# Sparse R-CNN ResNet-50 + FPN on COCO (learnable proposals, NMS-free).
# Paper/mmdet defaults: 100 proposals, 6 stages, focal cls (2.0) +
# L1 (5.0) + GIoU (2.0) per-stage set losses, AdamW 2.5e-5.
_base_ = "retinanet_r50_fpn_coco.py"

num_classes = 80

model = dict(
    _delete_=True,
    type="SparseRCNN",
    backbone=dict(
        type="ResNet",
        depth=50,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_cfg=dict(type="FrozenBN"),
    ),
    neck=dict(
        type="FPN",
        in_channels=(256, 512, 1024, 2048),
        out_channels=256,
        num_outs=4,  # rois ride P2..P5 only (official config)
    ),
    num_proposals=100,
    num_stages=6,
    num_classes=num_classes,
)

detection = dict(
    _delete_=True,
    style="sparse_rcnn",
    num_classes=num_classes,
    num_proposals=100,
    score_thr=0.0,
    max_detections=100,
)

optimizer = dict(type="adamw", lr=2.5e-5, weight_decay=1e-4, grad_clip_norm=1.0)

runtime = dict(work_dir="work_dirs/sparse_rcnn_r50_fpn_coco")
