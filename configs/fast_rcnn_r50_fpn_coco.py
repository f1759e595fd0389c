# Fast R-CNN ResNet-50 + FPN on COCO: detection over PRECOMPUTED proposals
# (no RPN).  The reference's data tier ships a proposal_file through every
# geometric transform (base_dataset.py:100-105,193-200) for exactly this
# workflow; generate the pkl files with
#   python tools/dump_proposals.py configs/faster_rcnn_r50_fpn_coco.py CKPT \
#       --split train --out data/coco/proposals_train.pkl
# (and --split val) from a trained Faster R-CNN checkpoint.
_base_ = "faster_rcnn_r50_fpn_coco.py"

num_classes = 80

model = dict(
    _delete_=True,
    type="FastRCNN",
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
        num_outs=5,
    ),
    bbox_head=dict(type="BBoxHead", num_classes=num_classes, fc_channels=1024),
)

detection = dict(
    _delete_=True,
    style="fast_rcnn",
    num_classes=num_classes,
    score_thr=0.05,
    nms_iou_thr=0.5,
    max_detections=100,
)

data = dict(
    # fixed proposal slate: every train batch pads to this many rois so one
    # XLA program serves the whole run
    max_proposals=1000,
    train=dict(proposal_file="data/coco/proposals_train.pkl"),
    val=dict(proposal_file="data/coco/proposals_val.pkl"),
)

runtime = dict(work_dir="work_dirs/fast_rcnn_r50_fpn_coco")
