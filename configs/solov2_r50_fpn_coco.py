# SOLOv2 ResNet-50 + FPN on COCO: box-free dense instance segmentation.
# Each FPN level's S x S grid predicts per-cell class scores and a dynamic
# 1x1 conv kernel applied to a unified stride-4 mask feature map; Matrix
# NMS (pure matmuls) replaces greedy suppression.
_base_ = "retinanet_r50_fpn_coco.py"

num_classes = 80

model = dict(
    _delete_=True,
    type="SOLOV2",
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
        num_outs=5,  # P2-P6 (strides 4..64)
    ),
    head=dict(
        type="SOLOV2Head",
        num_classes=num_classes,
        in_channels=256,
        feat_channels=256,
        kernel_channels=128,
        stacked_convs=4,
        grid_numbers=(40, 36, 24, 16, 12),
    ),
    mask_feat_head=dict(
        type="MaskFeatHead",
        in_channels=256,
        feat_channels=128,
        out_channels=128,
        num_inputs=4,  # P2-P5 fuse into the stride-4 mask features
    ),
)

detection = dict(
    _delete_=True,
    style="solov2",
    num_classes=num_classes,
    grid_numbers=(40, 36, 24, 16, 12),
    scale_ranges=((1, 96), (48, 192), (96, 384), (192, 768), (384, 2048)),
    sigma=0.2,
    dice_weight=3.0,
    score_thr=0.1,
    update_thr=0.05,
    mask_thr=0.5,
    pre_nms_top_k=256,
    max_detections=100,
    nms_sigma=2.0,
)

data = dict(train=dict(with_mask=True))

runtime = dict(work_dir="work_dirs/solov2_r50_fpn_coco", val_segm=True)
