# Faster R-CNN ResNet-50 + FPN on COCO (two-stage flagship).
_base_ = "retinanet_r50_fpn_coco.py"

num_classes = 80

model = dict(
    _delete_=True,
    type="TwoStageDetector",
    backbone=dict(
        type="ResNet",
        # stem_s2d deliberately OFF: at the two-stage batch (b4) XLA already
        # picks a good 7x7s2 algorithm and the s2d wire measured slightly
        # slower e2e (124.4 -> 121.3 img/s, r3); the win is batch-dependent
        # (the 7x7 stem is only pessimized at b8+: 4.9 ms vs 1.3 folded).
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
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256, num_base_anchors=3),
    bbox_head=dict(type="BBoxHead", num_classes=num_classes, fc_channels=1024),
)

detection = dict(
    _delete_=True,
    style="faster_rcnn",
    num_classes=num_classes,
    anchor=dict(
        strides=(4, 8, 16, 32, 64),
        ratios=(0.5, 1.0, 2.0),
        scales=(8.0,),
    ),
    score_thr=0.05,
    nms_iou_thr=0.5,
    max_detections=100,
)

runtime = dict(work_dir="work_dirs/faster_rcnn_r50_fpn_coco")
