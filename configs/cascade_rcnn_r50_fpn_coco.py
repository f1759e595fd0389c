# Cascade R-CNN ResNet-50 + FPN on COCO (three-stage box refinement,
# IoU thresholds 0.5 / 0.6 / 0.7, class-agnostic regression heads).
_base_ = "faster_rcnn_r50_fpn_coco.py"

num_classes = 80

model = dict(
    _delete_=True,
    type="CascadeRCNN",
    num_stages=3,
    backbone=dict(
        # stem_s2d OFF like the other two-stage configs: the s2d stem win is
        # batch-dependent and two-stage trains/serves at small batch.
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
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256, num_base_anchors=3),
    # per-stage head config; each stage gets its own parameters.  Cascade
    # heads are class-agnostic regression (the refine step is a 4-delta
    # decode) — BBoxHead's default.
    bbox_head=dict(type="BBoxHead", num_classes=num_classes, fc_channels=1024),
)

detection = dict(
    _delete_=True,
    style="cascade_rcnn",
    num_classes=num_classes,
    num_stages=3,
    stage_pos_ious=(0.5, 0.6, 0.7),
    stage_loss_weights=(1.0, 0.5, 0.25),
    stage_target_stds=(
        (0.1, 0.1, 0.2, 0.2),
        (0.05, 0.05, 0.1, 0.1),
        (0.033, 0.033, 0.067, 0.067),
    ),
    anchor=dict(
        strides=(4, 8, 16, 32, 64),
        ratios=(0.5, 1.0, 2.0),
        scales=(8.0,),
    ),
    score_thr=0.05,
    nms_iou_thr=0.5,
    max_detections=100,
)

runtime = dict(work_dir="work_dirs/cascade_rcnn_r50_fpn_coco")
