# YOLOX-s on COCO: CSPDarknet(0.33/0.5) + YOLOXPAFPN + decoupled head with
# SimOTA dynamic assignment, 640x640 canvas, anchor-free.
_base_ = "retinanet_r50_fpn_coco.py"

num_classes = 80

model = dict(
    _delete_=True,
    type="SingleStageDetector",
    backbone=dict(
        type="CSPDarknet",
        deepen_factor=0.33,
        widen_factor=0.5,
        out_indices=(2, 3, 4),
    ),
    neck=dict(
        type="YOLOXPAFPN",
        in_channels=(128, 256, 512),
        out_channels=128,
        num_csp_blocks=1,
    ),
    head=dict(
        type="YOLOXHead",
        num_classes=num_classes,
        in_channels=128,
        feat_channels=128,
        stacked_convs=2,
    ),
)

detection = dict(
    _delete_=True,
    style="yolox",
    num_classes=num_classes,
    strides=(8, 16, 32),
    center_radius=2.5,
    score_thr=0.01,
    nms_iou_thr=0.65,
    max_detections=100,
)

data = dict(
    canvas=(640, 640),
    train=dict(img_expected_sizes=(640, 640)),
    val=dict(img_expected_sizes=(640, 640)),
)

optimizer = dict(type="sgd", lr=0.01, momentum=0.9, weight_decay=5e-4)

runtime = dict(work_dir="work_dirs/yolox_s_coco")
