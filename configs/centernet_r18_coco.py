# CenterNet ResNet-18 on COCO — NMS-free center-point detection
# ("Objects as Points").  512x512 canvas -> one stride-4 map via the
# CTResNetNeck deconv stack; inference is sigmoid + 3x3 peak-pick + top-k.
_base_ = "retinanet_r50_fpn_coco.py"

num_classes = 80

model = dict(
    _delete_=True,
    type="SingleStageDetector",
    backbone=dict(
        type="ResNet",
        depth=18,
        num_stages=4,
        out_indices=(3,),
        norm_cfg=dict(type="FrozenBN"),
    ),
    neck=dict(
        type="CTResNetNeck",
        in_channels=512,
        num_deconv_filters=(256, 128, 64),
    ),
    head=dict(
        type="CenterNetHead",
        num_classes=num_classes,
        in_channels=64,
        feat_channels=64,
    ),
)

detection = dict(
    _delete_=True,
    style="centernet",
    num_classes=num_classes,
    down_ratio=4,
    score_thr=0.05,
    max_detections=100,
)

data = dict(
    canvas=(512, 512),
    train=dict(img_expected_sizes=(512, 512)),
    val=dict(img_expected_sizes=(512, 512)),
)

optimizer = dict(lr=5e-4)  # adam-style magnitude; the paper trains with Adam

runtime = dict(work_dir="work_dirs/centernet_r18_coco")
