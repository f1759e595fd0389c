# YOLOv3 Darknet-53 on COCO — eighth detector family.
# Canonical 608x608 geometry: Darknet-53 trunk, top-down YOLOV3Neck,
# 3-anchor-per-cell YOLOV3Head, grid-responsible assignment.

num_classes = 80

model = dict(
    type="SingleStageDetector",
    backbone=dict(
        type="Darknet",
        depth=53,
        out_indices=(2, 3, 4),  # 256 @ /8, 512 @ /16, 1024 @ /32
        norm_cfg=dict(type="FrozenBN"),
    ),
    neck=dict(
        type="YOLOV3Neck",
        in_channels=(256, 512, 1024),
        out_channels=(512, 256, 128),
    ),
    head=dict(
        type="YOLOV3Head",
        num_classes=num_classes,
        in_channels=(512, 256, 128),
        out_channels=(1024, 512, 256),
    ),
)

detection = dict(
    style="yolo",
    num_classes=num_classes,
    anchor=dict(
        strides=[32, 16, 8],
        base_sizes=[
            [[116, 90], [156, 198], [373, 326]],
            [[30, 61], [62, 45], [59, 119]],
            [[10, 13], [16, 30], [33, 23]],
        ],
    ),
    assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.0),
    conf_thr=0.005,
    score_thr=0.05,
    nms_iou_thr=0.45,
    max_detections=100,
)

data = dict(
    train=dict(
        type="CocoDataset",
        ann_file="data/coco/annotations/instances_train2017.json",
        img_prefix="data/coco/train2017/",
        img_means=(0.0, 0.0, 0.0),
        img_stds=(255.0, 255.0, 255.0),  # darknet convention: [0, 1] inputs
        img_expected_sizes=(608, 608),
        size_divisor=32,
        flip_ratio=0.5,
    ),
    val=dict(
        type="CocoDataset",
        ann_file="data/coco/annotations/instances_val2017.json",
        img_prefix="data/coco/val2017/",
        img_means=(0.0, 0.0, 0.0),
        img_stds=(255.0, 255.0, 255.0),
        img_expected_sizes=(608, 608),
        size_divisor=32,
        test_mode=True,
    ),
    sample_per_replica=8,
    max_gts=100,
    canvas=(608, 608),
)

optimizer = dict(lr=0.001, momentum=0.9, weight_decay=5e-4, grad_clip_norm=35.0)
schedule = dict(total_epochs=273, decay_epochs=(218, 246), warmup_steps=2000, warmup_ratio=0.1)
runtime = dict(
    work_dir="work_dirs/yolov3_d53_coco",
    log_interval=50,
    checkpoint_interval_epochs=7,
    pretrained=None,
    mesh=dict(model=1),
    compute_dtype="bfloat16",
)
