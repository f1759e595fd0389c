# SSD512 (VGG16) on COCO — the classic single-shot detector over the
# reference's VGG backbone (models/backbone/vgg.py in
# TCGGroup/Torch_Detection; the reference never built the detector tier).
#
# NOTE on resizing: the canonical SSD protocol distorts images to a square
# 512x512; this pipeline keep-ratio-resizes (longest side 512) onto a
# 512x512 canvas with validity-masked padding — anchors outside the valid
# region are handled by the fixed-shape masking like every other config.

num_classes = 80

model = dict(
    type="SingleStageDetector",
    backbone=dict(type="SSDVGG", depth=16, input_size=512, l2_norm_scale=20.0),
    neck=None,
    head=dict(
        type="SSDHead",
        num_classes=num_classes,
        in_channels=(512, 1024, 512, 256, 256, 256, 256),
        anchors_per_level=(4, 6, 6, 6, 6, 4, 4),
    ),
)

detection = dict(
    style="ssd",
    num_classes=num_classes,
    anchor=dict(
        strides=(8, 16, 32, 64, 128, 256, 512),
        min_sizes=(20.48, 51.2, 133.12, 215.04, 296.96, 378.88, 460.8),
        max_sizes=(51.2, 133.12, 215.04, 296.96, 378.88, 460.8, 542.72),
        ratios=((2.0,), (2.0, 3.0), (2.0, 3.0), (2.0, 3.0), (2.0, 3.0), (2.0,), (2.0,)),
    ),
    assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.0),
    target_stds=(0.1, 0.1, 0.2, 0.2),
    neg_pos_ratio=3.0,
    smooth_l1_beta=1.0,
    score_thr=0.02,
    nms_iou_thr=0.45,
    max_detections=200,
)

data = dict(
    train=dict(
        type="CocoDataset",
        ann_file="data/coco/annotations/instances_train2017.json",
        img_prefix="data/coco/train2017/",
        img_means=(123.675, 116.28, 103.53),
        img_stds=(58.395, 57.12, 57.375),
        img_expected_sizes=(512, 512),
        size_divisor=512,
        flip_ratio=0.5,
    ),
    val=dict(
        type="CocoDataset",
        ann_file="data/coco/annotations/instances_val2017.json",
        img_prefix="data/coco/val2017/",
        img_means=(123.675, 116.28, 103.53),
        img_stds=(58.395, 57.12, 57.375),
        img_expected_sizes=(512, 512),
        size_divisor=512,
        test_mode=True,
    ),
    sample_per_replica=16,
    max_gts=100,
    canvas=(512, 512),
)

optimizer = dict(lr=2e-3, momentum=0.9, weight_decay=5e-4, grad_clip_norm=35.0)
schedule = dict(total_epochs=24, decay_epochs=(16, 22), warmup_steps=500, warmup_ratio=1.0 / 3)
runtime = dict(
    work_dir="work_dirs/ssd512_vgg16_coco",
    log_interval=50,
    checkpoint_interval_epochs=1,
    pretrained=None,
    mesh=dict(model=1),
    compute_dtype="bfloat16",
)
