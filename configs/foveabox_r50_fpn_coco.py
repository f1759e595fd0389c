# FoveaBox ResNet-50 + FPN on COCO — anchor-free fovea-region family.
# Config surface mirrors the reference's dict+registry idiom
# (utils/utils.py:5-38 obj_from_dict; get_datasets list fan-out).

num_classes = 80

model = dict(
    type="SingleStageDetector",
    backbone=dict(
        type="ResNet",
        stem_s2d=True,  # folded 7x7 stem on the s2d wire (r3: 4.9 -> 1.3 ms @ b8)
        depth=50,
        num_stages=4,
        out_indices=(1, 2, 3),
        frozen_stages=1,
        norm_cfg=dict(type="FrozenBN"),
    ),
    neck=dict(
        type="FPN",
        in_channels=(512, 1024, 2048),
        out_channels=256,
        num_outs=5,
        add_extra_convs=True,
        extra_convs_on_inputs=True,
        relu_before_extra_convs=True,
    ),
    head=dict(
        type="FoveaHead",
        num_classes=num_classes,
        in_channels=256,
        feat_channels=256,
        stacked_convs=4,
    ),
)

detection = dict(
    style="fovea",
    num_classes=num_classes,
    strides=(8, 16, 32, 64, 128),
    base_edges=(16.0, 32.0, 64.0, 128.0, 256.0),
    scale_ranges=((1.0, 64.0), (32.0, 128.0), (64.0, 256.0), (128.0, 512.0), (256.0, 2048.0)),
    sigma=0.4,
    score_thr=0.05,
    nms_iou_thr=0.5,
    max_detections=100,
)

data = dict(
    train=dict(
        type="CocoDataset",
        ann_file="data/coco/annotations/instances_train2017.json",
        img_prefix="data/coco/train2017/",
        img_means=(123.675, 116.28, 103.53),
        img_stds=(58.395, 57.12, 57.375),
        img_expected_sizes=(1333, 800),
        size_divisor=32,
        flip_ratio=0.5,
    ),
    val=dict(
        type="CocoDataset",
        ann_file="data/coco/annotations/instances_val2017.json",
        img_prefix="data/coco/val2017/",
        img_means=(123.675, 116.28, 103.53),
        img_stds=(58.395, 57.12, 57.375),
        img_expected_sizes=(1333, 800),
        size_divisor=32,
        test_mode=True,
    ),
    sample_per_replica=8,
    max_gts=100,
    canvas=(800, 1344),
)

optimizer = dict(lr=0.01, momentum=0.9, weight_decay=1e-4, grad_clip_norm=35.0)
schedule = dict(total_epochs=12, decay_epochs=(8, 11), warmup_steps=500, warmup_ratio=1.0 / 3)
runtime = dict(
    work_dir="work_dirs/foveabox_r50_fpn_coco",
    log_interval=50,
    checkpoint_interval_epochs=1,
    pretrained=None,  # e.g. "torch://weights/resnet50.pth"
    mesh=dict(model=1),  # data axis fills remaining devices
    compute_dtype="bfloat16",
)
