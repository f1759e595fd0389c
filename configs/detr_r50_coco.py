# DETR ResNet-50 on COCO — set-prediction transformer family
# (Carion et al., ECCV 2020): C5 features -> 6+6 encoder/decoder layers,
# 100 learned queries, Hungarian-matched CE + L1 + GIoU losses (matching
# runs ON DEVICE — ops/hungarian.py), no anchors and no NMS.
# Config surface mirrors the reference's dict+registry idiom
# (utils/utils.py:5-38 obj_from_dict; get_datasets list fan-out).

num_classes = 80

model = dict(
    type="DETR",
    backbone=dict(
        type="ResNet",
        depth=50,
        num_stages=4,
        out_indices=(3,),
        frozen_stages=1,
        norm_cfg=dict(type="FrozenBN"),
    ),
    num_classes=num_classes,
    d_model=256,
    nhead=8,
    num_encoder_layers=6,
    num_decoder_layers=6,
    dim_feedforward=2048,
    num_queries=100,
)

detection = dict(
    style="detr",
    num_classes=num_classes,
    num_queries=100,
    cls_weight=1.0,
    bbox_weight=5.0,
    giou_weight=2.0,
    eos_coef=0.1,
    aux_loss=True,
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

# the transformer family trains with AdamW (paper: 1e-4, backbone 1e-5,
# 0.1 clip) and a long cosine-free schedule; grad clip matters for the
# cross-attention early on
optimizer = dict(type="adamw", lr=1e-4, weight_decay=1e-4, grad_clip_norm=0.1)
schedule = dict(total_epochs=150, decay_epochs=(100,), warmup_steps=10)
runtime = dict(
    work_dir="work_dirs/detr_r50_coco",
    log_interval=50,
    checkpoint_interval_epochs=1,
    pretrained=None,  # e.g. "modelzoo://resnet50"
    mesh=dict(model=1),  # data axis fills remaining devices
    compute_dtype="bfloat16",
)
