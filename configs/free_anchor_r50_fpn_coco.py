# FreeAnchor ResNet-50 + FPN on COCO (fourteenth family).
# Same model graph and inference path as RetinaNet — the family is a
# training-objective change: per-gt anchor bags with a learned (mean-max)
# matching instead of hard MaxIoU assignment.  See
# models/detectors/free_anchor.py for the formulation.

_base_ = "./retinanet_r50_fpn_coco.py"

detection = dict(
    style="free_anchor",
    num_classes=80,
    anchor=dict(
        strides=(8, 16, 32, 64, 128),
        ratios=(0.5, 1.0, 2.0),
        octave_base_scale=4.0,
        scales_per_octave=3,
    ),
    # FreeAnchor decodes boxes inside the loss and exponentiates the huber:
    # the canonical setting (paper / mmdet) is UNIT target stds — 0.1/0.2
    # stds inflate the deltas 5-10x and exp(-0.75 * huber) underflows at
    # init, starving the positive bag term.
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
    pre_anchor_topk=50,
    bbox_thr=0.6,
    bag_gamma=2.0,
    bag_alpha=0.5,
    loc_loss_weight=0.75,
    score_thr=0.05,
    nms_iou_thr=0.5,
    max_detections=100,
)

optimizer = dict(lr=0.01, momentum=0.9, weight_decay=1e-4, grad_clip_norm=35.0)
runtime = dict(
    work_dir="work_dirs/free_anchor_r50_fpn_coco",
    mesh=dict(model=1),
    compute_dtype="bfloat16",
)
