# PAA ResNet-50 + FPN on COCO — probabilistic anchor assignment family
# (Kim & Lee, ECCV 2020): ATSS's graph (one anchor per location, IoU-pred
# third branch) with the assignment learned per step — candidate anchors
# scored by their current detection loss, split positive/negative by an
# ON-DEVICE 2-component GMM (ops/gmm.py, fixed-shape EM in lax loops), and
# score voting at inference. See models/detectors/paa.py.

_base_ = "./atss_r50_fpn_coco.py"

model = dict(head=dict(type="PAAHead"))

detection = dict(
    style="paa",
    num_classes=80,
    anchor=dict(
        strides=(8, 16, 32, 64, 128),
        ratios=(1.0,),
        octave_base_scale=8.0,
        scales_per_octave=1,
    ),
    # loose initial matching defines the candidate pools (paper/mmdet: 0.1)
    assigner=dict(pos_iou_thr=0.1, neg_iou_thr=0.1, min_pos_iou=0.0),
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(0.1, 0.1, 0.2, 0.2),
    topk=9,
    reg_loss_weight=1.3,
    iou_loss_weight=0.5,
    score_voting=True,
    score_thr=0.05,
    nms_iou_thr=0.6,
    max_detections=100,
)

optimizer = dict(lr=0.01, momentum=0.9, weight_decay=1e-4, grad_clip_norm=35.0)
runtime = dict(
    work_dir="work_dirs/paa_r50_fpn_coco",
    mesh=dict(model=1),
    compute_dtype="bfloat16",
)
