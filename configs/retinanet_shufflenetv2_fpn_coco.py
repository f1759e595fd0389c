# RetinaNet ShuffleNetV2-1.0x + FPN on COCO (lightweight backbone).
_base_ = "retinanet_r50_fpn_coco.py"

model = dict(
    backbone=dict(
        _delete_=True,
        type="ShuffleNetV2",
        width_mult=1.0,
        out_indices=(0, 1, 2),  # /8, /16, /32 -> 116/232/464 channels
    ),
    neck=dict(in_channels=(116, 232, 464)),
)

runtime = dict(work_dir="work_dirs/retinanet_shufflenetv2_fpn_coco")
