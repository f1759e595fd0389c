# RetinaNet MobileNetV2 + FPN on COCO (lightweight backbone; torchvision
# checkpoint import via models/torch_import.py mobilenetv2_key_rules).
_base_ = "retinanet_r50_fpn_coco.py"

model = dict(
    backbone=dict(
        _delete_=True,
        type="MobileNetV2",
        out_indices=(2, 4, 6),  # /8, /16, /32 -> 32/96/320 channels
    ),
    neck=dict(in_channels=(32, 96, 320)),
)

runtime = dict(work_dir="work_dirs/retinanet_mobilenetv2_fpn_coco")
