# RetinaNet ResNet-50 + PAFPN on COCO (path-aggregation neck variant,
# reference parity: models/necks/pafpn.py:9-148).
_base_ = "retinanet_r50_fpn_coco.py"

model = dict(
    neck=dict(
        type="PAFPN",
        in_channels=(512, 1024, 2048),
        out_channels=256,
        num_outs=5,
        add_extra_convs=True,
        extra_convs_on_inputs=True,
        relu_before_extra_convs=True,
    ),
)

runtime = dict(work_dir="work_dirs/retinanet_pafpn_r50_coco")
