# RetinaNet ResNet-101 + FPN on VOC07 (BASELINE.json config #2 pipeline).
_base_ = "retinanet_r50_fpn_coco.py"

num_classes = 20

model = dict(
    backbone=dict(depth=101),
    head=dict(num_classes=num_classes),
)

detection = dict(num_classes=num_classes)

data = dict(
    train=dict(
        _delete_=True,
        type="VOCDataset",
        cache_dir="data/cache/",
        dataset_scope="voc07",
        dataset_root="data/voc/voc2007/",
        img_means=(123.675, 116.28, 103.53),
        img_stds=(58.395, 57.12, 57.375),
        img_expected_sizes=(1000, 600),
        size_divisor=32,
        flip_ratio=0.5,
    ),
    val=dict(
        _delete_=True,
        type="VOCDataset",
        cache_dir="data/cache/",
        dataset_scope="voc07",
        dataset_root="data/voc/voc2007/",
        img_means=(123.675, 116.28, 103.53),
        img_stds=(58.395, 57.12, 57.375),
        img_expected_sizes=(1000, 600),
        size_divisor=32,
        test_mode=True,
    ),
    canvas=(608, 1024),
)

runtime = dict(work_dir="work_dirs/retinanet_r101_fpn_voc")
