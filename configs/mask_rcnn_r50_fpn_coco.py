# Mask R-CNN ResNet-50 + FPN on COCO (instance segmentation flagship).
_base_ = "faster_rcnn_r50_fpn_coco.py"

num_classes = 80

model = dict(
    type="MaskRCNN",
    mask_head=dict(
        type="FCNMaskHead",
        num_classes=num_classes,
        in_channels=256,
        conv_channels=256,
        num_convs=4,
    ),
)

detection = dict(style="mask_rcnn")

data = dict(train=dict(with_mask=True))

runtime = dict(work_dir="work_dirs/mask_rcnn_r50_fpn_coco")
