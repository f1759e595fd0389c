# Cascade Mask R-CNN ResNet-50 + FPN on COCO: three-stage box refinement
# (IoU 0.5 / 0.6 / 0.7) with one FCN mask head per stage; inference averages
# the stage heads' sigmoid masks on the final refined boxes (mmdet parity).
_base_ = "cascade_rcnn_r50_fpn_coco.py"

num_classes = 80

model = dict(
    type="CascadeMaskRCNN",
    mask_head=dict(
        type="FCNMaskHead",
        num_classes=num_classes,
        in_channels=256,
        conv_channels=256,
        num_convs=4,
    ),
)

detection = dict(style="cascade_mask_rcnn")

data = dict(train=dict(with_mask=True))

runtime = dict(work_dir="work_dirs/cascade_mask_rcnn_r50_fpn_coco")
