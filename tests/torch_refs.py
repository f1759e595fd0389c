"""Minimal torch reference models used as numerical oracles in tests.

These follow the standard torchvision ResNet naming (conv1/bn1/layer{i}/
downsample.0/...) so they produce state_dicts shaped exactly like the
checkpoints the importer must consume.  Written from the public architecture
definition; used only in tests.
"""

import torch
import torch.nn as nn


class TorchBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1, base_width=64):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * self.expansion, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(nn.Module):
    """Multi-scale-output ResNet with torchvision state_dict naming."""

    def __init__(self, block, layers, groups=1, base_width=64):
        super().__init__()
        self.inplanes = 64
        self.groups = groups
        self.base_width = base_width
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        kwargs = {}
        if block is TorchBottleneck:
            kwargs = dict(groups=self.groups, base_width=self.base_width)
        layers = [block(self.inplanes, planes, stride, downsample, **kwargs)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes, **kwargs))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c2, c3, c4, c5


def torch_resnet18():
    return TorchResNet(TorchBasicBlock, [2, 2, 2, 2])


def torch_resnet50():
    return TorchResNet(TorchBottleneck, [3, 4, 6, 3])


def torch_resnext50_32x4d():
    return TorchResNet(TorchBottleneck, [3, 4, 6, 3], groups=32, base_width=4)


def randomize_bn_stats(model, seed=0):
    """Give BN layers non-trivial running stats so eval-mode parity is a real test."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
            m.weight.data.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
    return model


class TorchVGG(nn.Module):
    """torchvision-style VGG (features Sequential naming), no norm."""

    ARCH = {11: (1, 1, 2, 2, 2), 13: (2, 2, 2, 2, 2), 16: (2, 2, 3, 3, 3), 19: (2, 2, 4, 4, 4)}

    def __init__(self, depth=16):
        super().__init__()
        layers = []
        in_ch = 3
        for i, blocks in enumerate(self.ARCH[depth]):
            out_ch = min(64 * 2**i, 512)
            for _ in range(blocks):
                layers += [nn.Conv2d(in_ch, out_ch, 3, padding=1), nn.ReLU(inplace=True)]
                in_ch = out_ch
            layers.append(nn.MaxPool2d(2, 2))
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        outs = []
        for m in self.features:
            x = m(x)
            if isinstance(m, nn.MaxPool2d):
                outs.append(x)
        return outs


class TorchConvModule(nn.Module):
    """conv(+relu) pair named like mmdet's ConvModule (``.conv`` child)."""

    def __init__(self, in_ch, out_ch, k, stride=1, padding=0, relu=True):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride, padding)
        self.relu = nn.ReLU(inplace=True) if relu else None

    def forward(self, x):
        x = self.conv(x)
        return self.relu(x) if self.relu is not None else x


class TorchFPN(nn.Module):
    """mmdet-style FPN: lateral_convs / fpn_convs (extras appended)."""

    def __init__(self, in_channels, out_channels, num_outs,
                 add_extra_convs=False, extra_convs_on_inputs=True,
                 relu_before_extra_convs=False):
        super().__init__()
        self.lateral_convs = nn.ModuleList(
            [TorchConvModule(c, out_channels, 1, relu=False) for c in in_channels]
        )
        self.fpn_convs = nn.ModuleList(
            [TorchConvModule(out_channels, out_channels, 3, padding=1, relu=False)
             for _ in in_channels]
        )
        self.num_outs = num_outs
        self.add_extra_convs = add_extra_convs
        self.extra_convs_on_inputs = extra_convs_on_inputs
        self.relu_before_extra_convs = relu_before_extra_convs
        if add_extra_convs:
            for k in range(num_outs - len(in_channels)):
                src_ch = in_channels[-1] if (k == 0 and extra_convs_on_inputs) else out_channels
                self.fpn_convs.append(
                    TorchConvModule(src_ch, out_channels, 3, stride=2, padding=1, relu=False)
                )

    def forward(self, inputs):
        laterals = [l(x) for l, x in zip(self.lateral_convs, inputs)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + nn.functional.interpolate(
                laterals[i], scale_factor=2, mode="nearest"
            )
        outs = [self.fpn_convs[i](laterals[i]) for i in range(len(laterals))]
        extra = self.num_outs - len(outs)
        if extra > 0:
            if not self.add_extra_convs:
                for _ in range(extra):
                    outs.append(nn.functional.max_pool2d(outs[-1], 1, stride=2))
            else:
                source = inputs[-1] if self.extra_convs_on_inputs else outs[-1]
                for k in range(extra):
                    if k > 0:
                        source = (nn.functional.relu(outs[-1])
                                  if self.relu_before_extra_convs else outs[-1])
                    outs.append(self.fpn_convs[len(self.lateral_convs) + k](source))
        return outs


class TorchRetinaHead(nn.Module):
    """mmdet-style RetinaHead naming (cls_convs/reg_convs/retina_cls/retina_reg)."""

    def __init__(self, num_classes, in_channels, feat_channels, stacked_convs, num_anchors):
        super().__init__()
        self.cls_convs = nn.ModuleList()
        self.reg_convs = nn.ModuleList()
        ch = in_channels
        for _ in range(stacked_convs):
            self.cls_convs.append(TorchConvModule(ch, feat_channels, 3, padding=1))
            self.reg_convs.append(TorchConvModule(ch, feat_channels, 3, padding=1))
            ch = feat_channels
        self.retina_cls = nn.Conv2d(feat_channels, num_anchors * num_classes, 3, padding=1)
        self.retina_reg = nn.Conv2d(feat_channels, num_anchors * 4, 3, padding=1)

    def forward(self, feats):
        cls_out, reg_out = [], []
        for f in feats:
            c = r = f
            for m in self.cls_convs:
                c = m(c)
            for m in self.reg_convs:
                r = m(r)
            cls_out.append(self.retina_cls(c))
            reg_out.append(self.retina_reg(r))
        return cls_out, reg_out


class TorchRetinaNet(nn.Module):
    """backbone + neck + bbox_head with mmdetection state_dict naming —
    the full-detector import-fidelity oracle (VERDICT.md round-1 #2)."""

    def __init__(self, depth=18, feat_channels=64, num_classes=4,
                 stacked_convs=2, num_anchors=9):
        super().__init__()
        self.backbone = torch_resnet18() if depth == 18 else torch_resnet50()
        c5 = 512 if depth == 18 else 2048
        in_channels = (c5 // 4, c5 // 2, c5)
        self.neck = TorchFPN(in_channels, feat_channels, num_outs=5,
                             add_extra_convs=True, extra_convs_on_inputs=True,
                             relu_before_extra_convs=True)
        self.bbox_head = TorchRetinaHead(
            num_classes, feat_channels, feat_channels, stacked_convs, num_anchors
        )

    def forward(self, x):
        _, c3, c4, c5 = self.backbone(x)
        feats = self.neck([c3, c4, c5])
        return self.bbox_head(feats)


class TorchRPNHead(nn.Module):
    """mmdet-style RPN head naming (rpn_conv/rpn_cls/rpn_reg)."""

    def __init__(self, in_channels, feat_channels, num_anchors):
        super().__init__()
        self.rpn_conv = nn.Conv2d(in_channels, feat_channels, 3, padding=1)
        self.rpn_cls = nn.Conv2d(feat_channels, num_anchors, 1)
        self.rpn_reg = nn.Conv2d(feat_channels, num_anchors * 4, 1)

    def forward(self, feats):
        scores, deltas = [], []
        for f in feats:
            h = nn.functional.relu(self.rpn_conv(f))
            scores.append(self.rpn_cls(h))
            deltas.append(self.rpn_reg(h))
        return scores, deltas


class TorchSharedFCBBoxHead(nn.Module):
    """mmdet shared-2fc bbox head naming (shared_fcs/fc_cls/fc_reg)."""

    def __init__(self, in_features, fc_channels, num_classes, reg_dim):
        super().__init__()
        self.shared_fcs = nn.ModuleList(
            [nn.Linear(in_features, fc_channels), nn.Linear(fc_channels, fc_channels)]
        )
        self.fc_cls = nn.Linear(fc_channels, num_classes + 1)
        self.fc_reg = nn.Linear(fc_channels, reg_dim)

    def forward(self, x):  # x: (R, in_features)
        for fc in self.shared_fcs:
            x = nn.functional.relu(fc(x))
        return self.fc_cls(x), self.fc_reg(x)


class TorchFasterRCNN(nn.Module):
    """Minimal Faster R-CNN parameter container with mmdet naming: the RoI
    pooling itself is framework-specific, so parity is asserted on the RPN
    maps and on the bbox head over FIXED pooled features."""

    def __init__(self, depth=18, feat_channels=32, num_classes=4,
                 roi_size=7, fc_channels=64, class_agnostic=False):
        super().__init__()
        self.backbone = torch_resnet18() if depth == 18 else torch_resnet50()
        c5 = 512 if depth == 18 else 2048
        self.neck = TorchFPN((c5 // 8, c5 // 4, c5 // 2, c5), feat_channels, num_outs=5)
        self.rpn_head = TorchRPNHead(feat_channels, feat_channels, num_anchors=3)
        reg_dim = 4 if class_agnostic else 4 * (num_classes + 1)
        self.bbox_head = TorchSharedFCBBoxHead(
            feat_channels * roi_size * roi_size, fc_channels, num_classes, reg_dim
        )

    def forward_rpn(self, x):
        c2, c3, c4, c5 = self.backbone(x)
        feats = self.neck([c2, c3, c4, c5])
        return feats, self.rpn_head(feats)


def _conv_bn_relu(in_ch, out_ch, k=3, stride=1, groups=1):
    return nn.Sequential(
        nn.Conv2d(in_ch, out_ch, k, stride, (k - 1) // 2, groups=groups, bias=False),
        nn.BatchNorm2d(out_ch),
        nn.ReLU6(inplace=True),
    )


class TorchInvertedResidual(nn.Module):
    """torchvision MobileNetV2 block naming (conv Sequential)."""

    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        self.stride = stride
        hidden = inp * expand_ratio
        self.use_res = stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers.append(_conv_bn_relu(inp, hidden, 1))
        layers += [
            _conv_bn_relu(hidden, hidden, 3, stride, groups=hidden),
            nn.Conv2d(hidden, oup, 1, bias=False),
            nn.BatchNorm2d(oup),
        ]
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class TorchMobileNetV2(nn.Module):
    """torchvision-naming MobileNetV2 returning /8,/16,/32 features."""

    CFG = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    def __init__(self, out_stages=(2, 4, 6)):
        super().__init__()
        self.out_stages = out_stages
        features = [_conv_bn_relu(3, 32, 3, 2)]
        self.stage_of = []  # feature idx -> stage idx
        in_ch = 32
        for s, (t, c, n, stride) in enumerate(self.CFG):
            for j in range(n):
                features.append(
                    TorchInvertedResidual(in_ch, c, stride if j == 0 else 1, t)
                )
                self.stage_of.append(s)
                in_ch = c
        features.append(_conv_bn_relu(in_ch, 1280, 1))
        self.features = nn.Sequential(*features)

    def forward(self, x):
        outs = {}
        x = self.features[0](x)
        for i, m in enumerate(list(self.features)[1:-1]):
            x = m(x)
            outs[self.stage_of[i]] = x
        return [outs[s] for s in self.out_stages]


class TorchL2Norm(nn.Module):
    def __init__(self, channels, scale=20.0, eps=1e-10):
        super().__init__()
        self.scale = nn.Parameter(torch.full((channels,), float(scale)))
        self.eps = eps

    def forward(self, x):  # (B, C, H, W)
        norm = x.pow(2).sum(dim=1, keepdim=True).sqrt() + self.eps
        return x / norm * self.scale.view(1, -1, 1, 1)


class TorchSSDVGG(nn.Module):
    """SSD300 VGG16 trunk mirroring models/backbones/ssd_vgg.py naming:
    layer{s}_{j}, conv6..conv11_2 (each a TorchConvModule), l2_norm."""

    def __init__(self):
        super().__init__()
        arch = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))
        in_ch = 3
        for s, (blocks, ch) in enumerate(arch):
            for j in range(blocks):
                setattr(self, f"layer{s + 1}_{j}", TorchConvModule(in_ch, ch, 3, padding=1))
                in_ch = ch
        self.l2_norm = TorchL2Norm(512)
        self.conv6 = TorchConvModule(512, 1024, 3, padding=6)
        self.conv6.conv.dilation = (6, 6)
        self.conv7 = TorchConvModule(1024, 1024, 1)
        self.conv8_1 = TorchConvModule(1024, 256, 1)
        self.conv8_2 = TorchConvModule(256, 512, 3, stride=2, padding=1)
        self.conv9_1 = TorchConvModule(512, 128, 1)
        self.conv9_2 = TorchConvModule(128, 256, 3, stride=2, padding=1)
        self.conv10_1 = TorchConvModule(256, 128, 1)
        self.conv10_2 = TorchConvModule(128, 256, 3)
        self.conv11_1 = TorchConvModule(256, 128, 1)
        self.conv11_2 = TorchConvModule(128, 256, 3)

    def forward(self, x):
        pool = lambda v: nn.functional.max_pool2d(v, 2, 2, ceil_mode=True)
        outs = []
        for j in range(2):
            x = getattr(self, f"layer1_{j}")(x)
        x = pool(x)
        for j in range(2):
            x = getattr(self, f"layer2_{j}")(x)
        x = pool(x)
        for j in range(3):
            x = getattr(self, f"layer3_{j}")(x)
        x = pool(x)
        for j in range(3):
            x = getattr(self, f"layer4_{j}")(x)
        outs.append(self.l2_norm(x))
        x = pool(x)
        for j in range(3):
            x = getattr(self, f"layer5_{j}")(x)
        x = nn.functional.max_pool2d(x, 3, 1, padding=1)
        x = self.conv7(self.conv6(x))
        outs.append(x)
        x = self.conv8_2(self.conv8_1(x))
        outs.append(x)
        x = self.conv9_2(self.conv9_1(x))
        outs.append(x)
        x = self.conv10_2(self.conv10_1(x))
        outs.append(x)
        x = self.conv11_2(self.conv11_1(x))
        outs.append(x)
        return outs
