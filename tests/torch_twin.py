"""Test-only torch models mirroring the reference architectures.

These exist purely to generate parity fixtures: random-initialized torch
networks whose ``state_dict`` key layout matches the reference checkpoints
(so the `egotap_tpu.compat` converters are exercised with realistic keys)
and whose outputs the flax models must reproduce.

Written from the architecture spec in SURVEY.md; NOT imported by the
framework.
"""

import math

import torch
from torch import nn


# ---------------------------------------------------------------- resnet18
class _BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class TorchResNet18(nn.Module):
    """Minimal torchvision-resnet18-compatible trunk (state_dict keys match:
    conv1, bn1, layer{1..4}.{0,1}.*, fc)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cfg = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for i, (cin, cout, s) in enumerate(cfg, start=1):
            setattr(self, f"layer{i}", nn.Sequential(
                _BasicBlock(cin, cout, s), _BasicBlock(cout, cout, 1)))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512, 1000)

    # children order must mirror torchvision for the Encoder_Block split
    # (conv1, bn1, relu, maxpool, layer1..4, avgpool, fc)


def _convrelu(cin, cout, k, p):
    return nn.Sequential(nn.Conv2d(cin, cout, k, padding=p), nn.ReLU(inplace=True))


class TorchHeatmapNet(nn.Module):
    """Stage-1 net twin: shared resnet18 encoder over V views + concat-UNet
    decoder; state_dict keys match a reference ``*_net_HeatMap.pth``."""

    def __init__(self, num_output_maps, views=2):
        super().__init__()
        self.views = views
        fs = views  # resnet18 expansion 1

        trunk = TorchResNet18()

        class _Enc(nn.Module):
            def __init__(self, backbone):
                super().__init__()
                self.backbone = backbone
                kids = list(backbone.children())
                self.layer0 = nn.Sequential(*kids[:3])
                self.layer1 = nn.Sequential(*kids[3:5])
                self.layer2, self.layer3, self.layer4 = kids[5], kids[6], kids[7]

            def forward(self, x):
                l0 = self.layer0(x)
                l1 = self.layer1(l0)
                l2 = self.layer2(l1)
                l3 = self.layer3(l2)
                l4 = self.layer4(l3)
                return [x, l0, l1, l2, l3, l4]

        class _SharedBackbone(nn.Module):
            def __init__(self, enc):
                super().__init__()
                self.backbone = enc

            def forward(self, *views):
                return tuple(self.backbone(v) for v in views)

        class _Decoder(nn.Module):
            def __init__(self):
                super().__init__()
                self.layer1_1x1 = _convrelu(64 * fs, 64 * fs, 1, 0)
                self.layer2_1x1 = _convrelu(128 * fs, 128 * fs, 1, 0)
                self.layer3_1x1 = _convrelu(256 * fs, 258 * fs, 1, 0)
                self.layer4_1x1 = _convrelu(512 * fs, 512 * fs, 1, 0)
                self.upsample = nn.Upsample(scale_factor=2, mode="bilinear",
                                            align_corners=True)
                self.conv_up3 = _convrelu(258 * fs + 512 * fs, 512 * fs, 3, 1)
                self.conv_up2 = _convrelu(128 * fs + 512 * fs, 256 * fs, 3, 1)
                self.conv_up1 = _convrelu(64 * fs + 256 * fs, 256 * fs, 3, 1)
                self.conv_heatmap = nn.Conv2d(256 * fs, num_output_maps * views, 1)

            def forward(self, *pyramids):
                cat = [torch.cat([p[i] for p in pyramids], dim=1)
                       for i in range(6)]
                _, _, l1, l2, l3, l4 = cat
                x = self.upsample(self.layer4_1x1(l4))
                x = self.conv_up3(torch.cat([x, self.layer3_1x1(l3)], 1))
                x = self.upsample(x)
                x = self.conv_up2(torch.cat([x, self.layer2_1x1(l2)], 1))
                x = self.upsample(x)
                x = self.conv_up1(torch.cat([x, self.layer1_1x1(l1)], 1))
                return self.conv_heatmap(x)

        self.backbone = _SharedBackbone(_Enc(trunk))
        self.after_backbone = _Decoder()

    def forward(self, *views):
        return self.after_backbone(*self.backbone(*views))


def randomize_bn_stats(module, gen=None):
    """Give BN layers non-trivial running stats so eval-mode parity is a
    real test."""
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.05, generator=gen)
                m.running_var.uniform_(0.8, 1.2, generator=gen)
                m.weight.normal_(1.0, 0.05, generator=gen)
                m.bias.normal_(0, 0.05, generator=gen)
