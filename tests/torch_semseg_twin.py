"""Torch twin of models/resnet_semseg.ResNet50DilatedFCN (test helper).

An independent torch.nn implementation of the same mmseg-style dilated
ResNet-50 v1c + FCN head (reference consumer: utils/onnx_utils.py:32-44),
with the EXACT mmseg state-dict names the weight port maps by
(models/onnx_port._torch_name). Exporting this twin with torch's legacy
ONNX exporter produces a real exporter-named ONNX graph, which
tests/test_onnx_port.py feeds through the package's own ModelProto reader
(models/onnx_pb.py) and weight converter, then checks forward parity
torch-vs-Flax — the hermetic version of porting the reference checkpoint
``semseg_rn50_160k_cm.onnx``.
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class TorchBottleneck(nn.Module):
    def __init__(self, in_ch, features, stride=1, dilation=1,
                 downsample=False):
        super().__init__()
        out_ch = features * 4
        self.conv1 = nn.Conv2d(in_ch, features, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(features, eps=1e-5)
        self.conv2 = nn.Conv2d(features, features, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(features, eps=1e-5)
        self.conv3 = nn.Conv2d(features, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch, eps=1e-5)
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out_ch, eps=1e-5))
        else:
            self.downsample = None

    def forward(self, x):
        residual = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + residual)


class _Backbone(nn.Module):
    def __init__(self, stage_sizes):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm2d(32, eps=1e-5), nn.ReLU(),
            nn.Conv2d(32, 32, 3, padding=1, bias=False),
            nn.BatchNorm2d(32, eps=1e-5), nn.ReLU(),
            nn.Conv2d(32, 64, 3, padding=1, bias=False),
            nn.BatchNorm2d(64, eps=1e-5), nn.ReLU())
        stage_cfg = ((64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4))
        in_ch = 64
        for si, (feats, stride, dil) in enumerate(stage_cfg):
            blocks = []
            for bi in range(stage_sizes[si]):
                blocks.append(TorchBottleneck(
                    in_ch, feats, stride=stride if bi == 0 else 1,
                    dilation=dil, downsample=(bi == 0)))
                in_ch = feats * 4
            setattr(self, f'layer{si + 1}', nn.Sequential(*blocks))

    def forward(self, x):
        x = self.stem(x)
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        for si in range(4):
            x = getattr(self, f'layer{si + 1}')(x)
        return x


class _HeadConv(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = nn.Conv2d(2048, 512, 3, padding=1, bias=False)
        self.bn = nn.BatchNorm2d(512, eps=1e-5)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class _DecodeHead(nn.Module):
    def __init__(self, num_classes):
        super().__init__()
        self.convs = nn.Sequential(_HeadConv())
        self.conv_seg = nn.Conv2d(512, num_classes, 1)

    def forward(self, x):
        return self.conv_seg(self.convs(x))


class TorchResNet50DilatedFCN(nn.Module):
    """Raw [0,255] (B,H,W,3) image in, (B,H,W,num_classes) logits out —
    same contract as the Flax model, NCHW internally."""

    def __init__(self, num_classes=19, stage_sizes=(3, 4, 6, 3)):
        super().__init__()
        # _HeadConv.convs expects 2048 = 512*4 input channels; reduced
        # stage_sizes keep the channel progression, so this holds for any
        # stage_sizes tuple.
        self.backbone = _Backbone(stage_sizes)
        self.decode_head = _DecodeHead(num_classes)

    def forward(self, images):
        x = images.permute(0, 3, 1, 2).float() / 255.0
        mean = torch.tensor(IMAGENET_MEAN, device=x.device).view(1, 3, 1, 1)
        std = torch.tensor(IMAGENET_STD, device=x.device).view(1, 3, 1, 1)
        x = (x - mean) / std
        logits = self.decode_head(self.backbone(x))
        logits = F.interpolate(logits, size=images.shape[1:3],
                               mode='bilinear', align_corners=False)
        return logits.permute(0, 2, 3, 1)


def randomize_(model: nn.Module, seed: int = 0) -> None:
    """Give every parameter AND buffer a distinct random value so the
    ONNX exporter cannot deduplicate value-identical tensors (fresh
    BatchNorms are all-ones/zeros and collapse into Identity aliases),
    and so forward parity is tested on non-degenerate weights."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.empty_like(p).normal_(0., 0.05, generator=g))
        for name, b in model.named_buffers():
            if b.dtype.is_floating_point:
                if 'running_var' in name:
                    b.copy_(torch.empty_like(b).uniform_(
                        0.5, 1.5, generator=g))
                else:
                    b.copy_(torch.empty_like(b).normal_(
                        0., 0.05, generator=g))
