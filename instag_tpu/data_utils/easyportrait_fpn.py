"""EasyPortrait FPN teeth/face-part segmentor, from scratch in torch.

The reference produces teeth masks by running an mmseg ``EncoderDecoder``
(ResNetV1c-50 backbone + FPN neck + FPNHead, 8 classes, teeth = class 7)
over ``ori_imgs`` (reference ``data_utils/easyportrait/create_teeth_mask.py``
+ ``local_configs/easyportrait_experiments_v2/fpn-fp/fpn-fp.py``). The
reference vendors ~25k lines of mmseg to do this; here the same network is
~200 lines of plain torch whose ``state_dict`` keys exactly match the mmseg
checkpoint layout, so the public ``fpn-fp-512.pth`` loads directly with
``load_state_dict(..., strict=True)`` — no mmcv/mmseg dependency.

Architecture (from the reference config, not the mmseg source):
  * ResNetV1c-50: deep 3x3x3 stem (3->32->32->64, stride 2) + maxpool,
    bottleneck layers [3, 4, 6, 3], channels 256/512/1024/2048,
    strides 1/2/2/2, "pytorch" style (stride on conv2), BN everywhere.
  * FPN neck: 1x1 lateral convs (bias, no norm) -> top-down nearest
    upsample accumulation -> 3x3 fpn convs; 256 channels, 4 outputs.
  * FPNHead (Semantic FPN): per-level scale heads of 3x3 ConvModule
    (conv+BN+ReLU) with x2 bilinear upsamples down to stride 4, summed,
    then a 1x1 conv_seg to 8 classes.
Inference = "whole" mode: logits at stride 4, bilinear-resized to input.
"""

from __future__ import annotations

import numpy as np

try:
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
except ImportError:  # pragma: no cover - torch is baked into this image
    torch = None

# test-pipeline normalization (fpn-fp.py img_norm_cfg; 0-255 domain, RGB)
_MEAN = np.array([143.55267075, 132.96705975, 126.94924335], np.float32)
_STD = np.array([60.2625333, 60.32740275, 59.30988645], np.float32)

TEETH_CLASS = 7
CLASSES = ("background", "skin", "left brow", "right brow", "left eye",
           "right eye", "lips", "teeth")

if torch is not None:

    def _bn(c):
        return nn.BatchNorm2d(c)  # SyncBN folds to plain BN for inference

    class ConvModule(nn.Module):
        """mmcv ConvModule (conv + optional BN + ReLU) with matching keys."""

        def __init__(self, cin, cout, k, stride=1, padding=0, norm=True):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, stride, padding,
                                  bias=not norm)
            self.bn = _bn(cout) if norm else None
            self.activate = nn.ReLU(inplace=True)

        def forward(self, x):
            x = self.conv(x)
            if self.bn is not None:
                x = self.bn(x)
            return self.activate(x)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            # "pytorch" style: stride on conv2
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = _bn(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = _bn(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = _bn(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            idt = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                idt = self.downsample(x)
            return self.relu(out + idt)

    class ResNetV1c(nn.Module):
        """ResNet-50 with the deep 3-conv stem (mmseg ResNetV1c)."""

        def __init__(self, depth=50):
            super().__init__()
            blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
            self.stem = nn.Sequential(
                nn.Conv2d(3, 32, 3, 2, 1, bias=False), _bn(32),
                nn.ReLU(inplace=True),
                nn.Conv2d(32, 32, 3, 1, 1, bias=False), _bn(32),
                nn.ReLU(inplace=True),
                nn.Conv2d(32, 64, 3, 1, 1, bias=False), _bn(64),
                nn.ReLU(inplace=True))
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            inplanes = 64
            for i, (n, planes, stride) in enumerate(zip(
                    blocks, (64, 128, 256, 512), (1, 2, 2, 2))):
                layers = []
                for j in range(n):
                    s = stride if j == 0 else 1
                    down = None
                    if j == 0 and (s != 1 or inplanes != planes * 4):
                        down = nn.Sequential(
                            nn.Conv2d(inplanes, planes * 4, 1, s,
                                      bias=False), _bn(planes * 4))
                    layers.append(Bottleneck(inplanes, planes, s, down))
                    inplanes = planes * 4
                setattr(self, f"layer{i + 1}", nn.Sequential(*layers))

        def forward(self, x):
            x = self.maxpool(self.stem(x))
            outs = []
            for i in range(4):
                x = getattr(self, f"layer{i + 1}")(x)
                outs.append(x)
            return outs

    class FPN(nn.Module):
        def __init__(self, in_channels=(256, 512, 1024, 2048), out=256):
            super().__init__()
            self.lateral_convs = nn.ModuleList(
                [ConvModule(c, out, 1, norm=False) for c in in_channels])
            self.fpn_convs = nn.ModuleList(
                [ConvModule(out, out, 3, padding=1, norm=False)
                 for _ in in_channels])
            # mmcv ConvModule without norm keeps ReLU only when act_cfg is
            # set; FPN passes act_cfg=None -> identity
            for m in list(self.lateral_convs) + list(self.fpn_convs):
                m.activate = nn.Identity()

        def forward(self, feats):
            lat = [conv(f) for conv, f in zip(self.lateral_convs, feats)]
            for i in range(len(lat) - 1, 0, -1):
                lat[i - 1] = lat[i - 1] + F.interpolate(
                    lat[i], size=lat[i - 1].shape[2:], mode="nearest")
            return [conv(x) for conv, x in zip(self.fpn_convs, lat)]

    class FPNHead(nn.Module):
        def __init__(self, channels=128, num_classes=8,
                     feature_strides=(4, 8, 16, 32), in_channels=256):
            super().__init__()
            self.scale_heads = nn.ModuleList()
            for s in feature_strides:
                length = max(1, int(np.log2(s) - np.log2(feature_strides[0])))
                mods = []
                for k in range(length):
                    mods.append(ConvModule(
                        in_channels if k == 0 else channels, channels, 3,
                        padding=1, norm=True))
                    if s != feature_strides[0]:
                        mods.append(nn.Upsample(scale_factor=2,
                                                mode="bilinear",
                                                align_corners=False))
                self.scale_heads.append(nn.Sequential(*mods))
            self.conv_seg = nn.Conv2d(channels, num_classes, 1)

        def forward(self, feats):
            out = self.scale_heads[0](feats[0])
            for i in range(1, len(feats)):
                out = out + F.interpolate(
                    self.scale_heads[i](feats[i]), size=out.shape[2:],
                    mode="bilinear", align_corners=False)
            return self.conv_seg(out)

    class EasyPortraitFPN(nn.Module):
        """mmseg EncoderDecoder(ResNetV1c-50 + FPN + FPNHead), key-compatible
        with the public EasyPortrait ``fpn-fp-512.pth`` checkpoint."""

        def __init__(self, num_classes=8):
            super().__init__()
            self.backbone = ResNetV1c(50)
            self.neck = FPN()
            self.decode_head = FPNHead(num_classes=num_classes)

        def forward(self, x):
            logits = self.decode_head(self.neck(self.backbone(x)))
            return F.interpolate(logits, size=x.shape[2:], mode="bilinear",
                                 align_corners=False)


def load_fpn_fp(checkpoint_path: str) -> "EasyPortraitFPN":
    """Build the segmentor and load the mmseg checkpoint strictly."""
    model = EasyPortraitFPN()
    ckpt = torch.load(checkpoint_path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    # mmseg sometimes stores aux heads / ema copies; keep decode path only
    sd = {k: v for k, v in sd.items()
          if k.startswith(("backbone.", "neck.", "decode_head."))
          and "num_batches_tracked" not in k}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    missing = [k for k in missing if "num_batches_tracked" not in k]
    if missing or unexpected:
        raise ValueError(
            f"fpn-fp checkpoint mismatch: missing={missing[:5]} "
            f"unexpected={unexpected[:5]}")
    return model.eval()


def segment(model: "EasyPortraitFPN", img_bgr: np.ndarray) -> np.ndarray:
    """Whole-image inference -> [H, W] uint8 class map (teeth = 7).

    Matches the reference test pipeline: BGR->RGB, 0-255 normalize with the
    EasyPortrait mean/std, no resize (inference at the native resolution,
    padded to a /32 multiple)."""
    h, w = img_bgr.shape[:2]
    rgb = img_bgr[:, :, ::-1].astype(np.float32)
    inp = (rgb - _MEAN) / _STD
    ph, pw = -h % 32, -w % 32
    x = torch.from_numpy(inp.transpose(2, 0, 1))[None]
    if ph or pw:
        x = F.pad(x, (0, pw, 0, ph))
    with torch.no_grad():
        logits = model(x)
    return logits[0, :, :h, :w].argmax(0).numpy().astype(np.uint8)
