"""BiSeNet face parsing (task 4) — compact torch implementation + the
reference's class→color coding (data_utils/face_parsing/test.py:38-69):

  classes 1-13 head  -> (255,0,0)   (blue after cv2 BGR write)
  class 11 mouth     -> (100,100,100)
  classes 14-15 neck -> (0,255,0)
  class 16 torso     -> (0,0,255)   (red after BGR write)
  classes 17-18 hair -> (0,0,0)
  class 18+ / cloth  -> (255,0,0); background stays white

Runs on CPU torch; requires the public 19-class CelebAMask BiSeNet weights
(set INSTAG_BISENET_WEIGHTS or place 79999_iter.pth under weights/). Without
weights the task raises with instructions — this image has no egress.

The network is the standard BiSeNet-with-ResNet18 (context path with 16x/32x
attention-refined features + feature fusion), written from scratch; the
state-dict key layout matches the public checkpoint so it loads directly.
"""

from __future__ import annotations

import glob
import os

import numpy as np


def _build_bisenet():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    import torchvision  # noqa: F401  (resnet18 structure, weightless)

    class ConvBNReLU(nn.Module):
        def __init__(self, cin, cout, ks=3, stride=1, padding=1):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, ks, stride, padding, bias=False)
            self.bn = nn.BatchNorm2d(cout)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if cin != cout or stride != 1:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            sc = x if self.downsample is None else self.downsample(x)
            return F.relu(out + sc)

    class Resnet18(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            def layer(cin, cout, stride):
                return nn.Sequential(BasicBlock(cin, cout, stride),
                                     BasicBlock(cout, cout, 1))
            self.layer1 = layer(64, 64, 1)
            self.layer2 = layer(64, 128, 2)
            self.layer3 = layer(128, 256, 2)
            self.layer4 = layer(256, 512, 2)

        def forward(self, x):
            x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
            x = self.layer1(x)
            feat8 = self.layer2(x)
            feat16 = self.layer3(feat8)
            feat32 = self.layer4(feat16)
            return feat8, feat16, feat32

    class AttentionRefinementModule(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = ConvBNReLU(cin, cout)
            self.conv_atten = nn.Conv2d(cout, cout, 1, bias=False)
            self.bn_atten = nn.BatchNorm2d(cout)

        def forward(self, x):
            feat = self.conv(x)
            atten = F.adaptive_avg_pool2d(feat, 1)
            atten = torch.sigmoid(self.bn_atten(self.conv_atten(atten)))
            return feat * atten

    class ContextPath(nn.Module):
        def __init__(self):
            super().__init__()
            self.resnet = Resnet18()
            self.arm16 = AttentionRefinementModule(256, 128)
            self.arm32 = AttentionRefinementModule(512, 128)
            self.conv_head32 = ConvBNReLU(128, 128)
            self.conv_head16 = ConvBNReLU(128, 128)
            self.conv_avg = ConvBNReLU(512, 128, 1, 1, 0)

        def forward(self, x):
            feat8, feat16, feat32 = self.resnet(x)
            avg = F.adaptive_avg_pool2d(feat32, 1)
            avg = self.conv_avg(avg)
            avg_up = F.interpolate(avg, size=feat32.shape[2:], mode="nearest")
            feat32 = self.arm32(feat32) + avg_up
            feat32_up = F.interpolate(feat32, size=feat16.shape[2:],
                                      mode="nearest")
            feat32_up = self.conv_head32(feat32_up)
            feat16 = self.arm16(feat16) + feat32_up
            feat16_up = F.interpolate(feat16, size=feat8.shape[2:],
                                      mode="nearest")
            feat16_up = self.conv_head16(feat16_up)
            return feat8, feat16_up, feat32_up

    class FeatureFusionModule(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.convblk = ConvBNReLU(cin, cout, 1, 1, 0)
            self.conv1 = nn.Conv2d(cout, cout // 4, 1, bias=False)
            self.conv2 = nn.Conv2d(cout // 4, cout, 1, bias=False)

        def forward(self, fsp, fcp):
            feat = self.convblk(torch.cat([fsp, fcp], 1))
            atten = F.adaptive_avg_pool2d(feat, 1)
            atten = F.relu(self.conv1(atten))
            atten = torch.sigmoid(self.conv2(atten))
            return feat + feat * atten

    class BiSeNetOutput(nn.Module):
        def __init__(self, cin, mid, n_classes):
            super().__init__()
            self.conv = ConvBNReLU(cin, mid)
            self.conv_out = nn.Conv2d(mid, n_classes, 1, bias=False)

        def forward(self, x):
            return self.conv_out(self.conv(x))

    class BiSeNet(nn.Module):
        def __init__(self, n_classes=19):
            super().__init__()
            self.cp = ContextPath()
            self.ffm = FeatureFusionModule(256, 256)
            self.conv_out = BiSeNetOutput(256, 256, n_classes)
            self.conv_out16 = BiSeNetOutput(128, 64, n_classes)
            self.conv_out32 = BiSeNetOutput(128, 64, n_classes)

        def forward(self, x):
            hw = x.shape[2:]
            feat8, feat16_up, _ = self.cp(x)
            feat = self.ffm(feat8, feat16_up)
            out = self.conv_out(feat)
            return F.interpolate(out, size=hw, mode="bilinear",
                                 align_corners=True)

    return BiSeNet()


def colorize_parsing(parsing: np.ndarray) -> np.ndarray:
    """19-class map -> color-coded PNG array (written with cv2, i.e. BGR)."""
    h, w = parsing.shape
    color = np.full((h, w, 3), 255, np.uint8)
    color[(parsing >= 1) & (parsing <= 13)] = (255, 0, 0)
    color[parsing == 11] = (100, 100, 100)
    color[(parsing == 14) | (parsing == 15)] = (0, 255, 0)
    color[parsing == 16] = (0, 0, 255)
    color[(parsing == 17) | (parsing == 18)] = (0, 0, 0)
    if parsing.max() > 18:
        color[parsing > 18] = (255, 0, 0)
    return color


def find_weights() -> str | None:
    for cand in (os.environ.get("INSTAG_BISENET_WEIGHTS", ""),
                 "weights/79999_iter.pth", "weights/bisenet.pth"):
        if cand and os.path.exists(cand):
            return cand
    return None


def run_parsing(ori_imgs_dir: str, parsing_dir: str) -> None:
    import torch
    import cv2
    path = find_weights()
    if path is None:
        raise RuntimeError(
            "BiSeNet weights not found. Set INSTAG_BISENET_WEIGHTS or place "
            "the public 19-class CelebAMask checkpoint (79999_iter.pth) "
            "under weights/.")
    net = _build_bisenet()
    sd = torch.load(path, map_location="cpu", weights_only=False)
    net.load_state_dict(sd, strict=False)
    net.eval()

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    os.makedirs(parsing_dir, exist_ok=True)
    with torch.no_grad():
        for p in sorted(glob.glob(os.path.join(ori_imgs_dir, "*.jpg"))):
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            ori_size = img.shape[:2][::-1]
            inp = cv2.resize(img, (512, 512)).astype(np.float32) / 255.0
            inp = (inp - mean) / std
            t = torch.from_numpy(inp.transpose(2, 0, 1))[None]
            out = net(t)[0].argmax(0).numpy().astype(np.uint8)
            color = colorize_parsing(out)
            color = cv2.resize(color, ori_size,
                               interpolation=cv2.INTER_NEAREST)
            cv2.imwrite(os.path.join(
                parsing_dir, os.path.basename(p).replace(".jpg", ".png")),
                color)
