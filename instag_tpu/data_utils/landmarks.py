"""68-point facial landmark detection (task 7) — FAN from scratch.

The reference's task 7 (`/root/reference/data_utils/process.py:54-86`) runs
the `face_alignment` package (Bulat & Tzimiropoulos, ICCV'17 — four stacked
hourglass "FAN" network) per frame and writes `N.lms` files (68 rows of
"x y"). That package is not in this image, so this module provides the same
capability natively:

  * ``FAN`` — the 2D-FAN architecture written from scratch in torch, with a
    state-dict key layout matching the public ``2DFAN-4`` checkpoints
    (conv1/bn1/conv2../m0../top_m_0../conv_last0/bn_end0/l0/bl0/al0..), so
    the historical ``.pth.tar`` weights load directly; TorchScript releases
    of the same network (face_alignment >= 1.2, ``2DFAN4-*.zip``) are loaded
    via ``torch.jit.load`` and used as-is.
  * crop / heatmap-decode math identical to the reference package: bbox ->
    (center, scale=(w+h)/195, y -= 0.12 h), 256x256 crop through the
    200*scale similarity transform, 64x64 heatmap argmax + 0.25 neighbor
    nudge - 0.5, inverse transform back to image coordinates.
  * a video-mode tracker instead of a face *detector* (SFD is a separate
    network the pipeline does not need): the dataset contract guarantees a
    face in every frame (README:95-98), so frame 0 bootstraps from a
    full-frame square (optionally refined by re-cropping around the first
    prediction) and each later frame crops around the previous frame's
    landmarks — standard landmark tracking.

Weights: set ``INSTAG_FAN_WEIGHTS`` or drop ``2DFAN4.pth`` under
``weights/`` (see scripts/fetch_weights.sh). Without weights the entry
points raise with instructions — this image has no egress.
"""

from __future__ import annotations

import glob
import os

import numpy as np

_WEIGHT_HINTS = ("INSTAG_FAN_WEIGHTS",
                 "weights/2DFAN4.pth", "weights/2DFAN4-cd938726ad.zip",
                 "weights/2DFAN-4.pth.tar")


def build_fan(num_modules: int = 4):
    """The 2D-FAN network (4 stacked depth-4 hourglasses, 256 features,
    68 heatmaps), module names matching the public checkpoints."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    def conv3x3(cin, cout):
        return nn.Conv2d(cin, cout, 3, 1, 1, bias=False)

    class ConvBlock(nn.Module):
        """Pre-activated 3-way split residual block (out/2 + out/4 + out/4
        channels concatenated)."""

        def __init__(self, cin, cout):
            super().__init__()
            self.bn1 = nn.BatchNorm2d(cin)
            self.conv1 = conv3x3(cin, cout // 2)
            self.bn2 = nn.BatchNorm2d(cout // 2)
            self.conv2 = conv3x3(cout // 2, cout // 4)
            self.bn3 = nn.BatchNorm2d(cout // 4)
            self.conv3 = conv3x3(cout // 4, cout // 4)
            self.downsample = None
            if cin != cout:
                self.downsample = nn.Sequential(
                    nn.BatchNorm2d(cin), nn.ReLU(True),
                    nn.Conv2d(cin, cout, 1, 1, bias=False))

        def forward(self, x):
            o1 = self.conv1(F.relu(self.bn1(x), True))
            o2 = self.conv2(F.relu(self.bn2(o1), True))
            o3 = self.conv3(F.relu(self.bn3(o2), True))
            out = torch.cat([o1, o2, o3], 1)
            res = x if self.downsample is None else self.downsample(x)
            return out + res

    class HourGlass(nn.Module):
        def __init__(self, depth, features):
            super().__init__()
            self.depth = depth
            for level in range(1, depth + 1):
                self.add_module("b1_" + str(level), ConvBlock(features, features))
                self.add_module("b2_" + str(level), ConvBlock(features, features))
                if level == 1:
                    self.add_module("b2_plus_" + str(level),
                                    ConvBlock(features, features))
                self.add_module("b3_" + str(level), ConvBlock(features, features))

        def _forward(self, level, inp):
            up1 = self._modules["b1_" + str(level)](inp)
            low1 = F.avg_pool2d(inp, 2, stride=2)
            low1 = self._modules["b2_" + str(level)](low1)
            if level > 1:
                low2 = self._forward(level - 1, low1)
            else:
                low2 = self._modules["b2_plus_" + str(level)](low1)
            low3 = self._modules["b3_" + str(level)](low2)
            up2 = F.interpolate(low3, scale_factor=2, mode="nearest")
            return up1 + up2

        def forward(self, x):
            return self._forward(self.depth, x)

    class FAN(nn.Module):
        def __init__(self, num_modules):
            super().__init__()
            self.num_modules = num_modules
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3)
            self.bn1 = nn.BatchNorm2d(64)
            self.conv2 = ConvBlock(64, 128)
            self.conv3 = ConvBlock(128, 128)
            self.conv4 = ConvBlock(128, 256)
            for i in range(num_modules):
                self.add_module("m" + str(i), HourGlass(4, 256))
                self.add_module("top_m_" + str(i), ConvBlock(256, 256))
                self.add_module("conv_last" + str(i),
                                nn.Conv2d(256, 256, 1, 1, 0))
                self.add_module("bn_end" + str(i), nn.BatchNorm2d(256))
                self.add_module("l" + str(i), nn.Conv2d(256, 68, 1, 1, 0))
                if i < num_modules - 1:
                    self.add_module("bl" + str(i), nn.Conv2d(256, 256, 1, 1, 0))
                    self.add_module("al" + str(i), nn.Conv2d(68, 256, 1, 1, 0))

        def forward(self, x):
            x = F.relu(self.bn1(self.conv1(x)), True)
            x = F.avg_pool2d(self.conv2(x), 2, stride=2)
            x = self.conv3(x)
            x = self.conv4(x)
            previous = x
            outputs = []
            for i in range(self.num_modules):
                hg = self._modules["m" + str(i)](previous)
                ll = self._modules["top_m_" + str(i)](hg)
                ll = F.relu(self._modules["bn_end" + str(i)](
                    self._modules["conv_last" + str(i)](ll)), True)
                tmp_out = self._modules["l" + str(i)](ll)
                outputs.append(tmp_out)
                if i < self.num_modules - 1:
                    previous = (previous
                                + self._modules["bl" + str(i)](ll)
                                + self._modules["al" + str(i)](tmp_out))
            return outputs

    return FAN(num_modules)


def load_fan(path: str | None = None):
    """Load FAN weights: TorchScript archive (face_alignment >= 1.2) or a
    plain/older state dict into the from-scratch architecture."""
    import torch
    if path is None:
        path = os.environ.get("INSTAG_FAN_WEIGHTS", "")
        if not path:
            for cand in _WEIGHT_HINTS[1:]:
                if os.path.exists(cand):
                    path = cand
                    break
    if not path or not os.path.exists(path):
        raise RuntimeError(
            "FAN landmark weights not found. Set INSTAG_FAN_WEIGHTS or place "
            "a public 2DFAN-4 checkpoint under weights/ (see "
            "scripts/fetch_weights.sh). Alternatively produce .lms files "
            "with any 68-point detector (68 rows of 'x y').")
    try:
        net = torch.jit.load(path, map_location="cpu")
        net.eval()
        return net
    except Exception:
        pass
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    n_mod = 1 + max(int(k[1:].split(".")[0]) for k in sd
                    if k[0] == "l" and k[1].isdigit())
    net = build_fan(n_mod)
    net.load_state_dict(sd)
    net.eval()
    return net


# ---------------------------------------------------------------- geometry
# the face_alignment package's crop/decode math, reproduced exactly so a
# loaded public checkpoint sees the distribution it was trained on.

def _transform(pt, center, scale, resolution, invert=False):
    """Map an image point into the 256/64 crop frame (or back)."""
    h = 200.0 * scale
    t = np.eye(3)
    t[0, 0] = resolution / h
    t[1, 1] = resolution / h
    t[0, 2] = resolution * (-center[0] / h + 0.5)
    t[1, 2] = resolution * (-center[1] / h + 0.5)
    if invert:
        t = np.linalg.inv(t)
    p = t @ np.array([pt[0], pt[1], 1.0])
    return p[:2]


def crop(image: np.ndarray, center, scale, resolution: int = 256):
    """Square crop around (center, scale) resized to resolution (bilinear),
    zero-padded where the crop leaves the image."""
    import cv2
    ul = _transform([1, 1], center, scale, resolution, True).astype(int)
    br = _transform([resolution, resolution], center, scale, resolution,
                    True).astype(int)
    h, w = image.shape[:2]
    ch, cw = br[1] - ul[1], br[0] - ul[0]
    out = np.zeros((ch, cw, 3), image.dtype)
    sy0, sy1 = max(0, ul[1] - 1), min(h, br[1] - 1)
    sx0, sx1 = max(0, ul[0] - 1), min(w, br[0] - 1)
    dy0, dx0 = max(0, -(ul[1] - 1)), max(0, -(ul[0] - 1))
    if sy1 > sy0 and sx1 > sx0:
        out[dy0:dy0 + (sy1 - sy0), dx0:dx0 + (sx1 - sx0)] = \
            image[sy0:sy1, sx0:sx1]
    return cv2.resize(out, (resolution, resolution),
                      interpolation=cv2.INTER_LINEAR)


def decode_heatmaps(hm: np.ndarray, center, scale) -> np.ndarray:
    """[68, 64, 64] heatmaps -> [68, 2] image-space landmarks (argmax +
    0.25-pixel gradient nudge - 0.5, inverse similarity transform)."""
    C, H, W = hm.shape
    flat = hm.reshape(C, -1)
    idx = flat.argmax(-1)
    px = (idx % W).astype(np.float64)
    py = (idx // W).astype(np.float64)
    for j in range(C):
        x, y = int(px[j]), int(py[j])
        if 0 < x < W - 1 and 0 < y < H - 1:
            px[j] += 0.25 * np.sign(hm[j, y, x + 1] - hm[j, y, x - 1])
            py[j] += 0.25 * np.sign(hm[j, y + 1, x] - hm[j, y - 1, x])
    pts = np.stack([px, py], -1) + 0.5  # 1-indexed + nudge - 0.5
    out = np.zeros_like(pts)
    for j in range(C):
        out[j] = _transform(pts[j], center, scale, H, True)
    return out


def bbox_to_center_scale(bbox) -> tuple[np.ndarray, float]:
    """face_alignment's detector-box convention: scale=(w+h)/195, center
    shifted up by 12% of the box height."""
    x0, y0, x1, y1 = [float(v) for v in bbox]
    center = np.array([(x0 + x1) / 2.0, (y0 + y1) / 2.0])
    center[1] -= (y1 - y0) * 0.12
    scale = (x1 - x0 + y1 - y0) / 195.0
    return center, scale


def landmarks_to_bbox(lms: np.ndarray, margin: float = 0.25) -> np.ndarray:
    x0, y0 = lms.min(0)
    x1, y1 = lms.max(0)
    mx, my = (x1 - x0) * margin, (y1 - y0) * margin
    return np.array([x0 - mx, y0 - my * 2.0, x1 + mx, y1 + my * 0.5])


class LandmarkTracker:
    """Video-mode 68-point landmark tracking with the FAN network.

    Frame 0: centered square bbox covering ``init_frac`` of the short side
    (the dataset contract has the face filling most of the frame), refined
    once by re-cropping around the first prediction. Later frames crop
    around the previous frame's landmarks.
    """

    def __init__(self, net=None, init_frac: float = 0.8):
        self.net = load_fan() if net is None else net
        self.init_frac = init_frac
        self._prev: np.ndarray | None = None

    def _run(self, image: np.ndarray, center, scale) -> np.ndarray:
        import torch
        inp = crop(image, center, scale).astype(np.float32) / 255.0
        t = torch.from_numpy(inp.transpose(2, 0, 1))[None]
        with torch.no_grad():
            out = self.net(t)
        hm = (out[-1] if isinstance(out, (list, tuple)) else out)[0]
        return decode_heatmaps(hm.float().numpy(), center, scale)

    def __call__(self, image: np.ndarray) -> np.ndarray:
        """image: HxWx3 uint8 RGB -> [68, 2] float landmarks (x, y)."""
        if self._prev is None:
            h, w = image.shape[:2]
            s = min(h, w) * self.init_frac
            bbox = [w / 2 - s / 2, h / 2 - s / 2, w / 2 + s / 2, h / 2 + s / 2]
            lms = self._run(image, *bbox_to_center_scale(bbox))
            lms = self._run(image, *bbox_to_center_scale(
                landmarks_to_bbox(lms)))
        else:
            lms = self._run(image, *bbox_to_center_scale(
                landmarks_to_bbox(self._prev)))
        self._prev = lms
        return lms

    def reset(self):
        self._prev = None


def extract_landmarks_fan(ori_imgs_dir: str) -> None:
    """Write reference-layout ``.lms`` files for every jpg in the dir."""
    import cv2
    tracker = LandmarkTracker()
    for image_path in sorted(glob.glob(os.path.join(ori_imgs_dir, "*.jpg"))):
        img = cv2.cvtColor(cv2.imread(image_path), cv2.COLOR_BGR2RGB)
        lms = tracker(img)
        np.savetxt(image_path.replace(".jpg", ".lms"), lms, "%f")
