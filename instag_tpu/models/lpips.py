"""LPIPS perceptual loss (AlexNet backbone), JAX/flax.

Replaces the reference's pip `lpips.LPIPS(net='alex')` (train_face.py:80,
metrics.py). Architecture: AlexNet conv features at 5 taps, per-tap unit
normalization over channels, linear (1x1 conv) calibration, spatial mean,
summed over taps — with the standard input scaling shift/scale constants.

Weights: this environment has no egress and no cached torch checkpoints, so
``load_lpips_params`` reads a converted ``.npz`` when available
(``INSTAG_LPIPS_WEIGHTS`` env or weights/lpips_alex.npz). Otherwise the
backbone falls back to a fixed-seed He-initialized network with uniform
calibration — random-feature perceptual distances are a documented, usable
proxy (they preserve the multi-scale structure of the metric), and the
interface is identical so real weights drop in without code changes.
``convert_torch_lpips`` produces the .npz from the pip package's state dict.
"""

from __future__ import annotations

import os
import warnings

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

# (out_channels, kernel, stride, pad) of AlexNet features; taps after each relu
_ALEX = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_MAXPOOL_AFTER = {0, 1}  # maxpool(3, stride 2) after taps 0 and 1

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class AlexFeatures(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: [B, 3, H, W] in [-1, 1]. Returns list of 5 tap tensors."""
        x = (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
        x = x.transpose(0, 2, 3, 1)  # NHWC
        taps = []
        for i, (c, k, s, p) in enumerate(_ALEX):
            x = nn.Conv(c, (k, k), (s, s), padding=((p, p), (p, p)),
                        name=f"conv_{i}")(x)
            x = nn.relu(x)
            taps.append(x)
            if i in _MAXPOOL_AFTER:
                x = nn.max_pool(x, (3, 3), (2, 2))
        return taps


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, img0, img1):
        """img0/img1: [B, 3, H, W] in [-1, 1]. Returns [B] distances."""
        feats = AlexFeatures(name="alex")
        t0 = feats(img0)
        t1 = feats(img1)
        total = 0.0
        for i, (a, b) in enumerate(zip(t0, t1)):
            # eps inside the sqrt: plain L2-normalize has a NaN gradient at
            # all-zero (ReLU-dead) pixels
            a = a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            b = b * jax.lax.rsqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin_{i}",
                           lambda key, c=d.shape[-1]: jnp.ones((c,)) / c)
            total = total + jnp.mean(jnp.sum(d * jnp.abs(w), axis=-1),
                                     axis=(1, 2))
        return total


_warned_fallback = False


def load_lpips_params(rng_seed: int = 0):
    """Load the LPIPS model.

    Returns ``(model, params, real)`` where ``real`` says whether converted
    AlexNet-LPIPS weights were found. Without them the network falls back to
    fixed-seed random features and **warns loudly** — random-feature LPIPS
    preserves the multi-scale structure of the metric but its absolute values
    are NOT comparable to published LPIPS numbers, and every consumer
    (metrics.py, STATUS.md) must label them via the ``real`` flag.
    """
    model = LPIPS()
    dummy = jnp.zeros((1, 3, 64, 64))
    # INSTAG_LPIPS_RF_SEED varies the random-feature fallback's init for
    # seed-sensitivity A/Bs (scripts/exp_lpips_fallback.py); ignored when
    # real converted weights are found below.
    rng_seed = int(os.environ.get("INSTAG_LPIPS_RF_SEED", rng_seed))
    # jit: eager init dispatches ~200 tiny ops (each a compile-RPC round
    # trip on a tunneled device); one compiled program instead
    params = jax.jit(model.init)(jax.random.key(rng_seed), dummy, dummy)

    path = os.environ.get("INSTAG_LPIPS_WEIGHTS", "weights/lpips_alex.npz")
    if os.path.exists(path):
        data = np.load(path)

        def put(tree, keys, val):
            node = tree
            for k in keys[:-1]:
                node = node[k]
            assert node[keys[-1]].shape == val.shape, (keys, val.shape)
            node[keys[-1]] = jnp.asarray(val)

        import flax
        mut = flax.core.unfreeze(params)["params"]
        for i in range(5):
            put(mut, ["alex", f"conv_{i}", "kernel"], data[f"conv_{i}_w"])
            put(mut, ["alex", f"conv_{i}", "bias"], data[f"conv_{i}_b"])
            put(mut, [f"lin_{i}"], data[f"lin_{i}"])
        params = {"params": mut}
        return model, params, True

    global _warned_fallback
    if not _warned_fallback:
        _warned_fallback = True
        warnings.warn(
            "LPIPS: no converted AlexNet weights at "
            f"'{path}' — falling back to FIXED-SEED RANDOM FEATURES. "
            "Perceptual-loss training still works but reported LPIPS values "
            "are not comparable to published numbers (lpips_real=false). "
            "Provide weights via convert_torch_lpips() or "
            "INSTAG_LPIPS_WEIGHTS.", stacklevel=2)
    return model, params, False


def convert_torch_lpips(out_path: str = "weights/lpips_alex.npz",
                        state_dict=None) -> str:
    """Convert pip-`lpips` AlexNet weights to our .npz layout.

    ``state_dict``: a torch-layout mapping (``net.sliceX.Y.weight`` [O,I,K,K],
    ``lins.i.model.1.weight`` [1,C,1,1]) — pass one directly, or leave None
    to instantiate ``lpips.LPIPS(net='alex')`` (requires the pip package and
    its cached weights; not in this image).
    """
    if state_dict is None:
        import lpips as lpips_pkg  # noqa
        state_dict = lpips_pkg.LPIPS(net="alex").state_dict()

    def npy(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    out = {}
    conv_ids = [0, 3, 6, 8, 10]
    for i, cid in enumerate(conv_ids):
        w = npy(state_dict[f"net.slice{i+1}.{cid}.weight"])  # [O,I,K,K]
        out[f"conv_{i}_w"] = w.transpose(2, 3, 1, 0)          # HWIO
        out[f"conv_{i}_b"] = npy(state_dict[f"net.slice{i+1}.{cid}.bias"])
        out[f"lin_{i}"] = npy(state_dict[f"lins.{i}.model.1.weight"]).reshape(-1)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **out)
    return out_path
