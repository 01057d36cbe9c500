"""Optimizers for the motion networks: per-module LR groups via optax.

Parity targets:
  * UMF: AdamW(get_params(5e-3, 5e-4), betas (0.9, 0.99), eps 1e-8,
    wd 0.01 default) — audio_net/sigma/aud_ch/eye/exp at lr_net with wd=0,
    encoders at lr inheriting the 0.01 default wd, audio_att at 5*lr_net
    with wd=1e-4 (train_face.py:59, scene/motion_net.py:326-343); LambdaLR
    multiplier 0.1 below warm_step, then 0.5**(i/total) (0.1** in --long)
    (train_face.py:60-62).
  * PMF: registered in the Gaussian Adam (eps 1e-15, no schedule) with
    encoders at 1e-3 and nets at 1e-4, align_net at lr_net/2, audio_att at
    5*lr_net with L2 wd 1e-4 (scene/gaussian_model.py:398,
    scene/motion_net.py:738-772).
"""

from __future__ import annotations

from typing import Callable

import jax
import optax


def _label_for_path(path: tuple[str, ...]) -> str:
    parts = [p for p in path]
    s = "/".join(parts)
    if "audio_att_net" in s:
        return "audio_att"
    if "encoder" in s and "exp_encode" not in s:
        return "encoder"
    if "align_net" in s:
        return "align"
    return "net"


def label_tree(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _label_for_path(
            tuple(getattr(k, "key", str(k)) for k in path)), params)


def umf_schedule(total_iters: int, warm_step: int = 3000,
                 long: bool = False) -> Callable:
    base = 0.1 if long else 0.5

    def mult(step):
        import jax.numpy as jnp
        s = jnp.asarray(step, jnp.float32)
        return jnp.where(s < warm_step, 0.1, base ** (s / total_iters))
    return mult


def umf_optimizer(params, lr: float = 5e-3, lr_net: float = 5e-4,
                  total_iters: int = 10000, warm_step: int = 3000,
                  long: bool = False, schedule: bool = True):
    """AdamW with the reference's group structure and LambdaLR multiplier."""
    mult = umf_schedule(total_iters, warm_step, long) if schedule else (lambda s: 1.0)

    def sched(base_lr):
        return lambda step: base_lr * mult(step)

    def adamw(base_lr, wd):
        return optax.adamw(learning_rate=sched(base_lr), b1=0.9, b2=0.99,
                           eps=1e-8, weight_decay=wd)

    tx = optax.multi_transform(
        {
            "net": adamw(lr_net, 0.0),
            "encoder": adamw(lr, 0.01),
            "audio_att": adamw(lr_net * 5, 1e-4),
            "align": adamw(lr_net / 2, 0.0),
        },
        label_tree(params))
    import jax
    return tx, jax.jit(tx.init)(params)


def pmf_optimizer(params, lr: float = 1e-3, lr_net: float = 1e-4):
    """Plain Adam eps 1e-15 (matching the Gaussian optimizer the PMF shares
    in the reference), constant LRs, L2 wd on audio_att only."""
    def adam(base_lr, l2=0.0):
        steps = []
        if l2 > 0:
            steps.append(optax.add_decayed_weights(l2))
        steps += [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15),
                  optax.scale(-base_lr)]
        return optax.chain(*steps)

    tx = optax.multi_transform(
        {
            "net": adam(lr_net),
            "encoder": adam(lr),
            "audio_att": adam(lr_net * 5, l2=1e-4),
            "align": adam(lr_net / 2),
        },
        label_tree(params))
    import jax
    return tx, jax.jit(tx.init)(params)


def ema_update(ema_params, params, decay: float = 0.995):
    """EMA of the UMF used in pre-training (pretrain_face.py:83,137)."""
    return jax.tree.map(lambda e, p: decay * e + (1 - decay) * p,
                        ema_params, params)
