"""Checkpoint & PLY export/import for Gaussian states and training bundles.

Three artifact families, mirroring the reference (SURVEY.md §5.4):
  (a) training checkpoints — one **msgpack** bundle per branch (flax
      serialization: structured states are converted to pure state-dicts of
      arrays/scalars before writing, so loading never executes code — no
      pickle) containing the Gaussian state, its Adam moments, the
      motion-net params and their optimizer states, and the iteration;
  (b) PLY point-cloud snapshots with the vanilla-3DGS attribute layout
      (scene/gaussian_model.py:429-460: x,y,z,nx,ny,nz,f_dc_*,f_rest_*,
      opacity,scale_*,rot_*);
  (c) cfg_args.json (handled in config.py).

Structured leaves (optax opt states, AdamState) come back from
``load_bundle`` as nested dicts; use ``restore_like(target, d)`` with a
freshly-initialized target to rebuild the typed pytree.

The fixed-capacity padded state serializes compactly: only alive slots are
written; loading re-pads to any requested capacity.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import serialization as fser

from ..data.plyio import read_ply, write_ply
from ..models.gaussians import GaussianParams, GaussianState


def save_gaussian_ply(path: str, state: GaussianState) -> None:
    """Write alive slots in the reference PLY attribute layout."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # one batched device->host transfer (per-leaf np.asarray would pay a
    # blocking tunnel round trip per attribute)
    params_np, alive = jax.device_get((state.params, state.alive))
    p = jax.tree.map(lambda x: x[alive], params_np)
    n = p.xyz.shape[0]

    names = ["x", "y", "z", "nx", "ny", "nz"]
    cols = [p.xyz[:, 0], p.xyz[:, 1], p.xyz[:, 2],
            np.zeros(n, np.float32), np.zeros(n, np.float32),
            np.zeros(n, np.float32)]
    # f_dc: [N,1,3] -> channel-major flatten (transpose(1,2) in reference)
    f_dc = p.features_dc.transpose(0, 2, 1).reshape(n, -1)
    for i in range(f_dc.shape[1]):
        names.append(f"f_dc_{i}")
        cols.append(f_dc[:, i].astype(np.float32))
    f_rest = p.features_rest.transpose(0, 2, 1).reshape(n, -1)
    for i in range(f_rest.shape[1]):
        names.append(f"f_rest_{i}")
        cols.append(f_rest[:, i].astype(np.float32))
    names.append("opacity")
    cols.append(p.opacity[:, 0].astype(np.float32))
    for i in range(3):
        names.append(f"scale_{i}")
        cols.append(p.scaling[:, i].astype(np.float32))
    for i in range(4):
        names.append(f"rot_{i}")
        cols.append(p.rotation[:, i].astype(np.float32))
    write_ply(path, names, [np.ascontiguousarray(c) for c in cols])


def load_gaussian_ply(path: str, capacity: int,
                      max_sh_degree: int = 2) -> GaussianState:
    """Read a reference-layout PLY into a padded GaussianState
    (scene/gaussian_model.py:486-527)."""
    d = read_ply(path)
    n = d["x"].shape[0]
    assert n <= capacity, f"PLY has {n} points > capacity {capacity}"
    rest_k = (max_sh_degree + 1) ** 2 - 1

    xyz = np.stack([d["x"], d["y"], d["z"]], 1).astype(np.float32)
    f_dc = np.stack([d[f"f_dc_{i}"] for i in range(3)], 1).astype(np.float32)
    f_dc = f_dc.reshape(n, 3, 1).transpose(0, 2, 1)
    rest_names = sorted([k for k in d if k.startswith("f_rest_")],
                        key=lambda s: int(s.split("_")[-1]))
    if rest_names:
        fr = np.stack([d[k] for k in rest_names], 1).astype(np.float32)
        fr = fr.reshape(n, 3, rest_k).transpose(0, 2, 1)
    else:
        fr = np.zeros((n, rest_k, 3), np.float32)
    scaling = np.stack([d[f"scale_{i}"] for i in range(3)], 1).astype(np.float32)
    rotation = np.stack([d[f"rot_{i}"] for i in range(4)], 1).astype(np.float32)
    opacity = d["opacity"].reshape(n, 1).astype(np.float32)

    def pad(x):
        return jnp.asarray(np.pad(x, [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)))

    params = GaussianParams(
        xyz=pad(xyz), features_dc=pad(f_dc), features_rest=pad(fr),
        identity=pad(np.zeros((n, 1), np.float32)), scaling=pad(scaling),
        rotation=pad(rotation), opacity=pad(opacity))
    return GaussianState(
        params=params, alive=jnp.arange(capacity) < n,
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
        active_sh_degree=jnp.int32(max_sh_degree),
        spatial_lr_scale=1.0, max_sh_degree=max_sh_degree)


def state_to_dict(state: GaussianState) -> dict:
    """GaussianState -> plain numpy dict (for bundles)."""
    state = jax.device_get(state)          # one batched transfer
    return {
        "params": {k: np.asarray(getattr(state.params, k))
                   for k in state.params.__dataclass_fields__},
        "alive": np.asarray(state.alive),
        "max_radii2d": np.asarray(state.max_radii2d),
        "xyz_grad_accum": np.asarray(state.xyz_grad_accum),
        "denom": np.asarray(state.denom),
        "active_sh_degree": int(state.active_sh_degree),
        "dropped_children": int(state.dropped_children),
        "spatial_lr_scale": float(state.spatial_lr_scale),
        "max_sh_degree": int(state.max_sh_degree),
    }


def state_from_dict(d: dict) -> GaussianState:
    params = GaussianParams(**{k: jnp.asarray(v)
                               for k, v in d["params"].items()})
    return GaussianState(
        params=params, alive=jnp.asarray(d["alive"]),
        max_radii2d=jnp.asarray(d["max_radii2d"]),
        xyz_grad_accum=jnp.asarray(d["xyz_grad_accum"]),
        denom=jnp.asarray(d["denom"]),
        active_sh_degree=jnp.int32(d["active_sh_degree"]),
        dropped_children=jnp.int32(d.get("dropped_children", 0)),
        spatial_lr_scale=float(d["spatial_lr_scale"]),
        max_sh_degree=int(d["max_sh_degree"]))


def save_bundle(path: str, bundle: dict) -> None:
    """Save a pytree-of-arrays training bundle as msgpack (code-free load).

    Structured nodes (optax states, flax struct dataclasses) are flattened
    to state-dicts; rebuild them at load time with ``restore_like``.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    bundle = jax.device_get(bundle)        # one batched transfer
    def to_host(x):
        if isinstance(x, (jnp.ndarray, np.ndarray, np.generic)):
            return np.asarray(x)
        return x  # python scalars/strings are native msgpack types
    state = fser.to_state_dict(jax.tree.map(to_host, bundle))
    with open(path, "wb") as f:
        f.write(fser.msgpack_serialize(state))


def load_bundle(path: str) -> dict:
    """Load a msgpack bundle as nested dicts of numpy arrays."""
    with open(path, "rb") as f:
        data = f.read()
    try:
        return fser.msgpack_restore(data)
    except Exception as e:
        # bundles written before the msgpack switch were pickled (same .pkl
        # extension); refuse to unpickle silently — tell the user instead
        if data[:1] == b"\x80":  # pickle protocol>=2 magic
            raise ValueError(
                f"{path} is a legacy pickle bundle from an older revision; "
                "re-save it with the current code (load with "
                "pickle.load under your own responsibility, then "
                "save_bundle) — load_bundle only reads msgpack") from e
        raise


def bundle_list(x) -> list:
    """Normalize a list stored in a bundle: flax's to_state_dict turns
    Python lists into ``{'0': ..., '1': ...}`` dicts, which iterate over
    their string keys — every bundle consumer must decode through this."""
    if isinstance(x, dict):
        return [x[k] for k in sorted(x, key=int)]
    return list(x)


def restore_like(target, state_dict):
    """Rebuild a typed pytree (optax state, AdamState, ...) from a loaded
    bundle entry, using a freshly-initialized ``target`` for structure."""
    return jax.tree.map(jnp.asarray,
                        fser.from_state_dict(target, state_dict))
