"""Configuration system: dataclass param groups + argparse + cfg persistence.

Functional replacement for the reference's reflection-based ParamGroups
(arguments/__init__.py:16-122) with identical defaults. Values persist to
``cfg_args.json`` in the model directory and are merged back at inference
(the reference's get_combined_args, :102-122).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Any


@dataclasses.dataclass
class ModelConfig:
    """Reference ModelParams (arguments/__init__.py:47-70)."""
    sh_degree: int = 2
    source_path: str = ""
    model_path: str = ""
    white_background: bool = False
    eval: bool = False
    audio: str = ""
    init_num: int = 10_000
    N_views: int = -1
    audio_extractor: str = "deepspeech"
    type: str = "face"        # "face" | "mouth"
    preload: bool = True
    all_for_train: bool = False
    # TPU additions
    capacity: int = 0         # 0 => auto (16x init_num, tiled to 1024)
    max_per_tile: int = 256   # rasterizer per-tile splat budget
    # --no_approx_topk: EXACT per-tile top-K selection (lax.top_k) instead
    # of the shipping recall-0.9 approx_max_k — the A/B knob that bounds
    # the approximation's effect on a full adaptation (BASELINE.md
    # "approx-selection A/B")
    approx_topk: bool = True
    # pack/resize the padded cloud to occupancy at log points (adaptation
    # trainers); resolve_capacity() stays the hard ceiling
    adaptive_capacity: bool = True
    # A/B-reproducibility mode: resizes keep every slot in place (grow
    # pads, never shrinks, no packing) so densification's per-slot
    # sampling draws replay a fixed-capacity run bit-for-bit
    # (models/gaussians.py pack_resize keep_slots)
    deterministic_slots: bool = False

    def resolve_capacity(self) -> int:
        if self.capacity > 0:
            return self.capacity
        cap = max(self.init_num * 16, 16384)
        return -(-cap // 1024) * 1024


@dataclasses.dataclass
class PipelineConfig:
    """Reference PipelineParams (arguments/__init__.py:72-77)."""
    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclasses.dataclass
class OptimizationConfig:
    """Reference OptimizationParams (arguments/__init__.py:79-100)."""
    iterations: int = 50_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 45_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.003
    rotation_lr: float = 0.001
    identity_lr: float = 0.01
    percent_dense: float = 0.005
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 45_000
    densify_grad_threshold: float = 0.0002
    random_background: bool = False


def add_dataclass_args(parser: argparse.ArgumentParser, cls, prefix="") -> None:
    for f in dataclasses.fields(cls):
        name = f"--{prefix}{f.name}"
        if f.type == "bool" or f.type is bool:
            if f.default:  # default-True bools get a --no_* disable switch
                parser.add_argument(f"--no_{prefix}{f.name}",
                                    dest=f"{prefix}{f.name}",
                                    action="store_false", default=True)
            else:
                parser.add_argument(name, action="store_true",
                                    default=f.default)
        else:
            # reference CLI shorthands (arguments/__init__.py ParamGroup
            # shorthand=True: `-s` source_path, `-m` model_path)
            alias = {"source_path": ["-s"], "model_path": ["-m"]}.get(
                f"{prefix}{f.name}", [])
            parser.add_argument(name, *alias, type=type(f.default),
                                default=f.default)


def extract_dataclass(args: argparse.Namespace, cls, prefix=""):
    kwargs = {}
    for f in dataclasses.fields(cls):
        kwargs[f.name] = getattr(args, f"{prefix}{f.name}")
    return cls(**kwargs)


def make_parser(description: str) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    add_dataclass_args(parser, ModelConfig)
    add_dataclass_args(parser, PipelineConfig)
    add_dataclass_args(parser, OptimizationConfig)
    return parser


def enable_persistent_compile_cache() -> None:
    """Point JAX at a persistent compilation cache (INSTAG_JAX_CACHE or
    ~/.cache/instag_tpu/jax_cache). The trainer CLIs run as separate
    processes per pipeline stage; without this every stage re-pays minutes
    of XLA/Mosaic compiles that the cache serves in seconds on any rerun."""
    import jax
    path = os.environ.get(
        "INSTAG_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "instag_tpu",
                     "jax_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache EVERYTHING: on a network-tunneled chip even a trivial eager
        # op costs ~0.4 s of compile RPC, and a trainer start dispatches
        # hundreds of them (measured: 384 tiny compiles ≈ 170 s/stage)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"[config] persistent compile cache unavailable: {e}")


def parse_all(parser: argparse.ArgumentParser, argv=None):
    args = parser.parse_args(argv)
    enable_persistent_compile_cache()
    return (extract_dataclass(args, ModelConfig),
            extract_dataclass(args, PipelineConfig),
            extract_dataclass(args, OptimizationConfig), args)


def save_cfg(model_path: str, model_cfg: ModelConfig) -> None:
    """Persist the model config for train→infer round trips
    (reference writes a repr'd Namespace; we use JSON)."""
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        json.dump(dataclasses.asdict(model_cfg), f, indent=2)


def load_cfg(model_path: str, overrides: dict[str, Any] | None = None
             ) -> ModelConfig:
    with open(os.path.join(model_path, "cfg_args.json")) as f:
        data = json.load(f)
    if overrides:
        data.update({k: v for k, v in overrides.items() if v is not None})
    return ModelConfig(**data)
