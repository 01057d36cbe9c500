"""Observability: JSONL metrics log + optional TensorBoard + step timing.

The reference logs scalars/images to tensorboardX and times iterations with
CUDA events (SURVEY.md §5.1/§5.5). TPU equivalents: wall-clock around
block_until_ready'd steps, scalars to a JSONL file that survives without any
viewer, and TensorBoard via torch.utils.tensorboard when importable.
jax.profiler traces can be captured around any window for Perfetto/XProf.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager


class MetricsLogger:
    def __init__(self, log_dir: str, tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step), "t": time.time()}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def image(self, tag: str, img, step: int) -> None:
        """img: [3, H, W] float in [0,1]."""
        if self._tb is not None:
            import numpy as np
            self._tb.add_image(tag, np.asarray(img), step)

    def histogram(self, tag: str, values, step: int) -> None:
        """Log a histogram (summary stats also land in metrics.jsonl so the
        signal survives without TensorBoard)."""
        import numpy as np
        v = np.asarray(values).reshape(-1)
        self._f.write(json.dumps({
            "tag": tag, "step": int(step), "t": time.time(),
            "mean": float(v.mean()), "p5": float(np.percentile(v, 5)),
            "p50": float(np.percentile(v, 50)),
            "p95": float(np.percentile(v, 95))}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_histogram(tag, v, step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """EMA per-step wall time (the reference's CUDA-event timing analogue)."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.ema_ms: float | None = None
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = (time.perf_counter() - self._t0) * 1000
        self.ema_ms = dt if self.ema_ms is None else (
            self.decay * self.ema_ms + (1 - self.decay) * dt)
        return False


@contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace (viewable in XProf/Perfetto/TensorBoard)."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
