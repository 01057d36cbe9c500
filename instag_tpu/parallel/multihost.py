"""Multi-host (DCN) input pipeline and checkpoint I/O.

On a multi-host TPU slice each process sees only its local chips;
``jax.distributed`` stitches them into one global runtime. The training
collectives (shared-gradient psums of the dp/identity/tensor-parallel
modes) ride ICI; DCN is used ONLY for the two things that genuinely cross
hosts (SURVEY §5.8 "DCN only for multi-host input pipelines and
checkpoint I/O"):

(a) **input**: each host decodes only its contiguous shard of the video
    (``frame_shard``) into a ``HostFrameStore``; per-block batches are
    assembled into ONE global ``jax.Array`` per leaf with
    ``jax.make_array_from_process_local_data`` — every host uploads
    exactly the rows its local devices train, nothing is broadcast;
(b) **checkpoints**: ``save_bundle_multihost`` materializes sharded
    state with ``multihost_utils.process_allgather`` and writes from
    process 0 only (every host holds the replicated trees already, so
    the gather only moves genuinely-sharded leaves).

The reference has no distributed story at all (single-GPU PyTorch); this
module and its single-process-degenerate tests exist so the dp/identity
training modes scale past one host without new code paths: every helper
degrades to the plain local behavior when ``jax.process_count() == 1``,
which is also how CI covers it (multi-process runtimes cannot be
simulated in-process; the sharding math is tested directly).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> bool:
    """Connect this process to a multi-host run (jax.distributed).

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID); on TPU pods with no explicit
    configuration ``jax.distributed.initialize()`` auto-discovers from the
    metadata server. Returns True when a multi-process runtime is active
    (idempotent; single-process callers get False and no side effects).
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    process_id = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None)
    # `jax.process_count()` initializes the XLA backend, after which
    # `jax.distributed.initialize` refuses to run — so the already-connected
    # check must go through the distributed service, never the backend
    # (caught by the real 2-process run in tests/test_multihost_real.py).
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    if coordinator is None and num_processes is None:
        # No coordinator info: do NOT touch jax.process_count() here —
        # it initializes the XLA backend, after which a LATER call with
        # coordinator info could never jax.distributed.initialize (the
        # same failure mode the is_initialized() check above prevents).
        # Single-process callers simply get False with no side effects;
        # pod launchers must provide coordinator env vars on first call.
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count() > 1


def global_mesh(axis: str = "dp", n_devices: int | None = None) -> Mesh:
    """Mesh over ALL devices of the run (every host's chips), leading axis
    ``axis``. ``jax.devices()`` is globally consistent across processes, so
    every host builds the identical mesh."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def frame_shard(n_frames: int, process_index: int | None = None,
                process_count: int | None = None) -> slice:
    """The contiguous frame range THIS host decodes: balanced contiguous
    blocks (first ``n % P`` hosts take one extra frame). Contiguous so a
    host reads one video segment sequentially instead of striding the
    codec. The union over processes is exactly [0, n)."""
    p = jax.process_index() if process_index is None else process_index
    P_ = jax.process_count() if process_count is None else process_count
    base, extra = divmod(n_frames, P_)
    start = p * base + min(p, extra)
    return slice(start, start + base + (1 if p < extra else 0))


def sample_local_rows(rng: np.random.Generator, shard: slice,
                      rows_per_host: int) -> np.ndarray:
    """Per-host curriculum draw: each host samples uniformly from ITS frame
    shard (global-index output). With random frame curricula this is the
    standard multi-host semantics — the union draw over hosts matches the
    global uniform distribution without any host needing remote frames."""
    return rng.integers(shard.start, shard.stop, size=rows_per_host)


def make_global_batch(local_arrays: dict, mesh: Mesh, axis: str = "dp"):
    """Per-host numpy leaf stacks -> one global FrameBatch, each leaf a
    single ``jax.Array`` sharded over ``axis``. Every host contributes its
    local rows only; ``None`` leaves (absent priors) stay None.

    Single-process this is exactly ``device_put(..., NamedSharding(axis))``
    — the path the virtual-mesh tests pin down.
    """
    from ..train.common import FrameBatch

    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(sharding, x)

    return FrameBatch(**{k: put(v) for k, v in local_arrays.items()})


class MultihostFrameStore:
    """Host-RAM store over this process's frame shard, producing globally
    sharded per-block batches.

    ``gather_global(rows_per_step, n_steps, mesh, rng)`` draws
    ``n_steps x rows_per_host`` local frames and assembles the global
    ``[n_steps * rows_per_step]``-leading-axis batch (rows interleave
    host-major exactly like the dp mesh axis, so row r of step s lands on
    the device that trains it). The block's ``idx`` array is simply
    ``arange`` reshaped — identical to the single-host stream path.
    """

    def __init__(self, records, with_priors: bool = False,
                 process_index: int | None = None,
                 process_count: int | None = None):
        from ..train.common import _stack_records
        self.pi = (jax.process_index() if process_index is None
                   else process_index)
        self.pc = (jax.process_count() if process_count is None
                   else process_count)
        self.shard = frame_shard(len(records), self.pi, self.pc)
        self.arrays = _stack_records(records[self.shard], with_priors,
                                     as_numpy=True)

    def gather_global(self, local_idxs, mesh: Mesh, axis: str = "dp"):
        """``local_idxs``: indices into THIS host's shard (shard-relative),
        one per (step, local-row). Returns the global FrameBatch whose
        leading axis is ``len(local_idxs) * process_count``."""
        idxs = np.asarray(local_idxs)
        local = {k: (v[idxs] if v is not None else None)
                 for k, v in self.arrays.items()}
        return make_global_batch(local, mesh, axis)


def save_bundle_multihost(path: str, tree) -> None:
    """Checkpoint a (possibly sharded) pytree from a multi-host run:
    sharded leaves allgather over DCN, process 0 writes the bundle, other
    hosts return after the gather (a barrier in itself — every process
    participates in the collectives)."""
    from ..io.checkpoints import save_bundle

    if jax.process_count() == 1:
        save_bundle(path, jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "dtype") else x, tree))
        return
    from jax.experimental import multihost_utils

    def fetch(x):
        if not hasattr(x, "sharding"):
            return x
        if x.is_fully_addressable:
            return np.asarray(x)
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    host_tree = jax.tree.map(fetch, tree)
    if jax.process_index() == 0:
        save_bundle(path, host_tree)
    multihost_utils.sync_global_devices("instag_save_bundle")
