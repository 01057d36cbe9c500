"""Multi-chip scaling utilities (a new capability — the reference is
strictly single-process single-GPU, SURVEY.md §2.5).

Two parallel axes map naturally onto a TPU mesh:

  * ``dp`` — frame-level data parallelism for adaptation training: the model
    (Gaussian state + UMF/PMF params) is replicated, each device renders and
    differentiates a different training frame, and XLA inserts the psum for
    the shared-parameter gradients over ICI.
  * identity parallelism for multi-identity pre-training: the stacked
    per-identity PMFs/Gaussian clouds shard across devices while the UMF
    stays replicated (its gradients all-reduce); the cross-identity
    contrastive term rides an all-gather of PMF outputs.

  * ``tp`` — tensor-parallel rendering (``parallel.tensor_parallel``):
    splats shard for projection, the projected rows all_gather (~2 MB),
    tiles shard for selection + the fused composite; the backward's only
    communication is one reduce-scatter of the per-splat gradient rows.

Everything is jax.sharding + pjit/shard_map — no hand-written collectives.

Multi-host runs (``parallel.multihost``) keep ICI for the training
collectives and use DCN only for per-host input assembly
(``make_array_from_process_local_data``) and checkpoint gathers.
"""

from .mesh import make_mesh, replicate, shard_leading_axis  # noqa: F401
from .multihost import (  # noqa: F401
    MultihostFrameStore, frame_shard, global_mesh, init_multihost,
    make_global_batch, sample_local_rows, save_bundle_multihost)
