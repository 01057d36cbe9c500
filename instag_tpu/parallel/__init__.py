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
"""

from .mesh import make_mesh, replicate, shard_leading_axis  # noqa: F401
