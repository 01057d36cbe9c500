"""Trustworthy on-device timing through the axon remote-TPU tunnel.

The tunnel can acknowledge ``block_until_ready`` at enqueue (observed: an
8192³ bf16 matmul "completing" in 0.05 ms where the true cost is ~7 ms),
and may serve value-identical dispatches from a cache. The only reliable
measurement is therefore:

  1. run the body ``reps`` times inside ONE in-device ``lax.scan`` whose
     iterations are chained through the carry (no two iterations compute
     the same values, nothing can be CSE'd or cache-served),
  2. force completion by FETCHING the scalar carry to the host,
  3. subtract the fixed fetch/RPC floor measured with a trivial program.

Used by bench.py, scripts/profile_components.py and the quantify_*
scripts; works identically (and harmlessly) on local CPU/TPU backends.
"""

from __future__ import annotations

import time

import numpy as np

_RPC_MS: float | None = None


def fetch(x) -> float:
    """Fetch a scalar to the host, forcing real execution."""
    return float(np.asarray(x))


def rpc_floor(refresh: bool = False) -> float:
    """Fixed ms cost of one compiled-call + scalar fetch (cached)."""
    global _RPC_MS
    if _RPC_MS is not None and not refresh:
        return _RPC_MS
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1.0).lower(jnp.float32(0)).compile()
    fetch(f(jnp.float32(0)))
    best = 1e9
    for i in range(5):
        t0 = time.time()
        fetch(f(jnp.float32(i)))
        best = min(best, time.time() - t0)
    _RPC_MS = best * 1e3
    return _RPC_MS


def time_scanned(fn, *args, reps: int = 20, trials: int = 3) -> float:
    """ms per call of ``fn(*args)``: scanned ``reps`` times on device.

    Floating args are perturbed by the carry each iteration (the carry is
    runtime data, so the perturbation cannot be constant-folded away) and
    every output element feeds the fetched checksum.
    """
    import jax
    import jax.numpy as jnp

    def loop(*a):
        def body(c, _):
            aa = jax.tree.map(
                lambda x: x + (c * 0).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a)
            r = fn(*aa)
            tot = sum(jnp.sum(leaf.astype(jnp.float32))
                      for leaf in jax.tree.leaves(r))
            return c + tot, None
        return jax.lax.scan(body, jnp.float32(0), None, length=reps)[0]

    base = rpc_floor()
    c = jax.jit(loop).lower(*args).compile()
    fetch(c(*args))                                   # warm
    best = 1e9
    for _ in range(trials):
        t0 = time.time()
        fetch(c(*args))
        best = min(best, time.time() - t0)
    return max(best * 1e3 - base, 0.0) / reps
