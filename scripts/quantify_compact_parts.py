"""Decompose the compact-scatter candidate into parts (see quantify_scatter).

Times, at bench scale (T=1024, K=256, N=32k, F=16), each stage of
  mask -> cumsum -> searchsorted -> gather -> scatter-B
separately, plus scatter-B with presorted vs tile-ordered indices, to find
which stage makes `compact` slower than the full scan4 scatter.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from instag_tpu.config import enable_persistent_compile_cache
    from instag_tpu.utils.timing import time_scanned

    enable_persistent_compile_cache()
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    F, T, K, N = 16, 1024, 256, 32768
    TK = T * K
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(F, TK)).astype(np.float32))
    # ~32 valid per tile as a realistic occupancy
    v = np.zeros((T, K), bool)
    v[:, :32] = True
    vflat = jnp.asarray(v.reshape(-1))
    ids_np = rng.integers(0, N, size=(T, K)).astype(np.int32)
    ids = jnp.asarray(ids_np.reshape(-1))

    def t(name, fn, *a):
        ms = time_scanned(fn, *a, reps=20)
        print(f"{name:26s} {ms:7.2f} ms")

    B = 32768
    cs = jnp.cumsum(vflat.astype(jnp.int32))
    pos = jnp.minimum(
        jnp.searchsorted(cs, jnp.arange(1, B + 1, dtype=jnp.int32)), TK - 1)
    posf = jax.block_until_ready(pos)
    isel = jax.block_until_ready(ids[posf])
    isel_sorted = jnp.sort(isel)
    gsel = jax.block_until_ready(g[:, posf])

    t("mask (where)", lambda x: jnp.where(vflat[None], x, 0.0), g)
    t("cumsum 262k", lambda x: jnp.cumsum(x.astype(jnp.int32)), vflat)
    t("searchsorted B=32k", lambda c: jnp.searchsorted(
        c, jnp.arange(1, B + 1, dtype=jnp.int32)), cs)
    t("gather [16,262k]->B", lambda x: x[:, posf], g)
    t("scatter B=32k", lambda gg: jnp.zeros((F, N), gg.dtype)
      .at[:, isel].add(gg), gsel)
    t("scatter B=32k sorted ids", lambda gg: jnp.zeros((F, N), gg.dtype)
      .at[:, isel_sorted].add(gg), gsel)
    t("scatter B=32k sorted+flag", lambda gg: jnp.zeros((F, N), gg.dtype)
      .at[:, isel_sorted].add(gg, indices_are_sorted=True), gsel)

    # 2-D update grid like scan4 uses: same B updates, shaped [B/256, 256]
    isel2 = isel.reshape(-1, 256)
    gsel2 = gsel.reshape(F, -1, 256)
    t("scatter B=32k 2-D grid", lambda gg: jnp.zeros((F, N), gg.dtype)
      .at[:, isel2].add(gg), gsel2)

    # scan4-shape reference: 262k updates
    idsTK = ids.reshape(T, K)
    gTK = g.reshape(F, T, K)

    def scan4(gg):
        gs = jnp.moveaxis(gg.reshape(F, T // 4, 4, K), 2, 0)
        ii = jnp.moveaxis(idsTK.reshape(T // 4, 4, K), 1, 0)

        def body(acc, xs):
            return acc.at[:, xs[1]].add(xs[0]), None
        return jax.lax.scan(body, jnp.zeros((F, N), gg.dtype), (gs, ii))[0]
    t("scan4 262k (ref)", scan4, gTK)

    # one-hot MXU over B entries: [F, B] @ onehot[B, N] in N-blocks
    def onehot_b(gg):
        oh = (isel[:, None] ==
              jnp.arange(N, dtype=jnp.int32)[None, :]).astype(gg.dtype)
        return gg @ oh
    t("one-hot MXU B=32k", onehot_b, gsel)


if __name__ == "__main__":
    main()
