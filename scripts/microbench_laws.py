"""Primitive-cost laws on one chip: multi-row cumsum, scatter shapes,
chunk-granular gathers. Feeds binning-restructure decisions (round 5).

Hypotheses under test:
  H1  an (8, I) axis-1 cumsum costs about the same as an (I,) cumsum
      (sublane parallelism is otherwise idle) -> per-Gaussian -> per-slot
      value broadcast could ride ONE stacked cumsum instead of a 20 ms
      (I, 8) gather.
  H2  a C-update 1-channel scatter-add is ~C/I of the I-update cost.
  H3  a chunk-granular block gather ((K, n_chunks, chunk) take of n2 chunk
      indices on axis 1) is HBM-cheap (the backward-compaction primitive).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/microbench_laws.py
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None)
    ap.add_argument("--size", type=int, default=2 ** 21)
    ap.add_argument("--gaussians", type=int, default=500_000)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)

    import jax
    import jax.numpy as jnp

    I = args.size
    C = args.gaussians
    chunk = 128
    n_chunks = I // chunk
    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(key, (I,))
    x8 = jax.random.normal(key, (8, I))
    xi = (x1 * 100).astype(jnp.int32)
    x8i = (x8 * 100).astype(jnp.int32)
    cidx = jax.random.randint(key, (C,), 0, I)
    iidx = jax.random.randint(key, (I,), 0, C)
    cval = jax.random.normal(key, (C,))
    cval8 = jax.random.normal(key, (8, C))
    tabKI = jax.random.normal(key, (24, I))
    keep = jax.random.randint(key, (n_chunks // 2,), 0, n_chunks)

    def timeit(fn, *a):
        out = jax.jit(fn)(*a)
        jax.tree.map(lambda o: float(jnp.asarray(o).reshape(-1)[0]), out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jax.jit(fn)(*a)
        jax.tree.map(lambda o: float(jnp.asarray(o).reshape(-1)[0]), out)
        return round((time.perf_counter() - t0) / args.iters * 1e3, 3)

    res = {"I": I, "C": C}
    res["cumsum_1xI_f32"] = timeit(lambda v: jnp.cumsum(v), x1)
    res["cumsum_8xI_f32_ax1"] = timeit(lambda v: jnp.cumsum(v, axis=1), x8)
    res["cumsum_1xI_i32"] = timeit(lambda v: jnp.cumsum(v), xi)
    res["cumsum_8xI_i32_ax1"] = timeit(lambda v: jnp.cumsum(v, axis=1), x8i)
    res["cummax_1xI_i32"] = timeit(lambda v: jax.lax.cummax(v), xi)
    res["scatter_add_CtoI_1ch"] = timeit(
        lambda v: jnp.zeros((I,), jnp.float32).at[cidx].add(v), cval)
    res["scatter_add_CtoI_8ch_sep"] = timeit(
        lambda v: [jnp.zeros((I,), jnp.float32).at[cidx].add(v[k])
                   for k in range(8)], cval8)
    res["scatter_add_CtoI_8ch_one"] = timeit(
        lambda v: jnp.zeros((8, I), jnp.float32).at[:, cidx].add(v), cval8)
    res["scatter_add_ItoC_1ch"] = timeit(
        lambda v: jnp.zeros((C,), jnp.float32).at[iidx].add(v), x1)
    res["gather_chunkblocks_24xI_half"] = timeit(
        lambda k: tabKI.reshape(24, n_chunks, chunk)[:, k].reshape(
            24, -1), keep)
    # The actual broadcast composite H1 would replace: diff-scatter (8 sep)
    # + one 8-row cumsum, vs today's (I,8) gather.
    res["gather_I_from_C_8rows"] = timeit(
        lambda idx: jax.lax.optimization_barrier(
            jax.lax.optimization_barrier(
                jnp.stack([cval] * 8, 0))[:, jax.lax.optimization_barrier(idx)]),
        iidx)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
