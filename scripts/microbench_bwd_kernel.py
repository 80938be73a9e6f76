"""Backward-kernel cost dissection on one chip.

r5 microbench_stages: fwd kernel 4.8 ms, bwd kernel 44.9 ms at the same
grid (~15k chunks). Hypotheses, timed as kernel variants on the REAL bench
binning (wrong outputs are fine — timing only, never used for math):

  rev     the production reversed sweep (affine n-1-i index maps)
  fwdmap  same kernel body with FORWARD index maps — isolates whether
          Mosaic's block pipelining degrades on descending block indices
  nosum   reversed, but per-instance dgeom emitted WITHOUT the 8 cross-lane
          sums (writes a (chunk, P) slab reduced to 8 rows via one matmul)
          — isolates the lane-reduction cost               [skipped: shape]
  novjp   reversed, value/geom grads but no suffix cumsum (drops one MXU
          pass) — isolates the second _cumsum0

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/microbench_bwd_kernel.py
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None)
    ap.add_argument("--gaussians", type=int, default=500_000)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--height", type=int, default=1200)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)

    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_bench_scene
    from gs2m_tpu.ops import blend_pallas as bp
    from gs2m_tpu.ops.binning import bin_gaussians, num_tiles
    from gs2m_tpu.ops.projection import project

    W, H, chunk, tile = args.width, args.height, 128, 16
    g, cam = build_bench_scene(args.gaussians, W, H)
    opac = g.get_opacity[:, 0]
    proj = project(g, cam, 3, opacities=opac)
    probe = bin_gaussians(proj, H, W, tile, 3 * 2 ** 20, chunk, opacities=opac)
    cap = max(-(-int(int(probe.num_aligned) * 1.06) // 2 ** 17) * 2 ** 17,
              4 * chunk)
    binning = bin_gaussians(proj, H, W, tile, cap, chunk, opacities=opac)

    grid_y, grid_x = num_tiles(H, W, tile)
    T = grid_y * grid_x
    P = tile * tile
    I = cap
    n = I // chunk
    V = 16
    key = jax.random.PRNGKey(0)
    vals_c = jax.random.normal(key, (args.gaussians, V))
    geom_t, vals_t = bp._gather_instances(
        vals_c, proj.means2d, proj.conics, opac, binning.gid, binning.is_null)
    img_tiles, fT_tiles, clogT, cdone, _ = bp._run_forward(
        geom_t, vals_t, binning.chunk_tile, T=T, n_chunks=n, chunk=chunk,
        tile=tile, grid_x=grid_x, width=W, height=H, interpret=False)
    g_img = jax.random.normal(key, (T + 1, V, P))
    gT = jax.random.normal(key, (T + 1, 1, P))

    def run_variant(reverse: bool):
        kernel = functools.partial(bp._bwd_kernel, tile=tile, grid_x=grid_x,
                                   width=W, height=H, P=P, n_chunks=n)
        ix = (lambda i: n - 1 - i) if reverse else (lambda i: i)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((8, chunk), lambda i, ct: (0, ix(i)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((V, chunk), lambda i, ct: (0, ix(i)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, P), lambda i, ct: (ix(i), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, P), lambda i, ct: (ix(i), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, V, P), lambda i, ct: (ct[ix(i)], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, P), lambda i, ct: (ct[ix(i)], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, P), lambda i, ct: (ct[ix(i)], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((8, chunk), lambda i, ct: (0, ix(i)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((V, chunk), lambda i, ct: (0, ix(i)),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((1, P), jnp.float32)],
        )
        out_shape = [jax.ShapeDtypeStruct((8, I), jnp.float32),
                     jax.ShapeDtypeStruct((V, I), jnp.float32)]
        f = jax.jit(lambda *a: pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=False)(*a))
        a = (binning.chunk_tile, geom_t, vals_t, clogT, cdone, g_img, gT,
             fT_tiles)
        o = f(*a)
        float(o[0][0, 0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = f(*a)
        float(o[0][0, 0])
        return round((time.perf_counter() - t0) / args.iters * 1e3, 2)

    res = {"instances": int(binning.num_aligned), "cap": I,
           "rev_ms": run_variant(True), "fwdmap_ms": run_variant(False)}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
