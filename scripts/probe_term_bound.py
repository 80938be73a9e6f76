"""Capture rate of conservative termination bounds vs exact per-pixel truth.

The cdone-based probe says 84.6-90.8% of aligned slots are post-termination
on opaque scenes, but a binning-time cut can only use a per-instance LOWER
bound on alpha over a pixel REGION. This probe measures, per region
granularity (16x16 tile, 8x8, 4x4, 2x2 blocks), what fraction of the
exactly-dead slots the bound-based cut would actually capture — before any
kernel work is spent implementing it.

Method (pure numpy over binning outputs + fwd-kernel carries):
  exact:  chunk dead iff all pixels done at chunk start (cdone carries)
  bound:  walk each tile's kept run in depth order; per region r maintain
          S_r += log1p(-amin_r) where amin_r = min(.99, op*exp(-.5*lmax*
          d2far_r)) if >= 1/255; instance cut-eligible once max_r S_r ...
          all regions crossed log(1e-4).

Usage (small scene is fine — geometry is what matters):
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/probe_term_bound.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=20_000)
    ap.add_argument("--width", type=int, default=240)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--opacity", type=float, default=0.9)
    ap.add_argument("--preset", default="steady")
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--cap", type=int, default=2 ** 18)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from bench_train import build_scene
    from gs2m_tpu.core.gaussians import Gaussians
    from gs2m_tpu.ops.binning import bin_gaussians, num_tiles
    from gs2m_tpu.ops.blend_pallas import _gather_instances, _run_forward
    from gs2m_tpu.ops.projection import project

    mc, pipe, opt, scene = build_scene(1, args.width, args.height,
                                       args.gaussians)
    g = Gaussians.create(scene.info.points, scene.info.colors, mc.sh_degree,
                         capacity=1 << int(np.ceil(np.log2(args.gaussians * 1.2))))
    if args.preset == "steady":
        # match bench_train steady splat size scaled to this resolution
        g = dataclasses.replace(
            g, scaling=jnp.full_like(g.scaling, float(np.log(0.02 * 800 / args.width))))
    inv = float(np.log(args.opacity / (1 - args.opacity)))
    g = dataclasses.replace(g, opacity=jnp.full_like(g.opacity, inv))

    tile = 16
    cam = scene.train_cameras[0]
    opac = g.get_opacity[:, 0]
    proj = project(g, cam, mc.sh_degree, tile=tile, opacities=opac)
    binning = bin_gaussians(proj, args.height, args.width, tile, args.cap,
                            args.chunk, opacities=opac)
    grid_y, grid_x = num_tiles(args.height, args.width, tile)
    T = grid_y * grid_x
    n_chunks = args.cap // args.chunk
    vals = jnp.zeros((g.capacity, 8), jnp.float32)
    geom_t, vals_t = _gather_instances(vals, proj.means2d, proj.conics, opac,
                                       binning.gid, binning.is_null)
    out = _run_forward(geom_t, vals_t, binning.chunk_tile, T=T,
                       n_chunks=n_chunks, chunk=args.chunk, tile=tile,
                       grid_x=grid_x, width=args.width, height=args.height,
                       interpret=jax.default_backend() == "cpu")
    cdone = np.asarray(out[3][:, 0, :])                 # (n_chunks, P)
    chunk_tile = np.asarray(binning.chunk_tile)
    gid = np.asarray(binning.gid)
    is_null = np.asarray(binning.is_null)

    # exact dead slots
    dead_chunk = (cdone > 0).all(1) & (chunk_tile < T)
    exact_dead = int(dead_chunk.sum()) * args.chunk
    used = int((chunk_tile < T).sum()) * args.chunk

    # per-Gaussian params
    con = np.asarray(proj.conics)
    ca, cb, cc = con[:, 0], con[:, 1], con[:, 2]
    disc = np.sqrt(0.25 * (ca - cc) ** 2 + cb * cb + 1e-20)
    lmax = 0.5 * (ca + cc) + disc
    m2d = np.asarray(proj.means2d)
    op = np.asarray(opac)

    LOG_EPS = np.log(1e-4)
    results = {"exact_dead_slots": exact_dead, "used_slots": used,
               "exact_dead_frac": round(exact_dead / max(used, 1), 4)}
    for block in (16, 8, 4, 2):
        nb = tile // block
        # region corners per tile-local block (nb*nb regions)
        cut_slots = 0
        for c0 in range(n_chunks):
            pass  # vectorized below instead
        # Vectorize per tile: walk slots in layout order.
        S = np.zeros((T, nb, nb), np.float64)
        tile_of_slot = np.repeat(chunk_tile, args.chunk)
        alive_tile = np.ones((T,), bool)  # not yet fully terminated
        # block far-corner distances need tile origin
        ty = (np.arange(T) // grid_x) * tile
        tx = (np.arange(T) % grid_x) * tile
        # slot loop is too slow in python; do it chunk-blocked per tile run
        # using cumulative credits computed vectorized per slot first:
        slot_idx = np.arange(len(gid))
        valid = (~is_null) & (tile_of_slot < T)
        t_of = np.where(tile_of_slot < T, tile_of_slot, 0)
        gx0 = tx[t_of][:, None, None] + np.arange(nb)[None, :, None] * block
        gy0 = ty[t_of][:, None, None] + np.arange(nb)[None, None, :] * block
        mx = m2d[gid][:, None, None]
        my = m2d[gid, 1][:, None, None]
        mx = m2d[gid, 0][:, None, None]
        dxf = np.maximum(np.abs(mx - gx0), np.abs(mx - (gx0 + block - 1)))
        dyf = np.maximum(np.abs(my - gy0), np.abs(my - (gy0 + block - 1)))
        qfar = 0.5 * lmax[gid][:, None, None] * (dxf ** 2 + dyf ** 2)
        amin = np.minimum(0.99, op[gid][:, None, None] * np.exp(-qfar))
        credit = np.where((amin >= 1 / 255) & valid[:, None, None],
                          np.log1p(-amin), 0.0)        # (I, nb, nb)
        # segmented prefix per tile in layout order (slots already grouped)
        cs = np.cumsum(credit, axis=0)
        # base at each tile's first slot
        first_slot = np.full((T,), -1, np.int64)
        for s in range(len(chunk_tile)):
            t = chunk_tile[s]
            if t < T and first_slot[t] < 0:
                first_slot[t] = s * args.chunk
        base = np.zeros((T, nb, nb))
        ok = first_slot >= 0
        base[ok] = cs[first_slot[ok]] - credit[first_slot[ok]]
        excl = cs - credit - base[t_of]
        dead_bound = (excl < LOG_EPS).all(axis=(1, 2)) & valid
        cut_slots = int(dead_bound.sum())
        results[f"bound_dead_slots_b{block}"] = cut_slots
        results[f"capture_b{block}"] = round(cut_slots / max(exact_dead, 1), 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
