"""Measure the post-termination instance fraction at the train operating point.

VERDICT r4 next-#1 asks: what fraction of binned instances still contribute
zero weight after early termination (T < 1e-4)? The forward kernel already
skips COMPUTE for fully-terminated chunks (@pl.when all_done), but every
dead instance still rides the index-space pipeline: the (8+V, I) gather, the
backward kernel's grid/DMA, and the segmented-reduce sort + prefix extraction
— all linear in the instance cap. If the dead fraction is large, compacting
the layout between forward and backward (chunk-granular, using the saved
cdone carries — zero extra kernels) shrinks all of those.

Prints, per preset (steady/early) at the bench_train operating point:
  aligned slots, real (non-null) instances, instances in DEAD chunks
  (all pixels terminated at chunk start), and the dead fraction of both.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_dead_instances.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(preset: str, n=300_000, width=800, height=600, views=3, chunk=128,
          cap=2 ** 22, opacity=None):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bench_train import build_scene
    from gs2m_tpu.ops.binning import bin_gaussians, num_tiles
    from gs2m_tpu.ops.blend_pallas import _gather_instances, _run_forward
    from gs2m_tpu.ops.projection import project
    from gs2m_tpu.core.gaussians import Gaussians

    mc, pipe, opt, scene = build_scene(views, width, height, n)
    g = Gaussians.create(scene.info.points, scene.info.colors,
                         mc.sh_degree,
                         capacity=1 << int(np.ceil(np.log2(n * 1.2))))
    if preset == "steady":
        sc = jnp.full_like(g.scaling, float(np.log(0.02)))
        g = dataclasses.replace(g, scaling=sc)
    if opacity is not None:
        # Converged scenes are mostly OPAQUE (the bench presets keep the
        # create_from_pcd 0.1 init, which makes termination ~9x deeper than
        # a trained model) — probe both regimes before sizing the lever.
        inv = float(np.log(opacity / (1.0 - opacity)))
        g = dataclasses.replace(g, opacity=jnp.full_like(g.opacity, inv))

    tile = pipe.tile
    grid_y, grid_x = num_tiles(height, width, tile)
    interp = jax.default_backend() == "cpu"

    rows = []
    for vi, cam in enumerate(scene.train_cameras):
        proj = project(g, cam, mc.sh_degree, tile=tile,
                       opacities=g.get_opacity[:, 0])
        binning = bin_gaussians(proj, height, width, tile, cap, chunk,
                                opacities=g.get_opacity[:, 0])
        num_aligned = int(binning.num_aligned)
        real = int(jnp.sum(~binning.is_null))
        vals = jnp.zeros((proj.means2d.shape[0], 8), jnp.float32)
        geom_t, vals_t = _gather_instances(
            vals, proj.means2d, proj.conics, g.get_opacity[:, 0],
            binning.gid, binning.is_null)
        T = grid_y * grid_x
        n_chunks = binning.gid.shape[0] // chunk
        out = _run_forward(geom_t, vals_t, binning.chunk_tile, T=T,
                           n_chunks=n_chunks, chunk=chunk, tile=tile,
                           grid_x=grid_x, width=width, height=height,
                           interpret=interp)
        cdone = out[3]                       # (n_chunks, 1, P)
        chunk_dead = jnp.all(cdone[:, 0, :] > 0.0, axis=1)   # (n_chunks,)
        chunk_used = binning.chunk_tile < T
        dead_used = chunk_dead & chunk_used
        slot_null = binning.is_null.reshape(n_chunks, chunk)
        dead_slots = int(jnp.sum(jnp.where(dead_used[:, None], 1, 0)
                                 * jnp.ones((1, chunk), jnp.int32)))
        dead_real = int(jnp.sum(jnp.where(dead_used[:, None], ~slot_null, False)))
        rows.append(dict(view=vi, aligned=num_aligned, real=real,
                         dead_slots=dead_slots, dead_real=dead_real,
                         used_chunks=int(jnp.sum(chunk_used)),
                         dead_chunks=int(jnp.sum(dead_used))))
    agg = {k: sum(r[k] for r in rows) for k in
           ("aligned", "real", "dead_slots", "dead_real", "used_chunks",
            "dead_chunks")}
    agg["dead_frac_of_aligned"] = round(agg["dead_slots"] / max(agg["aligned"], 1), 4)
    agg["dead_frac_of_real"] = round(agg["dead_real"] / max(agg["real"], 1), 4)
    agg["preset"] = preset
    return agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=300_000)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--cap", type=int, default=2 ** 22)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--opacity", type=float, default=None,
                    help="force a uniform opacity (e.g. 0.9 ~ converged)")
    args = ap.parse_args()
    for preset in ("steady", "early"):
        out = probe(preset, n=args.gaussians, views=args.views,
                    chunk=args.chunk, cap=args.cap,
                    width=args.width, height=args.height,
                    opacity=args.opacity)
        out["opacity"] = args.opacity
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
