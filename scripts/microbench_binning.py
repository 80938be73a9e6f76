"""Sub-stage itemization of bin_gaussians on the bench workload, one chip.

The r4 stage microbench put binning at ~80 ms of a ~190 ms step — the
largest single stage. This script times each internal piece as its own
jitted program with scalar-readback sync (CLAUDE.md: block_until_ready can
return early through the axon tunnel), plus candidate sort variants, so the
next binning lever is picked from evidence rather than guesses.

Pieces (mirroring gs2m_tpu/ops/binning.py):
  expansion   — boundary cumsum + packed table gather + cull + tile/depth
  sort4       — the production 4-operand lex sort (tile, depth | g, slots)
  sort3       — (tile | g, slots) single-key: what a depth-presorted
                expansion would need (depth dropped from the key set)
  sort2       — (tile | slots): payload floor
  presort     — C-sized Gaussian depth sort + column permute (the price a
                depth-presorted expansion pays back)
  ranges      — T+1 searchsorted + alignment cumsums
  scatter     — the aligned-layout gid scatter + dst computation
  full        — bin_gaussians end-to-end

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/microbench_binning.py
  python scripts/microbench_binning.py --smoke --device cpu
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--gaussians", type=int, default=500_000)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--height", type=int, default=1200)
    args = ap.parse_args()
    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)
    if args.smoke:
        args.gaussians, args.width, args.height, args.iters = 2_000, 256, 192, 2

    import jax
    import jax.numpy as jnp

    from bench import build_bench_scene
    from gs2m_tpu.ops.binning import bin_gaussians, num_tiles
    from gs2m_tpu.ops.projection import project

    W, H, chunk, tile = args.width, args.height, 128, 16
    g, cam = build_bench_scene(args.gaussians, W, H)
    opac = g.get_opacity[:, 0]
    proj = project(g, cam, 3, opacities=opac)
    probe = bin_gaussians(proj, H, W, tile, 3 * 2 ** 20, chunk, opacities=opac)
    want = int((int(probe.num_aligned) + int(probe.dropped)) * 1.06)
    I = max(-(-want // 2 ** 17) * 2 ** 17, 4 * chunk)
    grid_y, grid_x = num_tiles(H, W, tile)
    T = grid_y * grid_x
    C = proj.means2d.shape[0]

    def timed(name, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])  # sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*xs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        results[name] = round(ms, 2)
        print(f"  {name}: {ms:.2f} ms", file=sys.stderr, flush=True)
        return out

    results = {"instances": int(probe.num_instances), "instance_cap": I,
               "gaussians": C, "iters": args.iters}

    # --- expansion (mirrors binning.py up to tile_id/depth) -----------------
    def expansion(proj, opacities):
        tt = proj.tiles_touched
        offsets = jnp.cumsum(tt) - tt
        total = offsets[-1] + tt[-1]
        slots = jnp.arange(I, dtype=jnp.int32)
        marks = jnp.zeros((I,), jnp.int32).at[offsets].add(1, mode="drop")
        gg = jnp.clip(jnp.cumsum(marks) - 1, 0, C - 1)
        gg = jax.lax.optimization_barrier(gg)
        live = slots < total
        con = jax.lax.stop_gradient(proj.conics)
        ca, cb, cc = con[:, 0], con[:, 1], con[:, 2]
        lmin = jnp.maximum(
            0.5 * (ca + cc) - jnp.sqrt(0.25 * (ca - cc) ** 2 + cb * cb + 1e-20), 0.0)
        qmax = 2.0 * jnp.log(jnp.maximum(opacities, 1e-12) * 255.0)
        m2d = jax.lax.stop_gradient(proj.means2d)
        table = jnp.stack([
            proj.rect_min[:, 0].astype(jnp.float32),
            proj.rect_min[:, 1].astype(jnp.float32),
            jnp.maximum(proj.rect_max[:, 0] - proj.rect_min[:, 0], 1).astype(jnp.float32),
            proj.depths, m2d[:, 0], m2d[:, 1], lmin, qmax], axis=-1)
        rows = jax.lax.optimization_barrier(table[gg])
        start_marks = jnp.zeros((I,), jnp.int32).at[offsets].max(offsets, mode="drop")
        off_slot = jax.lax.cummax(start_marks)
        j = (slots - off_slot).astype(jnp.float32)
        q = jnp.floor(j / rows[:, 2])
        tx = rows[:, 0] + (j - q * rows[:, 2])
        ty = rows[:, 1] + q
        cx = jnp.clip(rows[:, 4], tx * tile, tx * tile + (tile - 1))
        cy = jnp.clip(rows[:, 5], ty * tile, ty * tile + (tile - 1))
        d2 = (rows[:, 4] - cx) ** 2 + (rows[:, 5] - cy) ** 2
        keep = live & (rows[:, 6] * d2 <= rows[:, 7] + 1e-3)
        tile_id = jnp.where(keep, ty * grid_x + tx, T).astype(jnp.int32)
        depth = jnp.where(keep, rows[:, 3], jnp.inf)
        return tile_id, depth, gg, slots, offsets, keep

    tile_id, depth, gg, slots, offsets, keep = timed(
        "expansion_ms", expansion, proj, opac)

    # --- sorts ----------------------------------------------------------------
    (tile_sorted, _, packed_sorted, eslot_sorted) = timed(
        "sort4_ms",
        lambda t, d, gG, s: jax.lax.sort((t, d, gG, s), num_keys=2,
                                         is_stable=True),
        tile_id, depth, gg, slots)
    timed("sort3_ms",
          lambda t, gG, s: jax.lax.sort((t, gG, s), num_keys=1, is_stable=True),
          tile_id, gg, slots)
    timed("sort2_ms",
          lambda t, s: jax.lax.sort((t, s), num_keys=1, is_stable=True),
          tile_id, slots)

    # --- the C-sized depth presort a single-key redesign would pay ----------
    def presort(proj):
        order = jnp.argsort(proj.depths)
        cols = jnp.stack([proj.rect_min[:, 0].astype(jnp.float32),
                          proj.rect_min[:, 1].astype(jnp.float32),
                          proj.depths], -1)
        return cols[order], proj.tiles_touched[order], order
    timed("presort_ms", presort, proj)

    # --- ranges + alignment ---------------------------------------------------
    def ranges(tile_sorted):
        start_fill = jnp.searchsorted(
            tile_sorted, jnp.arange(T + 1, dtype=tile_sorted.dtype),
            side="left").astype(jnp.int32)
        start = start_fill[:T]
        counts = start_fill[1:] - start
        aligned = ((counts + chunk - 1) // chunk) * chunk
        astart = jnp.cumsum(aligned) - aligned
        return start, counts, astart
    start, counts, astart = timed("ranges_ms", ranges, tile_sorted)

    # --- aligned-layout scatters + chunk map: gather form (pre-r4) vs the
    # boundary-diff cumsum form (binning.py) ----------------------------------
    def scatters_gather(tile_sorted, packed_sorted, eslot_sorted, start, astart):
        live_kept = tile_sorted < T
        t_safe = jnp.clip(tile_sorted, 0, T - 1)
        sl = jnp.arange(I, dtype=jnp.int32)
        dst = jnp.where(live_kept, astart[t_safe] + (sl - start[t_safe]), I)
        gid = jnp.zeros((I,), jnp.int32).at[dst].set(packed_sorted, mode="drop")
        return gid
    timed("scatter_gatherform_ms", scatters_gather, tile_sorted, packed_sorted,
          eslot_sorted, start, astart)

    def scatters_cumsum(tile_sorted, packed_sorted, eslot_sorted, start, astart):
        live_kept = tile_sorted < T
        shift = astart - start
        sdiff = jnp.concatenate([shift[:1], shift[1:] - shift[:-1]])
        shift_slot = jnp.cumsum(
            jnp.zeros((I,), jnp.int32).at[start].add(sdiff, mode="drop"))
        sl = jnp.arange(I, dtype=jnp.int32)
        dst = jnp.where(live_kept, sl + shift_slot, I)
        gid = jnp.zeros((I,), jnp.int32).at[dst].set(packed_sorted, mode="drop")
        return gid
    timed("scatter_cumsumform_ms", scatters_cumsum, tile_sorted, packed_sorted,
          eslot_sorted, start, astart)

    # --- gauss_present (cumsum + boundary diff over I) ------------------------
    def present(keep, offsets, tt):
        kcs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(keep.astype(jnp.int32))])
        seg_lo = jnp.clip(offsets, 0, I)
        seg_hi = jnp.clip(offsets + tt, 0, I)
        return kcs[seg_hi] - kcs[seg_lo]
    timed("present_ms", present, keep, offsets, proj.tiles_touched)

    # --- full -----------------------------------------------------------------
    timed("full_ms", lambda p, o: bin_gaussians(p, H, W, tile, I, chunk,
                                                opacities=o), proj, opac)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
