"""Tile binning: Gaussian -> (tile, depth)-sorted instance lists, in pure XLA.

Behavioral reference: the CUDA pipeline's scan/duplicate/sort/ranges steps
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
rasterizer_impl.cu:61-129,263-296): one instance per Gaussian-tile overlap,
sorted by (tileID, depth) with CUB radix sort, then per-tile [start, end)
ranges.

TPU-first design — everything static-shaped:
* instance expansion is GATHER-based: slot i finds its Gaussian via
  searchsorted over the exclusive cumsum of tiles_touched (no scatter, no
  dynamic allocation; replaces duplicateWithKeys + the resizing buffers of
  rasterize_points.cu:22-28)
* sort is a single `jax.lax.sort` with lexicographic (tile, depth, slot) keys
  — deterministic, replacing the 64-bit radix sort
* per-tile segments are CHUNK-ALIGNED: each tile's instance run is padded to a
  multiple of the blend chunk so the Pallas kernels see a regular
  (n_chunks, CHUNK) layout with a per-chunk tile id (scalar-prefetched)
* fixed instance capacity with an overflow counter — "no silent caps": the
  caller must surface `dropped > 0`
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gs2m_tpu.ops.projection import Projected


class Binning(NamedTuple):
    """Chunk-aligned, depth-sorted instance layout.

    With I = instance capacity (multiple of chunk) and n_chunks = I // chunk:
    """
    gid: jnp.ndarray          # (I,) int32 Gaussian index per slot; 0 for null
    is_null: jnp.ndarray      # (I,) bool — padding slots (alpha forced to 0)
    chunk_tile: jnp.ndarray   # (n_chunks,) int32 tile id per chunk (n_tiles = dummy)
    tile_nonempty: jnp.ndarray  # (n_tiles,) bool — tiles with >= 1 instance
    num_instances: jnp.ndarray  # () int32 — true instance count (pre-alignment)
    dropped: jnp.ndarray      # () int32 — instances dropped by the capacity cap
    gauss_offset: jnp.ndarray  # (C,) int32 first expansion slot per Gaussian
    gauss_live: jnp.ndarray    # (C,) int32 live (in-capacity) instances per Gaussian
    num_aligned: jnp.ndarray  # () int32 — chunk-aligned slots in use (cap sizing)
    gauss_present: jnp.ndarray  # (C,) int32 instances surviving the cull —
    #   equals the per-Gaussian count in the aligned layout whenever
    #   dropped == 0 (the blend backward's fast segment-rank path)
    dropped_expand: jnp.ndarray = 0  # () int32 — the expansion-cap part of
    #   `dropped` (term_cut splits the caps; the trainer grows each on its
    #   own overflow). Plain-int default: a jnp default would initialize the
    #   JAX backend at import time (RasterOut has the same note).


def num_tiles(height: int, width: int, tile: int) -> tuple[int, int]:
    return (height + tile - 1) // tile, (width + tile - 1) // tile


@partial(jax.jit, static_argnames=("height", "width", "tile", "instance_cap",
                                   "chunk", "with_present", "term_cut",
                                   "expand_cap"))
def bin_gaussians(proj: Projected, height: int, width: int, tile: int,
                  instance_cap: int, chunk: int,
                  opacities: jnp.ndarray | None = None,
                  with_present: bool = True,
                  term_cut: bool = False,
                  expand_cap: int | None = None) -> Binning:
    """Build the chunk-aligned instance layout from projected Gaussians.

    When `opacities` is given, instances are CULLED by a conservative
    ellipse-vs-tile test: the reference expands the full bbox rect of a
    3-sigma CIRCLE (auxiliary.h:44-53), so for anisotropic splats most rect
    tiles never meet the ellipse. An instance is dropped iff
    lambda_min(conic) * dist(tile, mean)^2 > 2*ln(255*opacity) — a lower
    bound on the Mahalanobis form, so every culled instance would have
    alpha < 1/255 on EVERY pixel of the tile and be gated off by the blend
    anyway (forward.cu:329: alpha < 1/255 -> continue). Output-identical,
    but the dead instances never enter the sort/gather/kernel pipeline.

    `term_cut` (requires opacities): additionally cut each tile's depth-
    sorted instance run where termination is GUARANTEED for every pixel of
    the tile, at 4x4-pixel block granularity. Per instance and block, a
    LOWER bound on its alpha anywhere in the block is
    alpha_min = min(0.99, op * exp(-0.5 * lmax * d2_far)) (lmax = largest
    conic eigenvalue, d2_far = squared distance from the mean to the block's
    farthest pixel); since the kernel only composites alpha >= 1/255, the
    per-block running sum of log1p(-alpha_min) over instances with
    alpha_min >= 1/255 upper-bounds every block pixel's log T, and once ALL
    of a tile's blocks cross the kernel's termination threshold (log 1e-4)
    every deeper instance of the tile has exactly-zero contribution, weight
    and gradient (forward.cu:332-338 early exit; the blend kernels'
    done/contribute gating) — cutting them is output- and gradient-exact.
    Granularity is load-bearing: tile-level bounds capture 0% of the
    exactly-dead slots, 4x4 captures ~83% (scripts/probe_term_bound.py).
    Converged scenes are mostly opaque: 84.6%/90.8% of aligned slots were
    post-termination at opacity 0.9 (r5 probe), so this shrinks the ALIGNED
    demand the trainer sizes the static instance cap from — pass
    `expand_cap` to keep the pre-cut expansion/sort side at its own larger
    cap. The cut changes per-Gaussian aligned counts, so callers must
    reduce with exact_rank (gauss_present still counts cull-survivors)."""
    assert instance_cap % chunk == 0
    # All slot-index arithmetic is int32-exact; the one f32 division below
    # only sees within-Gaussian offsets (< tiles touched per Gaussian), so the
    # cap is bounded by the sort/scatter index range, not f32 precision.
    assert instance_cap <= 2 ** 30, "instance_cap above int32 index range"
    grid_y, grid_x = num_tiles(height, width, tile)
    T = grid_y * grid_x
    I = instance_cap
    # Expansion/sorted space: term_cut removes most instances BETWEEN the
    # sort and the aligned layout, so the pre-cut side can need a LARGER cap
    # than the aligned output the kernels/reduce run at. Without term_cut
    # they coincide.
    IE = expand_cap or instance_cap
    assert IE % chunk == 0 and IE <= 2 ** 30
    C = proj.means2d.shape[0]

    tt = proj.tiles_touched  # (C,) int32, 0 for culled
    offsets = jnp.cumsum(tt) - tt  # exclusive cumsum: first slot of each Gaussian
    total = offsets[-1] + tt[-1]
    dropped_expand = jnp.maximum(total - IE, 0)

    def boundary_lookup(starts, size):
        """last index j with starts[j] <= slot, for every slot in [0, size).
        Equivalent to searchsorted(starts, slots, 'right') - 1, computed as
        scatter-ones + cumsum (XLA's searchsorted lowering is ~50x slower on
        TPU for millions of queries)."""
        marks = jnp.zeros((size,), jnp.int32).at[starts].add(1, mode="drop")
        return jnp.cumsum(marks) - 1

    # --- expansion: slot -> (gaussian, tile) ---------------------------------
    # Performance shape (TPU): one PACKED row gather instead of per-column
    # gathers; optimization_barrier stops XLA from fusing the boundary
    # cumsum into every consumer (measured 10x on the expansion); tile
    # rect division in f32 (exact for the small integer ranges involved).
    slots_e = jnp.arange(IE, dtype=jnp.int32)
    g = jnp.clip(boundary_lookup(offsets, IE), 0, C - 1)
    g = jax.lax.optimization_barrier(g)
    live = slots_e < total

    # f32 packed table carries only SMALL values (tile coords, rect widths,
    # depths, cull params); the Gaussian's first-slot offset rides in a
    # separate int32 gather so `j = slot - offset` stays int32-exact at any
    # capacity — offsets/slots themselves exceed f32's 2^24 integer range at
    # tens of millions of instances, but their difference is < tiles/Gaussian.
    cols = [
        proj.rect_min[:, 0].astype(jnp.float32),
        proj.rect_min[:, 1].astype(jnp.float32),
        jnp.maximum(proj.rect_max[:, 0] - proj.rect_min[:, 0], 1).astype(jnp.float32),
        proj.depths,
    ]
    assert not (term_cut and opacities is None), "term_cut needs opacities"
    if opacities is not None:
        # Per-Gaussian cull params (binning is index-valued: stop gradients).
        con = jax.lax.stop_gradient(proj.conics)
        ca, cb, cc = con[:, 0], con[:, 1], con[:, 2]
        disc = jnp.sqrt(0.25 * (ca - cc) ** 2 + cb * cb + 1e-20)
        lmin = jnp.maximum(0.5 * (ca + cc) - disc, 0.0)
        op = jax.lax.stop_gradient(opacities)
        qmax = 2.0 * jnp.log(jnp.maximum(op, 1e-12) * 255.0)
        m2d = jax.lax.stop_gradient(proj.means2d)
        cols += [m2d[:, 0], m2d[:, 1], lmin, qmax]
        if term_cut:
            lmax = 0.5 * (ca + cc) + disc
            cols += [lmax, op]
    table = jnp.stack(cols, axis=-1)               # (C, 4/8/10)
    rows = jax.lax.optimization_barrier(table[g])  # (IE, .) one gather
    # Each slot's Gaussian-start offset WITHOUT a gather (a 3.1M-index int32
    # gather costs ~27 ms on one chip; this scatter-max + cummax ~6 ms):
    # scatter each start onto its own slot, hold it forward with cummax.
    start_marks = jnp.zeros((IE,), jnp.int32).at[offsets].max(
        offsets, mode="drop")
    off_slot = jax.lax.cummax(start_marks)
    j = (slots_e - off_slot).astype(jnp.float32)   # exact: j < tiles/Gaussian
    q = jnp.floor(j / rows[:, 2])
    tx = rows[:, 0] + (j - q * rows[:, 2])
    ty = rows[:, 1] + q
    keep = live
    if opacities is not None:
        # Nearest point of the tile's pixel grid to the splat center; the
        # +1e-3 margin keeps the bound strictly conservative under f32.
        cx = jnp.clip(rows[:, 4], tx * tile, tx * tile + (tile - 1))
        cy = jnp.clip(rows[:, 5], ty * tile, ty * tile + (tile - 1))
        d2 = (rows[:, 4] - cx) ** 2 + (rows[:, 5] - cy) ** 2
        keep = live & (rows[:, 6] * d2 <= rows[:, 7] + 1e-3)
    tile_id = jnp.where(keep, ty * grid_x + tx, T).astype(jnp.int32)
    depth = jnp.where(keep, rows[:, 3], jnp.inf)

    # Per-Gaussian surviving-instance counts: `keep` is in EXPANSION order,
    # where each Gaussian's slots are contiguous — a cumsum + boundary
    # differences, no scatter. Only the blend backward's fast segment-rank
    # path consumes this (10.9 ms/view measured, r5 microbench_binning
    # `present`); compacting/term_cut backwards count present ids at reduce
    # time and the observe pass never reduces (with_present=False).
    if with_present:
        kcs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(keep.astype(jnp.int32))])
        seg_lo = jnp.clip(offsets, 0, IE)
        seg_hi = jnp.clip(offsets + tt, 0, IE)
        gauss_present = kcs[seg_hi] - kcs[seg_lo]
    else:
        gauss_present = jnp.zeros((C,), jnp.int32)

    # --- lexicographic sort by (tile, depth) with the Gaussian id payload ----
    # Dead/culled rows carry tile T + depth inf, sort to the tail, and never
    # scatter into the aligned layout below — no liveness payload needed.
    # No expansion-slot payload either (r4): the blend backward's segmented
    # reduce only needs GROUPING by Gaussian, and gid is an equivalent sort
    # key (expansion order is Gaussian-index-major), so the eslot payload and
    # the second aligned-layout scatter it fed were dead weight (~9 ms/view
    # each at cap 2M, r4 trace).
    if term_cut:
        # The termination credits need per-instance (mean2d, lmax, opacity)
        # in SORTED order; riding the sort as payloads (~0.7 ms/payload/M)
        # beats a second I-index gather (17 ms/2M, the per-index floor law).
        (tile_sorted, _, packed_sorted, mx_s, my_s, lmax_s,
         op_s) = jax.lax.sort(
            (tile_id, depth, g, rows[:, 4], rows[:, 5], rows[:, 8],
             rows[:, 9]), num_keys=2, is_stable=True)
    else:
        tile_sorted, _, packed_sorted = jax.lax.sort(
            (tile_id, depth, g), num_keys=2, is_stable=True)

    # --- per-tile ranges: searchsorted from the SMALL side (T+1 queries over
    # the sorted keys — a 3.1M-update scatter-min costs ~33ms, these ~7500
    # binary searches ~7ms; missing tiles naturally resolve to the next
    # tile's start, replacing the reverse-cummin fill) -------------------------
    start_fill = jnp.searchsorted(
        tile_sorted, jnp.arange(T + 1, dtype=tile_sorted.dtype),
        side="left").astype(jnp.int32)
    start = start_fill[:T]
    counts = (start_fill[1:] - start).astype(jnp.int32)

    if term_cut:
        # Guaranteed-termination cut at 4x4-pixel granularity. Per instance
        # and per block r of its tile, alpha at ANY pixel of the block is
        # >= amin_r = min(.99, op*exp(-.5*lmax*d2far_r)) (far corner of the
        # block); credits below the kernel's composite gate (1/255) don't
        # count. Tile-level bounds capture 0% of the exactly-dead slots and
        # 4x4 captures 83% (scripts/probe_term_bound.py, opacity 0.9).
        #
        # Numerics: the per-block running sums ride a GLOBAL cumsum whose
        # magnitude reaches ~1e7, so f32 prefixes would round each step at
        # ~1 — the same conditioning failure as the r4 segmented-reduce
        # breach. Credits are therefore QUANTIZED to ints (1e-3 steps,
        # ceil => conservative) and summed in int32, where the per-segment
        # difference (prefix minus the tile-start base, broadcast by the
        # diff-scatter + modular cumsum) is EXACT under wraparound as long
        # as the true within-tile sum stays inside int32 — guaranteed by
        # clamping each credit at -16/1e-3 and by the structural prefix
        # enforcement below (a wrap can only cost missed cuts, never a
        # non-prefix kept pattern).
        BQ = 4
        nb = tile // BQ
        R = nb * nb
        SCALE = 1e-3
        # Integer threshold: cutting requires sum_q * SCALE < log(1e-4).
        Q_EPS = int(math.floor(math.log(1e-4) / SCALE))   # -9211
        tpos = jnp.minimum(tile_sorted, T - 1)
        tox = ((tpos % grid_x) * tile).astype(jnp.float32)    # (IE,)
        toy = ((tpos // grid_x) * tile).astype(jnp.float32)
        off_b = (jnp.arange(nb, dtype=jnp.float32) * BQ)
        bx0 = tox[None, :] + off_b[:, None]                   # (nb, IE)
        by0 = toy[None, :] + off_b[:, None]
        dxf = jnp.maximum(jnp.abs(mx_s[None, :] - bx0),
                          jnp.abs(mx_s[None, :] - (bx0 + BQ - 1)))
        dyf = jnp.maximum(jnp.abs(my_s[None, :] - by0),
                          jnp.abs(my_s[None, :] - (by0 + BQ - 1)))
        # (R, IE) with r = ry * nb + rx
        d2 = (dyf[:, None, :] ** 2 + dxf[None, :, :] ** 2).reshape(R, -1)
        qfar = 0.5 * lmax_s[None, :] * d2
        amin = jnp.minimum(0.99, op_s[None, :] * jnp.exp(-qfar))
        valid_i = tile_sorted < T
        credit = jnp.where(valid_i[None, :] & (amin >= 1.0 / 255.0),
                           jnp.maximum(jnp.log1p(-amin), -16.0), 0.0)
        qcredit = jnp.ceil(credit / SCALE).astype(jnp.int32)  # (R, IE) <= 0
        cs = jnp.cumsum(qcredit, axis=1)
        excl = cs - qcredit                                    # prefix BEFORE
        base = excl[:, jnp.minimum(start, IE - 1)]             # (R, T) exact
        bdiff = jnp.concatenate([base[:, :1],
                                 base[:, 1:] - base[:, :-1]], axis=1)
        base_slot = jnp.cumsum(
            jnp.zeros((R, IE), jnp.int32).at[:, start].add(bdiff, mode="drop"),
            axis=1)
        excl_in = excl - base_slot                             # exact modular
        # Blocks fully outside the image never gate (their lanes are gated
        # off in the kernels and cropped from outputs) — treat as crossed.
        outside = ((bx0[None, :, :] >= width) | (by0[:, None, :] >= height))
        outside = outside.reshape(R, -1)
        crossed = (excl_in <= Q_EPS) | outside
        kept_raw = ~jnp.all(crossed, axis=0)                   # (IE,)
        # Structural prefix enforcement: ranks in the aligned scatter assume
        # the kept set is a PREFIX of each tile's sorted run. It is, by
        # monotonicity — unless an int32 wrap flipped a deep slot back to
        # kept; force the property so any wrap only costs missed cuts.
        bad_pos = jnp.where(~kept_raw & valid_i, slots_e, -1)
        last_bad = jax.lax.cummax(bad_pos)
        start_slot = jax.lax.cummax(
            jnp.zeros((IE,), jnp.int32).at[start].max(start, mode="drop"))
        kept = kept_raw & (last_bad < start_slot)
        kcs2 = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(kept.astype(jnp.int32))])
        counts = kcs2[start_fill[1:]] - kcs2[start]            # kept per tile
    else:
        kept = None

    # --- chunk alignment ------------------------------------------------------
    aligned = ((counts + chunk - 1) // chunk) * chunk
    astart = jnp.cumsum(aligned) - aligned  # exclusive
    atotal = astart[-1] + aligned[-1]
    dropped_align = jnp.maximum(atotal - I, 0)

    # aligned slot -> tile, at CHUNK granularity: segments are chunk-aligned,
    # so astart values are chunk multiples and every slot of a chunk shares
    # one tile — the boundary scatter+cumsum and the (I, 3) tile-table gather
    # run over I/chunk elements instead of I (duplicate starts of empty tiles
    # accumulate so the cumsum still yields the LAST tile with astart <= slot)
    # and broadcast back to slots for free.
    n_chunks = I // chunk
    chunk_marks = jnp.zeros((n_chunks,), jnp.int32).at[astart // chunk].add(
        1, mode="drop")
    t_of_c = jnp.clip(jnp.cumsum(chunk_marks) - 1, 0, T - 1)
    t_of_c = jax.lax.optimization_barrier(t_of_c)
    tile_table = jnp.stack([astart, counts, start], axis=-1)   # (T, 3)
    trows_c = jax.lax.optimization_barrier(tile_table[t_of_c])  # (n_chunks, 3)
    trows = jnp.broadcast_to(trows_c[:, None, :],
                             (n_chunks, chunk, 3)).reshape(I, 3)
    slots_out = jnp.arange(I, dtype=jnp.int32)
    k = slots_out - trows[:, 0]
    in_tile = (slots_out < atotal) & (k < trows[:, 1])
    # Aligned layout via SCATTER: dst = astart[tile] + rank-in-tile, where
    # rank = sorted position - start[tile]. The previous form gathered from
    # an I-WIDE source (gather cost scales with SOURCE width — 109 ms for
    # 3.1M indices from a 3.1M-wide table, BASELINE gather law). The shift
    # astart[tile] - start[tile] is CONSTANT over each tile's sorted segment,
    # so instead of two (T-wide source, I-index) gathers — which are NOT
    # cheap: gather also has a per-INDEX floor, measured 17 + 11 ms at
    # I ~ 2M from a 1900-wide table (r4 train-step trace) — scatter the
    # per-tile shift DIFFS at the segment starts (T updates) and carry the
    # shift forward with one I-cumsum (~5 ms): the boundary_lookup pattern.
    # Empty tiles collapse onto the next start; their diffs accumulate at
    # the same position, so the cumsum still lands on the owning tile's
    # shift. Only live+kept instances scatter (culled/dead rows carry tile
    # T and drop); dst >= I under alignment overflow also drops. Chunk-
    # padding slots stay at their scatter init (gid 0) —
    # exactly the old nulls.
    live_kept = tile_sorted < T
    if term_cut:
        # Cut instances are a SUFFIX of each tile's sorted run, so ranks of
        # the kept prefix are unchanged and the same shift-scatter works.
        live_kept = live_kept & kept
    shift = astart - start                                   # (T,) >= 0
    sdiff = jnp.concatenate([shift[:1], shift[1:] - shift[:-1]])
    shift_slot = jnp.cumsum(
        jnp.zeros((IE,), jnp.int32).at[start].add(sdiff, mode="drop"))
    dst = jnp.where(live_kept, slots_e + shift_slot, I)
    gid = jnp.zeros((I,), jnp.int32).at[dst].set(packed_sorted, mode="drop")
    is_null = ~in_tile
    gid = jnp.where(in_tile, gid, 0)

    # Per-Gaussian expansion ranges (contiguous by construction): live count
    # clips the tail lost to the expansion capacity.
    gauss_offset = jnp.clip(offsets, 0, IE).astype(jnp.int32)
    gauss_live = jnp.clip(jnp.minimum(tt, IE - offsets), 0, None).astype(jnp.int32)

    # chunk -> tile id (dummy tile T for tail chunks); t_of_c IS per-chunk.
    chunk_starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    chunk_tile = jnp.where(chunk_starts < atotal, t_of_c, T)

    # A tile only renders if at least one chunk actually carries it (overflow
    # can cut a nonempty tile's chunks entirely; it then composites as pure
    # background on every backend — and is counted in `dropped`).
    covered = jnp.zeros((T + 1,), bool).at[chunk_tile].set(True)[:T]

    return Binning(
        gid=gid.astype(jnp.int32),
        is_null=is_null,
        chunk_tile=chunk_tile,
        tile_nonempty=(counts > 0) & covered,
        num_instances=total.astype(jnp.int32),
        dropped=(dropped_expand + dropped_align).astype(jnp.int32),
        gauss_offset=gauss_offset,
        gauss_live=gauss_live,
        num_aligned=jnp.minimum(atotal, I).astype(jnp.int32),
        gauss_present=gauss_present,
        dropped_expand=dropped_expand.astype(jnp.int32),
    )
