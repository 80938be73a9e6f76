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


def num_tiles(height: int, width: int, tile: int) -> tuple[int, int]:
    return (height + tile - 1) // tile, (width + tile - 1) // tile


@partial(jax.jit, static_argnames=("height", "width", "tile", "instance_cap", "chunk"))
def bin_gaussians(proj: Projected, height: int, width: int, tile: int,
                  instance_cap: int, chunk: int) -> Binning:
    """Build the chunk-aligned instance layout from projected Gaussians."""
    assert instance_cap % chunk == 0
    grid_y, grid_x = num_tiles(height, width, tile)
    T = grid_y * grid_x
    I = instance_cap
    C = proj.means2d.shape[0]

    tt = proj.tiles_touched  # (C,) int32, 0 for culled
    offsets = jnp.cumsum(tt) - tt  # exclusive cumsum: first slot of each Gaussian
    total = offsets[-1] + tt[-1]
    dropped_expand = jnp.maximum(total - I, 0)

    # --- expansion: slot -> (gaussian, tile) ---------------------------------
    slots = jnp.arange(I, dtype=jnp.int32)
    # g = last index with offsets[g] <= slot  (searchsorted right - 1)
    g = jnp.searchsorted(offsets, slots, side="right").astype(jnp.int32) - 1
    g = jnp.clip(g, 0, C - 1)
    live = slots < total
    j = slots - offsets[g]
    rect_w = proj.rect_max[g, 0] - proj.rect_min[g, 0]
    ty = proj.rect_min[g, 1] + j // jnp.maximum(rect_w, 1)
    tx = proj.rect_min[g, 0] + j % jnp.maximum(rect_w, 1)
    tile_id = jnp.where(live, ty * grid_x + tx, T).astype(jnp.int32)
    depth = jnp.where(live, proj.depths[g], jnp.inf)

    # --- lexicographic sort by (tile, depth, slot) ---------------------------
    tile_sorted, _, gid_sorted, live_sorted = jax.lax.sort(
        (tile_id, depth, g, live.astype(jnp.int32)), num_keys=2, is_stable=True)
    live_sorted = live_sorted.astype(bool)

    # --- per-tile ranges ------------------------------------------------------
    tids = jnp.arange(T, dtype=jnp.int32)
    start = jnp.searchsorted(tile_sorted, tids, side="left").astype(jnp.int32)
    end = jnp.searchsorted(tile_sorted, tids, side="right").astype(jnp.int32)
    counts = end - start  # (T,)

    # --- chunk alignment ------------------------------------------------------
    aligned = ((counts + chunk - 1) // chunk) * chunk
    astart = jnp.cumsum(aligned) - aligned  # exclusive
    atotal = astart[-1] + aligned[-1]
    dropped_align = jnp.maximum(atotal - I, 0)

    # aligned slot -> tile via searchsorted over astart
    t_of = jnp.searchsorted(astart, slots, side="right").astype(jnp.int32) - 1
    t_of = jnp.clip(t_of, 0, T - 1)
    k = slots - astart[t_of]
    in_tile = (slots < atotal) & (k < counts[t_of])
    src = jnp.clip(start[t_of] + k, 0, I - 1)
    gid = jnp.where(in_tile, gid_sorted[src], 0)
    # Null also where source slot was dead (expansion overflow tail).
    is_null = ~in_tile | ~live_sorted[jnp.clip(src, 0, I - 1)]

    # chunk -> tile id (dummy tile T for tail chunks)
    chunk_starts = jnp.arange(I // chunk, dtype=jnp.int32) * chunk
    ct = jnp.searchsorted(astart, chunk_starts, side="right").astype(jnp.int32) - 1
    ct = jnp.clip(ct, 0, T - 1)
    chunk_tile = jnp.where(chunk_starts < atotal, ct, T)

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
    )
