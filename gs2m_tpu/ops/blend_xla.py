"""Tiled alpha blending in pure XLA — the chunked log-transmittance formulation.

This is the mid-scale twin of the Pallas blend kernels: IDENTICAL math and
chunk layout (same binning, same masks, same log-space compositing), expressed
as a lax.scan over chunks so it runs anywhere (CPU tests) and differentiates
via plain autodiff. The Pallas kernels (blend_pallas.py) must match this
bit-for-bit modulo float reassociation.

The formulation (replacing the sequential CUDA loop, forward.cu:298-358):
with per-(instance, pixel) alpha a_{j,p} and log-transmittance carried per
pixel, the blend weight is
    w_j = a_j * exp(carry + cumsum_excl(log(1-a))) * [not done]
and a whole chunk's RGB+feature accumulation is ONE MXU matmul
    out[V, P] += Vals[V, CHUNK] @ W[CHUNK, P].
Early termination (T < 1e-4, forward.cu:335-338) becomes a cummax over the
crossing flag; skipped Gaussians (power > 0 or alpha < 1/255) set a_j = 0,
which is exactly "continue without updating T".
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gs2m_tpu.ops.binning import Binning, num_tiles

# math.log, NOT jnp.log: a module-level jnp expression initializes the JAX
# backend at import time, which turns a dead device tunnel into an
# ImportError for the whole package (this ate BENCH_r03).
LOG_EPS = math.log(1e-4)  # termination threshold (forward.cu:336)
ALPHA_MIN = 1.0 / 255.0


class BlendOut(NamedTuple):
    image: jnp.ndarray     # (V, Hp, Wp): rows 0-2 RGB (no bg), rest features
    final_T: jnp.ndarray   # (Hp, Wp)
    observe: jnp.ndarray   # (C,) int32


def _chunk_alpha(means2d_c, conics_c, opac_c, pix_x, pix_y, inside):
    """Per-(instance, pixel) gated alpha for one chunk.

    means2d_c: (K, 2); conics_c: (K, 3); opac_c: (K,);
    pix_x/pix_y/inside: (P,). Returns alpha_eff (K, P).
    """
    dx = means2d_c[:, 0:1] - pix_x[None, :]
    dy = means2d_c[:, 1:2] - pix_y[None, :]
    a = conics_c[:, 0:1]
    b = conics_c[:, 1:2]
    c = conics_c[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    # exp(min(power, 0)): power > 0 lanes are gated off below, but exp(+big)
    # is inf and masked-lane vjps turn 0-cotangent * inf into NaN (CLAUDE.md
    # masked-lane rule; a degenerate conic NaN'd opacity grads in training).
    alpha = jnp.minimum(0.99, opac_c[:, None] * jnp.exp(jnp.minimum(power, 0.0)))
    gate = (power <= 0.0) & (alpha >= ALPHA_MIN) & inside[None, :]
    return jnp.where(gate, alpha, 0.0)


def _chunk_blend(alpha, carry_logT, carry_done):
    """Shared forward compositing math for one chunk.

    alpha: (K, P) gated; carry_logT/carry_done: (P,).
    Returns (w, logT_excl, contribute, new_logT, new_done).
    """
    log1m = jnp.log1p(-alpha)
    cum = jnp.cumsum(log1m, axis=0)
    test_logT = carry_logT[None, :] + cum                 # inclusive: T after j
    # log1m <= 0 makes test_logT monotone non-increasing, so the crossing
    # flag is already cumulative — no prefix-max needed.
    done = carry_done[None, :] | (test_logT < LOG_EPS)
    contribute = (alpha > 0.0) & ~done
    logT_excl = carry_logT[None, :] + cum - log1m         # T before j
    w = jnp.where(contribute, alpha * jnp.exp(logT_excl), 0.0)
    new_logT = carry_logT + jnp.sum(jnp.where(contribute, log1m, 0.0), axis=0)
    new_done = done[-1, :]
    return w, logT_excl, contribute, new_logT, new_done


@partial(jax.jit, static_argnames=("height", "width", "tile", "chunk"))
def blend_tiles_xla(values: jnp.ndarray,    # (C, V) rows: rgb(3) + features
                    means2d: jnp.ndarray,   # (C, 2)
                    conics: jnp.ndarray,    # (C, 3)
                    opacities: jnp.ndarray,  # (C,)
                    binning: Binning,
                    height: int, width: int, tile: int, chunk: int) -> BlendOut:
    grid_y, grid_x = num_tiles(height, width, tile)
    T = grid_y * grid_x
    P = tile * tile
    C = values.shape[0]
    V = values.shape[1]
    I = binning.gid.shape[0]
    n_chunks = I // chunk

    gid = binning.gid.reshape(n_chunks, chunk)
    null = binning.is_null.reshape(n_chunks, chunk)

    # In-tile pixel offsets (row-major within the tile).
    off_y = (jnp.arange(P, dtype=jnp.int32) // tile).astype(jnp.float32)
    off_x = (jnp.arange(P, dtype=jnp.int32) % tile).astype(jnp.float32)

    # SEGMENTED scan: chunk_tile is non-decreasing (instances are sorted by
    # tile; padding chunks carry the sentinel tile T), so a tile's chunks are
    # contiguous and the scan only ever needs the CURRENT tile's per-pixel
    # state. Carrying (P,) state with a reset at tile boundaries — instead of
    # the old (T+1, P) full-image carry indexed at row t — matters for the
    # backward: jax.checkpoint(step) still saves the carry at EVERY step, and
    # at bench scale (16384 chunks x 7501 tiles x 256 px) the old layout's
    # saved logT alone was 125 GB (the r4 on-chip grad-gate OOM). Per-tile
    # results are emitted as scan outputs and gathered at each tile's last
    # chunk below; the per-tile math (chunk order, compositing, accumulation
    # order) is unchanged, so outputs are bit-identical.
    fresh = jnp.concatenate([
        jnp.ones((1,), bool),
        binning.chunk_tile[1:] != binning.chunk_tile[:-1]])

    def step(carry, inp):
        logT, done, acc = carry  # (P,), (P,), (V, P): current tile's state
        gids, nulls, t, new_tile = inp
        logT = jnp.where(new_tile, 0.0, logT)
        done = jnp.where(new_tile, False, done)
        acc = jnp.where(new_tile, 0.0, acc)
        m2 = means2d[gids]
        co = conics[gids]
        op = jnp.where(nulls, 0.0, opacities[gids])
        vals = values[gids]  # (chunk, V)

        ty = (t // grid_x).astype(jnp.float32)
        tx = (t % grid_x).astype(jnp.float32)
        pix_x = tx * tile + off_x
        pix_y = ty * tile + off_y
        inside = (pix_x < width) & (pix_y < height)

        alpha = _chunk_alpha(m2, co, op, pix_x, pix_y, inside)
        w, logT_excl, contribute, new_logT, new_done = _chunk_blend(
            alpha, logT, done)

        outv = vals.T @ w  # (V, P) MXU
        obs = jnp.sum((contribute & (logT_excl > jnp.log(0.5))).astype(jnp.int32), axis=1)

        acc = acc + outv
        return (new_logT, new_done, acc), (obs, new_logT, acc)

    logT0 = jnp.zeros((P,), values.dtype)
    done0 = jnp.zeros((P,), bool)
    acc0 = jnp.zeros((V, P), values.dtype)
    # Remat the chunk body: plain autodiff of the scan saves every chunk's
    # (chunk, P) alpha/weight intermediates — O(I*P) residual memory OOMs
    # above ~650k instances on one chip, capping gradient-parity checks
    # below bench scale. Recomputing them in the backward sweep costs one
    # extra forward pass and bounds residuals to the scan carries.
    _, (obs_chunks, logT_chunks, acc_chunks) = jax.lax.scan(
        jax.checkpoint(step), (logT0, done0, acc0),
        (gid, null, binning.chunk_tile, fresh))

    observe = jnp.zeros((C,), jnp.int32).at[gid.reshape(-1)].add(
        obs_chunks.reshape(-1))

    # Gather each tile's state at its LAST chunk (scatter-max over the sorted
    # chunk->tile map; empty tiles masked via tile_nonempty, sentinel chunks
    # land in row T which is sliced off).
    last_chunk = jnp.zeros((T + 1,), jnp.int32).at[binning.chunk_tile].max(
        jnp.arange(n_chunks, dtype=jnp.int32))
    nonempty = binning.tile_nonempty[:T]
    acc_tiles = jnp.where(nonempty[:, None, None],
                          acc_chunks[last_chunk[:T]], 0.0)      # (T, V, P)
    logT_tiles = jnp.where(nonempty[:, None],
                           logT_chunks[last_chunk[:T]], 0.0)    # (T, P)

    # Untile to (V, Hp, Wp) and (Hp, Wp).
    img = acc_tiles.reshape(grid_y, grid_x, V, tile, tile)
    img = img.transpose(2, 0, 3, 1, 4).reshape(V, grid_y * tile, grid_x * tile)
    fT = jnp.exp(logT_tiles).reshape(grid_y, grid_x, tile, tile)
    fT = fT.transpose(0, 2, 1, 3).reshape(grid_y * tile, grid_x * tile)
    return BlendOut(image=img, final_T=fT, observe=observe)
