"""Pallas TPU kernels for tiled alpha blending: forward + hand-derived backward.

The production twin of ops/blend_xla.py (identical math: chunked
log-transmittance compositing). Semantics trace back to the CUDA render
kernels (/root/reference/submodules/diff-gaussian-rasterization/
cuda_rasterizer/forward.cu:246-372, backward.cu:412-598), re-derived for TPU:

* one grid step per CHUNK of depth-sorted instances; chunk-aligned binning
  guarantees each chunk belongs to exactly one 16x16 pixel tile, so the
  output tile block stays resident in VMEM across consecutive grid steps
* layout: instances ride the sublane axis, pixels the lane axis
  (alpha/weight blocks are (chunk, P=256)); per-instance tables are stored
  TRANSPOSED — geom (8, I), values (V, I), V = 8 (warmup/geometry) or 16
  (material; ops/rasterize.value_width) — so HBM tiles are dense
* the whole chunk's accumulation is ONE MXU matmul Vals(V,chunk) @ W(chunk,P)
* early termination (T < 1e-4) is a cummax over the crossing flag; a chunk
  whose tile is fully terminated skips its math under @pl.when
* the backward pass sweeps chunks in REVERSE grid order, reconstructing
  per-instance transmittance from per-chunk saved carries (logT + done at
  chunk start, (n_chunks, P) each — the TPU replacement for the CUDA
  back-to-front T-division, backward.cu:532), carrying the per-pixel suffix
  accumulator S = final_T*dL_dT + sum_{k>j} w_k (g.v_k), and emitting
  per-instance grads that are scatter-added per Gaussian OUTSIDE the kernel
  (deterministic segmented reduction — no atomics, unlike backward.cu:582-595)
* the backward also accumulates the per-pixel ABSOLUTE mean2D gradients
  (AbsGS channels, backward.cu:586-587) — surfaced through the
  `m2d_abs_sink` zero input's cotangent.

Gradient oracle: jax.grad of blend_tiles_xla (tests/test_pallas.py).
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gs2m_tpu.ops.binning import Binning, num_tiles
from gs2m_tpu.ops.blend_xla import ALPHA_MIN, LOG_EPS, BlendOut

LOG_HALF = float(np.log(0.5))
DONE_FLAG = 1.0  # carried as float (0/1)


# =============================================================================
# Forward kernel
# =============================================================================

def _pixel_coords(t, tile: int, grid_x: int, P: int):
    """Lane-axis pixel coordinates (1, P) for tile id t (row-major in-tile)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    ty = t // grid_x
    tx = t % grid_x
    px = (tx * tile + lane % tile).astype(jnp.float32)
    py = (ty * tile + lane // tile).astype(jnp.float32)
    return px, py


def _chunk_alpha_kernel(g8, px, py, width: int, height: int):
    """Gated alpha (chunk, P) from the geometry block transposed to
    (chunk, 8) — one relayout, then free (chunk, 1) column slices."""
    gt = g8.T             # (chunk, 8)
    mx = gt[:, 0:1]       # (chunk, 1)
    my = gt[:, 1:2]
    ca = gt[:, 2:3]
    cb = gt[:, 3:4]
    cc = gt[:, 4:5]
    op = gt[:, 5:6]
    dx = mx - px          # (chunk, P)
    dy = my - py
    power_raw = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    # Clamp before exp: power > 0 lanes are gated (on the RAW value), but
    # their exp would be inf and ride into the backward's G * dalpha
    # products as inf * 0 = NaN.
    power = jnp.minimum(power_raw, 0.0)
    alpha = jnp.minimum(0.99, op * jnp.exp(power))
    inside = (px < width) & (py < height)
    gate = (power_raw <= 0.0) & (alpha >= ALPHA_MIN) & inside
    return jnp.where(gate, alpha, 0.0), dx, dy, power


def _tril_ones(n: int) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r >= c).astype(jnp.float32)


def _cumsum0(x):
    """Inclusive prefix sum along the sublane axis as ONE MXU matmul with a
    lower-triangular ones matrix (Mosaic has no native cumsum; log-step
    rolls cost ~16 VPU passes — the 256^3 f32 matmul is far cheaper)."""
    # precision=HIGHEST pinned explicitly: measured identical speed AND
    # results on v5e (Mosaic already emits full-precision f32 here), but the
    # package's correctness depends on it (bf16 compositing would break the
    # SSIM-boundedness guarantee), so don't leave it to a default.
    return jnp.dot(_tril_ones(x.shape[0]), x,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _compose(alpha, logT0, done0):
    """Shared compositing recurrence (mirrors blend_xla._chunk_blend).
    alpha (chunk, P); logT0/done0 (1, P). Returns
    (w, logT_excl, contribute, logT_end, done_end)."""
    log1m = jnp.log1p(-alpha)
    cum = _cumsum0(log1m)
    test_logT = logT0 + cum
    # log1m <= 0 makes test_logT monotone non-increasing within the chunk,
    # so the crossing flag is already cumulative.
    done = (done0 > 0.0) | (test_logT < LOG_EPS)
    contribute = (alpha > 0.0) & ~done
    logT_excl = test_logT - log1m
    w = jnp.where(contribute, alpha * jnp.exp(logT_excl), 0.0)
    logT_end = logT0 + jnp.sum(jnp.where(contribute, log1m, 0.0), axis=0,
                               keepdims=True)
    done_end = done[-1:, :].astype(jnp.float32)
    return w, logT_excl, contribute, logT_end, done_end


def _fwd_kernel(chunk_tile_ref,            # scalar prefetch (n_chunks,)
                geom_ref, vals_ref,        # (8, chunk), (16, chunk)
                img_ref, fT_ref, clogT_ref, cdone_ref, obs_ref,  # outputs
                logT_s, done_s,            # scratch (1, P)
                *, tile: int, grid_x: int, width: int, height: int, P: int):
    i = pl.program_id(0)
    t = chunk_tile_ref[i]
    prev_t = chunk_tile_ref[jnp.maximum(i - 1, 0)]
    first_of_tile = jnp.logical_or(i == 0, t != prev_t)

    @pl.when(first_of_tile)
    def _():
        img_ref[...] = jnp.zeros_like(img_ref)
        logT_s[...] = jnp.zeros_like(logT_s)
        done_s[...] = jnp.zeros_like(done_s)

    # Save chunk-start carries for the backward sweep.
    clogT_ref[0] = logT_s[...]
    cdone_ref[0] = done_s[...]

    all_done = jnp.all(done_s[...] > 0.0)

    @pl.when(jnp.logical_not(all_done))
    def _():
        px, py = _pixel_coords(t, tile, grid_x, P)
        alpha, _, _, _ = _chunk_alpha_kernel(geom_ref[...], px, py, width, height)
        w, logT_excl, contribute, logT_end, done_end = _compose(
            alpha, logT_s[...], done_s[...])
        img_ref[0] += jnp.dot(vals_ref[...], w,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
        obs_ref[0] = jnp.sum(
            (contribute & (logT_excl > LOG_HALF)).astype(jnp.int32),
            axis=1)[None, :]
        logT_s[...] = logT_end
        done_s[...] = done_end

    @pl.when(all_done)
    def _():
        obs_ref[...] = jnp.zeros_like(obs_ref)

    fT_ref[0] = jnp.exp(logT_s[...])


def _run_forward(geom_t, vals_t, chunk_tile, *, T: int, n_chunks: int,
                 chunk: int, tile: int, grid_x: int, width: int, height: int,
                 interpret: bool):
    P = tile * tile
    V = vals_t.shape[0]
    kernel = functools.partial(_fwd_kernel, tile=tile, grid_x=grid_x,
                               width=width, height=height, P=P)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((8, chunk), lambda i, ct: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, chunk), lambda i, ct: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, V, P), lambda i, ct: (ct[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, ct: (ct[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, ct: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, ct: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((T + 1, V, P), jnp.float32),       # per-tile image
        jax.ShapeDtypeStruct((T + 1, 1, P), jnp.float32),       # final T
        jax.ShapeDtypeStruct((n_chunks, 1, P), jnp.float32),    # carry logT
        jax.ShapeDtypeStruct((n_chunks, 1, P), jnp.float32),    # carry done
        jax.ShapeDtypeStruct((n_chunks, 1, chunk), jnp.int32),  # observe counts
    ]
    return pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape,
                          interpret=interpret)(chunk_tile, geom_t, vals_t)


# =============================================================================
# Observe-only kernel (multi-view trim counting)
# =============================================================================
#
# The per-1000-iteration observe trim (trainer.make_observe_counter, reference
# train.py:236-245) only consumes the per-Gaussian observe COUNTS — an int32
# visibility bit per view. Those depend solely on geometry (mean2d, conic,
# opacity, depth order), never on the blended values, so the full forward
# kernel's work per view is mostly waste there: the SH color eval, the V-wide
# half of the instance gather, the per-chunk MXU value accumulation, and the
# (n_chunks, P) backward carries. This kernel keeps only the alpha sweep +
# transmittance recurrence + observe emission. Same compositing math
# (_chunk_alpha_kernel/_compose) => counts are bit-identical to the forward's.

def _obs_kernel(chunk_tile_ref,            # scalar prefetch (n_chunks,)
                geom_ref,                  # (8, chunk)
                obs_ref,                   # (1, 1, chunk) int32 out
                logT_s, done_s,            # scratch (1, P)
                *, tile: int, grid_x: int, width: int, height: int, P: int):
    i = pl.program_id(0)
    t = chunk_tile_ref[i]
    prev_t = chunk_tile_ref[jnp.maximum(i - 1, 0)]
    first_of_tile = jnp.logical_or(i == 0, t != prev_t)

    @pl.when(first_of_tile)
    def _():
        logT_s[...] = jnp.zeros_like(logT_s)
        done_s[...] = jnp.zeros_like(done_s)

    all_done = jnp.all(done_s[...] > 0.0)

    @pl.when(jnp.logical_not(all_done))
    def _():
        px, py = _pixel_coords(t, tile, grid_x, P)
        alpha, _, _, _ = _chunk_alpha_kernel(geom_ref[...], px, py, width,
                                             height)
        _, logT_excl, contribute, logT_end, done_end = _compose(
            alpha, logT_s[...], done_s[...])
        obs_ref[0] = jnp.sum(
            (contribute & (logT_excl > LOG_HALF)).astype(jnp.int32),
            axis=1)[None, :]
        logT_s[...] = logT_end
        done_s[...] = done_end

    @pl.when(all_done)
    def _():
        obs_ref[...] = jnp.zeros_like(obs_ref)


def _gather_geom(means2d, conics, opacities, gid, is_null):
    """Geometry-only instance table (8, I) — the observe pass never touches
    values, so the gather source stays 8 rows instead of 8+V (gather cost
    scales with source-table width; see _gather_instances)."""
    C = means2d.shape[0]
    src = jnp.concatenate(
        [means2d, conics, opacities[:, None],
         jnp.zeros((C, 2), means2d.dtype)], axis=-1).T          # (8, C)
    src = jax.lax.optimization_barrier(src)
    gid = jax.lax.optimization_barrier(gid)
    tab = jax.lax.optimization_barrier(src[:, gid])             # (8, I)
    return jnp.where(is_null[None, :], 0.0, tab)


def observe_tiles_pallas(means2d, conics, opacities, binning: Binning,
                         height: int, width: int, tile: int, chunk: int,
                         interpret: bool | None = None) -> jnp.ndarray:
    """Per-Gaussian observe counts (C,) int32 — identical to
    blend_tiles_pallas(...).observe, at a fraction of the cost (no values, no
    image, no backward carries). Non-differentiable (int32 output)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    grid_y, grid_x = num_tiles(height, width, tile)
    I = binning.gid.shape[0]
    n_chunks = I // chunk
    P = tile * tile

    geom_t = _gather_geom(means2d, conics, opacities, binning.gid,
                          binning.is_null)
    kernel = functools.partial(_obs_kernel, tile=tile, grid_x=grid_x,
                               width=width, height=height, P=P)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((8, chunk), lambda i, ct: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i, ct: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    obs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_chunks, 1, chunk), jnp.int32)],
        interpret=interpret)(binning.chunk_tile, geom_t)[0]
    C = means2d.shape[0]
    return jnp.zeros((C,), jnp.int32).at[binning.gid].add(
        jnp.where(binning.is_null, 0, obs.reshape(-1)))


# =============================================================================
# Backward kernel (reverse chunk sweep)
# =============================================================================

def _bwd_kernel(chunk_tile_ref,             # scalar prefetch (n_chunks,)
                geom_ref, vals_ref, clogT_ref, cdone_ref,
                g_img_ref, gT_ref, fT_ref,
                dgeom_ref, dvals_ref,       # outputs (8, chunk), (16, chunk)
                S_s,                        # scratch (1, P): suffix accumulator
                *, tile: int, grid_x: int, width: int, height: int, P: int,
                n_chunks: int):
    # The sweep walks chunks back-to-front via REVERSED index maps (affine
    # n-1-i — no pre-reversed copies on the XLA side; only a double
    # scalar-prefetch indirection ct[rev[r]] aborts Mosaic, affine is fine).
    i = pl.program_id(0)
    j = n_chunks - 1 - i                    # original chunk index
    t = chunk_tile_ref[j]
    nxt_t = chunk_tile_ref[jnp.minimum(j + 1, n_chunks - 1)]
    # Walking backwards, a tile is ENTERED at its last chunk.
    last_of_tile = jnp.logical_or(i == 0, t != nxt_t)

    @pl.when(last_of_tile)
    def _():
        # Initialize suffix with the background/final-T term:
        # dL/dalpha_j -= (final_T * dL/dT) / (1 - alpha_j).
        S_s[...] = fT_ref[0] * gT_ref[0]

    # Skip-done culling: if every pixel of the tile had already terminated
    # at this chunk's START, all weights are 0 — zero the outputs and skip
    # both MXU passes (mirrors the forward's early-exit, forward.cu:335-338).
    all_done = jnp.all(cdone_ref[0] > 0.0)

    @pl.when(all_done)
    def _():
        dgeom_ref[...] = jnp.zeros_like(dgeom_ref)
        dvals_ref[...] = jnp.zeros_like(dvals_ref)

    @pl.when(jnp.logical_not(all_done))
    def _():
        px, py = _pixel_coords(t, tile, grid_x, P)
        g8 = geom_ref[...]
        alpha, dx, dy, power = _chunk_alpha_kernel(g8, px, py, width, height)
        w, logT_excl, contribute, _, _ = _compose(alpha, clogT_ref[0],
                                                  cdone_ref[0])

        g = g_img_ref[0]                      # (16, P) cotangent for this tile
        # u_j,p = g . v_j  -> (chunk, P) via MXU.
        u = jnp.dot(vals_ref[...].T, g, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

        wu = w * u
        # Suffix AFTER j within this chunk: S_s + sum_{k>j} w_k u_k
        # (= total - inclusive prefix; avoids sublane reversals).
        total = jnp.sum(wu, axis=0, keepdims=True)
        S_after = S_s[...] + total - _cumsum0(wu)

        T_excl = jnp.exp(logT_excl)
        dalpha = jnp.where(contribute,
                           T_excl * u - S_after / (1.0 - alpha), 0.0)

        # dvals (chunk, 16) = W @ g^T; store transposed into (16, chunk).
        dvals = jnp.dot(w, g.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        dvals_ref[...] = dvals.T

        # Chain through alpha = opacity * exp(power) (clamp/gates -> w==0
        # rows already have dalpha == 0; additionally gate the 0.99 clamp
        # like the golden twin's jnp.minimum).
        op = g8[5:6, :].T
        G = jnp.exp(power)
        unclamped = (op * G) < 0.99
        dalpha = jnp.where(unclamped, dalpha, 0.0)
        dop = jnp.sum(G * dalpha, axis=1)                      # (chunk,)
        dpower = alpha * dalpha
        ca = g8[2:3, :].T
        cb = g8[3:4, :].T
        cc = g8[4:5, :].T
        d_ca = jnp.sum(-0.5 * dx * dx * dpower, axis=1)
        d_cb = jnp.sum(-dx * dy * dpower, axis=1)
        d_cc = jnp.sum(-0.5 * dy * dy * dpower, axis=1)
        ddx = -(ca * dx + cb * dy) * dpower                    # (chunk, P)
        ddy = -(cc * dy + cb * dx) * dpower
        d_mx = jnp.sum(ddx, axis=1)
        d_my = jnp.sum(ddy, axis=1)
        d_mx_abs = jnp.sum(jnp.abs(ddx), axis=1)               # AbsGS channel
        d_my_abs = jnp.sum(jnp.abs(ddy), axis=1)

        dgeom_ref[...] = jnp.stack(
            [d_mx, d_my, d_ca, d_cb, d_cc, dop, d_mx_abs, d_my_abs], axis=0)

        S_s[...] = S_s[...] + jnp.sum(wu, axis=0, keepdims=True)


def _run_backward(geom_t, vals_t, chunk_tile, clogT, cdone, g_img, gT, fT, *,
                  T: int, n_chunks: int, chunk: int, tile: int, grid_x: int,
                  width: int, height: int, interpret: bool):
    P = tile * tile
    I = n_chunks * chunk
    n = n_chunks
    V = vals_t.shape[0]

    kernel = functools.partial(_bwd_kernel, tile=tile, grid_x=grid_x,
                               width=width, height=height, P=P, n_chunks=n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((8, chunk), lambda i, ct: (0, n - 1 - i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, chunk), lambda i, ct: (0, n - 1 - i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, ct: (n - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, ct: (n - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, P), lambda i, ct: (ct[n - 1 - i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, ct: (ct[n - 1 - i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, ct: (ct[n - 1 - i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, chunk), lambda i, ct: (0, n - 1 - i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, chunk), lambda i, ct: (0, n - 1 - i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((1, P), jnp.float32)],
    )
    out_shape = [
        jax.ShapeDtypeStruct((8, I), jnp.float32),
        jax.ShapeDtypeStruct((V, I), jnp.float32),
    ]
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret)(chunk_tile, geom_t, vals_t, clogT, cdone,
                             g_img, gT, fT)


# =============================================================================
# custom_vjp wrapper
# =============================================================================

def _gather_instances(values, means2d, conics, opacities, gid, is_null):
    """Per-instance transposed tables: geom (8, I), vals (V, I), via ONE
    lane-major (8+V, C)[:, gid] gather — a single fused gather beats two
    separate (8,C)+(V,C) gathers by ~25% on TPU, and column gathers from a
    (K, C) table are ~5x cheaper than (C, K) row gathers."""
    C = values.shape[0]
    src = jnp.concatenate(
        [means2d, conics, opacities[:, None], jnp.zeros((C, 2), values.dtype),
         values], axis=-1).T                       # (8+V, C): geom 8 | vals V
    # Barriers pin the gather to its clean isolated form — measured 31 ms at
    # 3.1M x 24 on one chip; letting XLA fuse producers/consumers into the
    # gather kernel ballooned the same op to 117 ms in the full step.
    src = jax.lax.optimization_barrier(src)
    gid = jax.lax.optimization_barrier(gid)
    tab = jax.lax.optimization_barrier(src[:, gid])  # (8+V, I) one gather
    # Null slots zero the geom column: opacity 0 gates them out of the blend.
    geom_t = jnp.where(is_null[None, :], 0.0, tab[:8])
    vals_t = tab[8:]
    return geom_t, vals_t


def _untile(img_tiles, fT_tiles, tile_nonempty, grid_y, grid_x, tile):
    T = grid_y * grid_x
    # jnp.where, NOT a multiply-by-mask: tiles no chunk ever visited (empty
    # tiles, or nonempty tiles cut whole by instance-cap overflow) keep
    # UNINITIALIZED kernel output blocks — NaN in interpret mode, garbage on
    # hardware — and NaN * 0 == NaN.
    V = img_tiles.shape[1]
    ne = tile_nonempty[:, None, None]
    img = jnp.where(ne, img_tiles[:T], 0.0)
    fT = jnp.where(tile_nonempty[:, None], fT_tiles[:T],
                   jnp.ones_like(fT_tiles[:T]))
    img = img.reshape(grid_y, grid_x, V, tile, tile)
    img = img.transpose(2, 0, 3, 1, 4).reshape(V, grid_y * tile, grid_x * tile)
    fT = fT.reshape(grid_y, grid_x, tile, tile)
    fT = fT.transpose(0, 2, 1, 3).reshape(grid_y * tile, grid_x * tile)
    return img, fT


def _retile(g_img, g_fT, grid_y, grid_x, tile):
    """Inverse of _untile for the cotangents; appends the dummy tile row."""
    V = g_img.shape[0]
    gi = g_img.reshape(V, grid_y, tile, grid_x, tile)
    gi = gi.transpose(1, 3, 0, 2, 4).reshape(grid_y * grid_x, V, tile * tile)
    gt = g_fT.reshape(grid_y, tile, grid_x, tile)
    gt = gt.transpose(0, 2, 1, 3).reshape(grid_y * grid_x, 1, tile * tile)
    pad_i = jnp.zeros((1,) + gi.shape[1:], gi.dtype)
    pad_t = jnp.zeros((1,) + gt.shape[1:], gt.dtype)
    return jnp.concatenate([gi, pad_i], 0), jnp.concatenate([gt, pad_t], 0)


def _segmented_reduce(dvals, dgeom, key, gauss_present, dropped, chunk,
                      exact_rank: bool = False):
    """Deterministic per-Gaussian sum of per-instance gradients -> (K, C).

    The reduce needs only GROUPING by Gaussian, and the expansion order is
    Gaussian-index-major, so the sort key is the per-slot Gaussian id
    directly (`key` = gid with the sentinel C on null slots) — r4: this
    replaced the expansion-id key, deleting binning's second aligned-layout
    scatter and its eslot sort payload (~10 ms/view). The reorder rides the
    K grad channels as `lax.sort` payloads (~53 ms at 3.1M x 24): TPU
    gather cost scales with SOURCE-TABLE width, so a permutation gather
    from the 3.1M-wide per-instance table costs ~109 ms — twice the sort —
    even though the same-index gather from the 500k-wide per-GAUSSIAN table
    costs only 25 ms (measured; see _gather_instances)."""
    V = dvals.shape[0]
    K = V + 8
    I = key.shape[0]
    C = gauss_present.shape[0]
    per_inst = jnp.concatenate([dvals, dgeom], axis=0)  # (K, I)
    sorted_ops = jax.lax.sort((key,) + tuple(per_inst[k] for k in range(K)),
                              num_keys=1, is_stable=False)
    grads_exp = jnp.stack(sorted_ops[1:], axis=0)       # (K, I) grouped by id

    # Rank of each segment boundary among the sorted keys. Fast path
    # (dropped == 0, the steady state — the trainer grows the buffer on any
    # drop): per-Gaussian slot counts are exactly binning's cull-survivor
    # counts — an exclusive cumsum over C. Exact path (transient overflow):
    # count the ids actually present in the aligned layout (C-wide
    # scatter-add; null slots carry the out-of-range sentinel and drop).
    def rank_fast(_):
        return jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(gauss_present)])

    def rank_exact(_):
        cnt = jnp.zeros((C,), jnp.int32).at[key].add(1, mode="drop")
        return jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)])

    # exact_rank: the compacted-backward path (chunks dropped after early
    # termination) has per-Gaussian counts that no longer match binning's
    # cull-survivor counts — always count the ids actually present.
    if exact_rank:
        r = rank_exact(None)
    else:
        r = jax.lax.cond(dropped == 0, rank_fast, rank_exact, None)  # (C+1,)

    if os.environ.get("GS2M_SEGREDUCE") == "two_level":
        # DIAGNOSIS ONLY: the round-4 two-level scheme whose global-prefix
        # conditioning breached the on-chip grad gate (BASELINE.md r4 rows;
        # A/B'd against the three-level scheme below in round 5). Never set
        # in production.
        B2 = chunk
        nb2 = I // B2
        loc = jnp.cumsum(grads_exp.reshape(K, nb2, B2), axis=2)
        blk2 = loc[:, :, -1]
        blk_excl = jnp.cumsum(blk2, axis=1) - blk2
        rm1 = jnp.clip(r - 1, 0, I - 1)
        pos = (r > 0)[None, :]
        S = jnp.where(pos, blk_excl[:, rm1 // B2] + loc.reshape(K, I)[:, rm1],
                      0.0)
        return S[:, 1:] - S[:, :-1]

    # Three-level prefix decomposition with LEVELWISE differences. The naive
    # two-level form S(r) = blk_excl[b] + loc[b, i] is catastrophically
    # ill-conditioned at scale: blk_excl accumulates to the GLOBAL total, so
    # the pre-addition rounds S at ULP(global) and every extracted segment
    # sum carries an absolute error of a few ULPs of the global sum — for
    # same-sign channels (color grads vs a constant target) that is ~1e-6 of
    # the total per row, i.e. 1-30% relative error on typical per-Gaussian
    # grads at 2M instances / 500k Gaussians (measured on-chip, r4: f_dc
    # wellcond p999 0.30 vs 3e-7 with an exact reduce). Fix: express the
    # exclusive prefix at rank r as three LEVEL-LOCAL terms
    #   P(r) = loc2e[s] + loc1e[b] + loc0[b, i]      (b = (r-1)//B, s = b//SB)
    # and difference each term ACROSS the segment BEFORE summing levels:
    # a segment inside one block cancels loc2e/loc1e exactly (identical
    # floats); one spanning blocks within a superblock cancels loc2e exactly
    # and rounds loc1e at ULP(superblock prefix ~ global/SB); only segments
    # spanning a superblock boundary (~nsb/C of rows) see ULP(global).
    B = chunk  # I is a multiple of chunk by construction
    SB = 128
    nb = I // B
    nbp = -(-nb // SB) * SB
    nsb = nbp // SB
    loc0 = jnp.cumsum(grads_exp.reshape(K, nb, B), axis=2)   # (K, nb, B)
    blk = loc0[:, :, -1]                                      # (K, nb)
    blkp = jnp.pad(blk, ((0, 0), (0, nbp - nb)))
    loc1 = jnp.cumsum(blkp.reshape(K, nsb, SB), axis=2)       # within-superblock
    loc1e = (loc1 - blkp.reshape(K, nsb, SB)).reshape(K, nbp)  # exclusive
    sbt = loc1[:, :, -1]                                      # (K, nsb)
    # Top level, MEAN-CENTERED: for same-sign data the raw superblock-total
    # cumsum grows to the global sum, so segments straddling a superblock
    # boundary would still difference two ULP(global)-rounded prefixes. The
    # centered totals random-walk near zero (prefix ~ std * sqrt(nsb)), and
    # the subtracted mean rides on the exact small-integer superblock count:
    #   P2(r) = loc2e_centered[s] + mu * s,  differenced as
    #   (c[sh] - c[sl]) + mu * (sh - sl)   — mu*ds rounds relative to the
    # spanned content itself, never the global total.
    mu = jnp.mean(sbt, axis=1, keepdims=True)                 # (K, 1)
    sbc = sbt - mu
    loc2e = jnp.cumsum(sbc, axis=1) - sbc                     # (K, nsb) excl
    rm1 = jnp.clip(r - 1, 0, I - 1)
    pos = (r > 0)[None, :]
    b = rm1 // B
    s = b // SB
    # Only P0 needs the pos mask: loc0 is an INCLUSIVE cumsum, so at r == 0
    # (rm1 clipped to 0) it reads the first element, not 0. loc1e/loc2e are
    # EXCLUSIVE, so their index-0 entries are exactly 0.0 by construction,
    # and the mu*ds term vanishes at r == 0 via s == 0.
    P0 = jnp.where(pos, loc0.reshape(K, I)[:, rm1], 0.0)
    P1 = loc1e[:, b]
    P2 = loc2e[:, s]
    ds = (s[1:] - s[:-1]).astype(per_inst.dtype)[None, :]     # (1, C) exact
    return ((P2[:, 1:] - P2[:, :-1]) + mu * ds
            + (P1[:, 1:] - P1[:, :-1])
            + (P0[:, 1:] - P0[:, :-1]))                       # (K, C)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(11, 12, 13, 14, 15, 16))
def _blend_pallas_core(values, means2d, conics, opacities, abs_sink,
                       gid, is_null, chunk_tile, tile_nonempty,
                       gauss_present, dropped,
                       height: int, width: int, tile: int, chunk: int,
                       interpret: bool, exact_rank: bool = False):
    out, _ = _blend_fwd(values, means2d, conics, opacities, abs_sink,
                        gid, is_null, chunk_tile, tile_nonempty,
                        gauss_present, dropped,
                        height, width, tile, chunk, interpret, exact_rank)
    return out


def _blend_fwd(values, means2d, conics, opacities, abs_sink,
               gid, is_null, chunk_tile, tile_nonempty,
               gauss_present, dropped,
               height, width, tile, chunk, interpret, exact_rank=False):
    grid_y, grid_x = num_tiles(height, width, tile)
    T = grid_y * grid_x
    I = gid.shape[0]
    n_chunks = I // chunk

    geom_t, vals_t = _gather_instances(values, means2d, conics, opacities,
                                       gid, is_null)
    img_tiles, fT_tiles, clogT, cdone, obs = _run_forward(
        geom_t, vals_t, chunk_tile, T=T, n_chunks=n_chunks, chunk=chunk,
        tile=tile, grid_x=grid_x, width=width, height=height,
        interpret=interpret)

    img, fT = _untile(img_tiles, fT_tiles[:, 0], tile_nonempty, grid_y,
                      grid_x, tile)
    C = values.shape[0]
    observe = jnp.zeros((C,), jnp.int32).at[gid].add(
        jnp.where(is_null, 0, obs.reshape(-1)))

    res = (values, gid, is_null, chunk_tile, gauss_present, dropped,
           geom_t, vals_t, clogT, cdone, fT_tiles)
    return (img, fT, observe), res


def _blend_bwd(height, width, tile, chunk, interpret, exact_rank, res, cts):
    (values, gid, is_null, chunk_tile, gauss_present, dropped,
     geom_t, vals_t, clogT, cdone, fT_tiles) = res
    g_img, g_fT, _ = cts
    grid_y, grid_x = num_tiles(height, width, tile)
    T = grid_y * grid_x
    I = gid.shape[0]
    n_chunks = I // chunk

    g_img_tiles, g_fT_tiles = _retile(g_img, g_fT, grid_y, grid_x, tile)
    dgeom, dvals = _run_backward(
        geom_t, vals_t, chunk_tile, clogT, cdone, g_img_tiles, g_fT_tiles,
        fT_tiles, T=T, n_chunks=n_chunks, chunk=chunk, tile=tile,
        grid_x=grid_x, width=width, height=height, interpret=interpret)

    C = values.shape[0]

    # Per-Gaussian segmented reduction WITHOUT scatters: sort the per-
    # instance grads by their Gaussian id (null slots carry sentinel C and
    # zero grads, sorting harmlessly to the tail), then prefix-difference at
    # the per-id segment boundaries — see _segmented_reduce.
    V = dvals.shape[0]
    key = jnp.where(is_null, C, gid)
    acc = _segmented_reduce(dvals, dgeom, key, gauss_present, dropped, chunk,
                            exact_rank=exact_rank)

    d_values = acc[0:V].T
    d_means2d = acc[V:V + 2].T
    d_conics = acc[V + 2:V + 5].T
    d_opac = acc[V + 5]
    d_abs = acc[V + 6:V + 8].T

    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (d_values, d_means2d, d_conics, d_opac, d_abs,
            f0(gid), f0(is_null), f0(chunk_tile), f0(jnp.zeros(T, bool)),
            f0(gauss_present), f0(dropped))


_blend_pallas_core.defvjp(_blend_fwd, _blend_bwd)


# =============================================================================
# Pair blend: two views of the SAME Gaussians in one custom_vjp
# =============================================================================
#
# The geometry-stage train step renders the main AND the nearest camera every
# iteration (trainer.py make_view_objective). Fusing both views into one vjp
# shares the two expensive index-space passes whose TPU cost does NOT scale
# with the index count:
#   * ONE instance-table gather over a (8+V, 2C) source for BOTH views'
#     instances (gather cost scales with source width, not indices — two
#     separate I-sized gathers cost ~2x one 2I-sized gather)
#   * ONE backward sort + rank + two-level prefix over the concatenated 2I
#     instances (merged keys: view-b expansion ids offset by Ia)
# The Pallas kernels themselves run once per view, unchanged. The merged
# arrays stack view b's Gaussian rows after view a's (2C rows), so per-view
# gradients split back by row range via the concatenate transpose.

def _compact_alive(cdone, chunk_tile, T: int):
    """Per-chunk liveness from the forward's saved carries: a chunk is DEAD
    when every pixel of its tile had terminated (T < 1e-4) at the chunk's
    start — its backward outputs are exactly zero (the kernel zeroes them
    under @pl.when all_done), so dropping it from the backward's index-space
    pipeline (gather/sort/prefix) changes nothing. Termination is monotone
    within a tile, so dead chunks are a SUFFIX of each tile's run and
    compaction keeps every tile's kept chunks contiguous."""
    dead = jnp.all(cdone[:, 0, :] > 0.0, axis=1)
    alive = ~dead & (chunk_tile < T)
    return alive


def _compact_view(alive, n2: int, chunk: int, chunk_tile, clogT, cdone,
                  geom_s, vals_s, gid_s, null_s, T: int):
    """Select the alive chunks (original order, alive-first) into a dense
    n2-chunk layout. Padding positions (when fewer than n2 chunks are alive)
    carry tile T + all-null, which the kernels and the reduce both treat as
    zero-contribution. Returns the compacted operands + the count of alive
    chunks that did NOT fit (each a real gradient loss — the trainer grows
    bwd_cap on it, mirroring the binning-overflow policy)."""
    n_chunks = alive.shape[0]
    order = jnp.argsort(~alive, stable=True)
    perm = order[:n2]
    n_keep = jnp.sum(alive.astype(jnp.int32))
    pad = jnp.arange(n2, dtype=jnp.int32) >= n_keep
    ct_c = jnp.where(pad, T, chunk_tile[perm])
    clogT_c = clogT[perm]
    cdone_c = cdone[perm]
    geom_c = geom_s.reshape(8, n_chunks, chunk)[:, perm].reshape(8, -1)
    V = vals_s.shape[0]
    vals_c = vals_s.reshape(V, n_chunks, chunk)[:, perm].reshape(V, -1)
    gid_c = gid_s.reshape(n_chunks, chunk)[perm].reshape(-1)
    null_c = (null_s.reshape(n_chunks, chunk)[perm]
              | pad[:, None]).reshape(-1)
    lost = jnp.maximum(n_keep - n2, 0)
    return ct_c, clogT_c, cdone_c, geom_c, vals_c, gid_c, null_c, lost


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def _blend_pair_core(values2, means2d2, conics2, opacities2, abs_sink2,
                     height: int, width: int, tile: int, chunk: int,
                     interpret: bool, observe_b: bool, bwd_cap: int | None,
                     exact_rank: bool,
                     bin_a: Binning, bin_b: Binning):
    out, _ = _pair_fwd(values2, means2d2, conics2, opacities2, abs_sink2,
                       height, width, tile, chunk, interpret, observe_b,
                       bwd_cap, exact_rank, bin_a, bin_b)
    return out


def _pair_fwd(values2, means2d2, conics2, opacities2, abs_sink2,
              height, width, tile, chunk, interpret, observe_b, bwd_cap,
              exact_rank, bin_a, bin_b):
    grid_y, grid_x = num_tiles(height, width, tile)
    T = grid_y * grid_x
    C = values2.shape[0] // 2
    Ia = bin_a.gid.shape[0]
    Ib = bin_b.gid.shape[0]

    gid2 = jnp.concatenate([bin_a.gid, bin_b.gid + C])
    null2 = jnp.concatenate([bin_a.is_null, bin_b.is_null])
    geom2, vals2 = _gather_instances(values2, means2d2, conics2, opacities2,
                                     gid2, null2)

    outs = []
    for b, sl in ((bin_a, slice(0, Ia)), (bin_b, slice(Ia, Ia + Ib))):
        img_tiles, fT_tiles, clogT, cdone, obs = _run_forward(
            geom2[:, sl], vals2[:, sl], b.chunk_tile, T=T,
            n_chunks=(sl.stop - sl.start) // chunk, chunk=chunk, tile=tile,
            grid_x=grid_x, width=width, height=height, interpret=interpret)
        img, fT = _untile(img_tiles, fT_tiles[:, 0], b.tile_nonempty,
                          grid_y, grid_x, tile)
        obs_flat = jnp.where(b.is_null, 0, obs.reshape(-1))
        outs.append((img, fT, obs_flat, clogT, cdone, fT_tiles))

    # A 1-channel scatter-add costs ~8 ms/M updates on TPU; when the caller
    # doesn't consume view b's observe (the train step only masks stats with
    # the MAIN view's, reference train.py:225) skip its half of the updates.
    if observe_b:
        observe2 = jnp.zeros((2 * C,), jnp.int32).at[gid2].add(
            jnp.concatenate([outs[0][2], outs[1][2]]))
    else:
        observe2 = jnp.zeros((2 * C,), jnp.int32).at[bin_a.gid].add(outs[0][2])

    # Backward-compaction demand signal: slots in non-terminated chunks per
    # view (what bwd_cap must cover). The trainer sizes/adjusts bwd_cap from
    # the window max of this, exactly like binning's `dropped` loop.
    live_a = jnp.sum(_compact_alive(outs[0][4], bin_a.chunk_tile, T)
                     .astype(jnp.int32)) * chunk
    live_b = jnp.sum(_compact_alive(outs[1][4], bin_b.chunk_tile, T)
                     .astype(jnp.int32)) * chunk
    bwd_live = jnp.maximum(live_a, live_b)

    res = (geom2, vals2, gid2, outs[0][3], outs[0][4], outs[0][5],
           outs[1][3], outs[1][4], outs[1][5], bin_a, bin_b)
    return ((outs[0][0], outs[0][1], outs[1][0], outs[1][1], observe2,
             bwd_live), res)


def _pair_bwd(height, width, tile, chunk, interpret, observe_b, bwd_cap,
              exact_rank, res, cts):
    (geom2, vals2, gid2, clogT_a, cdone_a, fT_a,
     clogT_b, cdone_b, fT_b, bin_a, bin_b) = res
    g_img_a, g_fT_a, g_img_b, g_fT_b, _, _ = cts
    grid_y, grid_x = num_tiles(height, width, tile)
    T = grid_y * grid_x
    Ia = bin_a.gid.shape[0]
    Ib = bin_b.gid.shape[0]
    C = bin_a.gauss_present.shape[0]
    compact = bwd_cap is not None and (bwd_cap < Ia or bwd_cap < Ib)

    null2_full = jnp.concatenate([bin_a.is_null, bin_b.is_null])
    dparts, keys = [], []
    for (b, sl, g_img, g_fT, clogT, cdone, fT) in (
            (bin_a, slice(0, Ia), g_img_a, g_fT_a, clogT_a, cdone_a, fT_a),
            (bin_b, slice(Ia, Ia + Ib), g_img_b, g_fT_b, clogT_b, cdone_b,
             fT_b)):
        geom_s, vals_s = geom2[:, sl], vals2[:, sl]
        ct, gid_s = b.chunk_tile, gid2[sl]
        null_s = null2_full[sl]
        n_view = (sl.stop - sl.start) // chunk
        if compact:
            alive = _compact_alive(cdone, ct, T)
            n2 = min(bwd_cap, sl.stop - sl.start) // chunk
            (ct, clogT, cdone, geom_s, vals_s, gid_s, null_s,
             _lost) = _compact_view(alive, n2, chunk, ct, clogT, cdone,
                                    geom_s, vals_s, gid_s, null_s, T)
            n_view = n2
        g_img_tiles, g_fT_tiles = _retile(g_img, g_fT, grid_y, grid_x, tile)
        dgeom, dvals = _run_backward(
            geom_s, vals_s, ct, clogT, cdone,
            g_img_tiles, g_fT_tiles, fT, T=T,
            n_chunks=n_view, chunk=chunk, tile=tile,
            grid_x=grid_x, width=width, height=height, interpret=interpret)
        dparts.append((dvals, dgeom))
        keys.append(jnp.where(null_s, 2 * C, gid_s))

    V = dparts[0][0].shape[0]
    dvals2 = jnp.concatenate([dparts[0][0], dparts[1][0]], axis=1)  # (V, 2I)
    dgeom2 = jnp.concatenate([dparts[0][1], dparts[1][1]], axis=1)  # (8, 2I)

    # Merged Gaussian-id keys: view b's ids already ride at +C in gid2, so
    # view a's segments (keys 0..C-1) sort before view b's (C..2C-1) and the
    # concatenated per-view survivor counts give the segment boundaries;
    # null slots carry the merged sentinel 2C. Under compaction the per-
    # Gaussian counts changed, so the reduce counts the present ids itself.
    key2 = jnp.concatenate(keys)
    pres2 = jnp.concatenate([bin_a.gauss_present, bin_b.gauss_present])
    dropped2 = bin_a.dropped + bin_b.dropped

    # exact_rank under compaction OR term_cut (both change the per-Gaussian
    # aligned counts): counting present ids is an I2-update scatter (17 ms /
    # 2M updates — laws r5), so the plain path keeps binning's survivor
    # counts (rank_fast); the pair binnings skip with_present to match.
    acc = _segmented_reduce(dvals2, dgeom2, key2, pres2, dropped2,
                            chunk, exact_rank=exact_rank or compact)

    d_values2 = acc[0:V].T
    d_means2d2 = acc[V:V + 2].T
    d_conics2 = acc[V + 2:V + 5].T
    d_opac2 = acc[V + 5]
    d_abs2 = acc[V + 6:V + 8].T
    # Binnings are index-valued (int/bool leaves): float0 cotangents.
    f0t = lambda t: jax.tree.map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), t)
    return (d_values2, d_means2d2, d_conics2, d_opac2, d_abs2,
            f0t(bin_a), f0t(bin_b))


_blend_pair_core.defvjp(_pair_fwd, _pair_bwd)


def blend_tiles_pallas_pair(values2, means2d2, conics2, opacities2,
                            bin_a: Binning, bin_b: Binning,
                            height: int, width: int, tile: int, chunk: int,
                            m2d_abs_sink2=None,
                            interpret: bool | None = None,
                            observe_b: bool = True,
                            bwd_cap: int | None = None,
                            exact_rank: bool = False):
    """Blend TWO views of the same scene in one custom_vjp (see pair-core
    notes above). Inputs are the per-view arrays stacked along rows
    (2C, ...): rows [0, C) = view a, rows [C, 2C) = view b — build them with
    jnp.concatenate so the gradient splits back automatically. Returns
    (BlendOut_a, BlendOut_b, bwd_live) with per-view observe counts.

    bwd_cap (multiple of chunk, or None): run the BACKWARD on a layout
    compacted to the non-terminated chunks (exact — dropped chunks have
    identically-zero gradients) capped at bwd_cap slots per view. bwd_live
    reports the per-step demand; when it exceeds bwd_cap, the overflowing
    alive chunks' gradients are LOST for this step — callers must grow
    bwd_cap on it (Trainer does, like the binning-overflow loop)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if m2d_abs_sink2 is None:
        m2d_abs_sink2 = jnp.zeros((values2.shape[0], 2), jnp.float32)
    if bwd_cap is not None:
        assert bwd_cap % chunk == 0 and bwd_cap > 0
    img_a, fT_a, img_b, fT_b, observe2, bwd_live = _blend_pair_core(
        values2, means2d2, conics2, opacities2, m2d_abs_sink2,
        height, width, tile, chunk, interpret, observe_b, bwd_cap,
        exact_rank, bin_a, bin_b)
    C = values2.shape[0] // 2
    return (BlendOut(image=img_a, final_T=fT_a, observe=observe2[:C]),
            BlendOut(image=img_b, final_T=fT_b, observe=observe2[C:]),
            bwd_live)


def blend_tiles_pallas(values, means2d, conics, opacities, binning: Binning,
                       height: int, width: int, tile: int, chunk: int,
                       m2d_abs_sink=None, interpret: bool | None = None,
                       exact_rank: bool = False):
    """Drop-in replacement for blend_tiles_xla (same outputs, Pallas kernels).
    `m2d_abs_sink` is a (C, 2) zero tensor whose gradient receives the
    absolute screen-gradient accumulation for AbsGS densification.
    exact_rank: required for term_cut binnings (their per-Gaussian aligned
    counts no longer match gauss_present)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if m2d_abs_sink is None:
        m2d_abs_sink = jnp.zeros((values.shape[0], 2), jnp.float32)
    img, fT, observe = _blend_pallas_core(
        values, means2d, conics, opacities, m2d_abs_sink,
        binning.gid, binning.is_null, binning.chunk_tile,
        binning.tile_nonempty, binning.gauss_present, binning.dropped,
        height, width, tile, chunk, interpret, exact_rank)
    return BlendOut(image=img, final_T=fT, observe=observe)
