"""Bilinear grid sampling (torch.nn.functional.grid_sample equivalent).

The reference leans on grid_sample for multi-view losses (utils/
loss_utils.py:366-414,432-453) with mode='bilinear', padding_mode='border',
align_corners=True. Differentiable in both the image and the sampling grid.

TPU-first core (custom_vjp `_bilinear_core`):
* forward: the four corner taps collapse into ONE barriered gather from a
  QUAD-packed (4C, H*W) table (rows = [img, img>>x, img>>y, img>>xy] with
  edge duplication — exactly the border-clamped corner set). Measured on one
  chip at 480k samples: 11 ms vs 21 ms for four 2-D gathers isolated — and
  vs 4 x 51 ms for the fused producer/consumer form XLA emits otherwise.
* backward (image): per-pixel segment reduction via lax.sort on the flat
  pixel key with the 4C corner-grad channels as payloads + prefix-sum
  differencing — 19 ms vs 54 ms for the multi-channel scatter-add autodiff
  emits (multi-row scatters serialize on TPU).
* backward (grid): elementwise from the saved corner taps.

`grid_sample_bilinear_reference` keeps the plain-autodiff formulation as the
semantic twin for tests.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _corner_setup(gx, gy, H, W):
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0
    x0i = jnp.clip(x0, 0, W - 1).astype(jnp.int32)
    x1i = jnp.clip(x0 + 1, 0, W - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, H - 1).astype(jnp.int32)
    y1i = jnp.clip(y0 + 1, 0, H - 1).astype(jnp.int32)
    return x0i, x1i, y0i, y1i, wx, wy


@jax.custom_vjp
def _bilinear_core(img, gx, gy):
    """img (C, H, W); gx/gy (N,) pixel coords (already border-clipped).
    Returns (N, C)."""
    out, _ = _bilinear_fwd(img, gx, gy)
    return out


def _quad_pack(img):
    """(C, H, W) -> (4C, H*W): [v00 | v01 (x+1) | v10 (y+1) | v11 (x+1,y+1)]
    with edge duplication (matches clipped corner indices at the border)."""
    C, H, W = img.shape
    r = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], -1)
    d = jnp.concatenate([img[:, 1:], img[:, -1:]], 1)
    dr = jnp.concatenate([d[:, :, 1:], d[:, :, -1:]], -1)
    return jnp.concatenate([img, r, d, dr], 0).reshape(4 * C, H * W)


def _bilinear_fwd(img, gx, gy):
    C, H, W = img.shape
    x0i, x1i, y0i, y1i, wx, wy = _corner_setup(gx, gy, H, W)
    # One gather; barriers pin the clean isolated form (CLAUDE.md: XLA's
    # fused gather form can be 4x slower).
    quad = jax.lax.optimization_barrier(_quad_pack(img))
    idx = jax.lax.optimization_barrier(y0i * W + x0i)
    v = jax.lax.optimization_barrier(quad[:, idx])        # (4C, N)
    # Corners whose clipped x1/y1 collapsed (border) still read the
    # duplicated edge value — identical to the clipped 2-D indexing.
    v00, v01, v10, v11 = v[:C], v[C:2 * C], v[2 * C:3 * C], v[3 * C:]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = (top * (1 - wy) + bot * wy).T                   # (N, C)
    return out, (v, idx, wx, wy, (C, H, W))


def _bilinear_bwd(res, g):
    v, idx, wx, wy, (C, H, W) = res
    HW = H * W
    gT = g.T                                               # (C, N)
    v00, v01, v10, v11 = v[:C], v[C:2 * C], v[2 * C:3 * C], v[3 * C:]

    # Grid gradients: d out / d wx, wy (elementwise on saved taps).
    d_top_dwx = v01 - v00
    d_bot_dwx = v11 - v10
    d_gx = jnp.sum(gT * (d_top_dwx * (1 - wy) + d_bot_dwx * wy), axis=0)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    d_gy = jnp.sum(gT * (bot - top), axis=0)

    # Image gradients: per-corner weights -> (4C, N) quad-table grads ->
    # per-pixel segment sums via sort + prefix differencing (no scatters
    # except a 1-channel count), then fold the shifted tables back.
    w00 = (1 - wx) * (1 - wy)
    w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy
    w11 = wx * wy
    dq = jnp.concatenate([gT * w00, gT * w01, gT * w10, gT * w11], 0)
    ops = jax.lax.sort((idx,) + tuple(dq[k] for k in range(4 * C)),
                       num_keys=1, is_stable=False)
    s = jnp.stack(ops[1:], 0)                              # (4C, N) key-sorted
    cs = jnp.concatenate([jnp.zeros((4 * C, 1), s.dtype),
                          jnp.cumsum(s, axis=1)], 1)
    cnt = jnp.zeros((HW,), jnp.int32).at[idx].add(1, mode="drop")
    ends = jnp.cumsum(cnt)                                 # (HW,) inclusive
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
    d_quad = (cs[:, ends] - cs[:, starts]).reshape(4 * C, H, W)

    def unshift_x(t):  # adjoint of right-shift-with-edge-duplicate
        out = jnp.concatenate([jnp.zeros_like(t[:, :, :1]), t[:, :, :-1]], -1)
        return out.at[:, :, -1].add(t[:, :, -1])

    def unshift_y(t):
        out = jnp.concatenate([jnp.zeros_like(t[:, :1]), t[:, :-1]], 1)
        return out.at[:, -1].add(t[:, -1])

    d_img = (d_quad[:C] + unshift_x(d_quad[C:2 * C])
             + unshift_y(d_quad[2 * C:3 * C])
             + unshift_y(unshift_x(d_quad[3 * C:])))
    return d_img, d_gx, d_gy


_bilinear_core.defvjp(_bilinear_fwd, _bilinear_bwd)


def grid_sample_bilinear(img: jnp.ndarray, grid: jnp.ndarray,
                         padding_mode: str = "border") -> jnp.ndarray:
    """Sample `img` (C, H, W) at normalized coords `grid` (..., 2) in [-1, 1]
    (x, y) with align_corners=True semantics. Returns (..., C)."""
    C, H, W = img.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    if padding_mode == "border":
        # clip's vjp gates coords outside (0.5-subgradient at exact ties,
        # matching the autodiff twin). zeros mode keeps raw coords — the
        # core's INT indices clip internally, the inside mask zeroes the
        # out-of-range lerps, exactly like the reference formulation.
        gx = jnp.clip(gx, 0.0, W - 1)
        gy = jnp.clip(gy, 0.0, H - 1)

    lead = gx.shape
    out = _bilinear_core(img, gx.reshape(-1), gy.reshape(-1))
    out = out.reshape(*lead, C)

    if padding_mode == "zeros":
        inside = ((grid[..., 0] >= -1) & (grid[..., 0] <= 1)
                  & (grid[..., 1] >= -1) & (grid[..., 1] <= 1))
        out = out * inside[..., None]
    return out


def grid_sample_bilinear_reference(img: jnp.ndarray, grid: jnp.ndarray,
                                   padding_mode: str = "border") -> jnp.ndarray:
    """Plain-autodiff twin of grid_sample_bilinear (tests only)."""
    C, H, W = img.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)

    if padding_mode == "border":
        gx = jnp.clip(gx, 0.0, W - 1)
        gy = jnp.clip(gy, 0.0, H - 1)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0)[..., None]
    wy = (gy - y0)[..., None]
    x0i = jnp.clip(x0, 0, W - 1).astype(jnp.int32)
    x1i = jnp.clip(x0 + 1, 0, W - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, H - 1).astype(jnp.int32)
    y1i = jnp.clip(y0 + 1, 0, H - 1).astype(jnp.int32)

    imf = img.transpose(1, 2, 0)  # (H, W, C)
    top = imf[y0i, x0i] * (1 - wx) + imf[y0i, x1i] * wx
    bot = imf[y1i, x0i] * (1 - wx) + imf[y1i, x1i] * wx
    out = top * (1 - wy) + bot * wy

    if padding_mode == "zeros":
        inside = ((grid[..., 0] >= -1) & (grid[..., 0] <= 1)
                  & (grid[..., 1] >= -1) & (grid[..., 1] <= 1))
        out = out * inside[..., None]
    return out


def sample_pixels(img: jnp.ndarray, pix: jnp.ndarray,
                  padding_mode: str = "border") -> jnp.ndarray:
    """Sample (C, H, W) image at pixel coordinates pix (..., 2) = (x, y),
    align_corners=True normalization: x_norm = 2x/(W-1) - 1."""
    C, H, W = img.shape
    gx = 2.0 * pix[..., 0] / (W - 1) - 1.0
    gy = 2.0 * pix[..., 1] / (H - 1) - 1.0
    return grid_sample_bilinear(img, jnp.stack([gx, gy], -1), padding_mode)
