"""Bilinear grid sampling (torch.nn.functional.grid_sample equivalent).

The reference leans on grid_sample for multi-view losses (utils/
loss_utils.py:366-414,432-453) with mode='bilinear', padding_mode='border',
align_corners=True. This is a pure-JAX gather + lerp, differentiable in both
the image and the sampling grid.
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample_bilinear(img: jnp.ndarray, grid: jnp.ndarray,
                         padding_mode: str = "border") -> jnp.ndarray:
    """Sample `img` (C, H, W) at normalized coords `grid` (..., 2) in [-1, 1]
    (x, y) with align_corners=True semantics. Returns (..., C)."""
    C, H, W = img.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)

    if padding_mode == "border":
        gx = jnp.clip(gx, 0.0, W - 1)
        gy = jnp.clip(gy, 0.0, H - 1)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = x0 + 1
    y1 = y0 + 1
    wx = gx - x0
    wy = gy - y0

    x0i = jnp.clip(x0, 0, W - 1).astype(jnp.int32)
    x1i = jnp.clip(x1, 0, W - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, H - 1).astype(jnp.int32)
    y1i = jnp.clip(y1, 0, H - 1).astype(jnp.int32)

    imf = img.transpose(1, 2, 0)  # (H, W, C)
    v00 = imf[y0i, x0i]
    v01 = imf[y0i, x1i]
    v10 = imf[y1i, x0i]
    v11 = imf[y1i, x1i]

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
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
