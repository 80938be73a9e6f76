"""Golden reference renderer: per-pixel, all-Gaussian, pure-jnp alpha blending.

This is the slow-but-exact twin of the tiled Pallas rasterizer, mirroring the
semantics of the CUDA render kernel (/root/reference/submodules/
diff-gaussian-rasterization/cuda_rasterizer/forward.cu:246-372) pixel-for-pixel:

* front-to-back order: global depth sort, stable on Gaussian index (matching
  the tile/depth radix sort, rasterizer_impl.cu:288-296)
* a Gaussian touches a pixel only if the pixel's tile is inside the Gaussian's
  tile rect (the binning step, forward.cu:219-223)
* alpha = min(0.99, opacity * exp(power)); skip power > 0 and alpha < 1/255;
  a pixel terminates when T*(1-alpha) < 1e-4 and that Gaussian is NOT added
  (forward.cu:319-339)
* RGB accumulates c*alpha*T with background T_final*bg; the feature buffer
  accumulates the first `feature_count` channels with NO background
  (forward.cu:341-346,362-371)
* the `observe` counter increments per (pixel, Gaussian) contribution while
  T > 0.5 (forward.cu:348-350)

Differentiable end-to-end via JAX autodiff (lax.scan) — this is the gradient
oracle for the hand-derived Pallas backward. Test-scale only: O(N * H * W).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class GoldenOut(NamedTuple):
    color: jnp.ndarray     # (3, H, W) with background composited
    buffer: jnp.ndarray    # (10, H, W) blended features (raw, no background)
    final_T: jnp.ndarray   # (H, W)
    observe: jnp.ndarray   # (C,) int32


@partial(jax.jit, static_argnames=("height", "width", "tile", "feature_count"))
def golden_rasterize(
    means2d: jnp.ndarray,     # (C, 2)
    depths: jnp.ndarray,      # (C,)
    conics: jnp.ndarray,      # (C, 3)
    opacities: jnp.ndarray,   # (C,)
    colors: jnp.ndarray,      # (C, 3)
    features: jnp.ndarray,    # (C, 10)
    rect_min: jnp.ndarray,    # (C, 2) int32
    rect_max: jnp.ndarray,    # (C, 2) int32
    valid: jnp.ndarray,       # (C,) bool
    bg: jnp.ndarray,          # (3,)
    height: int,
    width: int,
    tile: int = 16,
    feature_count: int = 10,
) -> GoldenOut:
    C = means2d.shape[0]
    NF = features.shape[1]

    order = jnp.argsort(jnp.where(valid, depths, jnp.inf), stable=True)

    px, py = jnp.meshgrid(jnp.arange(width, dtype=jnp.float32),
                          jnp.arange(height, dtype=jnp.float32), indexing="xy")
    tile_x = (jnp.arange(width, dtype=jnp.int32) // tile)[None, :]
    tile_y = (jnp.arange(height, dtype=jnp.int32) // tile)[:, None]

    feat_mask = (jnp.arange(NF) < feature_count).astype(features.dtype)
    features = features * feat_mask[None, :]

    def step(carry, g):
        T, done, acc_c, acc_f = carry
        m2d = means2d[g]
        con = conics[g]
        opa = opacities[g]

        in_rect = ((tile_x >= rect_min[g, 0]) & (tile_x < rect_max[g, 0])
                   & (tile_y >= rect_min[g, 1]) & (tile_y < rect_max[g, 1]))

        dx = m2d[0] - px
        dy = m2d[1] - py
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        # min before exp keeps masked-lane vjps finite (see blend_xla).
        alpha = jnp.minimum(0.99, opa * jnp.exp(jnp.minimum(power, 0.0)))

        gate = valid[g] & in_rect & (power <= 0.0) & (alpha >= 1.0 / 255.0) & (~done)
        test_T = T * (1.0 - alpha)
        terminate = gate & (test_T < 1e-4)
        contribute = gate & (test_T >= 1e-4)

        w = jnp.where(contribute, alpha * T, 0.0)
        acc_c = acc_c + w[None, :, :] * colors[g][:, None, None]
        acc_f = acc_f + w[None, :, :] * features[g][:, None, None]
        observe_g = jnp.sum((contribute & (T > 0.5)).astype(jnp.int32))

        T = jnp.where(contribute, test_T, T)
        done = done | terminate
        return (T, done, acc_c, acc_f), observe_g

    T0 = jnp.ones((height, width), means2d.dtype)
    done0 = jnp.zeros((height, width), bool)
    acc_c0 = jnp.zeros((3, height, width), means2d.dtype)
    acc_f0 = jnp.zeros((NF, height, width), means2d.dtype)

    (T, _, acc_c, acc_f), observe_sorted = jax.lax.scan(
        step, (T0, done0, acc_c0, acc_f0), order)

    observe = jnp.zeros((C,), jnp.int32).at[order].set(observe_sorted)
    color = acc_c + T[None, :, :] * bg[:, None, None]
    return GoldenOut(color=color, buffer=acc_f, final_T=T, observe=observe)
