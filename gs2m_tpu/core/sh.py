"""Spherical-harmonics color evaluation (degrees 0..3).

Behavioral reference: /root/reference/utils/sh_utils.py:57-118 and the in-kernel
evaluation at /root/reference/submodules/diff-gaussian-rasterization/
cuda_rasterizer/forward.cu:20-67 (same polynomial basis and constants; the
kernel additionally adds 0.5 and clamps to >= 0, which lives in
`sh_to_rgb` here). Fully differentiable through XLA autodiff — no
hand-derived SH backward is needed on TPU.
"""
from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


import numpy as np

# SH band (degree) of each coefficient index 0..15.
BAND_OF_COEFF = np.array([0, 1, 1, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3])


def _sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """[..., (deg+1)^2] SH basis values at unit directions (static deg)."""
    one = jnp.ones_like(dirs[..., 0])
    out = [C0 * one]
    if deg > 0:
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        out += [-C1 * y, C1 * z, -C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            out += [C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
                    C2[3] * xz, C2[4] * (xx - yy)]
            if deg > 2:
                out += [C3[0] * y * (3.0 * xx - yy), C3[1] * xy * z,
                        C3[2] * y * (4.0 * zz - xx - yy),
                        C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                        C3[4] * x * (4.0 * zz - xx - yy),
                        C3[5] * z * (xx - yy), C3[6] * x * (xx - 3.0 * yy)]
    return jnp.stack(out, axis=-1)


def eval_sh(deg, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH polynomials.

    Args:
      deg: degree in [0, 3]. A static int truncates the polynomial; a TRACED
        value evaluates every band the array carries and masks bands above
        `deg` — so the SH-degree warmup schedule (train.py:85) does NOT
        recompile the train step at each bump (full evaluation is a few
        extra VPU ops; a recompile through a remote runtime is minutes).
      sh: [..., K, C] coefficients with K >= (deg+1)^2 (extra coeffs ignored).
      dirs: [..., 3] unit view directions.

    Returns: [..., C] raw SH radiance (no +0.5 offset, no clamp).
    """
    if not isinstance(deg, (int, np.integer)):
        K = sh.shape[-2]
        full_deg = int(round(np.sqrt(K))) - 1
        basis = _sh_basis(full_deg, dirs)                 # [..., K]
        mask = (jnp.asarray(BAND_OF_COEFF[:K]) <= deg).astype(sh.dtype)
        return jnp.sum((basis * mask)[..., None] * sh[..., :K, :], axis=-2)
    assert 0 <= deg <= 3
    result = C0 * sh[..., 0, :]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = result - C1 * y * sh[..., 1, :] + C1 * z * sh[..., 2, :] - C1 * x * sh[..., 3, :]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + C2[0] * xy * sh[..., 4, :]
                + C2[1] * yz * sh[..., 5, :]
                + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + C2[3] * xz * sh[..., 7, :]
                + C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if deg > 2:
                result = (
                    result
                    + C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                    + C3[1] * xy * z * sh[..., 10, :]
                    + C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                    + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                    + C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                    + C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
                )
    return result


def sh_to_rgb(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH -> RGB as the rasterizer does: +0.5 offset then clamp to >= 0."""
    return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)


def rgb_to_sh_dc(rgb: jnp.ndarray) -> jnp.ndarray:
    """Invert the DC band: color -> DC coefficient."""
    return (rgb - 0.5) / C0


def sh_dc_to_rgb(sh_dc: jnp.ndarray) -> jnp.ndarray:
    return sh_dc * C0 + 0.5
