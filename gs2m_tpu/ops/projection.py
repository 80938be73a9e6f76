"""Per-Gaussian preprocess: cull, project, 2D covariance, conic, tile rect.

Behavioral reference: the rasterizer's preprocess kernel
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
forward.cu:70-241 and auxiliary.h:40-64,140-162). Numerical details preserved:

* near cull at view-space z <= 0.2 (auxiliary.h:154)
* EWA 2D covariance with the 1.3*tanfov frustum clamp (forward.cu:77-82)
* NO +0.3 pixel dilation (this GS-2M fork inverts the raw covariance in its
  forward, forward.cu:205-209)
* radius = ceil(3 * sqrt(max eigenvalue)), eigenvalues from the
  max(0.1, mid^2-det) guarded discriminant (forward.cu:215-218)
* ndc2Pix(v, S) = ((v+1)*S - 1)/2 (auxiliary.h:40-42)
* tile rect via floor((p - r)/T) .. ceil((p + r + T - 1)/T) clamped to the
  grid (auxiliary.h:44-53)

TPU-first: one fused vectorized jnp pass over the padded (C,) arrays — XLA
autodiff provides the exact backward (replacing backward.cu:153-410), so no
hand-derived covariance/SH gradients are needed.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gs2m_tpu.core import sh as shlib
from gs2m_tpu.core.camera import Camera
from gs2m_tpu.core.gaussians import Gaussians, quat_to_rotmat


class Projected(NamedTuple):
    """Per-Gaussian screen-space quantities (all shape (C, ...))."""
    means2d: jnp.ndarray        # (C, 2) pixel coordinates
    depths: jnp.ndarray         # (C,) view-space z
    conics: jnp.ndarray         # (C, 3) inverse 2D covariance (a, b, c)
    colors: jnp.ndarray         # (C, 3) SH-evaluated RGB
    radii: jnp.ndarray          # (C,) int32 screen radius, 0 = culled
    rect_min: jnp.ndarray       # (C, 2) int32 tile rect (x, y), inclusive
    rect_max: jnp.ndarray       # (C, 2) int32 tile rect, exclusive
    tiles_touched: jnp.ndarray  # (C,) int32
    valid: jnp.ndarray          # (C,) bool


def compute_cov3d(gaussians: Gaussians, scale_modifier: float = 1.0) -> jnp.ndarray:
    return gaussians.get_covariance(scale_modifier)


def compute_cov2d(xyz: jnp.ndarray, cov3d: jnp.ndarray, camera: Camera) -> jnp.ndarray:
    """EWA projection of world covariance to screen (forward.cu:70-104).

    cov2d = J @ Rw2c @ Sigma @ Rw2c^T @ J^T with the frustum-clamped Jacobian.
    Returns (C, 3): (cov_xx, cov_xy, cov_yy).

    NaN-safety: rows behind the near plane are culled downstream, but their
    values still flow through this math under autodiff — 1/tz at tz ~ 0
    creates Inf whose vjp turns ZERO cotangents into NaN (0 * inf). Clamp tz
    away from 0 for the culled rows (their outputs are masked anyway).
    """
    t = xyz @ camera.world_view[:3, :3] + camera.world_view[3, :3]  # view space
    limx = 1.3 * camera.tanfovx
    limy = 1.3 * camera.tanfovy
    tz = jnp.where(t[:, 2] > 0.2, t[:, 2], 1.0)  # near cull happens downstream
    tx = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    fx, fy = camera.fx, camera.fy
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J (2x3) rows: [fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]
    R = camera.world_view[:3, :3].T  # true w2c rotation (3x3 traced scalars)
    # M = Rw2c @ Sigma @ Rw2c^T, needed entries only, fully elementwise
    # (a batched (C,3,3) einsum costs ~10ms/pass at C=500k on TPU; the
    # scalar expansion fuses into the surrounding VPU pass).
    s = cov3d  # (C,6): xx xy xz yy yz zz

    def quad(u, v):
        """u^T Sigma v for constant 3-vectors u, v (rows of R)."""
        return (s[:, 0] * (u[0] * v[0]) + s[:, 3] * (u[1] * v[1])
                + s[:, 5] * (u[2] * v[2])
                + s[:, 1] * (u[0] * v[1] + u[1] * v[0])
                + s[:, 2] * (u[0] * v[2] + u[2] * v[0])
                + s[:, 4] * (u[1] * v[2] + u[2] * v[1]))

    r0, r1, r2 = R[0], R[1], R[2]
    M00, M01, M02 = quad(r0, r0), quad(r0, r1), quad(r0, r2)
    M11, M12, M22 = quad(r1, r1), quad(r1, r2), quad(r2, r2)

    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2
    # cov = J M J^T expanded with J's sparsity:
    cxx = j00 * j00 * M00 + 2 * j00 * j02 * M02 + j02 * j02 * M22
    cxy = j00 * j11 * M01 + j00 * j12 * M02 + j02 * j11 * M12 + j02 * j12 * M22
    cyy = j11 * j11 * M11 + 2 * j11 * j12 * M12 + j12 * j12 * M22
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def crop_projected(proj: Projected, y0: jnp.ndarray, local_height: int,
                   tile: int) -> Projected:
    """Shift a Projected into the window rows [y0, y0 + local_height).

    The enabler for tile-sharded multi-chip rendering (parallel/sp.py) and
    banded rendering of huge images: screen y moves by -y0 (y0 a multiple of
    `tile`), the tile rect is re-clamped to the local grid, and Gaussians
    whose rect misses the window are invalidated. Downstream binning/blend
    then run UNCHANGED at the local height — per-pixel math is identical to
    the full-frame render, so shard outputs concatenate exactly.

    y0 may be traced (lax.axis_index inside shard_map); local_height static.
    """
    y0 = jnp.asarray(y0, jnp.int32)
    y0_t = y0 // tile
    local_gy = (local_height + tile - 1) // tile
    means2d = proj.means2d - jnp.stack(
        [jnp.zeros((), proj.means2d.dtype), y0.astype(proj.means2d.dtype)])
    rmin_y = jnp.clip(proj.rect_min[:, 1] - y0_t, 0, local_gy)
    rmax_y = jnp.clip(proj.rect_max[:, 1] - y0_t, 0, local_gy)
    area = (proj.rect_max[:, 0] - proj.rect_min[:, 0]) * (rmax_y - rmin_y)
    valid = proj.valid & (area > 0)
    return proj._replace(
        means2d=jnp.where(valid[:, None], means2d, -1e4),
        rect_min=jnp.stack([proj.rect_min[:, 0], rmin_y], -1),
        rect_max=jnp.stack([proj.rect_max[:, 0], rmax_y], -1),
        tiles_touched=jnp.where(valid, area, 0).astype(jnp.int32),
        valid=valid,
    )


def project(gaussians: Gaussians, camera: Camera, active_sh_degree: int,
            tile: int = 16, scale_modifier: float = 1.0,
            opacities: jnp.ndarray | None = None,
            with_colors: bool = True) -> Projected:
    """Vectorized preprocess over the padded capacity.

    `opacities` (C,), when given, tightens the tile rect to the
    alpha >= 1/255 ellipse: the reference expands the full 3-sigma bbox
    (auxiliary.h:44-53) but every pixel with op*exp(power) < 1/255 is skipped
    by the blend on all backends (forward.cu:329 / ALPHA_MIN gate), so a
    radius of sqrt(2*ln(255*op))*sigma covers every contributing pixel
    exactly — capped at the reference's own 3-sigma truncation. Low-opacity
    splats (e.g. right after opacity resets) shrink their instance footprint
    quadratically; outputs and gradients are bit-identical because the
    excluded pixels were gated to zero anyway. The reported `radii` AND the
    `valid` flag both keep the reference's 3-sigma definition (a splat whose
    3-sigma rect overlaps the screen stays visible for densify/prune
    accounting even when its tightened rect is empty); only tiles_touched
    and the emitted rect use the tightened radius."""
    xyz = gaussians.xyz
    W, H = camera.width, camera.height
    grid_x = (W + tile - 1) // tile
    grid_y = (H + tile - 1) // tile

    # View/clip transforms (row-vector convention).
    p_view = xyz @ camera.world_view[:3, :3] + camera.world_view[3, :3]
    p_hom = jnp.concatenate([xyz, jnp.ones_like(xyz[:, :1])], axis=-1) @ camera.full_proj
    in_front = p_view[:, 2] > 0.2  # near cull (auxiliary.h:154)
    # Culled rows get a safe homogeneous w: 1/(w + eps) at w ~ -eps is Inf
    # and its vjp NaNs the zero cotangents of masked outputs (0 * inf).
    w_safe = jnp.where(in_front, p_hom[:, 3], 1.0)
    p_w = 1.0 / (w_safe + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]

    cov3d = compute_cov3d(gaussians, scale_modifier)
    cov = compute_cov2d(xyz, cov3d, camera)
    det = cov[:, 0] * cov[:, 2] - cov[:, 1] * cov[:, 1]
    # STRICTLY positive det: cov2d is PSD in exact math, but razor-thin
    # splats (the plane loss drives log-scales to -20+) round to det < 0,
    # flipping the conic indefinite — Mahalanobis power then goes +inf at
    # some pixels and the blend backward's gated inf*0 products NaN the
    # opacity gradients (found as a global opacity-NaN collapse mid-run).
    # The reference tolerates det<0 only because its scalar per-pixel loop
    # `continue`s before touching the inf (forward.cu:324-330).
    det_ok = det > 0.0
    det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([cov[:, 2] * det_inv, -cov[:, 1] * det_inv, cov[:, 0] * det_inv], -1)

    mid = 0.5 * (cov[:, 0] + cov[:, 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    sigma_max = jnp.sqrt(jnp.maximum(lambda1, mid - disc))
    radius = jnp.ceil(3.0 * sigma_max)

    if opacities is None:
        rect_radius = radius
    else:
        # Opacity-aware rect (see docstring): q = 2*ln(255*op) bounds the
        # Mahalanobis form at the last alpha >= 1/255 pixel; +1e-3 keeps the
        # bound conservative under f32 (same margin as the binning ellipse
        # cull), and +1 px compensates the rect formula below, whose
        # floor((px + r + T-1)/T) exclusive max under-covers by up to one
        # pixel for fractional px + r (the reference formula has the same
        # sliver at its 3-sigma boundary and tolerates it because alpha
        # there is already below the gate). stop_gradient: index-valued.
        op = jax.lax.stop_gradient(opacities)
        q = 2.0 * jnp.log(jnp.maximum(op, 1e-12) * 255.0)
        r_op = jnp.sqrt((jnp.maximum(q, 0.0) + 1e-3) * jnp.maximum(lambda1, 0.0))
        rect_radius = jnp.minimum(radius, jnp.ceil(r_op) + 1.0)

    px = ((p_proj[:, 0] + 1.0) * W - 1.0) * 0.5
    py = ((p_proj[:, 1] + 1.0) * H - 1.0) * 0.5
    means2d = jnp.stack([px, py], axis=-1)

    # Tile rect (auxiliary.h:44-53), computed on the culled-to-zero radius.
    rect_min_x = jnp.clip(((px - rect_radius) / tile).astype(jnp.int32), 0, grid_x)
    rect_min_y = jnp.clip(((py - rect_radius) / tile).astype(jnp.int32), 0, grid_y)
    rect_max_x = jnp.clip(((px + rect_radius + tile - 1) / tile).astype(jnp.int32), 0, grid_x)
    rect_max_y = jnp.clip(((py + rect_radius + tile - 1) / tile).astype(jnp.int32), 0, grid_y)
    area = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y)

    # Visibility bookkeeping (valid -> radii -> visibility_filter -> densify
    # denominators / prune-by-visibility) keeps the reference's 3-sigma rect
    # semantics even when the opacity-tightened rect falls off-screen; only
    # the instance expansion (tiles_touched + the emitted rect) uses the
    # tightened rect, which is pixel-output-identical by construction.
    area3_x = (jnp.clip(((px + radius + tile - 1) / tile).astype(jnp.int32), 0, grid_x)
               - jnp.clip(((px - radius) / tile).astype(jnp.int32), 0, grid_x))
    area3_y = (jnp.clip(((py + radius + tile - 1) / tile).astype(jnp.int32), 0, grid_y)
               - jnp.clip(((py - radius) / tile).astype(jnp.int32), 0, grid_y))

    valid = in_front & det_ok & (area3_x * area3_y > 0) & gaussians.alive
    radii = jnp.where(valid, radius, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(valid, area, 0).astype(jnp.int32)

    if with_colors:
        # SH -> RGB (forward.cu:227-232); view dirs from the unclamped
        # positions.
        dirs = xyz - camera.cam_center[None, :]
        dirs = dirs / jnp.sqrt(
            jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-20)
        colors = shlib.sh_to_rgb(active_sh_degree, gaussians.get_features, dirs)
    else:
        # Color-free projection (observe counting: visibility depends only on
        # geometry/opacity, never on the blended values).
        colors = jnp.zeros((xyz.shape[0], 3), xyz.dtype)

    # Sanitize culled slots so no inf/NaN leaks into the blend or its
    # gradients (the CUDA kernel simply never touches culled Gaussians;
    # under XLA the whole array flows through, so we pin safe values).
    v = valid[:, None]
    means2d = jnp.where(v, means2d, -1e4)
    conic = jnp.where(v, conic, jnp.array([1.0, 0.0, 1.0], conic.dtype))
    depths = jnp.where(valid, p_view[:, 2], camera.zfar)

    return Projected(
        means2d=means2d,
        depths=depths,
        conics=conic,
        colors=colors,
        radii=radii,
        rect_min=jnp.stack([rect_min_x, rect_min_y], -1),
        rect_max=jnp.stack([rect_max_x, rect_max_y], -1),
        tiles_touched=tiles_touched,
        valid=valid,
    )
