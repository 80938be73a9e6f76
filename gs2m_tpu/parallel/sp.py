"""Tile-sharded (spatial) multi-chip rendering over a jax.sharding.Mesh.

The reference is single-GPU; this is native scale-out for the OTHER axis
than parallel/dp.py: instead of one VIEW per device, one horizontal BAND of
one view per device — the parallelism that matters for very large frames
and low-latency single-view rendering (SIBR viewer, eval sweeps).

Design ("How to Scale Your Model" recipe — pick a mesh, keep compute local,
let collectives ride ICI):

* mesh axis "sp": device d owns image rows [d*H/D, (d+1)*H/D) (H padded to
  a multiple of D*tile). Gaussians and the camera are REPLICATED — the
  per-Gaussian preprocess is C-sized and cheap to recompute per device.
* each device SHIFTS the projected geometry into its window
  (ops/projection.crop_projected) and runs the standard binning + blend at
  the local height — per-pixel semantics identical to the full-frame
  render, so the shard outputs concatenate exactly (up to chunk-boundary
  fp reassociation).
* the image leaves shard_map PARTITIONED over rows (out_spec P(None,"sp",
  None)) — zero communication in the forward; XLA inserts the all-gather
  only if a consumer needs the full frame on one device.
* per-Gaussian outputs (observe, radii) and backward gradients are `psum`s
  — each Gaussian's instances split disjointly across bands, so the sums
  reproduce the single-chip totals.

Instance capacity: each band sees ~1/D of the instances, so callers pass
the SINGLE-FRAME cap divided by D (rounded to chunk) — the same overflow
reporting applies per band.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gs2m_tpu.core.camera import Camera
from gs2m_tpu.core.gaussians import Gaussians
from gs2m_tpu.ops.projection import crop_projected, project


def padded_height(height: int, n_devices: int, tile: int = 16) -> int:
    q = n_devices * tile
    return (height + q - 1) // q * q


def make_sp_render(mesh: Mesh, height: int, width: int, *,
                   feature_count: int = 10, active_sh_degree: int = 3,
                   tile: int = 16, chunk: int = 128,
                   instance_cap_per_band: int = 2 ** 17,
                   backend: str = "pallas") -> Callable:
    """Jitted (gaussians, camera, bg) -> dict sharded over image rows.

    Returns the rasterizer surface (color/buffer/final_T/observe/radii/
    dropped); the caller's camera must match `height`/`width` (pad height
    with `padded_height` first).
    """
    (axis,) = mesh.axis_names
    D = mesh.devices.size
    Hp = padded_height(height, D, tile)
    local_h = Hp // D
    assert instance_cap_per_band % chunk == 0

    def band(gaussians: Gaussians, camera: Camera, bg):
        from gs2m_tpu.ops.rasterize import (build_features,
                                            rasterize_from_projected)

        d = jax.lax.axis_index(axis)
        y0 = d * local_h
        proj = project(gaussians, camera, active_sh_degree, tile=tile,
                       opacities=gaussians.get_opacity[:, 0])
        proj = crop_projected(proj, y0, local_h, tile)
        feats = build_features(gaussians, camera)
        # rasterize only reads height/width from the camera (static meta).
        import dataclasses
        local_cam = dataclasses.replace(camera, height=local_h)
        out = rasterize_from_projected(
            proj, gaussians.get_opacity[:, 0], feats, bg, local_cam,
            feature_count=feature_count, tile=tile, chunk=chunk,
            instance_cap=instance_cap_per_band, backend=backend)
        # Per-Gaussian reductions: bands partition each Gaussian's
        # instances disjointly.
        observe = jax.lax.psum(out.observe, axis)
        dropped = jax.lax.psum(out.dropped, axis)
        radii = jax.lax.pmax(out.radii, axis)
        return (out.color, out.buffer, out.final_T, observe, radii, dropped)

    smapped = jax.shard_map(
        band, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(None, axis, None), P(None, axis, None), P(axis, None),
                   P(), P(), P()),
        check_vma=False)

    @jax.jit
    def render_sp(gaussians: Gaussians, camera: Camera, bg: jnp.ndarray):
        color, buffer, final_T, observe, radii, dropped = smapped(
            gaussians, camera, bg)
        return {
            "color": color[:, :height], "buffer": buffer[:, :height],
            "final_T": final_T[:height], "observe": observe,
            "radii": radii, "dropped": dropped,
        }

    return render_sp


def halo_extend(x: jnp.ndarray, r: int, axis: str, n_devices: int) -> jnp.ndarray:
    """(..., local_h, W) band -> (..., local_h + 2r, W) slab extended with r
    boundary rows from each band neighbor over ICI (two ppermute shifts).
    Edge bands receive zeros — exactly the zero padding a single-chip 'same'
    convolution would see beyond the image border. Differentiable: the
    transpose of ppermute is the reverse permute, so halo-row gradients flow
    back to the producing band automatically."""
    h_axis = x.ndim - 2
    top = jax.lax.slice_in_dim(x, 0, r, axis=h_axis)
    bot = jax.lax.slice_in_dim(x, x.shape[h_axis] - r, x.shape[h_axis],
                               axis=h_axis)
    # Band d's rows just ABOVE its window live on band d-1 (its bottom rows).
    from_above = jax.lax.ppermute(
        bot, axis, [(i, i + 1) for i in range(n_devices - 1)])
    from_below = jax.lax.ppermute(
        top, axis, [(i, i - 1) for i in range(1, n_devices)])
    return jnp.concatenate([from_above, x, from_below], axis=h_axis)


_SSIM_HALO = 5  # 11x11 Gaussian window radius (ops/ssim.py)


def _banded_rgb_sums(colm, tgtm, mask, lambda_ssim, axis, D, local_h):
    """(l1_sum, ssim_sum) of one masked band. Sum (not mean) locally;
    normalize AFTER the psum so the total equals the single-chip full-frame
    mean. SSIM windows cross band edges via halo_extend; every kept pixel's
    11x11 support lies inside the extended slab."""
    l1_sum = jnp.sum(jnp.abs(colm - tgtm))
    if lambda_ssim == 0.0:
        return l1_sum, jnp.float32(0.0)
    from gs2m_tpu.ops.ssim import ssim_map
    # One exchange for both images: (2, 3, local_h, W) slab.
    ext = halo_extend(jnp.stack([colm, tgtm]), _SSIM_HALO, axis, D)
    m = ssim_map(ext[:1, :, :], ext[1:, :, :])  # grads to colm only
    kept = m[0, :, _SSIM_HALO:_SSIM_HALO + local_h] * mask
    return l1_sum, jnp.sum(kept)


def make_sp_grad(mesh: Mesh, height: int, width: int, *,
                 feature_count: int = 10, active_sh_degree: int = 3,
                 tile: int = 16, chunk: int = 128,
                 instance_cap_per_band: int = 2 ** 17,
                 backend: str = "pallas",
                 lambda_ssim: float = 0.0) -> Callable:
    """Tile-sharded BACKWARD: jitted (params, gaussians, camera, bg, target)
    -> (loss, per-Gaussian grad pytree) for the reference photometric
    objective (1-l)*L1 + l*(1-SSIM) (train.py:101-107; losses.rgb_loss).

    The SURVEY §2.4 pattern: each chip back-propagates through its own band
    of the tile grid; per-Gaussian partial gradients are `psum`-reduced over
    ICI, replicated parameters never move. Pixel-local terms (L1) shard with
    zero communication. The SSIM window term sharding uses HALO EXCHANGE:
    each band ppermutes its 5 boundary rows to its neighbors (the 11x11
    window radius), computes the SSIM map on the extended slab, and keeps
    only its own rows — every kept pixel's window support lies inside the
    slab, so the map (and, through the transposed ppermute, its gradient)
    is bit-equal to the single-chip full-frame computation. Cross-view
    losses (multi-view NCC) reproject arbitrarily far and stay on the DP
    axis. The `target` image is passed full-frame and sliced per band
    (replicated-in, local-read)."""
    (axis,) = mesh.axis_names
    D = mesh.devices.size
    Hp = padded_height(height, D, tile)
    local_h = Hp // D
    assert instance_cap_per_band % chunk == 0
    assert lambda_ssim == 0.0 or local_h >= _SSIM_HALO, (
        "SSIM halo exchange needs bands of at least 5 rows")

    def band_loss(params, gaussians, camera, bg, target):
        import dataclasses

        from gs2m_tpu.ops.rasterize import (build_features,
                                            rasterize_from_projected)

        d = jax.lax.axis_index(axis)
        y0 = d * local_h
        g = gaussians.with_params(params)
        proj = project(g, camera, active_sh_degree, tile=tile,
                       opacities=g.get_opacity[:, 0])
        proj = crop_projected(proj, y0, local_h, tile)
        feats = build_features(g, camera)
        local_cam = dataclasses.replace(camera, height=local_h)
        out = rasterize_from_projected(
            proj, g.get_opacity[:, 0], feats, bg, local_cam,
            feature_count=feature_count, tile=tile, chunk=chunk,
            instance_cap=instance_cap_per_band, backend=backend)
        # Local band of the (padded) target; rows beyond `height` are masked
        # to zero in BOTH images — the padded-frame rows render real splat
        # content that the single-chip H-row frame never sees, and SSIM
        # windows near the bottom edge must read zeros there (the same zeros
        # the single-chip 'same' conv pads with).
        tgt = jax.lax.dynamic_slice_in_dim(target, y0, local_h, axis=1)
        rows = y0 + jnp.arange(local_h)
        mask = (rows < height).astype(out.color.dtype)[None, :, None]
        # Clip like the trainer's photometric term (trainer.py:92) so the
        # banded objective matches the single-chip one where compositing
        # overshoots [0, 1].
        colm = jnp.clip(out.color, 0.0, 1.0) * mask
        tgtm = tgt * mask
        return _banded_rgb_sums(colm, tgtm, mask, lambda_ssim, axis, D,
                                local_h)

    def shard_fn(params, gaussians, camera, bg, target):
        # The global objective is LINEAR in the per-device sums:
        #   loss = lam + sum_d [(1-lam)*l1_d - lam*ssim_d] / denom
        # so differentiate the purely LOCAL summand and psum once at the end
        # (a psum inside the differentiated function would transpose to
        # another psum under check_vma=False and double-count by D —
        # observed as exactly-8x grads on the 8-device mesh).
        denom = 3.0 * height * width

        def local_obj(p):
            l1_sum, ssim_sum = band_loss(p, gaussians, camera, bg, target)
            return ((1.0 - lambda_ssim) * l1_sum
                    - lambda_ssim * ssim_sum) / denom

        val, grads = jax.value_and_grad(local_obj)(params)
        # grads_d includes neighbor-loss contributions routed back through
        # the transposed ppermute; the psum sums the per-device partials.
        loss = lambda_ssim + jax.lax.psum(val, axis)
        grads = jax.tree.map(lambda x: jax.lax.psum(x, axis), grads)
        return loss, grads

    smapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)

    @jax.jit
    def grad_sp(params, gaussians: Gaussians, camera: Camera, bg, target):
        # Pad the target to the band grid so every device slices in-bounds.
        pad = Hp - target.shape[1]
        tgt = jnp.pad(target, ((0, 0), (0, pad), (0, 0)))
        return smapped(params, gaussians, camera, bg, tgt)

    return grad_sp


def make_sp_geometry_grad(mesh: Mesh, height: int, width: int, *,
                          active_sh_degree: int = 3,
                          tile: int = 16, chunk: int = 128,
                          instance_cap_per_band: int = 2 ** 17,
                          backend: str = "pallas",
                          lambda_ssim: float = 0.2,
                          lambda_depth_normal: float = 0.05,
                          lambda_plane: float = 100.0,
                          lambda_alpha: float = 0.0) -> Callable:
    """Tile-sharded backward for the FULL geometry-stage objective minus the
    cross-view term (train.py:92-115 without Lmv — multi-view NCC reprojects
    arbitrarily far across the frame and stays on the DP axis):

        (1-l)*L1 + l*(1-SSIM) + lambda_plane*Lplane
        [+ lambda_alpha*BCE(alpha, gt_alpha)] + lambda_depth_normal*Ldn

    Window terms shard by halo exchange: SSIM ppermutes 5 boundary rows
    (_banded_rgb_sums); the sobel normal-from-depth ppermutes 1 depth row and
    back-projects with GLOBAL pixel rows (ops/normals.py row0), with the true
    image border rows re-zeroed exactly like the single-chip 1-px border. The
    depth-normal weights normalize by the FULL image gradient range
    (losses._img_grad_weight), computed from the replicated gt per device.
    The plane loss is a per-Gaussian ratio (nonlinear in the psum) — its
    visibility is discrete (radii > 0, no grad path), so it is evaluated
    REPLICATED outside the shard_map on the pmax'd radii and its grads are
    added to the psum'd per-Gaussian grads.

    Returns jitted (params, gaussians, camera, bg, target, gt_alpha)
    -> (loss, grads); loss and grads match the single-chip assembly of the
    same terms (chunk-boundary fp reassociation only)."""
    import dataclasses

    from gs2m_tpu.models.losses import (_img_grad_weight,
                                        binary_cross_entropy_map, plane_loss)
    from gs2m_tpu.ops.normals import normal_from_depth_image
    from gs2m_tpu.ops.rasterize import build_features, rasterize_from_projected

    (axis,) = mesh.axis_names
    D = mesh.devices.size
    Hp = padded_height(height, D, tile)
    local_h = Hp // D
    assert instance_cap_per_band % chunk == 0
    assert local_h >= _SSIM_HALO, "SSIM halo needs bands of at least 5 rows"

    def band_terms(params, gaussians, camera, bg, target, gt_alpha, rays_pad,
                   dn_weights_pad):
        d = jax.lax.axis_index(axis)
        y0 = d * local_h
        g = gaussians.with_params(params)
        proj = project(g, camera, active_sh_degree, tile=tile,
                       opacities=g.get_opacity[:, 0])
        projc = crop_projected(proj, y0, local_h, tile)
        feats = build_features(g, camera)
        local_cam = dataclasses.replace(camera, height=local_h)
        out = rasterize_from_projected(
            projc, g.get_opacity[:, 0], feats, bg, local_cam,
            feature_count=10, tile=tile, chunk=chunk,
            instance_cap=instance_cap_per_band, backend=backend)

        rows = y0 + jnp.arange(local_h)
        mask = (rows < height).astype(out.color.dtype)[None, :, None]

        # --- photometric (bg = 0 zeroes the background compositing) --------
        colm = jnp.clip(out.color, 0.0, 1.0) * mask
        tgtm = jax.lax.dynamic_slice_in_dim(target, y0, local_h, 1) * mask
        l1_sum, ssim_sum = _banded_rgb_sums(colm, tgtm, mask, lambda_ssim,
                                            axis, D, local_h)

        # --- geometry maps (derive_render_pkg semantics, banded) -----------
        buffer = out.buffer
        alpha = buffer[0:1]
        distance = buffer[1:2]
        normal_map = buffer[2:5]
        n_flat = normal_map.transpose(1, 2, 0).reshape(-1, 3)
        local_n = n_flat @ camera.world_view[:3, :3]
        rays = jax.lax.dynamic_slice_in_dim(rays_pad, y0, local_h, 0)
        denoms = jnp.sum(local_n * rays.reshape(-1, 3), -1).reshape(
            1, local_h, width)
        depth = distance / -(denoms + 1e-8)

        # Sobel normals: 1-row depth halo; global pixel rows via row0. The
        # slab's zero border lands on the halos; the TRUE image border rows
        # (0 and height-1) are re-zeroed to match the single-chip 1-px pad.
        ext_d = halo_extend(depth, 1, axis, D)[0]       # (local_h+2, W)
        w2c = camera.world_view.T
        c2w = jnp.linalg.inv(w2c)
        n_sob = normal_from_depth_image(ext_d, camera.get_K(), c2w,
                                        row0=y0 - 1)[1:-1]  # (local_h, W, 3)
        # Re-zero the TRUE image border rows of the normals BEFORE the alpha
        # compositing — the single-chip 1-px pad zeroes n, not the composite
        # (render_normal_from_depth_map: n*alpha + bg*(1-alpha)).
        border = (rows == 0) | (rows == height - 1)
        n_sob = jnp.where(border[:, None, None], 0.0, n_sob)
        a1 = alpha[0][..., None]
        sobel = (n_sob * a1 + bg[None, None, :] * (1.0 - a1)).transpose(2, 0, 1)

        wdn = jax.lax.dynamic_slice_in_dim(dn_weights_pad, y0, local_h, 0)
        dn_sum = jnp.sum(
            wdn * jnp.sum(jnp.abs(sobel - normal_map), axis=0) * mask[0])

        bce_sum = jnp.float32(0.0)
        if lambda_alpha:
            gta = jax.lax.dynamic_slice_in_dim(gt_alpha, y0, local_h, 1)
            bce_sum = jnp.sum(
                binary_cross_entropy_map(alpha, gta) * mask)

        return (l1_sum, ssim_sum, dn_sum, bce_sum), out.radii

    def shard_fn(params, gaussians, camera, bg, target, gt_alpha, rays_pad,
                 dn_weights_pad):
        denom = float(height * width)

        def local_obj(p):
            (l1, ssim, dn, bce), radii = band_terms(
                p, gaussians, camera, bg, target, gt_alpha, rays_pad,
                dn_weights_pad)
            val = ((1.0 - lambda_ssim) * l1 - lambda_ssim * ssim) / (3 * denom)
            val = val + lambda_depth_normal * dn / denom
            if lambda_alpha:
                val = val + lambda_alpha * bce / denom
            return val, radii

        (val, radii), grads = jax.value_and_grad(local_obj, has_aux=True)(
            params)
        loss = lambda_ssim + jax.lax.psum(val, axis)
        grads = jax.tree.map(lambda x: jax.lax.psum(x, axis), grads)
        radii = jax.lax.pmax(radii, axis)
        return loss, grads, radii

    smapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(),) * 8,
        out_specs=(P(), P(), P()),
        check_vma=False)

    @jax.jit
    def grad_sp(params, gaussians: Gaussians, camera: Camera, bg, target,
                gt_alpha):
        pad = Hp - target.shape[1]
        tgt = jnp.pad(target, ((0, 0), (0, pad), (0, 0)))
        gta = jnp.pad(gt_alpha, ((0, 0), (0, pad), (0, 0)))
        rays_pad = jnp.pad(camera.get_rays(), ((0, pad), (0, 0), (0, 0)))
        # Full-frame-normalized depth-normal weights from the replicated gt.
        wdn = jax.lax.stop_gradient(
            jnp.clip(1.0 - _img_grad_weight(target), 0.0, 1.0) ** 2)
        wdn_pad = jnp.pad(wdn, ((0, pad), (0, 0)))
        loss, grads, radii = smapped(params, gaussians, camera, bg, tgt,
                                     gta, rays_pad, wdn_pad)
        # Plane prior: visibility is index-valued; replicated evaluation.
        vis = jax.lax.stop_gradient(radii > 0)

        def plane_fn(p):
            return lambda_plane * plane_loss(
                vis, gaussians.with_params(p).get_scaling)

        pl, pg = jax.value_and_grad(plane_fn)(params)
        return loss + pl, jax.tree.map(jnp.add, grads, pg)

    return grad_sp
