"""Block-sparse TSDF fusion of rendered depth maps.

Behavioral reference: /root/reference/utils/mesh_utils.py:37-74 — Open3D
ScalableTSDFVolume integration of per-view (plane-depth, RGB) frames with
pinhole intrinsics: projective SDF truncated at sdf_trunc, per-observation
weight 1, running-average color; depth==0 and depth > max_depth rejected.

TPU-native design (no Open3D in this stack): a spatially-hashed set of
BLOCK_EDGE^3-voxel blocks discovered from the back-projected depth points
(host pass), then one jitted integration pass — a lax.scan over views,
dense over (n_blocks, BLOCK_EDGE^3) voxels: project voxel centers into the
view, sample depth, accumulate clipped SDF/weight/color. All static shapes;
the voxel math runs on the MXU-adjacent VPU as plain vectorized jnp.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_EDGE = 8  # voxels per block edge (8^3 = 512 voxels per block)


@dataclasses.dataclass
class TSDFVolume:
    block_coords: np.ndarray  # (B, 3) int block indices
    tsdf: np.ndarray          # (B, E^3) f32 in [-1, 1] (units of sdf_trunc)
    weight: np.ndarray        # (B, E^3) f32
    color: np.ndarray         # (B, E^3, 3) f32
    voxel_size: float
    sdf_trunc: float


def _block_voxel_offsets() -> np.ndarray:
    r = np.arange(BLOCK_EDGE)
    zz, yy, xx = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([xx, yy, zz], -1).reshape(-1, 3)  # (E^3, 3) x-fastest


def discover_blocks(depths: np.ndarray, cameras, alpha_masks: np.ndarray | None,
                    voxel_size: float, sdf_trunc: float, max_depth: float,
                    stride: int = 2) -> np.ndarray:
    """Union of blocks touched by back-projected depth points, dilated by the
    truncation band. depths (V, H, W); cameras list of Camera."""
    blocks = set()
    band = int(np.ceil(sdf_trunc / (voxel_size * BLOCK_EDGE))) + 1
    offs = np.arange(-band, band + 1)
    ox, oy, oz = np.meshgrid(offs, offs, offs, indexing="ij")
    dilate = np.stack([ox, oy, oz], -1).reshape(-1, 3)

    for v, cam in enumerate(cameras):
        d = np.asarray(depths[v])
        H, W = d.shape
        if alpha_masks is not None:
            d = np.where(np.asarray(alpha_masks[v])[0] >= 0.5, d, 0.0)
        ys, xs = np.mgrid[0:H:stride, 0:W:stride]
        z = d[ys, xs]
        ok = (z > 0) & (z < max_depth)
        if not ok.any():
            continue
        fx, fy = float(cam.fx), float(cam.fy)
        cx, cy = float(cam.cx), float(cam.cy)
        pc = np.stack([(xs[ok] - cx) / fx * z[ok],
                       (ys[ok] - cy) / fy * z[ok], z[ok]], -1)
        R = np.asarray(cam.world_view[:3, :3])  # transposed w2c
        t = np.asarray(cam.world_view[3, :3])
        pw = (pc - t) @ R.T
        bc = np.floor(pw / (voxel_size * BLOCK_EDGE)).astype(np.int64)
        bc = np.unique(bc, axis=0)
        bc = (bc[:, None, :] + dilate[None]).reshape(-1, 3)
        blocks.update(map(tuple, bc))
    return np.array(sorted(blocks), dtype=np.int64).reshape(-1, 3)


def fuse_depths(depths, colors, cameras, voxel_size: float, sdf_trunc: float,
                max_depth: float, alpha_masks=None,
                bounds: np.ndarray | None = None) -> TSDFVolume:
    """Integrate V views. depths (V, H, W); colors (V, 3, H, W) in [0, 1];
    `bounds` (3, 2) world AABB replaces the alpha mask when given
    (mesh_utils.py:48-56)."""
    V = len(cameras)
    H, W = int(cameras[0].height), int(cameras[0].width)
    depths = np.asarray(depths, np.float32).reshape(V, H, W)

    if bounds is not None:
        # Mask out depth samples whose world point leaves the AABB.
        masked = []
        for v, cam in enumerate(cameras):
            d = depths[v]
            ys, xs = np.mgrid[0:H, 0:W]
            z = d
            pc = np.stack([(xs - float(cam.cx)) / float(cam.fx) * z,
                           (ys - float(cam.cy)) / float(cam.fy) * z, z], -1)
            R = np.asarray(cam.world_view[:3, :3])
            t = np.asarray(cam.world_view[3, :3])
            pw = (pc.reshape(-1, 3) - t) @ R.T
            pw = pw.reshape(H, W, 3)
            out = ((pw[..., 0] < bounds[0, 0]) | (pw[..., 0] > bounds[0, 1])
                   | (pw[..., 1] < bounds[1, 0]) | (pw[..., 1] > bounds[1, 1])
                   | (pw[..., 2] < bounds[2, 0]) | (pw[..., 2] > bounds[2, 1]))
            masked.append(np.where(out, 0.0, d))
        depths = np.stack(masked, 0)
        alpha_masks = None

    block_coords = discover_blocks(depths, cameras, alpha_masks, voxel_size,
                                   sdf_trunc, max_depth)
    B = block_coords.shape[0]
    if B == 0:
        E3 = BLOCK_EDGE ** 3
        return TSDFVolume(block_coords, np.zeros((0, E3), np.float32),
                          np.zeros((0, E3), np.float32),
                          np.zeros((0, E3, 3), np.float32), voxel_size, sdf_trunc)

    offsets = _block_voxel_offsets()  # (E^3, 3)
    centers = ((block_coords[:, None, :] * BLOCK_EDGE + offsets[None]) + 0.5
               ) * voxel_size  # (B, E^3, 3) world voxel centers
    centers = jnp.asarray(centers.reshape(-1, 3), jnp.float32)  # (N, 3)

    world_views = jnp.stack([c.world_view for c in cameras], 0)
    intr = jnp.asarray([[float(c.fx), float(c.fy), float(c.cx), float(c.cy)]
                        for c in cameras], jnp.float32)
    depths_j = jnp.asarray(depths)
    colors_j = jnp.asarray(np.asarray(colors, np.float32).reshape(V, 3, H, W))
    masks_j = (jnp.asarray(np.asarray(alpha_masks).reshape(V, H, W))
               if alpha_masks is not None else jnp.ones((V, H, W)))

    # Big per-view buffers ride as jit ARGUMENTS, never closure constants:
    # closed-over arrays upload inside the compile request over the axon
    # HTTP tunnel, which rejects bodies above ~300 MB (hit at 49 views x
    # 800x600 in the r5 production gate: HTTP 413).
    @jax.jit
    def integrate(centers, world_views, intr, depths_j, colors_j, masks_j):
        def body(carry, v):
            tsdf, wsum, csum = carry
            wv = world_views[v]
            pc = centers @ wv[:3, :3] + wv[3, :3]
            z = pc[:, 2]
            fx, fy, cx, cy = intr[v]
            u = pc[:, 0] / z * fx + cx
            vv = pc[:, 1] / z * fy + cy
            ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
            vi = jnp.clip(jnp.round(vv).astype(jnp.int32), 0, H - 1)
            dmask = masks_j[v][vi, ui] >= 0.5
            d = jnp.where(dmask, depths_j[v][vi, ui], 0.0)
            inside = (z > 0) & (u >= 0) & (u < W) & (vv >= 0) & (vv < H)
            valid_d = (d > 0) & (d < max_depth)
            sdf = d - z
            integr = inside & valid_d & (sdf > -sdf_trunc)
            tsdf_obs = jnp.clip(sdf / sdf_trunc, -1.0, 1.0)
            w = integr.astype(jnp.float32)
            col = colors_j[v][:, vi, ui].T  # (N, 3)
            return (tsdf + tsdf_obs * w, wsum + w,
                    csum + col * w[:, None]), None

        N = centers.shape[0]
        init = (jnp.zeros(N), jnp.zeros(N), jnp.zeros((N, 3)))
        (tsdf, wsum, csum), _ = jax.lax.scan(body, init, jnp.arange(V))
        w = jnp.maximum(wsum, 1e-12)
        return tsdf / w, wsum, csum / w[:, None]

    tsdf, wsum, cavg = integrate(centers, world_views, intr, depths_j,
                                 colors_j, masks_j)
    E3 = BLOCK_EDGE ** 3
    return TSDFVolume(
        block_coords=block_coords,
        tsdf=np.asarray(tsdf).reshape(B, E3),
        weight=np.asarray(wsum).reshape(B, E3),
        color=np.asarray(cavg).reshape(B, E3, 3),
        voxel_size=voxel_size, sdf_trunc=sdf_trunc)
