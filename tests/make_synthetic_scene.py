"""Build a tiny synthetic COLMAP-format dataset by rendering a known Gaussian
cloud from a ring of cameras with the golden renderer. Used by data-layer and
end-to-end training tests (the scene is perfectly fittable by construction).
"""
from __future__ import annotations

import os

import numpy as np


def ring_camera(theta: float, dist: float = 4.0, height: float = 0.8):
    """c2w looking at the origin from a ring; returns (R_transposed_w2c, T_w2c)."""
    eye = np.array([dist * np.sin(theta), height, -dist * np.cos(theta)])
    forward = -eye / np.linalg.norm(eye)           # +z view axis toward origin
    up = np.array([0.0, -1.0, 0.0])                 # COLMAP y-down
    right = np.cross(up, forward)
    right /= np.linalg.norm(right)
    true_up = np.cross(forward, right)
    R_c2w = np.stack([right, true_up, forward], axis=1)  # columns
    w2c_R = R_c2w.T
    T = -w2c_R @ eye
    return R_c2w, T  # reference convention: R stored as transposed w2c = c2w


def make_scene_data(n_points: int = 300, seed: int = 0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n_points, 3)).astype(np.float32) * 0.6
    cols = ((pts - pts.min(0)) / (pts.max(0) - pts.min(0))).astype(np.float32)
    return pts, cols


def make_sphere_data(n_points: int = 4000, radius: float = 1.0, seed: int = 0):
    """Points ON a sphere surface (analytic geometry ground truth for the
    train -> mesh -> chamfer quality gate)."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n_points, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = (v * radius).astype(np.float32)
    cols = (0.5 + 0.45 * v).astype(np.float32)  # smooth normal-coded colors
    return pts, cols


def build(out_dir: str, n_views: int = 10, width: int = 64, height: int = 48,
          n_points: int = 300, seed: int = 0, surface: bool = False,
          opacity_boost: float = 6.0, point_scale: float | None = None):
    import jax.numpy as jnp
    from PIL import Image

    from gs2m_tpu.core.camera import Camera
    from gs2m_tpu.core.gaussians import Gaussians
    from gs2m_tpu.data import colmap as cm
    from gs2m_tpu.ops.projection import project
    from gs2m_tpu.ops.rasterize import build_features, rasterize_from_projected

    if surface:
        pts, cols = make_sphere_data(n_points, seed=seed)
    else:
        pts, cols = make_scene_data(n_points, seed)
    msd = (np.full(pts.shape[0], point_scale ** 2, np.float32)
           if point_scale is not None else None)
    g = Gaussians.create(pts, cols, max_sh_degree=1, capacity=pts.shape[0],
                         mean_sq_dist=msd)

    fx = fy = 0.9 * width
    os.makedirs(os.path.join(out_dir, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)

    cams, imgs = {}, {}
    cams[1] = cm.ColmapCamera(1, "PINHOLE", width, height,
                              np.array([fx, fy, width / 2, height / 2], np.float64))
    for i in range(n_views):
        R, T = ring_camera(2 * np.pi * i / n_views)
        name = f"view_{i:03d}.png"
        imgs[i + 1] = cm.ColmapImage(i + 1, cm.rotmat_to_qvec(R.T), T, 1, name)

        cam = Camera.create(R, T, fovx=2 * np.arctan(width / (2 * fx)),
                            fovy=2 * np.arctan(height / (2 * fy)),
                            width=width, height=height)
        proj = project(g, cam, g.max_sh_degree)
        opa = jnp.minimum(g.get_opacity[:, 0] * opacity_boost, 0.99)
        feats = build_features(g, cam)
        out = rasterize_from_projected(proj, opa, feats, jnp.zeros(3), cam,
                                       feature_count=1, chunk=64,
                                       instance_cap=2 ** 15, backend="xla")
        img = np.clip(np.asarray(out.color).transpose(1, 2, 0), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(out_dir, "images", name))

    cm.write_cameras_binary(os.path.join(out_dir, "sparse/0/cameras.bin"), cams)
    cm.write_images_binary(os.path.join(out_dir, "sparse/0/images.bin"), imgs)
    # Noisy subset of the true points as the SfM cloud.
    rng = np.random.default_rng(seed + 1)
    sel = rng.choice(pts.shape[0], size=max(50, pts.shape[0] // 2), replace=False)
    noisy = pts[sel] + rng.normal(scale=0.02, size=(len(sel), 3)).astype(np.float32)
    cm.write_points3d_binary(os.path.join(out_dir, "sparse/0/points3D.bin"),
                             noisy.astype(np.float64), (cols[sel] * 255))
    return out_dir


if __name__ == "__main__":
    import sys

    import jax
    jax.config.update("jax_platforms", "cpu")
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/gs2m_synthetic")
    print("wrote synthetic scene")
