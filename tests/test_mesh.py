"""TSDF fusion + marching tetrahedra: reconstruct a known sphere."""
import numpy as np
import pytest

from gs2m_tpu.core.camera import Camera
from gs2m_tpu.mesh import (fuse_depths, keep_largest_clusters,
                           marching_tetrahedra_blocks)
from gs2m_tpu.mesh.tsdf import TSDFVolume, BLOCK_EDGE

from tests.make_synthetic_scene import ring_camera


def sphere_depth(cam, radius=1.0, center=(0.0, 0.0, 0.0)):
    """Analytic ray-sphere depth map (H, W); 0 where the ray misses."""
    H, W = cam.height, cam.width
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    d = np.stack([(xs - float(cam.cx)) / float(cam.fx),
                  (ys - float(cam.cy)) / float(cam.fy),
                  np.ones_like(xs)], -1)
    R = np.asarray(cam.world_view[:3, :3])  # transposed w2c
    t = np.asarray(cam.world_view[3, :3])
    o = np.asarray(cam.cam_center, np.float64)
    dirs = d @ R.T  # camera -> world (row-vector inverse rotation)
    oc = o - np.asarray(center)
    b = np.sum(dirs * oc, -1)
    a = np.sum(dirs * dirs, -1)
    c = np.dot(oc, oc) - radius ** 2
    disc = b * b - a * c
    hit = disc > 0
    s = (-b - np.sqrt(np.maximum(disc, 0))) / a
    depth = np.where(hit & (s > 0), s, 0.0)  # depth = z_cam = s (dir_z = 1)
    return depth.astype(np.float32)


@pytest.fixture(scope="module")
def sphere_fusion():
    cams = []
    depths = []
    colors = []
    for i in range(12):
        R, T = ring_camera(2 * np.pi * i / 12, dist=4.0, height=0.5)
        cam = Camera.create(R, T, fovx=0.7, fovy=0.55, width=96, height=72)
        cams.append(cam)
        depths.append(sphere_depth(cam))
        colors.append(np.full((3, 72, 96), 0.5, np.float32))
    vol = fuse_depths(np.stack(depths), np.stack(colors), cams,
                      voxel_size=0.05, sdf_trunc=0.15, max_depth=8.0)
    return vol, cams


def test_tsdf_volume_sane(sphere_fusion):
    vol, _ = sphere_fusion
    assert vol.block_coords.shape[0] > 0
    seen = vol.weight > 0
    assert seen.any()
    # TSDF crosses zero somewhere (surface present).
    vals = vol.tsdf[seen]
    assert vals.min() < -0.1 and vals.max() > 0.1


def test_marching_tets_reconstructs_sphere(sphere_fusion):
    vol, _ = sphere_fusion
    verts, faces, cols = marching_tetrahedra_blocks(vol)
    assert len(verts) > 200
    assert len(faces) > 200
    r = np.linalg.norm(verts, axis=1)
    # Vertices lie near the unit sphere (voxel 0.05 -> ~1.5 voxel tolerance).
    assert abs(np.median(r) - 1.0) < 0.08
    assert np.quantile(np.abs(r - 1.0), 0.9) < 0.12
    assert np.isfinite(cols).all()
    # Welding connected the mesh: far fewer verts than 3 * faces.
    assert len(verts) < 1.2 * len(faces)


def test_cluster_cleanup_removes_floaters(sphere_fusion):
    vol, _ = sphere_fusion
    verts, faces, cols = marching_tetrahedra_blocks(vol)
    # Add a tiny floating triangle island.
    extra_v = np.array([[5, 5, 5], [5.1, 5, 5], [5, 5.1, 5]], np.float32)
    extra_f = np.array([[0, 1, 2]]) + len(verts)
    v2 = np.concatenate([verts, extra_v])
    f2 = np.concatenate([faces, extra_f])
    c2 = np.concatenate([cols, np.zeros((3, 3), np.float32)])
    v3, f3, c3 = keep_largest_clusters(v2, f2, c2, clusters_to_keep=1)
    # Floater gone; main surface (possibly minus tiny sub-50-tri patches) kept.
    assert 0.95 * len(faces) <= len(f3) <= len(faces)
    assert (np.linalg.norm(v3, axis=1) < 2.0).all()


def test_bounds_masking():
    # Bound the fusion to half-space x < 0: only half the sphere survives.
    cams, depths, colors = [], [], []
    for i in range(12):
        R, T = ring_camera(2 * np.pi * i / 12, dist=4.0, height=0.5)
        cam = Camera.create(R, T, fovx=0.7, fovy=0.55, width=96, height=72)
        cams.append(cam)
        depths.append(sphere_depth(cam))
        colors.append(np.full((3, 72, 96), 0.5, np.float32))
    bounds = np.array([[-2.0, 0.0], [-2.0, 2.0], [-2.0, 2.0]])
    vol = fuse_depths(np.stack(depths), np.stack(colors), cams,
                      voxel_size=0.05, sdf_trunc=0.15, max_depth=8.0,
                      bounds=bounds)
    verts, faces, _ = marching_tetrahedra_blocks(vol)
    assert len(verts) > 50
    assert np.quantile(verts[:, 0], 0.95) < 0.15
