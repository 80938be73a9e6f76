"""Geometry-eval machinery: surface sampling, downsample, F-score, ICP."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from eval_dtu import radius_downsample, sample_mesh_surface  # noqa: E402
from eval_tnt import f_score, icp_point_to_point, voxel_downsample  # noqa: E402


def unit_quad():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float64)
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    return verts, faces


def test_surface_sampling_density():
    verts, faces = unit_quad()
    pts = sample_mesh_surface(verts, faces, density=0.05)
    # Unit square at 0.05 spacing -> ~400 points.
    assert 200 < len(pts) < 1200
    assert np.abs(pts[:, 2]).max() < 1e-9
    assert pts[:, 0].min() >= -1e-9 and pts[:, 0].max() <= 1 + 1e-9


def test_radius_downsample():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (5000, 3))
    down = radius_downsample(pts, radius=0.2)
    # Minimum pairwise distance respects the radius.
    from scipy.spatial import cKDTree
    d, _ = cKDTree(down).query(down, k=2)
    assert d[:, 1].min() >= 0.2 - 1e-9
    assert len(down) < 200


def test_fscore_identical_clouds():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(2000, 3))
    r = f_score(pts, pts, tau=0.01)
    assert r["fscore"] == 1.0


def test_fscore_penalizes_offset():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(2000, 3))
    r = f_score(pts + np.array([0.05, 0, 0]), pts, tau=0.01)
    assert r["fscore"] < 0.2


def test_icp_recovers_transform():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (3000, 3))
    th = 0.05
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    t = np.array([0.02, -0.01, 0.015])
    moved = pts @ R.T + t
    T = icp_point_to_point(moved, pts, iters=30, max_corr=0.2)
    recovered = moved @ T[:3, :3].T + T[:3, 3]
    assert np.abs(recovered - pts).max() < 0.01


def test_voxel_downsample():
    pts = np.array([[0.0, 0, 0], [0.001, 0, 0], [1, 1, 1]])
    d = voxel_downsample(pts, 0.01)
    assert len(d) == 2
