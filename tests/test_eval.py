"""Geometry-eval machinery: surface sampling, downsample, F-score, ICP."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from eval_dtu import radius_downsample, sample_mesh_surface  # noqa: E402
from eval_tnt import (CropVolume, f_score, icp_similarity,  # noqa: E402
                      read_trajectory_log, umeyama_similarity,
                      voxel_downsample, write_trajectory_log)


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
    T = icp_similarity(moved, pts, threshold=0.2, iters=30)
    recovered = moved @ T[:3, :3].T + T[:3, 3]
    assert np.abs(recovered - pts).max() < 0.01


def test_voxel_downsample():
    pts = np.array([[0.0, 0, 0], [0.001, 0, 0], [1, 1, 1]])
    d = voxel_downsample(pts, 0.01)
    assert len(d) == 2


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(5)
    pts = rng.uniform(-1, 1, (200, 3))
    th = 0.6
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    s, t = 2.3, np.array([0.5, -1.0, 0.25])
    moved = s * pts @ R.T + t
    T = umeyama_similarity(pts, moved)
    np.testing.assert_allclose(pts @ (T[:3, :3]).T + T[:3, 3], moved,
                               atol=1e-9)


def test_trajectory_log_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    poses = np.tile(np.eye(4), (5, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(5, 3))
    path = str(tmp_path / "traj.log")
    write_trajectory_log(poses, path)
    back = read_trajectory_log(path)
    np.testing.assert_allclose(back, poses, atol=1e-10)


def test_crop_volume_polygon(tmp_path):
    import json
    vol_json = {"orthogonal_axis": "Y", "axis_min": 0.0, "axis_max": 1.0,
                "bounding_polygon": [[0, 0, 0], [2, 0, 0], [2, 0, 2],
                                     [0, 0, 2]]}
    path = str(tmp_path / "crop.json")
    json.dump(vol_json, open(path, "w"))
    vol = CropVolume.load(path)
    pts = np.array([[1.0, 0.5, 1.0],    # inside
                    [3.0, 0.5, 1.0],    # outside polygon (x > 2)
                    [1.0, 1.5, 1.0],    # above axis_max
                    [1.0, -0.1, 1.0]])  # below axis_min
    got = vol.contains(pts)
    np.testing.assert_array_equal(got, [True, False, False, False])


def test_tnt_trajectory_protocol_end_to_end(tmp_path):
    """Synthetic official-protocol run: a known similarity misalignment is
    recovered from camera trajectories + ICP, yielding F ~ 1 (run.py:141-161
    semantics)."""
    import json

    from eval_tnt import evaluate
    from gs2m_tpu.data.ply import store_mesh, store_point_cloud

    rng = np.random.default_rng(7)
    gt_pts = rng.uniform(0.2, 1.8, (4000, 3))

    th = 0.3
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    s, t = 1.7, np.array([0.4, -0.2, 0.9])
    M = np.eye(4); M[:3, :3] = s * R; M[:3, 3] = t
    inv = np.linalg.inv(M)

    # Recon lives in the EST frame = inv(M) of GT frame.
    recon_pts = gt_pts @ inv[:3, :3].T + inv[:3, 3]
    # Camera rings in both frames (same physical cameras).
    cams_gt = np.tile(np.eye(4), (12, 1, 1))
    cams_gt[:, :3, 3] = np.stack([2 * np.cos(np.linspace(0, 6, 12)),
                                  np.linspace(0, 1, 12),
                                  2 * np.sin(np.linspace(0, 6, 12))], -1)
    cams_est = cams_gt.copy()
    cams_est[:, :3, 3] = cams_gt[:, :3, 3] @ inv[:3, :3].T + inv[:3, 3]

    d = tmp_path
    store_point_cloud(str(d / "gt.ply"), gt_pts.astype(np.float32),
                      np.zeros_like(gt_pts, dtype=np.float32))
    # recon as a tiny mesh (vertices only usage is fine; fake 2 faces).
    faces = np.array([[0, 1, 2], [1, 2, 3]], np.int32)
    store_mesh(str(d / "recon.ply"), recon_pts.astype(np.float32), faces)
    write_trajectory_log(cams_est, str(d / "est.log"))
    write_trajectory_log(cams_gt, str(d / "gt.log"))
    np.savetxt(str(d / "trans.txt"), np.eye(4))
    json.dump({"orthogonal_axis": "Y", "axis_min": -10.0, "axis_max": 10.0,
               "bounding_polygon": [[-10, 0, -10], [10, 0, -10], [10, 0, 10],
                                    [-10, 0, 10]]},
              open(str(d / "crop.json"), "w"))

    res = evaluate(str(d / "recon.ply"), str(d / "gt.ply"), tau=0.05,
                   crop_json=str(d / "crop.json"), out_dir=str(d),
                   traj=str(d / "est.log"), gt_traj=str(d / "gt.log"),
                   gt_trans=str(d / "trans.txt"))
    assert res["fscore"] > 0.95
