"""Tanks&Temples F-score evaluation (self-contained, no Open3D).

Behavioral reference: /root/reference/scripts/eval_tnt/ (the official TnT
toolbox): align the reconstruction to the GT point cloud (alignment
transform + ICP refinement), crop both to the judging volume, voxel-
downsample, then precision = fraction of recon points within tau of GT,
recall = fraction of GT points within tau of recon,
F = 2 P R / (P + R). Implemented with scipy cKDTree + a point-to-point ICP.

Usage: python scripts/eval_tnt.py --data mesh.ply --gt gt.ply \
           [--tau 0.01] [--alignment trafo.txt] [--crop crop.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from scipy.spatial import cKDTree

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    keys = np.floor(points / voxel).astype(np.int64)
    _, idx = np.unique(keys, axis=0, return_index=True)
    return points[np.sort(idx)]


def icp_point_to_point(src: np.ndarray, dst: np.ndarray, iters: int = 20,
                       max_corr: float = 0.05):
    """Rigid ICP src -> dst; returns a 4x4 transform."""
    T = np.eye(4)
    cur = src.copy()
    tree = cKDTree(dst)
    for _ in range(iters):
        d, j = tree.query(cur, k=1, workers=-1)
        m = d < max_corr
        if m.sum() < 10:
            break
        a = cur[m]
        b = dst[j[m]]
        ca, cb = a.mean(0), b.mean(0)
        Hm = (a - ca).T @ (b - cb)
        U, _, Vt = np.linalg.svd(Hm)
        R = Vt.T @ U.T
        if np.linalg.det(R) < 0:
            Vt[-1] *= -1
            R = Vt.T @ U.T
        t = cb - R @ ca
        step = np.eye(4)
        step[:3, :3] = R
        step[:3, 3] = t
        T = step @ T
        cur = cur @ R.T + t
    return T


def f_score(recon: np.ndarray, gt: np.ndarray, tau: float) -> dict:
    d_r2g, _ = cKDTree(gt).query(recon, k=1, workers=-1)
    d_g2r, _ = cKDTree(recon).query(gt, k=1, workers=-1)
    precision = float((d_r2g < tau).mean())
    recall = float((d_g2r < tau).mean())
    f = (2 * precision * recall / (precision + recall)
         if precision + recall > 0 else 0.0)
    return {"precision": precision, "recall": recall, "fscore": f, "tau": tau}


def evaluate(data_ply: str, gt_ply: str, tau: float = 0.01,
             alignment: str | None = None, crop_json: str | None = None,
             icp: bool = True, out_dir: str = ".") -> dict:
    from gs2m_tpu.data.ply import fetch_mesh, fetch_point_cloud

    verts, faces, _ = fetch_mesh(data_ply)
    if len(faces) > 0:
        from scripts.eval_dtu import sample_mesh_surface
        recon = sample_mesh_surface(verts.astype(np.float64), faces, tau / 2)
    else:
        recon = verts.astype(np.float64)
    gt, _, _ = fetch_point_cloud(gt_ply)
    gt = gt.astype(np.float64)

    if alignment and os.path.exists(alignment):
        M = np.loadtxt(alignment).reshape(4, 4)
        recon = recon @ M[:3, :3].T + M[:3, 3]

    if crop_json and os.path.exists(crop_json):
        with open(crop_json) as f:
            crop = json.load(f)
        lo = np.array(crop["min"])
        hi = np.array(crop["max"])
        recon = recon[((recon >= lo) & (recon <= hi)).all(-1)]
        gt = gt[((gt >= lo) & (gt <= hi)).all(-1)]

    recon = voxel_downsample(recon, tau / 2)
    gt_d = voxel_downsample(gt, tau / 2)

    if icp and len(recon) > 100:
        T = icp_point_to_point(voxel_downsample(recon, tau * 2),
                               voxel_downsample(gt_d, tau * 2),
                               max_corr=tau * 10)
        recon = recon @ T[:3, :3].T + T[:3, 3]

    result = f_score(recon, gt_d, tau)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "evaluation.json"), "w") as f:
        json.dump(result, f, indent=True)
    print(f"[>] F-score@{tau}: {result['fscore']:.4f} "
          f"(P {result['precision']:.4f} R {result['recall']:.4f})")
    return result


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--gt", type=str, required=True)
    p.add_argument("--tau", type=float, default=0.01)
    p.add_argument("--alignment", type=str, default=None)
    p.add_argument("--crop", type=str, default=None)
    p.add_argument("--no-icp", action="store_true")
    p.add_argument("--out_dir", type=str, default=".")
    a = p.parse_args()
    evaluate(a.data, a.gt, a.tau, a.alignment, a.crop, not a.no_icp, a.out_dir)
