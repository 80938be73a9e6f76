"""Export a TnT-style transforms.json with an aabb_range from a COLMAP model.

Behavioral reference: /root/reference/scripts/preprocess/convert_json.py —
estimate the scene center/radius either from pairwise closest points of the
camera look-at rays (concentric captures) or from the 3D point statistics
(mean +- 3 sigma box), then write transforms.json carrying `aabb_range` for
the TnT mesh-extraction preset (apps/render.py --tnt).

Usage: python scripts/preprocess/convert_json.py --data_dir <scene>
"""
from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from gs2m_tpu.data import colmap as cm  # noqa: E402


def closest_point(p1, d1, p2, d2):
    d1 = d1 / np.linalg.norm(d1)
    d2 = d2 / np.linalg.norm(d2)
    A = np.vstack((d1, -d2)).T
    b = p2 - p1
    t1, t2 = np.linalg.lstsq(A, b, rcond=None)[0]
    return 0.5 * ((p1 + d1 * t1) + (p2 + d2 * t2))


def bound_by_pose(images: dict):
    poses = []
    for img in images.values():
        w2c = np.eye(4)
        w2c[:3, :3] = cm.qvec_to_rotmat(img.qvec)
        w2c[:3, 3] = img.tvec
        poses.append(np.linalg.inv(w2c))
    center = np.zeros(3)
    for f in poses:
        for g in poses:
            center += closest_point(f[:3, 3], f[:3, 2], g[:3, 3], g[:3, 2])
    center /= len(poses) ** 2
    radius = float(np.mean([np.linalg.norm(f[:3, 3]) for f in poses]))
    box = [[center[i] - radius, center[i] + radius] for i in range(3)]
    return center, radius, box


def bound_by_points(xyz: np.ndarray):
    center = xyz.mean(0)
    std = xyz.std(0)
    radius = float(std.max() * 2)
    box = [[center[i] - 3 * std[i], center[i] + 3 * std[i]] for i in range(3)]
    return center, radius, box


def main():
    p = ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--by_points", action="store_true")
    args = p.parse_args()

    sparse = os.path.join(args.data_dir, "sparse/0")
    if os.path.exists(os.path.join(sparse, "images.bin")):
        images = cm.read_images_binary(os.path.join(sparse, "images.bin"))
    else:
        images = cm.read_images_text(os.path.join(sparse, "images.txt"))

    if args.by_points:
        if os.path.exists(os.path.join(sparse, "points3D.bin")):
            xyz, _, _ = cm.read_points3d_binary(os.path.join(sparse, "points3D.bin"))
        else:
            xyz, _, _ = cm.read_points3d_text(os.path.join(sparse, "points3D.txt"))
        center, radius, box = bound_by_points(xyz)
    else:
        center, radius, box = bound_by_pose(images)

    out = {"aabb_range": box, "center": center.tolist(), "radius": radius}
    path = os.path.join(args.data_dir, "transforms.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[>] Wrote {path}: center {np.round(center, 3).tolist()} "
          f"radius {radius:.3f}")


if __name__ == "__main__":
    main()
