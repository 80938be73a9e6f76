"""Convert a NeRO GlossySynthetic scene to the Blender transforms format.

Behavioral reference: /root/reference/scripts/preprocess/nero2blender.py —
reads the per-image `{k}-camera.pkl` (pose (3,4) + K (3,3)) files, splits
every-8th into test, writes transforms_{train,test}.json with the
opencv->opengl axis flip, and copies images into rgb/.

Usage: python scripts/preprocess/nero2blender.py --path <root> --scene bell
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import pickle
import shutil

import numpy as np


def read_pickle(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--path", type=str, required=True)
    p.add_argument("--scene", type=str, required=True)
    opt = p.parse_args()

    root = os.path.join(opt.path, opt.scene)
    out = os.path.join(opt.path, opt.scene + "_blender")
    os.makedirs(os.path.join(out, "rgb"), exist_ok=True)

    img_num = len(glob.glob(f"{root}/*-camera.pkl"))
    cams = [read_pickle(f"{root}/{k}-camera.pkl") for k in range(img_num)]
    img_files = [f"{root}/{k}.png" for k in range(img_num)]

    test_ids = [i for i in range(img_num) if i % 8 == 0]
    train_ids = [i for i in range(img_num) if i % 8 != 0]

    for split, ids in (("train", train_ids), ("test", test_ids)):
        frames = []
        for i in ids:
            w2c = np.concatenate([np.asarray(cams[i][0]),
                                  np.array([[0, 0, 0, 1.0]])], 0)
            c2w = np.linalg.inv(w2c)
            c2w[:3, 1:3] *= -1  # opencv -> blender/opengl
            frames.append({
                "file_path": os.path.join(
                    "rgb", os.path.basename(img_files[i])).replace(".png", ""),
                "transform_matrix": c2w.tolist(),
            })
        K = np.asarray(cams[ids[0]][1])
        fl_x, fl_y = float(K[0, 0]), float(K[1, 1])
        transforms = {
            "w": 800, "h": 800, "fl_x": fl_x, "fl_y": fl_y,
            "cx": 400, "cy": 400,
            "camera_angle_x": float(2 * np.arctan(400 / fl_x)),
            "frames": frames,
        }
        path = os.path.join(out, f"transforms_{split}.json")
        with open(path, "w") as f:
            json.dump(transforms, f, indent=2)
        print(f"[>] wrote {path} ({len(frames)} frames)")

    for f in img_files:
        if os.path.exists(f):
            shutil.copy(f, os.path.join(out, "rgb", os.path.basename(f)))
    pts = os.path.join(root, "eval_pts.ply")
    if os.path.exists(pts):
        shutil.copy(pts, os.path.join(out, "points3d.ply"))
    print(f"[>] converted {opt.scene} -> {out}")


if __name__ == "__main__":
    main()
