"""Tanks&Temples harness: train -> mesh -> F-score.

Behavioral reference: /root/reference/scripts/run_tnt.py — per-scene
training with --densify_grad_abs_threshold 0.00015 --opacity_prune_threshold
0.05 -r 2, --tnt render preset, the Truck pi/8 y-rotation fix before eval.

Usage: python scripts/run_tnt.py --data <tnt_root> --out output/tnt
       (expects <scene>/<scene>.ply GT point cloud for the F-score)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
SCENES = ["Barn", "Truck"]


def run(cmd):
    print("[>] " + " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=ROOT,
                   env=dict(os.environ, PYTHONPATH=str(ROOT)))


def rotate_truck_mesh(mesh_path: str):
    """The reference's Truck alignment fix (run_tnt.py:45-54)."""
    sys.path.insert(0, str(ROOT))
    from gs2m_tpu.data.ply import fetch_mesh, store_mesh

    v, f, c = fetch_mesh(mesh_path)
    th = np.pi / 8
    R = np.array([[np.cos(th), 0, np.sin(th)],
                  [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    store_mesh(mesh_path, (v @ R.T).astype(np.float32), f, c)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--out", default="output/tnt")
    p.add_argument("--scenes", nargs="+", default=SCENES)
    p.add_argument("--iterations", type=int, default=30_000)
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    label = "ours_wo-brdf"
    runtimes = []
    for scene in args.scenes:
        t0 = time.time()
        run([sys.executable, "-m", "gs2m_tpu.apps.train",
             "-s", f"{args.data}/{scene}", "-m", f"{args.out}/{scene}",
             "-r", "2", "--densify_grad_abs_threshold", "0.00015",
             "--opacity_prune_threshold", "0.05",
             "--iterations", str(args.iterations), *args.extra])
        run([sys.executable, "-m", "gs2m_tpu.apps.render",
             "-m", f"{args.out}/{scene}", "--tnt", "--label", label])
        runtimes.append(time.time() - t0)

        mesh = (f"{args.out}/{scene}/train/{label}_{args.iterations}"
                "/mesh/tsdf_post.ply")
        if scene == "Truck":
            rotate_truck_mesh(mesh)
        gt = f"{args.data}/{scene}/{scene}.ply"
        if os.path.exists(gt):
            cmd = [sys.executable, "scripts/eval_tnt.py", "--data", mesh,
                   "--gt", gt, "--scene", scene,
                   "--out_dir", f"{args.out}/{scene}/evaluation"]
            # Official protocol files, when present (TnT training-data kit):
            # COLMAP SfM log + GT alignment + cropfile -> trajectory-based
            # registration (eval_tnt/run.py:75-88). Estimated trajectory from
            # the trained model's cameras.json.
            gt_traj = f"{args.data}/{scene}/{scene}_COLMAP_SfM.log"
            gt_trans = f"{args.data}/{scene}/{scene}_trans.txt"
            cropfile = f"{args.data}/{scene}/{scene}.json"
            if os.path.exists(gt_traj):
                cmd += ["--traj", f"{args.out}/{scene}/cameras.json",
                        "--gt-traj", gt_traj]
                if os.path.exists(gt_trans):
                    cmd += ["--gt-trans", gt_trans]
            if os.path.exists(cropfile):
                cmd += ["--crop", cropfile]
            run(cmd)
        else:
            print(f"[!] GT point cloud {gt} not found; skipping F-score")

    runtime_file = Path(args.out) / "runtime.json"
    data = json.loads(runtime_file.read_text()) if runtime_file.exists() else {}
    data[label] = round(sum(runtimes) / len(runtimes) / 60, 2)
    runtime_file.write_text(json.dumps(data, indent=2))


if __name__ == "__main__":
    main()
