"""ShinyBlender material-decomposition harness.

Behavioral reference: /root/reference/scripts/run_shiny.py — 6 scenes with
per-scene (reflection_threshold, lambda_smooth, lambda_normal) triples,
--material --eval --white_background, ball adds --mask_gt; Blender render
preset; wall-clock to runtime.json.

Usage: python scripts/run_shiny.py --data <shiny_root> --out output/shiny
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SCENES = ["helmet", "car", "teapot", "ball", "coffee", "toaster"]
REF_THRESHOLDS = [0.2, 0.5, 0.1, 0.4, 0.2, 0.1]
LAMBDA_SMOOTHS = [0.5, 0.0, 0.5, 0.1, 0.5, 0.8]
LAMBDA_NORMALS = [2.5, 0.5, 0.1, 8.0, 0.1, 4.0]


def run(cmd):
    print("[>] " + " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=ROOT,
                   env=dict(os.environ, PYTHONPATH=str(ROOT)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--out", default="output/shiny")
    p.add_argument("--scenes", nargs="+", default=SCENES)
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    label = "ours"
    runtimes = []
    for scene in args.scenes:
        i = SCENES.index(scene)
        t0 = time.time()
        train_args = ["--material", "--eval", "--white_background",
                      "--reflection_threshold", str(REF_THRESHOLDS[i]),
                      "--lambda_smooth", str(LAMBDA_SMOOTHS[i]),
                      "--lambda_normal", str(LAMBDA_NORMALS[i])]
        if scene == "ball":
            train_args.append("--mask_gt")
        run([sys.executable, "-m", "gs2m_tpu.apps.train",
             "-s", f"{args.data}/{scene}", "-m", f"{args.out}/{scene}",
             *train_args, *args.extra])
        run([sys.executable, "-m", "gs2m_tpu.apps.render",
             "-m", f"{args.out}/{scene}", "--blender", "--label", label])
        runtimes.append(time.time() - t0)
        run([sys.executable, "-m", "gs2m_tpu.apps.metrics",
             "-m", f"{args.out}/{scene}", "--split", "test"])

    runtime_file = Path(args.out) / "runtime.json"
    data = json.loads(runtime_file.read_text()) if runtime_file.exists() else {}
    data[label] = round(sum(runtimes) / len(runtimes) / 60, 2)
    runtime_file.write_text(json.dumps(data, indent=2))


if __name__ == "__main__":
    main()
