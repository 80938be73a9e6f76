"""GlossyBlender (NeRO synthetic) harness — 10k-iteration material runs.

Behavioral reference: /root/reference/scripts/run_glossy.py:30-48.
Usage: python scripts/run_glossy.py --data <glossy_root> --out output/glossy
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
SCENES = ["angel", "bell", "cat", "horse", "luyu", "potion", "tbell", "teapot"]


def run(cmd):
    print("[>] " + " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=ROOT,
                   env=dict(os.environ, PYTHONPATH=str(ROOT)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--out", default="output/glossy")
    p.add_argument("--scenes", nargs="+", default=SCENES)
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    label = "ours"
    runtimes = []
    for scene in args.scenes:
        t0 = time.time()
        run([sys.executable, "-m", "gs2m_tpu.apps.train",
             "-s", f"{args.data}/{scene}_blender", "-m", f"{args.out}/{scene}",
             "--mask_gt", "--material", "--eval", "--white_background",
             "--reflection_threshold", "0.2", "--lambda_smooth", "0.5",
             "--lambda_normal", "0.5", "--iterations", "10000", *args.extra])
        run([sys.executable, "-m", "gs2m_tpu.apps.render",
             "-m", f"{args.out}/{scene}", "--blender", "--iteration", "10000",
             "--label", label])
        runtimes.append(time.time() - t0)

    runtime_file = Path(args.out) / "runtime.json"
    data = json.loads(runtime_file.read_text()) if runtime_file.exists() else {}
    data[label] = round(sum(runtimes) / len(runtimes) / 60, 2)
    runtime_file.write_text(json.dumps(data, indent=2))


if __name__ == "__main__":
    main()
