"""COLMAP SfM pipeline wrapper (feature extract -> match -> map -> undistort).

Behavioral reference: /root/reference/scripts/colmap.py:13-123 (itself based
on the 3DGS convert.py): runs the external `colmap` binary over
<source>/input images and lays out sparse/0 + images/ the way the data layer
expects. Gated on the binary being installed.

Usage: python scripts/colmap.py -s <source_path> [--camera OPENCV]
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys
from argparse import ArgumentParser


def run(cmd: list[str]):
    print("[>] " + " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def main():
    p = ArgumentParser()
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--camera", default="OPENCV")
    p.add_argument("--colmap_executable", default="colmap")
    p.add_argument("--no_gpu", action="store_true")
    args = p.parse_args()

    exe = args.colmap_executable
    if shutil.which(exe) is None:
        sys.exit(f"[!] '{exe}' not found — install COLMAP "
                 "(https://colmap.github.io/install.html) first")
    src = args.source_path
    gpu = "0" if args.no_gpu else "1"
    os.makedirs(f"{src}/distorted/sparse", exist_ok=True)

    run([exe, "feature_extractor", "--database_path", f"{src}/distorted/database.db",
         "--image_path", f"{src}/input", "--ImageReader.single_camera", "1",
         "--ImageReader.camera_model", args.camera,
         "--SiftExtraction.use_gpu", gpu])
    run([exe, "exhaustive_matcher", "--database_path",
         f"{src}/distorted/database.db", "--SiftMatching.use_gpu", gpu])
    run([exe, "mapper", "--database_path", f"{src}/distorted/database.db",
         "--image_path", f"{src}/input", "--output_path", f"{src}/distorted/sparse",
         "--Mapper.ba_global_function_tolerance=0.000001"])
    run([exe, "image_undistorter", "--image_path", f"{src}/input",
         "--input_path", f"{src}/distorted/sparse/0", "--output_path", src,
         "--output_type", "COLMAP"])

    # image_undistorter writes sparse/*; the readers expect sparse/0/*.
    os.makedirs(f"{src}/sparse/0", exist_ok=True)
    for f in os.listdir(f"{src}/sparse"):
        if f != "0":
            shutil.move(os.path.join(src, "sparse", f),
                        os.path.join(src, "sparse", "0", f))
    print("[>] COLMAP pipeline complete")


if __name__ == "__main__":
    main()
