"""Turntable visualization: orbit renders of a trained model -> GIF/WebP.

Replaces the reference's Blender (bpy) visualization scripts
(/root/reference/scripts/vis_dtu.py, vis_shiny.py, vis_blender.py) with the
framework's own renderer — no external DCC needed. Renders RGB (or the
normal/depth/albedo map) from a camera ring around the scene centroid.

Usage: python scripts/vis_turntable.py -m <model_dir> [--map render]
       [--frames 60] [--size 512] [--out turntable.webp]
"""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = ArgumentParser()
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--elevation", type=float, default=0.35)
    p.add_argument("--distance", type=float, default=-1.0)
    p.add_argument("--map", default="render",
                   choices=["render", "normal", "depth", "albedo"])
    p.add_argument("--out", default="")
    p.add_argument("--device", default="")
    p.add_argument("--sh_degree", type=int, default=3)
    args = p.parse_args()

    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from gs2m_tpu.core.camera import Camera
    from gs2m_tpu.core.gaussians import Gaussians
    from gs2m_tpu.data.ply import load_gaussian_ply
    from gs2m_tpu.data.scene import search_max_iteration
    from gs2m_tpu.models.render import render_jit
    from tests.make_synthetic_scene import ring_camera

    iteration = args.iteration
    if iteration == -1:
        iteration = search_max_iteration(
            os.path.join(args.model_path, "point_cloud"))
    ply = os.path.join(args.model_path, "point_cloud",
                       f"iteration_{iteration}", "point_cloud.ply")
    raw = load_gaussian_ply(ply)
    g = Gaussians.from_raw(raw, args.sh_degree)
    center = np.asarray(raw["xyz"]).mean(0)
    spread = np.linalg.norm(np.asarray(raw["xyz"]) - center, axis=1)
    dist = args.distance if args.distance > 0 else float(np.quantile(spread, 0.9) * 3)

    frames = []
    for i in range(args.frames):
        R, T = ring_camera(2 * np.pi * i / args.frames, dist=dist,
                           height=args.elevation * dist)
        # Orbit around the model centroid.
        T = T - (R.T @ center)
        cam = Camera.create(R, T, fovx=0.8, fovy=0.8,
                            width=args.size, height=args.size)
        pkg = render_jit(g, cam, jnp.zeros(3), args.sh_degree,
                         geometry_stage=args.map in ("normal", "depth"),
                         material_stage=args.map == "albedo",
                         backend="xla", chunk=256,
                         instance_cap=2 ** 20)
        if args.map == "render":
            img = np.clip(np.asarray(pkg["render"]).transpose(1, 2, 0), 0, 1)
        elif args.map == "normal":
            img = np.clip(np.asarray(pkg["normal_map"]).transpose(1, 2, 0)
                          * 0.5 + 0.5, 0, 1)
        elif args.map == "albedo":
            img = np.clip(np.asarray(pkg["albedo_map"]).transpose(1, 2, 0), 0, 1)
        else:
            d = np.asarray(pkg["depth_map"][0])
            lo, hi = np.percentile(d, 1), np.percentile(d, 99)
            img = np.repeat(((np.clip(d, lo, hi) - lo)
                             / (hi - lo + 1e-8))[..., None], 3, -1)
        frames.append((img * 255).astype(np.uint8))
        print(f"\r[>] frame {i + 1}/{args.frames}", end="", flush=True)
    print()

    out = args.out or os.path.join(args.model_path,
                                   f"turntable_{args.map}_{iteration}.webp")
    imageio.mimsave(out, frames, duration=80, loop=0)
    print(f"[>] Wrote {out}")


if __name__ == "__main__":
    main()
