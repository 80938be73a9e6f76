"""Turntable visualization: orbit renders of a trained model -> GIF/WebP.

Replaces the reference's Blender (bpy) visualization scripts
(/root/reference/scripts/vis_dtu.py, vis_shiny.py, vis_blender.py) with the
framework's own renderer — no external DCC needed. Two modes:

* Gaussian model: RGB / normal / depth / albedo map orbits (default).
* Extracted MESH (`--mesh tsdf_post.ply`): the reference's diffuse-shaded
  mesh turntable (vis_dtu.py prepare_blender_scene + Principled BSDF) —
  rebuilt by converting triangles to flat surfel splats (one thin Gaussian
  per face, oriented by the face normal, sized by the face area) and
  rendering them with the SAME tiled rasterizer, headlight-Lambert shaded
  per frame. No bpy, fully accelerator-native.

Usage: python scripts/vis_turntable.py -m <model_dir> [--map render]
       [--mesh <mesh.ply>] [--frames 60] [--size 512] [--out turntable.webp]
"""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """(N, 3, 3) rotation matrices -> (N, 4) quaternions (r, x, y, z),
    numerically robust (largest-component method, vectorized)."""
    m = R
    t = np.trace(m, axis1=1, axis2=2)
    q = np.zeros((len(m), 4), np.float64)
    # Case trace > 0.
    s = np.sqrt(np.maximum(t + 1.0, 1e-12)) * 2
    q[:, 0] = 0.25 * s
    q[:, 1] = (m[:, 2, 1] - m[:, 1, 2]) / s
    q[:, 2] = (m[:, 0, 2] - m[:, 2, 0]) / s
    q[:, 3] = (m[:, 1, 0] - m[:, 0, 1]) / s
    # Fall back per-row where the trace path is ill-conditioned.
    bad = t <= 0
    for i in np.nonzero(bad)[0]:
        M = m[i]
        k = np.argmax([M[0, 0], M[1, 1], M[2, 2]])
        if k == 0:
            s_ = np.sqrt(max(1.0 + M[0, 0] - M[1, 1] - M[2, 2], 1e-12)) * 2
            q[i] = [(M[2, 1] - M[1, 2]) / s_, 0.25 * s_,
                    (M[0, 1] + M[1, 0]) / s_, (M[0, 2] + M[2, 0]) / s_]
        elif k == 1:
            s_ = np.sqrt(max(1.0 + M[1, 1] - M[0, 0] - M[2, 2], 1e-12)) * 2
            q[i] = [(M[0, 2] - M[2, 0]) / s_, (M[0, 1] + M[1, 0]) / s_,
                    0.25 * s_, (M[1, 2] + M[2, 1]) / s_]
        else:
            s_ = np.sqrt(max(1.0 + M[2, 2] - M[0, 0] - M[1, 1], 1e-12)) * 2
            q[i] = [(M[1, 0] - M[0, 1]) / s_, (M[0, 2] + M[2, 0]) / s_,
                    (M[1, 2] + M[2, 1]) / s_, 0.25 * s_]
    return (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)


def mesh_to_surfels(mesh_ply: str):
    """Triangles -> flat surfel splats: (centers, quats, log_scales, normals).

    One thin Gaussian per face: tangent axes sized by the face area, the
    normal axis collapsed — dense TSDF meshes blend into a watertight-looking
    diffuse surface under the standard rasterizer."""
    from gs2m_tpu.data.ply import fetch_mesh

    verts, faces, _ = fetch_mesh(mesh_ply)
    v = verts[faces].astype(np.float64)          # (F, 3, 3)
    centers = v.mean(1)
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    n = np.cross(e1, e2)
    area = 0.5 * np.linalg.norm(n, axis=1)
    n = n / (np.linalg.norm(n, axis=1, keepdims=True) + 1e-12)
    t1 = e1 / (np.linalg.norm(e1, axis=1, keepdims=True) + 1e-12)
    t2 = np.cross(n, t1)
    R = np.stack([t1, t2, n], axis=-1)           # columns = splat axes
    quats = _rotmat_to_quat(R)
    s = np.sqrt(np.maximum(area, 1e-12))         # tangent sigma ~ face size
    log_scales = np.log(np.stack([s * 0.9, s * 0.9, s * 1e-3], -1) + 1e-12)
    return (centers.astype(np.float32), quats,
            log_scales.astype(np.float32), n.astype(np.float32))


def render_mesh_turntable(args, imageio):
    import dataclasses

    import jax.numpy as jnp

    from gs2m_tpu.core.camera import Camera
    from gs2m_tpu.core.gaussians import Gaussians, inverse_sigmoid
    from gs2m_tpu.core.sh import C0
    from gs2m_tpu.models.render import render_jit
    from tests.make_synthetic_scene import ring_camera

    centers, quats, log_scales, normals = mesh_to_surfels(args.mesh)
    F = len(centers)
    g = Gaussians.create(centers, np.full((F, 3), 0.8, np.float32),
                         max_sh_degree=0, capacity=F)
    g = dataclasses.replace(
        g, rotation=jnp.asarray(quats), scaling=jnp.asarray(log_scales),
        opacity=jnp.full((F, 1), float(inverse_sigmoid(jnp.float32(0.97)))))

    center = centers.mean(0)
    spread = np.linalg.norm(centers - center, axis=1)
    dist = args.distance if args.distance > 0 else float(
        np.quantile(spread, 0.9) * 3)

    base = np.array([0.82, 0.8, 0.78], np.float32)  # Principled-ish gray
    frames = []
    for i in range(args.frames):
        R, T = ring_camera(2 * np.pi * i / args.frames, dist=dist,
                           height=args.elevation * dist)
        T = T - (R.T @ center)
        cam = Camera.create(R, T, fovx=0.8, fovy=0.8,
                            width=args.size, height=args.size)
        # Headlight Lambert per frame (vis_dtu.py's diffuse look).
        view = np.asarray(cam.cam_center) - centers
        view /= np.linalg.norm(view, axis=1, keepdims=True) + 1e-12
        lam = np.abs((normals * view).sum(1, keepdims=True))
        col = np.clip(base[None] * (0.25 + 0.75 * lam), 0, 1)
        dc = ((col - 0.5) / C0).astype(np.float32)
        gf = dataclasses.replace(g, features_dc=jnp.asarray(dc[:, None, :]))
        pkg = render_jit(gf, cam, jnp.ones(3), 0, backend="xla", chunk=256,
                         instance_cap=2 ** 21)
        img = np.clip(np.asarray(pkg["render"]).transpose(1, 2, 0), 0, 1)
        frames.append((img * 255).astype(np.uint8))
        print(f"\r[>] mesh frame {i + 1}/{args.frames}", end="", flush=True)
    print()
    out = args.out or os.path.join(
        os.path.dirname(args.mesh) or ".", "turntable_mesh.webp")
    imageio.mimsave(out, frames, duration=80, loop=0)
    print(f"[>] Wrote {out}")


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
    p.add_argument("--mesh", default="",
                   help="render this mesh PLY as diffuse-shaded surfels "
                        "instead of the Gaussian model")
    p.add_argument("--out", default="")
    p.add_argument("--device", default="")
    p.add_argument("--sh_degree", type=int, default=3)
    args = p.parse_args()

    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)
    import imageio.v2 as imageio
    import jax.numpy as jnp

    if args.mesh:
        return render_mesh_turntable(args, imageio)

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
