"""Material-stage quality gate: train a glossy scene on TPU, with numbers.

The GlossyBlender protocol (/root/reference/scripts/run_glossy.py:36:
`--mask_gt --material --eval --white_background --reflection_threshold 0.2
--lambda_smooth 0.5 --lambda_normal 0.5 --iterations 10000`) run end-to-end
on the synthetic specular sphere under a KNOWN analytic environment light
(tests/make_synthetic_scene.build_glossy), so recovery is checkable:

  1. build the glossy scene (two-ring cameras, banded albedo, glossy/rough
     hemispheres, masks)
  2. train warmup -> geometry -> material on-chip
  3. render the decomposition (albedo/roughness/metallic/diffuse/specular
     maps + envmap via apps/render --material)
  4. gate checks: PBR test PSNR, roughness-zone ordering (recovered glossy
     hemisphere < rough hemisphere), envmap-vs-analytic correlation, and the
     Lr activity rate from train_log.jsonl
  5. write material_gate.json

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/run_material_gate.py \
      [--out /tmp/gs2m_material] [--iterations 10000] [--skip_train]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd, **kw):
    print("[run]", " ".join(cmd), flush=True)
    if cmd[0] == sys.executable and cmd[1] != "-u":
        cmd = [cmd[0], "-u", *cmd[1:]]
    # Init-time TPU-claim retry (scripts/tpu_retry.py).
    cmd = [sys.executable, os.path.join(REPO, "scripts", "tpu_retry.py"),
           "--", *cmd]
    subprocess.run(cmd, check=True, cwd=REPO, **kw)


def envmap_recovery(lighting_pkl: str, n_dirs: int = 4096) -> dict:
    """Correlation between the learned cubemap and the analytic light."""
    import pickle

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gs2m_tpu.pbr.cubemap import cube_lookup
    from tests.make_synthetic_scene import analytic_env

    with open(lighting_pkl, "rb") as f:
        base = jnp.asarray(pickle.load(f))
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n_dirs, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    got = np.asarray(cube_lookup(base, jnp.asarray(d, jnp.float32)))
    want = analytic_env(d)
    lum = lambda x: x @ np.array([0.2126, 0.7152, 0.0722])
    gl, wl = lum(got), lum(want)
    corr = float(np.corrcoef(gl, wl)[0, 1])
    return {"luminance_corr": corr,
            "got_mean": float(gl.mean()), "want_mean": float(wl.mean()),
            "got_p95": float(np.quantile(gl, 0.95)),
            "want_p95": float(np.quantile(wl, 0.95))}


def roughness_zones(model_dir: str, iteration: int) -> dict:
    """Mean recovered per-Gaussian roughness in the glossy (y<0 world) vs
    rough (y>0) hemisphere, read straight from the snapshot PLY — the scene
    was built with roughness 0.1 / 0.5 in those zones
    (tests/make_synthetic_scene.build_glossy)."""
    from gs2m_tpu.data.ply import load_gaussian_ply

    raw = load_gaussian_ply(os.path.join(
        model_dir, "point_cloud", f"iteration_{iteration}", "point_cloud.ply"))
    xyz = raw["xyz"]
    sig = lambda x: 1.0 / (1.0 + np.exp(-x))
    rough = sig(raw["roughness"].reshape(-1))
    # Only near-surface points vote (densified strays dilute the zones).
    rad = np.linalg.norm(xyz, axis=1)
    on = np.abs(rad - 1.0) < 0.15
    glossy = rough[on & (xyz[:, 1] < 0.0)]
    roughz = rough[on & (xyz[:, 1] > 0.0)]
    return {"glossy_zone_mean": float(glossy.mean()),
            "rough_zone_mean": float(roughz.mean()),
            "n_glossy": int(glossy.size), "n_rough": int(roughz.size),
            "ordering_ok": bool(glossy.mean() < roughz.mean())}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/gs2m_material")
    ap.add_argument("--iterations", type=int, default=10_000)
    ap.add_argument("--views", type=int, default=36)
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--height", type=int, default=300)
    ap.add_argument("--points", type=int, default=20_000)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--device", default=None,
                    help="force a jax platform for ALL stages (e.g. cpu)")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--chunk", type=int, default=None)
    args = ap.parse_args(argv)

    scene_dir = os.path.join(args.out, "scene")
    model_dir = os.path.join(args.out, "model")
    py = sys.executable

    if not os.path.exists(os.path.join(scene_dir, "sparse/0/images.bin")):
        print("[>] Building glossy scene", flush=True)
        # GT renders on the chip: 36 views at 400x300 through the XLA twin
        # is seconds on TPU but hours on this 1-core host — except when the
        # whole gate is forced to CPU, where the scene is sized down anyway.
        dev_prelude = ("import jax; jax.config.update('jax_platforms', "
                       "'cpu');") if args.device == "cpu" else ""
        run([py, "-c",
             dev_prelude +
             "import sys; sys.path.insert(0, 'tests');"
             "from make_synthetic_scene import build_glossy;"
             f"build_glossy('{scene_dir}', n_views={args.views}, "
             f"width={args.width}, height={args.height}, "
             f"n_points={args.points})"])

    extra_flags = []
    if args.device:
        extra_flags += ["--device", args.device]
    if args.backend != "pallas":
        extra_flags += ["--no-use_pallas"]
    if args.chunk:
        extra_flags += ["--chunk", str(args.chunk)]
    if args.iterations < 10_000:
        # Same stage STRUCTURE as the 10k glossy protocol, compressed: the
        # material stage still gets the second half of the run (the trainer
        # maps material_from_iter = geometry_from_iter under --material),
        # and opacity resets still fire a few times before it starts.
        extra_flags += ["--geometry_from_iter", str(args.iterations // 2),
                        "--opacity_reset_interval",
                        str(max(400, (3 * args.iterations) // 10))]

    t0 = time.time()
    if not args.skip_train:
        # Auto-resume from the newest checkpoint on a mid-run tunnel drop
        # (same policy as the production quality gate).
        from scripts.run_quality_gate import run_train_resumable
        its = args.iterations
        test_iters = tuple(sorted({its // 5, its // 2, (7 * its) // 10, its}))
        run_train_resumable(
            [py, "-m", "gs2m_tpu.apps.train",
             "-s", scene_dir, "-m", model_dir,
             "--mask_gt", "--material", "--eval", "--white_background",
             "--masks", "masks", "-r", "1",
             "--reflection_threshold", "0.2", "--lambda_smooth", "0.5",
             "--lambda_normal", "0.5",
             "--iterations", str(args.iterations), *extra_flags,
             "--test_iterations", *[str(v) for v in test_iters],
             "--save_iterations", str(args.iterations),
             "--checkpoint_iterations", *[str(v) for v in test_iters]],
            model_dir)
    train_min = (time.time() - t0) / 60.0

    dev_flags = ["--device", args.device] if args.device else []
    run([py, "-m", "gs2m_tpu.apps.render", "-m", model_dir,
         "--iteration", str(args.iterations), "--label", "ours", *dev_flags])
    run([py, "-m", "gs2m_tpu.apps.metrics", "-m", model_dir, *dev_flags])
    # Held-out PBR metrics — the gate's metrics["test"] field reads this.
    run([py, "-m", "gs2m_tpu.apps.metrics", "-m", model_dir,
         "--split", "test", *dev_flags])

    # Gate checks.
    light_pkl = os.path.join(model_dir, "point_cloud",
                             f"iteration_{args.iterations}", "lighting.pkl")
    env = envmap_recovery(light_pkl)
    zones = roughness_zones(model_dir, args.iterations)

    metrics = {}
    for split in ("test", "train"):
        p = os.path.join(model_dir, f"metrics_{split}.json")
        if os.path.exists(p):
            metrics[split] = json.load(open(p))

    rough_active = mv_active = None
    test_psnrs = []
    log_path = os.path.join(model_dir, "train_log.jsonl")
    if os.path.exists(log_path):
        for line in open(log_path):
            rec = json.loads(line)
            rough_active = rec.get("rough_active", rough_active)
            mv_active = rec.get("mv_active", mv_active)
            if "test_psnr" in rec:
                test_psnrs.append((rec["iteration"], rec["test_psnr"]))

    result = {
        "scene": "glossy_sphere_analytic_env",
        "protocol": (f"run_glossy ({args.iterations} iters, "
                     "reflection_threshold 0.2)"),
        "resolution": f"{args.width}x{args.height}",
        "iterations": args.iterations,
        "train_minutes": round(train_min, 2),
        "test_psnr_trajectory": test_psnrs,
        "metrics": metrics,
        "envmap_recovery": env,
        "roughness_zones": zones,
        "rough_active_steps": rough_active,
        "mv_active_steps": mv_active,
        "pass": bool(zones["ordering_ok"] and env["luminance_corr"] > 0.5),
    }
    out_json = os.path.join(args.out, "material_gate.json")
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    print("[>] material gate:", json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
