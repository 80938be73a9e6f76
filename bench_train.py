"""Training-throughput benchmark: geometry-stage it/s at DTU-like scale.

The number that decides whether a 30k-iteration run takes one hour or ten
(the reference logs iter_time as a first-class metric, train.py:66-67,192).
Drives the REAL Trainer (staged objective: main render + neighbor render +
multi-view/depth-normal/plane losses + Adam + densify-stat accumulation) on
a synthetic scene at 800x600 (DTU -r2) with a configurable Gaussian count,
and prints one JSON line:

  {"metric": "train_geometry_it_per_s", "value": ..., "unit": "it/s",
   "step_ms": ..., "gaussians": ..., "projected_30k_min": ...}

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python bench_train.py \
      [--gaussians 300000] [--width 800] [--height 600] [--iters 30]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_scene(n_views, width, height, n_points, seed=0,
                point_scale=None, term_cut=False):
    import jax.numpy as jnp

    from gs2m_tpu.core.config import ModelConfig, OptimConfig, PipelineConfig
    from gs2m_tpu.data.readers import CameraInfo, SceneInfo
    from gs2m_tpu.data.scene import Scene
    from tests.make_synthetic_scene import ring_camera

    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-1.6, 1.6, n_points),
        rng.uniform(-1.2, 1.2, n_points),
        rng.uniform(-1.0, 1.0, n_points),
    ], -1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n_points, 3)).astype(np.float32)
    msd = (np.full(n_points, point_scale ** 2, np.float32)
           if point_scale else None)

    infos = []
    fx = 1.1 * width
    for i in range(n_views):
        R, T = ring_camera(2 * np.pi * i / n_views)
        infos.append(CameraInfo(uid=i, R=R, T=T, fx=fx, fy=fx, width=width,
                                height=height, image_name=f"v{i}",
                                image_path=""))
    info = SceneInfo(points=pts, colors=cols, normals=np.zeros_like(pts),
                     train_cameras=infos, test_cameras=[],
                     translate=np.zeros(3), radius=5.0)
    mc = ModelConfig(resolution=1, sh_degree=3)
    opt = OptimConfig(geometry_from_iter=0,
                      multi_view_max_angle=179.0, multi_view_max_dist=100.0,
                      nearby_cam_max_angle=179.0, nearby_cam_max_dist=100.0)
    # Fixed-population bench (no densification inside the window): a lean
    # instance multiplier — overflow growth would resize it automatically.
    pipe = PipelineConfig(chunk=128, use_pallas=True, instance_cap_mult=2.0,
                          term_cut=term_cut)
    scene = Scene(mc, resolution_scale=1.0, shuffle=False, load_images=False,
                  scene_info=info)
    scene.gt_images = jnp.asarray(
        rng.uniform(0, 1, (n_views, 3, height, width)).astype(np.float32))
    scene.alpha_masks = jnp.ones((n_views, 1, height, width), jnp.float32)
    scene.training_setup(opt)
    return mc, pipe, opt, scene


def build_trainer(args):
    """Scene + Trainer at the bench operating point, instance cap presized
    from a measured probe, warmed up to a non-dropping steady state.
    Shared with scripts/profile_step.py --train."""
    import jax.numpy as jnp

    from gs2m_tpu.train.trainer import Trainer

    mc, pipe, opt, scene = build_scene(args.views, args.width, args.height,
                                       args.gaussians,
                                       term_cut=getattr(args, "term_cut",
                                                        False))
    cap = 1 << max(int(np.ceil(np.log2(args.gaussians * 1.2))), 10)
    trainer = Trainer(mc, pipe, opt, scene, capacity=cap,
                      backend=args.backend)
    if args.preset in ("steady", "opaque"):
        # Converged-size splats: log-scale of ~1.5x the mean inter-point
        # spacing of this cloud density.
        import dataclasses
        import jax.numpy as jnp
        sc = jnp.full_like(trainer.gaussians.scaling, float(np.log(0.02)))
        trainer.gaussians = dataclasses.replace(trainer.gaussians, scaling=sc)
    if args.preset == "opaque":
        # Converged-OPACITY splats: create_from_pcd inits opacity at 0.1,
        # which makes termination ~9x deeper than a trained model (84.6% of
        # aligned slots are post-termination at opacity 0.9 — r5 probe).
        # This preset is the honest converged-regime operating point for the
        # termination-cut/compaction levers.
        import dataclasses
        import jax.numpy as jnp
        inv = float(np.log(0.9 / 0.1))
        trainer.gaussians = dataclasses.replace(
            trainer.gaussians,
            opacity=jnp.full_like(trainer.gaussians.opacity, inv))

    # Presize the instance buffer from a measured probe (knn-initialized
    # clouds at this density need ~3M instances/view at 800x600; relying on
    # overflow growth mid-bench costs slow recompiles AND a 45%-dropped
    # workload would flatter the timing).
    from gs2m_tpu.core.gaussians import Gaussians
    from gs2m_tpu.ops.binning import bin_gaussians
    from gs2m_tpu.ops.projection import project
    g0 = trainer.gaussians
    worst = worst_exp = 0
    tc = bool(getattr(trainer, "_term_cut", False))
    for cam in scene.train_cameras:  # compiled once, fast per-view evals
        proj = project(g0, cam, mc.sh_degree,
                       opacities=g0.get_opacity[:, 0])
        probe = bin_gaussians(proj, args.height, args.width, pipe.tile,
                              2 ** 22, pipe.chunk,
                              opacities=g0.get_opacity[:, 0],
                              term_cut=tc, with_present=not tc)
        worst = max(worst, int(probe.num_aligned) + int(probe.dropped)
                    - int(probe.dropped_expand))
        worst_exp = max(worst_exp, int(probe.num_instances))
    want = int(worst * 1.1)
    trainer.instance_cap = max(-(-want // 2 ** 17) * 2 ** 17, 2 ** 17)
    if tc:
        trainer.expand_cap = max(-(-int(worst_exp * 1.1) // 2 ** 17) * 2 ** 17,
                                 trainer.instance_cap)
    print(f"# worst-view aligned {worst} (expand {worst_exp}) -> "
          f"instance_cap {trainer.instance_cap} expand_cap "
          f"{trainer.expand_cap}", flush=True)
    # Skip straight into the geometry stage at full SH.
    trainer.active_sh_degree = mc.sh_degree

    # Warmup: compile + let any overflow-driven instance-cap growth settle
    # (the trainer only checks its drop window at 100-iter boundaries; a
    # bench must not time a dropping configuration).
    for _ in range(3):
        m = trainer.train_step()
    for _ in range(6):
        if int(m["dropped"]) == 0:
            break
        trainer._grow_instance_cap(dropped=int(m["dropped"]))
        m = trainer.train_step()
    dropped = int(m["dropped"])
    assert dropped == 0, f"instance cap still dropping after growth: {dropped}"
    float(m["loss"])  # scalar readback: full sync through remote runtimes
    return trainer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=300_000)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--preset", default="steady",
                    choices=["steady", "early", "opaque"],
                    help="steady: converged-size splats (~3 instances/"
                         "Gaussian, the 30k-run steady state); early: "
                         "knn-initialized splats (~10 instances/Gaussian, "
                         "the heavy post-SfM phase); opaque: steady + "
                         "converged opacity 0.9 (the real late-training "
                         "regime; exercises the termination-cut lever)")
    ap.add_argument("--term_cut", action="store_true",
                    help="enable the binning termination cut (pipe.term_cut)")
    ap.add_argument("--device", default=None,
                    help="force a JAX platform in-process (env JAX_PLATFORMS "
                         "is clobbered by the axon plugin in this image)")
    args = ap.parse_args(argv)
    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)

    import time

    trainer = build_trainer(args)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        m = trainer.train_step()
    float(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters

    # Absolute end-to-end gate (VERDICT r2 #9): the reference class trains a
    # DTU scene in under 2 hours on one GPU; vs_target = 120 / projected
    # minutes, so >= 1 means wall-clock parity-or-better on one chip.
    TARGET_30K_MIN = 120.0
    projected = 30_000 * dt / 60.0
    print(json.dumps({
        "metric": "train_geometry_it_per_s",
        "value": round(1.0 / dt, 3),
        "unit": "it/s",
        "step_ms": round(dt * 1e3, 1),
        "gaussians": args.gaussians,
        "preset": args.preset,
        "resolution": f"{args.width}x{args.height}",
        "instance_cap": trainer.instance_cap,
        "dropped": int(m["dropped"]),
        "projected_30k_min": round(projected, 1),
        "target_30k_min": TARGET_30K_MIN,
        "vs_target": round(TARGET_30K_MIN / projected, 3),
    }))


if __name__ == "__main__":
    main()
