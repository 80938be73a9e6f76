"""Training CLI.

Behavioral reference: /root/reference/train.py:284-315 — same flag surface
(model/pipeline/optimization groups + test/save/checkpoint iteration lists),
same staging defaults, cfg_args persistence for downstream apps.

Usage: python -m gs2m_tpu.apps.train -s <scene> -m <out> [--iterations N] ...
"""
from __future__ import annotations

import json
import os
import sys
import time
from argparse import ArgumentParser

import numpy as np


def main(argv=None):
    parser = ArgumentParser(description="gs2m_tpu training")
    from gs2m_tpu.core.config import (ModelConfig, OptimConfig, PipelineConfig,
                                      add_group_args, extract_group,
                                      save_cfg_args)
    add_group_args(parser, ModelConfig)
    add_group_args(parser, PipelineConfig)
    add_group_args(parser, OptimConfig)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[5_000, 7_000, 10_000, 15_000, 20_000, 25_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--device", type=str, default="",
                        help="jax platform override (e.g. cpu)")
    parser.add_argument("--profile_iterations", nargs=2, type=int, default=None,
                        metavar=("START", "STOP"),
                        help="capture a jax.profiler trace over [START, STOP)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="train one view per device over all local "
                             "devices (shard_map DP, parallel/dp.py)")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: call jax.distributed.initialize() "
                             "before device discovery (combine with "
                             "--data_parallel)")
    args = parser.parse_args(argv)

    if args.distributed:
        import jax
        jax.distributed.initialize()  # coordinator via env (JAX_COORDINATOR…)

    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)

    import jax
    import jax.numpy as jnp

    from gs2m_tpu.data.scene import Scene
    from gs2m_tpu.train.trainer import Trainer

    model_cfg = extract_group(args, ModelConfig)
    pipe = extract_group(args, PipelineConfig)
    opt = extract_group(args, OptimConfig)
    save_iterations = sorted(set(args.save_iterations + [opt.iterations]))

    os.makedirs(model_cfg.model_path, exist_ok=True)
    save_cfg_args(model_cfg.model_path, model_cfg, pipe, opt)

    print(f"[>] Loading scene: {model_cfg.source_path}")
    multi_host = args.distributed and jax.process_count() > 1
    if multi_host and not args.data_parallel:
        # Without DP the trainer's view pool stays global while each host
        # only loaded its own image subset (other rows zeroed) — a host
        # would silently train against zero GTs. Refuse the combination.
        raise SystemExit("--distributed with >1 process requires "
                         "--data_parallel (per-host view partitions only "
                         "make sense under the DP mesh)")
    if multi_host:
        # Per-host input pipeline (SURVEY §2.4): build the neighbor graph
        # first, then read only this host's view partition + its neighbor
        # closure from disk (parallel/dp.py partition_views).
        from gs2m_tpu.parallel.dp import host_view_closure, partition_views
        scene = Scene(model_cfg, load_images=False)
        scene.training_setup(opt)
        local = partition_views(len(scene.train_cameras),
                                jax.process_index(), jax.process_count())
        closure = host_view_closure(local, scene.nearest_table,
                                    scene.nearest_mask, scene.nearby_table,
                                    scene.nearby_mask)
        scene.load_train_image_subset(closure)
        print(f"[>] host {jax.process_index()}/{jax.process_count()}: "
              f"{len(local)} local views, {len(closure)} images loaded")
    else:
        scene = Scene(model_cfg, opt)
    print(f"[>] {len(scene.train_cameras)} train / {len(scene.test_cameras)} "
          f"test views at {scene.train_cameras[0].width}x"
          f"{scene.train_cameras[0].height}; extent {scene.cameras_extent:.3f}")

    pbr_fns = None
    if model_cfg.material:
        from gs2m_tpu.pbr import make_pbr_fns
        pbr_fns = make_pbr_fns()

    from gs2m_tpu.train.reporting import TrainingReporter, evaluate_views
    reporter = TrainingReporter(model_cfg.model_path, enable=not args.quiet)

    mesh = None
    if args.data_parallel:
        from jax.sharding import Mesh
        devs = np.array(jax.devices())
        mesh = Mesh(devs, ("data",))
        print(f"[>] Data-parallel over {devs.size} devices "
              f"({devs.size} views/step)")

    trainer = Trainer(model_cfg, pipe, opt, scene, pbr_fns=pbr_fns, mesh=mesh)
    if args.start_checkpoint:
        trainer.load_checkpoint(args.start_checkpoint)
        print(f"[>] Resumed from {args.start_checkpoint} at iteration "
              f"{trainer.iteration}")
    print(f"[>] Capacity {trainer.gaussians.capacity}, "
          f"{int(trainer.gaussians.num_alive)} alive, backend {trainer.backend}")

    t0 = time.time()
    log_path = os.path.join(model_cfg.model_path, "train_log.jsonl")
    log_file = open(log_path, "a")
    ema = None
    prof = args.profile_iterations
    while trainer.iteration < opt.iterations:
        if prof and trainer.iteration + 1 == prof[0]:
            jax.profiler.start_trace(os.path.join(model_cfg.model_path,
                                                  "profile"))
        metrics = trainer.train_step()
        it = trainer.iteration
        if prof and it == prof[1]:
            float(metrics["loss"])  # sync before closing the trace
            jax.profiler.stop_trace()
            print(f"[>] profile trace written to "
                  f"{model_cfg.model_path}/profile")
        # Metrics live on device; converting every step would add a host
        # round-trip per iteration (expensive through remote runtimes).
        if it % 100 == 0:
            loss = float(metrics["loss"])
            ema = loss if ema is None else 0.4 * loss + 0.6 * ema
            if not np.isfinite(loss):
                print(f"[!] non-finite loss at iteration {it} — "
                      "model state is likely corrupted", flush=True)
            # Param-health watchdog: corrupt params can render as pure
            # background (finite loss!) because culling drops non-finite
            # geometry — check the leaves themselves, name the first victim.
            for name, leaf in trainer.gaussians.params_dict().items():
                if not bool(jnp.isfinite(leaf).all()):
                    print(f"[!] non-finite values in param '{name}' at "
                          f"iteration {it}", flush=True)
                    break

        if it % 100 == 0 and not args.quiet:
            alive = int(trainer.gaussians.num_alive)
            dt = time.time() - t0
            print(f"[{it:>6}] loss {ema:.5f} Lrgb {float(metrics['Lrgb']):.5f} "
                  f"Lgeo {float(metrics['Lgeo']):.5f} points {alive} "
                  f"({it / dt:.1f} it/s)", flush=True)
            rec = {"iteration": it, "loss": ema, "points": alive,
                   "elapsed_s": dt, "dropped": int(metrics["dropped"]),
                   "mv_active": int(trainer.mv_active_count),
                   "rough_active": int(trainer.rough_active_count)}
            if trainer.last_trim_seconds is not None:
                rec["trim_s"] = round(trainer.last_trim_seconds, 2)
            log_file.write(json.dumps(rec) + "\n")
            log_file.flush()
            reporter.scalars(it, {k: float(v) for k, v in metrics.items()},
                             alive, iter_time_ms=1e3 * dt / it)

        if it in args.test_iterations:
            res = evaluate_views(trainer, scene.train_cameras[:5],
                                 scene.gt_images[:5], n_views=5,
                                 log_images_to=reporter, iteration=it,
                                 tag="train")
            line = f"[ITER {it:>6}] train PSNR {res['psnr']:.2f}"
            if "psnr_pbr" in res:
                line += f" (PBR {res['psnr_pbr']:.2f})"
            if scene.test_cameras:
                # Held-out PSNR over the FULL test split — the quality signal
                # (training_utils.py:59-168 evaluates every test camera).
                tres = evaluate_views(trainer, scene.test_cameras,
                                      scene.load_test_images(),
                                      log_images_to=reporter, iteration=it,
                                      tag="test")
                line += (f"  test PSNR {tres['psnr']:.2f} "
                         f"L1 {tres['l1']:.4f} ({len(scene.test_cameras)} views)")
                scal = {"test_psnr": tres["psnr"], "test_l1": tres["l1"]}
                rec = {"iteration": it, "test_psnr": tres["psnr"],
                       "test_l1": tres["l1"]}
                if "psnr_pbr" in tres:
                    # The material stage's quality signal is the PBR render
                    # (training_utils.py:158-168).
                    line += f"  test PSNR(PBR) {tres['psnr_pbr']:.2f}"
                    scal["test_psnr_pbr"] = tres["psnr_pbr"]
                    scal["test_l1_pbr"] = tres["l1_pbr"]
                    rec["test_psnr_pbr"] = tres["psnr_pbr"]
                    rec["test_l1_pbr"] = tres["l1_pbr"]
                reporter.scalars(it, scal, int(trainer.gaussians.num_alive))
                log_file.write(json.dumps(rec) + "\n")
                log_file.flush()
            print(line)
            reporter.histogram(it, "scene/opacity_histogram",
                               jax.nn.sigmoid(trainer.gaussians.opacity[
                                   trainer.gaussians.alive]))

        if it in save_iterations:
            print(f"[ITER {it:>6}] Saving snapshot")
            trainer.save_snapshot(it)
        if it in args.checkpoint_iterations:
            trainer.save_checkpoint(os.path.join(
                model_cfg.model_path, "checkpoints", f"ckp{it}.pkl"))

    wall_min = (time.time() - t0) / 60.0
    with open(os.path.join(model_cfg.model_path, "runtime.json"), "w") as f:
        json.dump({"minutes": wall_min, "iterations": opt.iterations}, f)
    print(f"[>] Training complete in {wall_min:.1f} min")
    log_file.close()
    reporter.close()


if __name__ == "__main__":
    main(sys.argv[1:])
