"""Benchmark: differentiable rasterizer forward+backward throughput.

Measures the production (Pallas) render path end-to-end — projection,
binning, tiled blend, hand-derived backward, per-Gaussian grads — at the
reference's canonical working resolution 1600x1200 (DTU full-res,
SURVEY.md §6) on one chip, and prints ONE JSON line:

  {"metric": "fwd_bwd_mpixels_per_s", "value": ..., "unit": "Mpixel/s",
   "vs_baseline": ...}

vs_baseline compares against BENCH_BASELINE.json (written on first run) so
round-over-round regressions/improvements are visible.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


# Absolute throughput gate (NOT self-referential — VERDICT r1 weak #8 /
# r2 #9), derived from the one absolute anchor we have: a reference-class
# GPU trains a DTU scene (30k iters, 800x600, ~3 rasterizer fwd+bwd per
# geometry step) in under 2 hours. 30k steps x 3 renders x 0.48 Mpix in
# 7200 s with renders getting half the step budget = 12 Mpix/s of
# rasterizer fwd+bwd throughput. vs_target < 1 means the absolute goal is
# NOT met regardless of round-over-round progress; bench_train.py carries
# the matching end-to-end gate (projected_30k_min <= 120).
TARGET_MPIX_S = 12.0


def build_bench_scene(n_gaussians: int, width: int, height: int, seed: int = 0,
                      heavy_tail: bool = False):
    import dataclasses

    import jax.numpy as jnp

    from gs2m_tpu.core.camera import Camera
    from gs2m_tpu.core.gaussians import Gaussians

    rng = np.random.default_rng(seed)
    # A slab of Gaussians filling the frustum at varied depths.
    pts = np.stack([
        rng.uniform(-1.6, 1.6, n_gaussians),
        rng.uniform(-1.2, 1.2, n_gaussians),
        rng.uniform(-1.0, 1.0, n_gaussians),
    ], -1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n_gaussians, 3)).astype(np.float32)
    if heavy_tail:
        # Adversarial instance distribution (VERDICT r2 #10): log-normal
        # splat areas like a post-SfM knn-initialized cloud — a few huge
        # splats touch hundreds of tiles each while the median stays small
        # (bench_train's "early" preset measures the same regime end-to-end).
        msd = np.exp(rng.normal(np.log(2.0e-5), 1.2,
                                n_gaussians)).astype(np.float32)
    else:
        # Scales sized so each Gaussian covers a few pixels at this density.
        msd = np.full(n_gaussians, 2.0e-5, np.float32)
    g = Gaussians.create(pts, cols, max_sh_degree=3, capacity=n_gaussians,
                         mean_sq_dist=msd)
    q = rng.normal(size=(n_gaussians, 4)).astype(np.float32)
    g = dataclasses.replace(
        g, rotation=jnp.asarray(q),
        opacity=jnp.full((n_gaussians, 1), 0.8))  # sigmoid -> ~0.69
    cam = Camera.create(np.eye(3), np.array([0.0, 0.0, 4.0]),
                        fovx=0.8, fovy=0.62, width=width, height=height)
    return g, cam


def run_bench(n_gaussians=500_000, width=1600, height=1200, iters=20,
              backend="pallas", instance_cap=None, chunk=128,
              heavy_tail=False):
    import jax
    import jax.numpy as jnp

    from gs2m_tpu.models.render import render

    g, cam = build_bench_scene(n_gaussians, width, height,
                               heavy_tail=heavy_tail)
    target = jnp.zeros((3, height, width))

    # Size the instance buffer from a measured binning pass (the Trainer
    # grows its buffer adaptively the same way): every sort/gather/kernel
    # cost scales with the STATIC cap, so a right-sized cap is a first-class
    # part of the TPU design, not a benchmark trick. 6% headroom; the run
    # still reports `dropped` and would fail loudly on overflow.
    from gs2m_tpu.ops.projection import project
    from gs2m_tpu.ops.binning import bin_gaussians
    proj = project(g, cam, 3, opacities=g.get_opacity[:, 0])
    probe = bin_gaussians(proj, height, width, 16, 3 * 2 ** 20, chunk,
                          opacities=g.get_opacity[:, 0])
    n_inst = int(probe.num_instances)
    if instance_cap is None:
        # Demand (aligned + anything the probe cap itself dropped) + 6%,
        # rounded to 2^17 granularity: friendlier shapes for the compiler's
        # tiling search than an arbitrary chunk multiple.
        want = int((int(probe.num_aligned) + int(probe.dropped)) * 1.06)
        instance_cap = max(-(-want // 2 ** 17) * 2 ** 17, 4 * chunk)

    def loss_fn(params):
        pkg = render(g.with_params(params), cam, jnp.zeros(3),
                     active_sh_degree=3, geometry_stage=True,
                     backend=backend, chunk=chunk, instance_cap=instance_cap)
        return (jnp.mean(jnp.abs(pkg["render"] - target))
                + 0.1 * jnp.mean(pkg["depth_map"] ** 2)
                + 0.1 * jnp.mean(jnp.abs(pkg["normal_map"])))

    step = jax.jit(jax.grad(loss_fn))
    params = g.params_dict()

    binning = bin_gaussians(proj, height, width, 16, instance_cap, chunk,
                            opacities=g.get_opacity[:, 0])
    dropped = int(binning.dropped)
    assert dropped == 0, f"bench instance cap overflowed: dropped={dropped}"

    grads = step(params)
    float(grads["xyz"][0, 0])  # full sync (block_until_ready can be lazy
    t0 = time.perf_counter()   # through remote-execution tunnels)
    for _ in range(iters):
        grads = step(params)
    float(grads["xyz"][0, 0])  # device executes serially: syncs the chain
    dt = (time.perf_counter() - t0) / iters
    mpix = width * height / dt / 1e6
    return {"mpixels_per_s": mpix, "step_ms": dt * 1e3,
            "instances": n_inst, "dropped": dropped,
            "gaussians": n_gaussians}


def _emit(obj):
    """The ONE stdout JSON line the driver contract requires."""
    print(json.dumps(obj), flush=True)


def main(argv=None):
    # Contract (CLAUDE.md / driver): bench.py prints exactly ONE JSON line on
    # stdout no matter what. BENCH_r03 proved the old structure could break
    # it two ways: a backend-init failure inside run_bench() escaped as a
    # traceback, and the aux gates ran BEFORE the headline was printed, so a
    # hard kill (OOM abort, campaign SIGKILL) left stdout empty. Now: the
    # headline is computed under try/except (error -> JSON error line +
    # nonzero exit) and printed IMMEDIATELY; the aux gates run afterwards and
    # report only via stderr + BENCH_AUX.json.
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--device", default=None,
                   help="force a JAX platform in-process (env JAX_PLATFORMS "
                        "is clobbered by the axon plugin in this image)")
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU-friendly workload; skips aux gates and "
                        "does not touch BENCH_BASELINE.json")
    p.add_argument("--skip-aux", action="store_true")
    args = p.parse_args(argv)
    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        if args.smoke:
            res = run_bench(n_gaussians=2_000, width=256, height=192, iters=2)
        else:
            res = run_bench()
    except BaseException as e:  # noqa: BLE001 — contract: one line, always
        _emit({"metric": "fwd_bwd_mpixels_per_s", "value": None,
               "unit": "Mpixel/s", "vs_baseline": None,
               "error": f"{type(e).__name__}: {e}"})
        raise SystemExit(1)

    base_path = os.path.join(here, "BENCH_BASELINE.json")
    base = None
    if not args.smoke:
        if os.path.exists(base_path):
            with open(base_path) as f:
                base = json.load(f)["value"]
        else:
            base = res["mpixels_per_s"]
            with open(base_path, "w") as f:
                json.dump({"metric": "fwd_bwd_mpixels_per_s", "value": base,
                           "note": "first recorded run (this repo's own r1)"},
                          f)
    _emit({
        "metric": "fwd_bwd_mpixels_per_s",
        "value": round(res["mpixels_per_s"], 4),
        "unit": "Mpixel/s",
        "vs_baseline": round(res["mpixels_per_s"] / base, 3) if base else None,
        "vs_target": round(res["mpixels_per_s"] / TARGET_MPIX_S, 3),
        "target_mpixels_per_s": TARGET_MPIX_S,
        "step_ms": round(res["step_ms"], 2),
        "instances": res["instances"],
    })
    if args.smoke or args.skip_aux:
        return

    # ---- auxiliary gates: stderr + BENCH_AUX.json only, never stdout ----
    aux_path = os.path.join(here, "BENCH_AUX.json")
    # A stale artifact from a previous round must never masquerade as this
    # run's numbers (a crash/kill below would otherwise leave it in place
    # for the harvester to report as current): mark the attempt first.
    with open(aux_path, "w") as f:
        json.dump({"aux_error": "aux gates started but did not finish"}, f)
    aux = {}
    aux_err = None
    # Adversarial heavy-tailed workload (fewer Gaussians, far more instances
    # per Gaussian — the post-SfM regime) so the headline can't hide behind a
    # kernel-friendly uniform slab.
    try:
        heavy = run_bench(n_gaussians=150_000, heavy_tail=True)
        aux["heavy_mpixels_per_s"] = round(heavy["mpixels_per_s"], 2)
        aux["heavy_instances"] = heavy["instances"]
    except Exception as e:  # noqa: BLE001 — recorded, re-raised via exit code
        aux_err = f"heavy: {type(e).__name__}: {e}"
    # Gradient-parity gate in the SAME session (VERDICT r2 #4): every perf
    # round re-proves pallas-vs-autodiff grads at production scale.
    sys.path.insert(0, os.path.join(here, "scripts"))
    grad_report, grad_ok = {}, False
    try:
        from check_grads_onchip import run_grad_check
        grad_report, grad_ok = run_grad_check()
        aux["grad_check_pass"] = grad_ok
        aux["grad_worst_wellcond_p999"] = round(
            max(v["wellcond_rel_p999"] for v in grad_report.values()), 6)
    except Exception as e:  # noqa: BLE001
        aux_err = (aux_err + "; " if aux_err else "") + \
            f"grad: {type(e).__name__}: {e}"
    if aux_err:
        aux["aux_error"] = aux_err
    with open(aux_path, "w") as f:
        json.dump(aux, f, indent=1)
    print(f"AUX: {json.dumps(aux)}", file=sys.stderr)
    if not grad_ok or aux_err:
        bad = {k: v for k, v in grad_report.items() if not v.get("pass")}
        if bad:
            print(f"GRAD GATE BREACH: {json.dumps(bad)}", file=sys.stderr)
        if aux_err:
            print(f"AUX GATE ERROR: {aux_err}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
