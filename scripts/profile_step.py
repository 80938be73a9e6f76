"""Itemize per-op device time of the bench step (fwd+bwd render).

Runs the same jitted step as bench.py under jax.profiler, then parses the
trace.json.gz event dump and aggregates device-track op durations, printing
a sorted cost table. This is the tool for burning down non-kernel step time
(VERDICT round-1 item #1).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_step.py \
      [--iters 3] [--backend pallas] [--gaussians 500000]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect_trace(tracedir: str):
    files = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise SystemExit(f"no trace.json.gz under {tracedir}")
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data


def aggregate(data, min_ms=0.05):
    # Find device-track pids (TPU/device tracks carry XLA op events).
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device:" in n or "Axon" in n
                   or "xla" in n.lower()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    total_dev = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        dur_ms = ev["dur"] / 1e3
        tot[name] += dur_ms
        cnt[name] += 1
        total_dev += dur_ms
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    return rows, cnt, total_dev, pid_names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--gaussians", type=int, default=500_000)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--height", type=int, default=1200)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--cap", type=int, default=3 * 2 ** 20)
    ap.add_argument("--min_ms", type=float, default=0.3)
    ap.add_argument("--keep", default=None, help="keep trace dir at this path")
    ap.add_argument("--train", action="store_true",
                    help="profile the FULL Trainer geometry step at "
                         "bench_train config instead of the bare render step")
    ap.add_argument("--preset", default="steady", choices=["steady", "early"])
    ap.add_argument("--device", default="",
                    help="force a jax platform (e.g. cpu for a smoke run; "
                         "the JAX_PLATFORMS env var is clobbered by the "
                         "axon plugin, only config.update works)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.device:
        jax.config.update("jax_platforms", args.device)

    if args.train:
        # The real thing: Trainer train_step (main+neighbor render, staged
        # losses, Adam, densify stats) at bench_train's scene/scale.
        import types

        import bench_train
        w, h = (args.width, args.height) if args.width != 1600 else (800, 600)
        n_g = args.gaussians if args.gaussians != 500_000 else 300_000
        bt = types.SimpleNamespace(gaussians=n_g, width=w, height=h, views=8,
                                   backend=args.backend, preset=args.preset)
        trainer = bench_train.build_trainer(bt)
        tracedir = args.keep or tempfile.mkdtemp(prefix="gs2m_trace_")
        with jax.profiler.trace(tracedir):
            for _ in range(args.iters):
                m = trainer.train_step()
            float(m["loss"])
    else:
        from bench import build_bench_scene
        from gs2m_tpu.models.render import render

        g, cam = build_bench_scene(args.gaussians, args.width, args.height)
        target = jnp.zeros((3, args.height, args.width))

        def loss_fn(params):
            pkg = render(g.with_params(params), cam, jnp.zeros(3),
                         active_sh_degree=3, geometry_stage=True,
                         backend=args.backend, chunk=args.chunk,
                         instance_cap=args.cap)
            return (jnp.mean(jnp.abs(pkg["render"] - target))
                    + 0.1 * jnp.mean(pkg["depth_map"] ** 2)
                    + 0.1 * jnp.mean(jnp.abs(pkg["normal_map"])))

        step = jax.jit(jax.grad(loss_fn))
        params = g.params_dict()
        out = step(params)
        float(out["xyz"][0, 0])  # full sync (see CLAUDE.md: scalar readback)

        tracedir = args.keep or tempfile.mkdtemp(prefix="gs2m_trace_")
        with jax.profiler.trace(tracedir):
            for _ in range(args.iters):
                out = step(params)
            float(out["xyz"][0, 0])

    data = collect_trace(tracedir)
    rows, cnt, total_dev, pid_names = aggregate(data)
    print(f"# trace dir: {tracedir}")
    print(f"# device-track total: {total_dev:.1f} ms over {args.iters} iters "
          f"-> {total_dev / args.iters:.1f} ms/step")
    print(f"{'ms/step':>9}  {'count':>6}  op")
    for name, ms in rows:
        per = ms / args.iters
        if per < args.min_ms:
            continue
        print(f"{per:9.2f}  {cnt[name] // args.iters:6d}  {name[:120]}")


if __name__ == "__main__":
    main()
