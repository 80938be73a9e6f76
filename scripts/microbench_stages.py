"""Stage-level step-time itemization on the bench workload, one chip.

Times each pipeline stage as its OWN jitted program with scalar-readback
sync (block_until_ready can return early through the axon tunnel — CLAUDE.md
hazards), so the breakdown survives tunnels/retries where trace collection
(scripts/profile_step.py) is fragile. Differences give the derived stages:

  blend_fwd ~ full_fwd - (projection + binning)
  blend_bwd ~ full_step - full_fwd

Prints ONE JSON line with per-stage milliseconds. This is the fast loop for
profile-driven optimization: run, read, attack the top stage, re-run.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/microbench_stages.py
  python scripts/microbench_stages.py --smoke --device cpu   # tiny CPU check
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--gaussians", type=int, default=500_000)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--height", type=int, default=1200)
    ap.add_argument("--backend", default="pallas")
    args = ap.parse_args()
    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)
    if args.smoke:
        args.gaussians, args.width, args.height = 2_000, 256, 192
        args.iters = 2
        if args.backend == "pallas" and args.device == "cpu":
            args.backend = "xla"

    import jax
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_bench_scene
    from gs2m_tpu.models.render import render
    from gs2m_tpu.ops.binning import bin_gaussians
    from gs2m_tpu.ops.blend_pallas import _gather_instances, _segmented_reduce
    from gs2m_tpu.ops.projection import project

    W, H, chunk = args.width, args.height, 128
    g, cam = build_bench_scene(args.gaussians, W, H)
    target = jnp.zeros((3, H, W))
    opac = g.get_opacity[:, 0]

    proj = project(g, cam, 3, opacities=opac)
    probe = bin_gaussians(proj, H, W, 16, 3 * 2 ** 20, chunk, opacities=opac)
    want = int((int(probe.num_aligned) + int(probe.dropped)) * 1.06)
    cap = max(-(-want // 2 ** 17) * 2 ** 17, 4 * chunk)

    proj_jit = jax.jit(lambda gg: project(gg, cam, 3,
                                          opacities=gg.get_opacity[:, 0]))
    bin_jit = jax.jit(lambda p: bin_gaussians(p, H, W, 16, cap, chunk,
                                              opacities=opac))

    def fwd(params):
        pkg = render(g.with_params(params), cam, jnp.zeros(3),
                     active_sh_degree=3, geometry_stage=True,
                     backend=args.backend, chunk=chunk, instance_cap=cap)
        return (jnp.mean(jnp.abs(pkg["render"] - target))
                + 0.1 * jnp.mean(pkg["depth_map"] ** 2)
                + 0.1 * jnp.mean(jnp.abs(pkg["normal_map"])))

    fwd_jit = jax.jit(fwd)
    step_jit = jax.jit(jax.grad(fwd))
    params = g.params_dict()

    def timeit(fn, arg, sync):
        out = fn(arg)
        sync(out)  # compile + first run
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(arg)
        sync(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    # Index-space sub-stages of the blend (historically 25-53 ms each on
    # chip): the (8+V, C) -> (8+V, I) instance gather and the backward's
    # sort + rank + two-level-prefix segmented reduction. Timing them as
    # standalone jits splits "blend kernel proper" from "data movement
    # around it" in the derived numbers below.
    binned = bin_jit(proj)
    V = 8  # geometry-stage value-table width (ops/rasterize.value_width)
    key = jax.random.PRNGKey(0)
    vals_c = jax.random.normal(key, (args.gaussians, V))
    dvals_i = jax.random.normal(key, (V, cap))
    dgeom_i = jax.random.normal(key, (8, cap))

    gather_jit = jax.jit(lambda v: _gather_instances(
        v, proj.means2d, proj.conics, opac, binned.gid, binned.is_null))
    import jax.numpy as _jnp
    _key = _jnp.where(binned.is_null, binned.gauss_present.shape[0],
                      binned.gid)
    reduce_jit = jax.jit(lambda dv: _segmented_reduce(
        dv, dgeom_i, _key, binned.gauss_present, binned.dropped, chunk))

    res = {
        "projection_ms": timeit(proj_jit, g, lambda o: float(o.depths[0])),
        "binning_ms": timeit(bin_jit, proj, lambda o: int(o.num_instances)),
        "gather_ms": timeit(gather_jit, vals_c, lambda o: float(o[0][0, 0])),
        "seg_reduce_ms": timeit(reduce_jit, dvals_i,
                                lambda o: float(o[0, 0])),
        "full_fwd_ms": timeit(fwd_jit, params, float),
        "full_step_ms": timeit(step_jit, params,
                               lambda o: float(o["xyz"][0, 0])),
    }
    res["blend_fwd_ms_derived"] = round(
        res["full_fwd_ms"] - res["projection_ms"] - res["binning_ms"], 2)
    res["blend_bwd_ms_derived"] = round(
        res["full_step_ms"] - res["full_fwd_ms"], 2)
    res["blend_fwd_kernel_ms_derived"] = round(
        res["blend_fwd_ms_derived"] - res["gather_ms"], 2)
    res["blend_bwd_kernel_ms_derived"] = round(
        res["blend_bwd_ms_derived"] - res["seg_reduce_ms"], 2)
    res.update(instances=int(probe.num_instances), instance_cap=cap,
               gaussians=args.gaussians, width=W, height=H,
               backend=args.backend,
               mpix_s=round(W * H / res["full_step_ms"] / 1e3, 2))
    res = {k: (round(v, 2) if isinstance(v, float) else v)
           for k, v in res.items()}
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
