"""On-chip gradient parity at PRODUCTION scale (ADVICE r1: CPU tests cover
~8K instances; accumulated prefix magnitude could degrade per-Gaussian grad
precision at millions).

Runs the bench scene (500k Gaussians, ~1.7M aligned instances at 1600x1200)
through BOTH rasterizer backends under the same loss and reports per-leaf
max relative error of the parameter gradients. Prints one JSON line.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/check_grads_onchip.py
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_bench_scene
    from gs2m_tpu.models.render import render

    n, W, H = 500_000, 1600, 1200
    g, cam = build_bench_scene(n, W, H)
    target = jnp.zeros((3, H, W))

    def loss_fn(params, backend):
        pkg = render(g.with_params(params), cam, jnp.zeros(3),
                     active_sh_degree=3, geometry_stage=True, backend=backend,
                     chunk=128, instance_cap=2 ** 21)
        return (jnp.mean(jnp.abs(pkg["render"] - target))
                + 0.1 * jnp.mean(pkg["depth_map"] ** 2)
                + 0.1 * jnp.mean(jnp.abs(pkg["normal_map"])))

    params = g.params_dict()
    grads = {}
    for be in ("pallas", "xla"):
        grads[be] = jax.jit(jax.grad(lambda p: loss_fn(p, be)))(params)
        float(grads[be]["xyz"][0, 0])  # scalar-readback sync

    report, worst = {}, 0.0
    for k in params:
        a = np.asarray(grads["pallas"][k], np.float64)
        b = np.asarray(grads["xla"][k], np.float64)
        scale = np.abs(b).max() + 1e-30
        rel = float(np.abs(a - b).max() / scale)
        report[k] = rel
        worst = max(worst, rel)
    print(json.dumps({"metric": "grad_rel_err_pallas_vs_xla",
                      "worst": worst, "per_leaf": report,
                      "gaussians": n, "resolution": f"{W}x{H}",
                      "pass": worst < 1e-4}))


if __name__ == "__main__":
    main()
