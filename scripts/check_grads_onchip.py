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

    # 180k Gaussians / ~650k instances: the largest scale the XLA-autodiff
    # oracle can hold — its backward materializes (n_chunks, chunk, P) f32
    # intermediates (~1.6 MB/chunk x ~12 buffers), so the full bench scene
    # (2M+ instances) OOMs 16 GB HBM. Still ~80x the CPU suite's instance
    # count, which is what the prefix-magnitude concern is about.
    n, W, H = 180_000, 1600, 1200
    g, cam = build_bench_scene(n, W, H)
    target = jnp.zeros((3, H, W))

    def loss_fn(params, backend):
        pkg = render(g.with_params(params), cam, jnp.zeros(3),
                     active_sh_degree=3, geometry_stage=True, backend=backend,
                     chunk=128, instance_cap=5120 * 128)
        return (jnp.mean(jnp.abs(pkg["render"] - target))
                + 0.1 * jnp.mean(pkg["depth_map"] ** 2)
                + 0.1 * jnp.mean(jnp.abs(pkg["normal_map"])))

    params = g.params_dict()
    grads = {}
    for be in ("pallas", "xla"):
        grads[be] = jax.jit(jax.grad(lambda p: loss_fn(p, be)))(params)
        float(grads[be]["xyz"][0, 0])  # scalar-readback sync

    # NOTE: this measures backend DISAGREEMENT, not error against exact
    # math — both backends round differently in f32 (two-level chunk sums
    # vs sequential scan accumulation), and the gap grows with instance
    # count. Report max|diff|/max|grad| per leaf plus the offending row's
    # own magnitude, so noise-floor rows aren't mistaken for real error.
    report, worst = {}, 0.0
    for k in params:
        a = np.asarray(grads["pallas"][k], np.float64)
        b = np.asarray(grads["xla"][k], np.float64)
        scale = np.abs(b).max() + 1e-30
        d = np.abs(a - b)
        i = np.unravel_index(d.argmax(), d.shape)
        rel = float(d.max() / scale)
        report[k] = {"rel_to_max": rel,
                     "argmax_pallas": float(a[i]), "argmax_xla": float(b[i]),
                     "argmax_row_mag_frac": float(np.abs(b[i]) / scale)}
        worst = max(worst, rel)
    print(json.dumps({"metric": "grad_backend_disagreement",
                      "worst_rel_to_max": worst, "per_leaf": report,
                      "gaussians": n, "resolution": f"{W}x{H}",
                      "pass": worst < 0.02}))


if __name__ == "__main__":
    main()
