"""Multi-chip data-parallel training over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.4: no torch.distributed /
NCCL anywhere); scale-out is a first-class feature of THIS framework, not a
port. Design (the "How to Scale Your Model" recipe — pick a mesh, annotate
shardings, let XLA/shard_map place collectives on ICI):

* mesh axis `data`: each device owns ONE view of a per-step view batch —
  Gaussian splatting trains on one random view per step (train.py:85-87);
  with D chips we step on D distinct views at once. Gaussians, optimizer
  state, and the light are REPLICATED; per-view pixel work (projection,
  binning, blending, all losses) is fully LOCAL to the owning chip; the only
  communication is one `psum` of the per-Gaussian gradient pytree and the
  densification statistics — the classic DP pattern, riding ICI.
* gradients are MEAN-reduced over the batch so single-chip semantics are
  preserved in expectation (a D-view batch is a lower-variance estimate of
  the reference's 1-view step; the densification stats `denom` counts all
  D views, matching the reference's per-view accumulation exactly).
* multi-host: each host feeds its local devices' view indices; the GT image
  stacks are replicated device-side (DTU at -r2 is ~350 MB — comfortably
  resident), so no input pipeline communication is needed at all.

Implementation: `shard_map` over the mesh with the per-view objective shared
with the single-chip trainer (train/trainer.py make_view_objective), psum
inside, Adam applied on replicated state inside the same jitted program.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gs2m_tpu.core.config import ModelConfig, OptimConfig, PipelineConfig
from gs2m_tpu.core.gaussians import Gaussians
from gs2m_tpu.data.scene import Scene
from gs2m_tpu.train import densify as D
from gs2m_tpu.train.optim import AdamState, adam_update, group_lrs, xyz_lr_schedule
from gs2m_tpu.train.trainer import make_view_objective


def partition_views(n_views: int, process_index: int,
                    process_count: int) -> np.ndarray:
    """The multi-host input partition: which TRAIN views this host feeds its
    local devices (SURVEY §2.4 — each host loads its own view subset).

    Strided assignment (host h gets views h, h+P, h+2P, ...): balanced to
    within one view for any V, and interleaved so each host's subset spans
    the whole camera ring rather than one arc (a contiguous split would give
    each host spatially-clustered views and bias its gradient batches)."""
    import numpy as np
    assert 0 <= process_index < process_count
    return np.arange(process_index, n_views, process_count, dtype=np.int64)


def host_view_closure(local_views, nearest_table, nearest_mask,
                      nearby_table, nearby_mask) -> np.ndarray:
    """All view indices whose image data this host must load: its own views
    plus every valid neighbor they can sample — the multi-view loss reads the
    NEAREST neighbor's gray image and the roughness loss a NEARBY one
    (train/trainer.py view_objective), so the closure is local ∪ neighbors;
    the host reads its GT/gray stacks at exactly these indices
    (Scene.load_train_image_subset)."""
    import numpy as np
    local_views = np.asarray(local_views)
    need = set(int(v) for v in local_views)
    for v in local_views:
        need.update(int(x) for x in np.asarray(nearest_table)[v][
            np.asarray(nearest_mask)[v]])
        need.update(int(x) for x in np.asarray(nearby_table)[v][
            np.asarray(nearby_mask)[v]])
    return np.array(sorted(need), dtype=np.int64)


def make_dp_train_step(model_cfg: ModelConfig, pipe: PipelineConfig,
                       opt: OptimConfig, scene: Scene, instance_cap: int,
                       geometry_stage: bool, material_stage: bool,
                       mesh: Mesh, backend: str | None = None,
                       pbr_fns: dict | None = None) -> Callable:
    """Jitted D-views-per-step training step over `mesh` (axis 'data').

    Call with view_idx (D,) int32 and keys (D, 2) uint32 (one PRNG key per
    view); all other state replicated. Returns the same pytree surface as the
    single-chip step with batch-meaned metrics.
    """
    backend = backend or ("pallas" if pipe.use_pallas else "xla")
    xyz_lr_fn = xyz_lr_schedule(opt, scene.cameras_extent)
    H = scene.train_cameras[0].height
    W = scene.train_cameras[0].width
    objective = make_view_objective(model_cfg, pipe, opt, scene, instance_cap,
                                    geometry_stage, material_stage, backend,
                                    pbr_fns)

    rep = P()          # replicated
    shard = P("data")  # one view per device

    def sharded_grads(active_sh_degree, gaussians, light_state, gt_images,
                      alpha_masks, gray_images, view_idx, keys):
        """Runs per-device on its own view; psum-reduces the grads."""
        C = gaussians.capacity
        vid = view_idx[0]   # this device's (1,)-shaped shard
        key = keys[0]

        def loss_fn(params, sink, abs_sink, light_params):
            return objective(gaussians, params, sink, abs_sink, light_params,
                             vid, gt_images, alpha_masks, gray_images, key,
                             active_sh_degree)

        sink = jnp.zeros((C, 2), jnp.float32)
        abs_sink = jnp.zeros((C, 2), jnp.float32)
        (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3),
                                                has_aux=True)(
            gaussians.params_dict(), sink, abs_sink, light_state)
        param_grads, sink_grad, abs_grad, light_grad = grads
        if backend != "pallas":
            abs_grad = sink_grad

        n = jax.lax.psum(1, "data")
        mean = lambda t: jax.tree.map(lambda x: jax.lax.psum(x, "data") / n, t)
        psum = lambda t: jax.tree.map(lambda x: jax.lax.psum(x, "data"), t)

        # Stats accumulate over ALL views of the batch (each view is one
        # "step" of the reference's accumulation) — sum, not mean.
        stat_upd = psum({
            "g": jnp.linalg.norm(sink_grad * jnp.array([0.5 * W, 0.5 * H]),
                                 axis=-1) * aux["visibility"],
            "ga": jnp.linalg.norm(abs_grad * jnp.array([0.5 * W, 0.5 * H]),
                                  axis=-1) * aux["visibility"],
            "vis": aux["visibility"].astype(jnp.float32),
            "obs": (aux["observe"] > 0).astype(jnp.int32),
        })
        radmax = jax.lax.pmax(
            aux["radii"].astype(jnp.float32)
            * ((aux["observe"] > 0) & aux["visibility"]), "data")

        metrics = mean({"loss": loss, "Lrgb": aux["Lrgb"], "Lgeo": aux["Lgeo"],
                        "Lmat": aux["Lmat"]})
        metrics["dropped"] = jax.lax.psum(aux["dropped"], "data")
        # Activity counters sum over the D views of this batch (each view is
        # one reference-equivalent step).
        metrics["mv_active"] = jax.lax.psum(
            aux["mv_active"].astype(jnp.int32), "data")
        metrics["rough_active"] = jax.lax.psum(
            aux["rough_active"].astype(jnp.int32), "data")
        return (mean(param_grads), mean(light_grad), stat_upd, radmax, metrics)

    import functools

    # active_sh_degree is TRACED (core/sh.py masks bands), so the per-1000-
    # iter SH warmup bumps do NOT recompile — remote compiles cost minutes.
    @jax.jit
    def step(gaussians: Gaussians, opt_state: AdamState, stats: D.DensifyStats,
             gt_images, alpha_masks, gray_images, light_state,
             view_idx, keys, iteration, active_sh_degree: int):
        # Accept either a per-view key batch (D, 2) or ONE base key to be
        # fold_in(iteration)-derived and split on device (the trainer path —
        # host-side splits cost a dispatch round-trip per step).
        if keys.ndim == 1:
            D_dev = mesh.devices.size
            keys = jax.random.split(
                jax.random.fold_in(keys, iteration), D_dev)
        smapped = jax.shard_map(
            functools.partial(sharded_grads, active_sh_degree), mesh=mesh,
            in_specs=(rep, rep, rep, rep, rep, shard, shard),
            out_specs=(rep, rep, rep, rep, rep),
            check_vma=False)
        param_grads, light_grad, su, radmax, metrics = smapped(
            gaussians, light_state, gt_images, alpha_masks, gray_images,
            view_idx, keys)

        stats = D.DensifyStats(
            accum=stats.accum + su["g"],
            accum_abs=stats.accum_abs + su["ga"],
            denom=stats.denom + su["vis"],
            max_radii2d=jnp.maximum(stats.max_radii2d, radmax))

        lrs = group_lrs(opt, scene.cameras_extent, xyz_lr_fn(iteration))
        new_params, opt_state = adam_update(gaussians.params_dict(),
                                            param_grads, opt_state, lrs)
        return (gaussians.with_params(new_params), opt_state, stats,
                light_grad, metrics)

    return step
