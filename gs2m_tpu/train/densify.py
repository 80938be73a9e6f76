"""Adaptive densification on fixed-capacity buffers: clone + AbsGS split + prune.

Behavioral reference: /root/reference/scene/gaussian_model.py:426-573 —
clone when mean view-space grad >= densify_grad_threshold and the Gaussian is
small (max scale <= percent_dense * extent); AbsGS split (N=2) when the ABS
grad >= densify_grad_abs_threshold and it is large, children sampled from the
Gaussian itself with scales / (0.8 * N); prune transparent (opacity < thr),
oversized world-space (> 0.1 * extent) and oversized view-space
(max_radii2D > threshold) points; all accumulators reset afterwards.

TPU-first: the reference reallocates tensors and rebuilds optimizer state
every densify (gaussian_model.py:372-457). Here capacity is STATIC: dead rows
are a mask, children are scattered into free slots inside one jitted pass
(searchsorted child->source mapping, argsort free-slot allocation), and Adam
moments of touched rows are zeroed in place. Capacity growth is a rare
host-side re-pad (powers of two -> bounded recompiles).

Deviation recorded: children inherit their source's opacity and are not
re-tested against the prune predicate within the same pass (the reference
prunes after appending); a sub-threshold-opacity child survives one extra
densify round. Children that do not fit in free capacity are dropped and
counted (`dropped` — no silent caps).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from gs2m_tpu.core.gaussians import Gaussians, inverse_sigmoid, quat_to_rotmat
from gs2m_tpu.train.optim import AdamState, zero_state_param, zero_state_rows


@partial(jax.tree_util.register_dataclass,
         data_fields=["accum", "accum_abs", "denom", "max_radii2d"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class DensifyStats:
    accum: jnp.ndarray       # (C,) sum of |grad_ndc_mean2d| norms
    accum_abs: jnp.ndarray   # (C,) sum of abs-grad norms (AbsGS channel)
    denom: jnp.ndarray       # (C,) visible-step counts
    max_radii2d: jnp.ndarray  # (C,) float32

    @staticmethod
    def zeros(capacity: int) -> "DensifyStats":
        # Distinct buffers: aliased leaves break jit donation.
        def z():
            return jnp.zeros((capacity,), jnp.float32)
        return DensifyStats(accum=z(), accum_abs=z(), denom=z(), max_radii2d=z())


def update_stats(stats: DensifyStats, sink_grad: jnp.ndarray,
                 abs_sink_grad: jnp.ndarray, visibility: jnp.ndarray,
                 radii: jnp.ndarray, observe: jnp.ndarray,
                 width: int, height: int) -> DensifyStats:
    """Per-step accumulation (train.py:223-227, gaussian_model.py:569-573).
    sink gradients are d/d(pixel mean2d); the reference accumulates NDC-space
    grads (backward.cu:490-491 multiplies by 0.5*W), so scale accordingly."""
    scale = jnp.array([0.5 * width, 0.5 * height], jnp.float32)
    g = jnp.linalg.norm(sink_grad * scale[None, :], axis=-1)
    ga = jnp.linalg.norm(abs_sink_grad * scale[None, :], axis=-1)
    vis = visibility.astype(jnp.float32)
    radmask = ((observe > 0) & visibility).astype(jnp.float32)
    return DensifyStats(
        accum=stats.accum + g * vis,
        accum_abs=stats.accum_abs + ga * vis,
        denom=stats.denom + vis,
        max_radii2d=jnp.maximum(stats.max_radii2d,
                                radii.astype(jnp.float32) * radmask),
    )


class DensifyReport(dict):
    pass


@partial(jax.jit, static_argnames=("use_radii_threshold",))
def densify_and_prune(gaussians: Gaussians, opt_state: AdamState,
                      stats: DensifyStats, key: jnp.ndarray,
                      grad_threshold: float, grad_abs_threshold: float,
                      min_opacity: float, extent: float, percent_dense: float,
                      radii2d_threshold: float,
                      use_radii_threshold: bool = False):
    """One clone/split/prune pass. Returns (gaussians, opt_state, stats, info)."""
    C = gaussians.capacity
    alive = gaussians.alive

    denom = jnp.maximum(stats.denom, 1e-12)
    grads = jnp.where(stats.denom > 0, stats.accum / denom, 0.0)
    grads_abs = jnp.where(stats.denom > 0, stats.accum_abs / denom, 0.0)

    scales = gaussians.get_scaling
    max_scale = jnp.max(scales, axis=-1)
    small = max_scale <= percent_dense * extent

    clone = alive & small & (grads >= grad_threshold)
    split = alive & ~small & (grads_abs >= grad_abs_threshold)

    opacity = jax.nn.sigmoid(gaussians.opacity[:, 0])
    prune = opacity < min_opacity
    if use_radii_threshold:
        prune = prune | (stats.max_radii2d > radii2d_threshold) \
                      | (max_scale > 0.1 * extent)
    prune = prune & alive

    # --- free-slot allocation -------------------------------------------------
    alive_after = alive & ~split & ~prune
    free = ~alive_after
    # Free slots in index order, children in source order (deterministic).
    slot_order = jnp.argsort(jnp.where(free, 0, 1), stable=True)
    num_free = jnp.sum(free)

    k = clone.astype(jnp.int32) + 2 * split.astype(jnp.int32)
    offsets = jnp.cumsum(k) - k
    total_children = offsets[-1] + k[-1]
    n_fit = jnp.minimum(total_children, num_free)
    dropped = total_children - n_fit

    child_ids = jnp.arange(C, dtype=jnp.int32)
    src = jnp.searchsorted(offsets, child_ids, side="right").astype(jnp.int32) - 1
    src = jnp.clip(src, 0, C - 1)
    valid_child = child_ids < n_fit
    target = slot_order[child_ids]

    # --- child parameters -----------------------------------------------------
    is_split_child = split[src]
    eps = jax.random.normal(key, (C, 3), scales.dtype)
    R = quat_to_rotmat(gaussians.get_rotation[src])
    offset = jnp.einsum("nij,nj->ni", R, eps * scales[src])
    child_xyz = jnp.where(is_split_child[:, None],
                          gaussians.xyz[src] + offset, gaussians.xyz[src])
    child_scaling = jnp.where(is_split_child[:, None],
                              jnp.log(scales[src] / 1.6), gaussians.scaling[src])

    params = gaussians.params_dict()

    def scatter_children(p, child_override=None):
        vals = p[src] if child_override is None else child_override
        m = valid_child.reshape((-1,) + (1,) * (p.ndim - 1))
        new_vals = jnp.where(m, vals, p[target])
        return p.at[target].set(new_vals)

    new_params = {name: scatter_children(p) for name, p in params.items()}
    new_params["xyz"] = scatter_children(params["xyz"], child_xyz)
    new_params["scaling"] = scatter_children(params["scaling"], child_scaling)

    new_alive = alive_after.at[target].set(
        jnp.where(valid_child, True, alive_after[target]))

    # Zero Adam moments on every re-allocated or dead row.
    touched = jnp.zeros((C,), bool).at[target].set(valid_child, mode="drop")
    opt_state = zero_state_rows(opt_state, touched | ~new_alive)

    g = dataclasses.replace(gaussians.with_params(new_params), alive=new_alive)
    info = {
        "cloned": jnp.sum(clone), "split": jnp.sum(split),
        "pruned": jnp.sum(prune), "dropped_children": dropped,
        "alive": jnp.sum(new_alive),
    }
    return g, opt_state, DensifyStats.zeros(C), info


@jax.jit
def reset_opacity(gaussians: Gaussians, opt_state: AdamState, cap: float = 0.01):
    """Clamp activated opacity to <= cap and zero its Adam state
    (gaussian_model.py:362-366). Same function with cap=0.8 implements
    reduce_opacity (:367-370)."""
    new_op = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(gaussians.opacity),
                                         jnp.float32(cap)))
    g = dataclasses.replace(gaussians, opacity=new_op)
    return g, zero_state_param(opt_state, "opacity")


@jax.jit
def prune_rows(gaussians: Gaussians, opt_state: AdamState,
               stats: DensifyStats, mask: jnp.ndarray):
    """Kill rows where mask (observe trim, train.py:236-245)."""
    alive = gaussians.alive & ~mask
    g = dataclasses.replace(gaussians, alive=alive)
    return g, zero_state_rows(opt_state, ~alive), stats


def prune_init_points(gaussians: Gaussians) -> Gaussians:
    """Drop oversized SfM init points (gaussian_model.py:426-435): max scale
    above BOTH the mean of all scales and the 99.9th percentile."""
    scales = gaussians.get_scaling
    # Quantile over alive scale entries only (dead rows are fill values).
    flat = jnp.where(gaussians.alive[:, None], scales, jnp.nan).reshape(-1)
    mean_s = jnp.nanmean(flat)
    q999 = jnp.nanquantile(flat, 0.999)
    mx = jnp.max(scales, axis=-1)
    drop = (mx > mean_s) & (mx > q999) & gaussians.alive
    return dataclasses.replace(gaussians, alive=gaussians.alive & ~drop)


def grow_capacity(gaussians: Gaussians, opt_state: AdamState,
                  stats: DensifyStats, new_capacity: int):
    """Host-side re-pad of every leading-axis array (rare; powers of two)."""
    C = gaussians.capacity
    assert new_capacity > C

    def pad(x):
        if not hasattr(x, "ndim") or x.ndim == 0 or x.shape[0] != C:
            return x
        pad_width = [(0, new_capacity - C)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width)

    g = jax.tree.map(pad, gaussians)
    # Keep padded quaternions normalizable.
    rot = g.rotation.at[C:, 0].set(1.0)
    g = dataclasses.replace(g, rotation=rot)
    return (g, jax.tree.map(pad, opt_state),
            jax.tree.map(pad, stats))
