"""Adam with per-parameter-group LRs and row-level state surgery.

Behavioral reference: /root/reference/scene/gaussian_model.py:224-252 (group
LRs: xyz scaled by the scene extent, f_rest = feature_lr/20, materials share
opacity_lr; Adam eps=1e-15) and utils/general_utils.py:23-56 (the JaxNeRF
log-linear xyz schedule with the delayed sine ramp).

TPU-first: implemented as a pure pytree transform rather than optax so that
densification's row surgery (zeroing first/second moments of re-allocated
rows, reference gaussian_model.py:372-457) is a plain tree_map — no
re-instantiating optimizer state, no recompiles. One shared step count plays
the role of torch Adam's per-tensor step (bias correction): appended rows
keep the global correction with zeroed moments, exactly like the reference's
cat_tensors_to_optimizer.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass,
         data_fields=["mu", "nu", "count"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class AdamState:
    mu: Any        # pytree like params
    nu: Any        # pytree like params
    count: jnp.ndarray  # () int32


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(params, grads, state: AdamState, lrs,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15):
    """One Adam step. `lrs` is a pytree of scalar learning rates matching the
    params structure (leaves may be python floats or traced scalars)."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    c1 = 1.0 - b1 ** t
    c2 = 1.0 - b2 ** t
    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

    def upd(p, m, v, lr):
        mhat = m / c1
        vhat = v / c2
        return p - lr * mhat / (jnp.sqrt(vhat) + eps)

    new_params = jax.tree.map(upd, params, mu, nu, lrs)
    return new_params, AdamState(mu=mu, nu=nu, count=count)


def zero_state_rows(state: AdamState, row_mask: jnp.ndarray) -> AdamState:
    """Zero the moments of rows where row_mask is True (leading-axis rows) —
    the replace/cat state surgery of gaussian_model.py:372-383,440-447."""
    def z(x):
        m = row_mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, 0.0, x)
    return AdamState(mu=jax.tree.map(z, state.mu), nu=jax.tree.map(z, state.nu),
                     count=state.count)


def zero_state_param(state: AdamState, name: str) -> AdamState:
    """Zero the full moments of one named param (dict pytrees only) — used by
    opacity reset (gaussian_model.py:362-370)."""
    mu = dict(state.mu)
    nu = dict(state.nu)
    mu[name] = jnp.zeros_like(mu[name])
    nu[name] = jnp.zeros_like(nu[name])
    return AdamState(mu=mu, nu=nu, count=state.count)


def group_lrs(opt, spatial_lr_scale: float, xyz_lr: Any) -> dict:
    """Per-group LRs keyed like Gaussians.params_dict()
    (gaussian_model.py:230-240). xyz_lr is the scheduled value."""
    return {
        "xyz": xyz_lr,
        "f_dc": opt.feature_lr,
        "f_rest": opt.feature_lr / 20.0,
        "opacity": opt.opacity_lr,
        "scaling": opt.scaling_lr,
        "rotation": opt.rotation_lr,
        "albedo": opt.opacity_lr,
        "roughness": opt.opacity_lr,
        "metallic": opt.opacity_lr,
    }


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Log-linear LR interpolation with optional sine delay ramp
    (utils/general_utils.py:23-56). Works on traced or numpy steps."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
    return delay * log_lerp * (step >= 0)


def xyz_lr_schedule(opt, spatial_lr_scale: float):
    """The position schedule (gaussian_model.py:244-248)."""
    return partial(expon_lr,
                   lr_init=opt.position_lr_init * spatial_lr_scale,
                   lr_final=opt.position_lr_final * spatial_lr_scale,
                   lr_delay_mult=opt.position_lr_delay_mult,
                   max_steps=opt.position_lr_max_steps)
