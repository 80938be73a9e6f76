"""Tiled (binning + chunked blend) vs golden renderer: forward and gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2m_tpu.core.camera import Camera
from gs2m_tpu.core.gaussians import Gaussians
from gs2m_tpu.ops.binning import bin_gaussians
from gs2m_tpu.ops.projection import project
from gs2m_tpu.ops.rasterize import rasterize_from_projected, build_features

from tests.test_golden import make_camera, make_scene


def render(g, cam, backend, feature_count=10, bg=None, boost=8.0, key=None,
           chunk=32, instance_cap=2 ** 13):
    proj = project(g, cam, g.max_sh_degree)
    opa = jnp.minimum(g.get_opacity[:, 0] * boost, 0.995)
    feats = build_features(g, cam)
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
    return rasterize_from_projected(
        proj, opa, feats, bg, cam, feature_count=feature_count,
        chunk=chunk, instance_cap=instance_cap, backend=backend)


@pytest.mark.parametrize("feature_count", [1, 5, 10])
def test_xla_matches_golden_forward(feature_count):
    rng = np.random.default_rng(7)
    cam = make_camera(width=48, height=40)  # non-tile-multiple on purpose
    g = make_scene(rng, n=80, capacity=128)
    out_g = render(g, cam, "golden", feature_count)
    out_x = render(g, cam, "xla", feature_count)
    np.testing.assert_allclose(np.asarray(out_x.color), np.asarray(out_g.color),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_x.buffer), np.asarray(out_g.buffer),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_x.final_T), np.asarray(out_g.final_T),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_x.observe), np.asarray(out_g.observe))
    assert int(out_x.dropped) == 0


def test_xla_matches_golden_with_background():
    rng = np.random.default_rng(8)
    cam = make_camera(width=32, height=32)
    g = make_scene(rng, n=40, capacity=64)
    bg = jnp.array([1.0, 0.5, 0.25])
    out_g = render(g, cam, "golden", bg=bg)
    out_x = render(g, cam, "xla", bg=bg)
    np.testing.assert_allclose(np.asarray(out_x.color), np.asarray(out_g.color),
                               atol=2e-5, rtol=1e-4)


def test_binning_overflow_reported():
    rng = np.random.default_rng(9)
    cam = make_camera(width=64, height=64)
    g = make_scene(rng, n=80, capacity=128)
    proj = project(g, cam, g.max_sh_degree)
    b = bin_gaussians(proj, 64, 64, 16, instance_cap=32, chunk=32)
    assert int(b.dropped) > 0


def test_termination_heavy_occlusion():
    # Many opaque gaussians stacked at the same spot: T crosses 1e-4 and the
    # tiled path must terminate exactly like golden.
    rng = np.random.default_rng(10)
    n = 32
    pts = np.tile(np.array([[0.0, 0.0, 0.0]], np.float32), (n, 1))
    pts[:, 2] = np.linspace(-0.5, 0.5, n)  # stacked along the view axis
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    g = Gaussians.create(pts, cols, 0, capacity=n, mean_sq_dist=np.full(n, 0.05))
    cam = make_camera(width=32, height=32)
    out_g = render(g, cam, "golden", boost=9.9)
    out_x = render(g, cam, "xla", boost=9.9)
    np.testing.assert_allclose(np.asarray(out_x.color), np.asarray(out_g.color),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_x.observe), np.asarray(out_g.observe))
    # Termination actually happened.
    assert float(out_g.final_T[16, 16]) < 1e-3


def _loss_through(backend):
    rng = np.random.default_rng(11)
    cam = make_camera(width=32, height=32)
    g = make_scene(rng, n=40, capacity=64)
    target = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))

    def loss_fn(params, sink):
        g2 = g.with_params(params)
        proj = project(g2, cam, g.max_sh_degree)
        opa = jnp.minimum(g2.get_opacity[:, 0] * 8.0, 0.995)
        feats = build_features(g2, cam)
        out = rasterize_from_projected(
            proj, opa, feats, jnp.zeros(3), cam, feature_count=10,
            chunk=32, instance_cap=2 ** 13, backend=backend, m2d_sink=sink)
        return jnp.mean(jnp.abs(out.color - target)) + 0.1 * jnp.mean(out.buffer ** 2)

    sink = jnp.zeros((g.capacity, 2))
    grads, sink_grad = jax.grad(loss_fn, argnums=(0, 1))(g.params_dict(), sink)
    return grads, sink_grad


def test_xla_grads_match_golden():
    grads_x, sink_x = _loss_through("xla")
    grads_g, sink_g = _loss_through("golden")
    for k in grads_g:
        gx, gg = np.asarray(grads_x[k]), np.asarray(grads_g[k])
        assert np.all(np.isfinite(gx)), k
        scale = np.abs(gg).max() + 1e-8
        np.testing.assert_allclose(gx, gg, atol=3e-5 * scale + 1e-8, rtol=2e-3,
                                   err_msg=f"param {k}")
    np.testing.assert_allclose(np.asarray(sink_x), np.asarray(sink_g),
                               atol=3e-5 * (np.abs(sink_g).max() + 1e-8), rtol=2e-3)
    assert np.abs(np.asarray(sink_g)).sum() > 0


def test_opacity_aware_rect_output_identical():
    """Tightening the tile rect to the alpha >= 1/255 ellipse
    (ops/projection.project opacities=...) must be invisible: every excluded
    pixel was already gated off by ALPHA_MIN, so outputs, observe counts AND
    gradients are bit-identical to the full 3-sigma rect — only the
    expansion size (instance-cap pressure) shrinks."""
    import dataclasses

    rng = np.random.default_rng(3)
    g = make_scene(rng, n=400, capacity=512)
    # Mixed opacities including the post-reset regime (sigmoid(-5) ~ 0.007).
    g = dataclasses.replace(
        g, opacity=jnp.asarray(rng.uniform(-5.0, 2.0, (512, 1)).astype(np.float32)))
    cam = make_camera(160, 120)
    opac = g.get_opacity[:, 0]
    cap = 2 ** 16

    def run(use_op):
        def f(params):
            g2 = g.with_params(params)
            kw = {"opacities": g2.get_opacity[:, 0]} if use_op else {}
            proj = project(g2, cam, 2, **kw)
            out = rasterize_from_projected(
                proj, g2.get_opacity[:, 0], build_features(g2, cam),
                jnp.ones(3), cam, feature_count=5, chunk=64,
                instance_cap=cap, backend="xla")
            return (jnp.sum(out.color ** 2) + jnp.sum(out.buffer ** 2),
                    (out.color, out.buffer, out.final_T, out.observe))
        (loss, outs), grads = jax.value_and_grad(f, has_aux=True)(g.params_dict())
        return outs, grads

    proj_full = project(g, cam, 2)
    proj_op = project(g, cam, 2, opacities=opac)
    exp_full = int(jnp.sum(proj_full.tiles_touched))
    exp_op = int(jnp.sum(proj_op.tiles_touched))
    assert exp_op < exp_full  # the point of the feature
    b = bin_gaussians(proj_op, 120, 160, 16, cap, 64, opacities=opac)
    assert int(b.dropped) == 0

    (c_f, buf_f, t_f, obs_f), g_f = run(False)
    (c_o, buf_o, t_o, obs_o), g_o = run(True)
    np.testing.assert_array_equal(np.asarray(c_f), np.asarray(c_o))
    np.testing.assert_array_equal(np.asarray(buf_f), np.asarray(buf_o))
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_o))
    np.testing.assert_array_equal(np.asarray(obs_f), np.asarray(obs_o))
    for k in g_f:
        np.testing.assert_array_equal(np.asarray(g_f[k]), np.asarray(g_o[k]),
                                      err_msg=f"param {k}")


def test_opacity_aware_rect_keeps_visibility_semantics():
    """`valid` and `radii` must keep the reference's 3-sigma definition under
    opacity-tightened rects (ADVICE r3): an edge-of-screen low-opacity splat
    whose 3-sigma rect overlaps but whose tightened rect is empty stays
    visible for densify/prune accounting."""
    import dataclasses

    rng = np.random.default_rng(7)
    g = make_scene(rng, n=400, capacity=512)
    # Push splats toward/past the screen edge and include very low opacities
    # so some tightened rects clip to zero area while 3-sigma rects survive.
    pts = np.array(g.xyz)
    pts[:, 0] += np.linspace(-3.0, 3.0, pts.shape[0]).astype(np.float32)
    g = dataclasses.replace(
        g, xyz=jnp.asarray(pts),
        opacity=jnp.asarray(rng.uniform(-6.0, 0.0, (512, 1)).astype(np.float32)))
    cam = make_camera(160, 120)
    opac = g.get_opacity[:, 0]

    proj_full = project(g, cam, 2)
    proj_op = project(g, cam, 2, opacities=opac)
    np.testing.assert_array_equal(np.asarray(proj_full.valid),
                                  np.asarray(proj_op.valid))
    np.testing.assert_array_equal(np.asarray(proj_full.radii),
                                  np.asarray(proj_op.radii))
    # tiles_touched may only shrink, never grow.
    assert np.all(np.asarray(proj_op.tiles_touched)
                  <= np.asarray(proj_full.tiles_touched))
