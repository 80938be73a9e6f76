"""Golden renderer semantics: projection + per-pixel alpha blending."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2m_tpu.core.camera import Camera
from gs2m_tpu.core.gaussians import Gaussians
from gs2m_tpu.ops.golden import golden_rasterize
from gs2m_tpu.ops.projection import project


def make_camera(width=64, height=64, dist=4.0):
    # Camera at z=-dist looking toward +z (identity rotation, w2c T = +dist z).
    return Camera.create(np.eye(3), np.array([0.0, 0.0, dist]), fovx=0.9, fovy=0.9,
                         width=width, height=height)


def make_scene(rng, n=64, capacity=96, sh_degree=1, spread=1.0, zspread=0.5,
               random_pose=False):
    pts = rng.normal(size=(n, 3)).astype(np.float32) * np.array([spread, spread, zspread], np.float32)
    cols = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    g = Gaussians.create(pts, cols, max_sh_degree=sh_degree, capacity=capacity)
    if random_pose:
        # Random rotations + anisotropic scales so normals point anywhere
        # (the default identity/isotropic init makes every normal ±x̂).
        import dataclasses
        import jax.numpy as jnp
        q = rng.normal(size=(capacity, 4)).astype(np.float32)
        scl = np.asarray(g.scaling) + rng.uniform(-1, 0.2, (capacity, 3)).astype(np.float32)
        g = dataclasses.replace(g, rotation=jnp.asarray(q), scaling=jnp.asarray(scl))
    return g


def full_features(g, cam):
    n = g.capacity
    normals = g.get_normals(cam.cam_center)
    cam_n = normals @ cam.world_view[:3, :3]
    cam_p = g.xyz @ cam.world_view[:3, :3] + cam.world_view[3, :3]
    dist = jnp.abs(jnp.sum(cam_n * cam_p, axis=-1))
    feats = jnp.concatenate([
        jnp.ones((n, 1)), dist[:, None], normals,
        g.get_albedo, g.get_roughness, g.get_metallic], axis=-1)
    return feats


def test_projection_center_gaussian():
    cam = make_camera()
    g = Gaussians.create(np.zeros((1, 3), np.float32), np.full((1, 3), 0.5, np.float32),
                         max_sh_degree=0, capacity=1, mean_sq_dist=np.array([0.01]))
    proj = project(g, cam, active_sh_degree=0)
    # Center of image: ndc (0,0) -> pixel ((W-1)/2, (H-1)/2).
    np.testing.assert_allclose(np.asarray(proj.means2d[0]), [31.5, 31.5], atol=1e-3)
    assert bool(proj.valid[0])
    assert int(proj.radii[0]) > 0
    # Depth equals camera distance.
    np.testing.assert_allclose(float(proj.depths[0]), 4.0, atol=1e-5)
    # Isotropic gaussian -> symmetric conic (b = 0, a = c).
    con = np.asarray(proj.conics[0])
    assert abs(con[1]) < 1e-5 * abs(con[0])


def test_near_cull_and_dead_mask():
    cam = make_camera(dist=4.0)
    pts = np.array([[0, 0, 0], [0, 0, -3.9], [0, 0, -10.0]], np.float32)  # z_view: 4, .1, -6
    g = Gaussians.create(pts, np.full((3, 3), 0.5, np.float32), 0, capacity=4,
                         mean_sq_dist=np.full(3, 0.01))
    proj = project(g, cam, 0)
    assert bool(proj.valid[0])
    assert not bool(proj.valid[1])  # z_view = 0.1 <= 0.2 culled
    assert not bool(proj.valid[2])  # behind camera
    assert not bool(proj.valid[3])  # dead padding slot
    assert np.all(np.isfinite(np.asarray(proj.means2d)))
    assert np.all(np.isfinite(np.asarray(proj.conics)))


def run_golden(g, cam, feature_count=10, bg=None, opacity_boost=None):
    proj = project(g, cam, g.max_sh_degree)
    opa = g.get_opacity[:, 0]
    if opacity_boost is not None:
        opa = jnp.minimum(opa * opacity_boost, 0.9999)
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
    feats = full_features(g, cam)
    return golden_rasterize(
        proj.means2d, proj.depths, proj.conics, opa, proj.colors, feats,
        proj.rect_min, proj.rect_max, proj.valid, bg,
        cam.height, cam.width, 16, feature_count), proj


def test_single_gaussian_renders_its_color():
    cam = make_camera()
    g = Gaussians.create(np.zeros((1, 3), np.float32), np.array([[0.8, 0.3, 0.1]], np.float32),
                         max_sh_degree=0, capacity=1, mean_sq_dist=np.array([0.05]))
    out, proj = run_golden(g, cam, opacity_boost=9.0)  # opacity 0.9
    # The mean lands at pixel 31.5, so pixel (32,32) sees alpha slightly
    # below 0.9; compute the exact expected alpha from the conic.
    con = np.asarray(proj.conics[0])
    d = np.asarray(proj.means2d[0]) - np.array([32.0, 32.0])
    power = -0.5 * (con[0] * d[0] ** 2 + con[2] * d[1] ** 2) - con[1] * d[0] * d[1]
    alpha = min(0.99, 0.9 * np.exp(power))
    c_center = np.asarray(out.color[:, 32, 32])
    np.testing.assert_allclose(c_center, alpha * np.array([0.8, 0.3, 0.1]), rtol=1e-3)
    np.testing.assert_allclose(float(out.final_T[32, 32]), 1.0 - alpha, atol=1e-4)
    # Alpha map = blended feature channel 0.
    np.testing.assert_allclose(float(out.buffer[0, 32, 32]), alpha, atol=1e-4)
    # Far corner unaffected: T = 1, black.
    np.testing.assert_allclose(np.asarray(out.color[:, 0, 0]), 0.0, atol=1e-6)
    assert int(out.observe[0]) > 0


def test_background_composites_on_rgb_not_features():
    cam = make_camera()
    g = Gaussians.create(np.zeros((1, 3), np.float32), np.full((1, 3), 0.5, np.float32),
                         max_sh_degree=0, capacity=1, mean_sq_dist=np.array([0.01]))
    out, _ = run_golden(g, cam, bg=jnp.array([1.0, 1.0, 1.0]))
    # Empty corner: RGB = bg, features = 0.
    np.testing.assert_allclose(np.asarray(out.color[:, 0, 0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.buffer[:, 0, 0]), 0.0, atol=1e-6)


def test_depth_ordering_occlusion():
    cam = make_camera()
    # Front gaussian (red, opaque) should hide back gaussian (green).
    pts = np.array([[0, 0, -1.0], [0, 0, 1.0]], np.float32)  # z_view 3 and 5
    cols = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
    g = Gaussians.create(pts, cols, 0, capacity=2, mean_sq_dist=np.full(2, 0.05))
    out, _ = run_golden(g, cam, opacity_boost=9.99)
    c = np.asarray(out.color[:, 32, 32])
    assert c[0] > 0.95 and c[1] < 0.02


def test_feature_count_masks_channels():
    rng = np.random.default_rng(5)
    cam = make_camera(width=32, height=32)
    g = make_scene(rng, n=16, capacity=16)
    out5, _ = run_golden(g, cam, feature_count=5)
    out10, _ = run_golden(g, cam, feature_count=10)
    np.testing.assert_allclose(np.asarray(out5.buffer[:5]), np.asarray(out10.buffer[:5]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out5.buffer[5:]), 0.0)
    assert float(jnp.abs(out10.buffer[5:]).sum()) > 0


def test_golden_is_differentiable():
    rng = np.random.default_rng(6)
    cam = make_camera(width=32, height=32)
    g = make_scene(rng, n=24, capacity=32)

    def loss_fn(params):
        g2 = g.with_params(params)
        proj = project(g2, cam, g.max_sh_degree)
        feats = full_features(g2, cam)
        out = golden_rasterize(
            proj.means2d, proj.depths, proj.conics, g2.get_opacity[:, 0], proj.colors,
            feats, proj.rect_min, proj.rect_max, proj.valid, jnp.zeros(3),
            cam.height, cam.width, 16, 10)
        return jnp.sum(out.color ** 2) + jnp.sum(out.buffer ** 2)

    grads = jax.grad(loss_fn)(g.params_dict())
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    total = sum(float(jnp.abs(x).sum()) for x in flat)
    assert total > 0.0
