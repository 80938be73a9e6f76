"""Renderer output surface: map shapes, plane depth, sobel normals."""
import jax
import jax.numpy as jnp
import numpy as np

from gs2m_tpu.models.render import render, render_jit
from gs2m_tpu.ops.normals import depth_to_points, normal_from_depth_image

from tests.test_golden import make_camera, make_scene


def test_render_output_surface():
    rng = np.random.default_rng(3)
    cam = make_camera(width=48, height=32)
    g = make_scene(rng, n=60, capacity=64, random_pose=True)
    pkg = render(g, cam, jnp.zeros(3), g.max_sh_degree,
                 geometry_stage=True, material_stage=True, sobel_normal=True,
                 blend_metallic=True, chunk=32, instance_cap=2 ** 13)
    H, W = 32, 48
    assert pkg["render"].shape == (3, H, W)
    for k in ["alpha_map", "distance_map", "depth_map", "roughness_map",
              "metallic_map", "normal_mask"]:
        assert pkg[k].shape == (1, H, W), k
    for k in ["normal_map", "albedo_map", "local_normal_map", "sobel_map"]:
        assert pkg[k].shape == (3, H, W), k
    assert pkg["radii"].shape == (g.capacity,)
    assert bool(jnp.all(jnp.isfinite(pkg["depth_map"])))
    # Plane depth is positive wherever normals blended.
    m = np.asarray(pkg["normal_mask"][0])
    d = np.asarray(pkg["depth_map"][0])
    assert (d[m] > 0).mean() > 0.95
    assert int(pkg["dropped"]) == 0


def test_feature_count_staging():
    rng = np.random.default_rng(4)
    cam = make_camera(width=32, height=32)
    g = make_scene(rng, n=40, capacity=64)
    warm = render(g, cam, jnp.zeros(3), g.max_sh_degree, chunk=32,
                  instance_cap=2 ** 13)
    geo = render(g, cam, jnp.zeros(3), g.max_sh_degree, geometry_stage=True,
                 chunk=32, instance_cap=2 ** 13)
    # Warmup blends only alpha: normals/albedo channels must be zero.
    assert float(jnp.abs(warm["normal_map"]).max()) == 0.0
    assert float(jnp.abs(warm["alpha_map"]).max()) > 0.0
    assert float(jnp.abs(geo["normal_map"]).max()) > 0.0
    assert float(jnp.abs(geo["albedo_map"]).max()) == 0.0


def test_render_jit_compiles_and_differentiates():
    rng = np.random.default_rng(5)
    cam = make_camera(width=32, height=32)
    g = make_scene(rng, n=40, capacity=64)
    target = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))

    @jax.jit
    def loss_fn(params):
        pkg = render_jit(g.with_params(params), cam, jnp.zeros(3),
                         active_sh_degree=g.max_sh_degree, geometry_stage=True,
                         chunk=32, instance_cap=2 ** 13)
        return jnp.mean(jnp.abs(pkg["render"] - target)) + jnp.mean(pkg["depth_map"] ** 2) * 1e-3

    grads = jax.grad(loss_fn)(g.params_dict())
    for k, v in grads.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    assert float(jnp.abs(grads["xyz"]).sum()) > 0


def test_normal_from_depth_flat_plane():
    # A constant-depth image back-projects to a plane z = d whose normal is
    # (0, 0, ±1) in camera space.
    H, W = 16, 20
    K = jnp.array([[20.0, 0.0, 10.0], [0.0, 20.0, 8.0], [0.0, 0.0, 1.0]])
    depth = jnp.full((H, W), 2.0)
    pts = depth_to_points(depth, K)
    np.testing.assert_allclose(np.asarray(pts[..., 2]), 2.0, atol=1e-6)
    n = normal_from_depth_image(depth, K)
    inner = np.asarray(n[1:-1, 1:-1])
    np.testing.assert_allclose(np.abs(inner[..., 2]), 1.0, atol=1e-5)
