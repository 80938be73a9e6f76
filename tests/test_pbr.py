"""PBR stack: cube mapping, prefilter integrals, LUT, split-sum shading."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2m_tpu.pbr import cubemap as cm
from gs2m_tpu.pbr import shade as sh


def test_cube_dir_roundtrip():
    res = 16
    dirs = jnp.asarray(cm.cube_dirs(res))  # (6, R, R, 3)
    face, u, v = cm.dir_to_face_uv(dirs)
    # Each texel's direction maps back to its own face and texel center.
    f_expect = np.broadcast_to(np.arange(6)[:, None, None], (6, res, res))
    np.testing.assert_array_equal(np.asarray(face), f_expect)
    grid = (np.arange(res) + 0.5) / res
    np.testing.assert_allclose(np.asarray(u[0]), np.broadcast_to(grid, (res, res)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(v[0]),
                               np.broadcast_to(grid[:, None], (res, res)), atol=1e-5)


def test_solid_angles_sum_to_sphere():
    for res in (16, 64):
        total = 6 * cm.texel_solid_angle(res).sum()
        np.testing.assert_allclose(total, 4 * np.pi, rtol=1e-3)


def test_cube_lookup_constant_and_gradient():
    cmap = jnp.ones((6, 8, 8, 3)) * 0.7
    dirs = jnp.asarray(np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32))
    out = cm.cube_lookup(cmap, dirs)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-6)

    def f(c):
        return jnp.sum(cm.cube_lookup(c, dirs))
    g = jax.grad(f)(cmap)
    # Total gradient mass = number of samples (bilinear weights sum to 1).
    np.testing.assert_allclose(float(g.sum()), 100.0 * 3, rtol=1e-5)


def test_diffuse_prefilter_constant_light():
    # A constant environment has irradiance == its own value (energy check:
    # integral of cos/pi over hemisphere = 1).
    base = jnp.ones((6, 16, 16, 3)) * 0.5
    diffuse, _ = cm.build_mips(base)
    np.testing.assert_allclose(np.asarray(diffuse), 0.5, rtol=2e-2)


def test_specular_prefilter_constant_light():
    base = jnp.ones((6, 64, 64, 3)) * 0.8
    _, specular = cm.build_mips(base)
    assert len(specular) == cm.num_levels(64) == 3
    for lvl in specular:
        np.testing.assert_allclose(np.asarray(lvl), 0.8, rtol=3e-2)


def test_specular_prefilter_smooths_with_roughness():
    # A one-hot bright texel spreads wider at rougher levels.
    rng = np.random.default_rng(1)
    base = np.zeros((6, 64, 64, 3), np.float32)
    base[4, 32, 32] = 50.0
    _, specular = cm.build_mips(jnp.asarray(base))
    peaks = [float(lvl.max()) for lvl in specular]
    assert peaks[0] > peaks[1] > peaks[2]


def test_build_mips_differentiable():
    base = jnp.ones((6, 32, 32, 3)) * 0.3

    def f(b):
        d, spec = cm.build_mips(b)
        return jnp.sum(d) + sum(jnp.sum(s) for s in spec)
    g = jax.grad(f)(base)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_brdf_lut_sane():
    lut = np.asarray(sh.get_brdf_lut())
    assert lut.shape == (256, 256, 2)
    assert np.isfinite(lut).all()
    assert (lut >= -1e-4).all() and (lut <= 1.2).all()
    # Smooth + head-on (NoV~1, r~0): A ~ 1, B ~ 0.
    assert lut[-1, 0, 0] > 0.9
    assert lut[-1, 0, 1] < 0.1


def test_get_mip_endpoints():
    n = 6
    assert float(sh.get_mip(jnp.float32(cm.MIN_ROUGHNESS), n)) == 0.0
    np.testing.assert_allclose(float(sh.get_mip(jnp.float32(cm.MAX_ROUGHNESS), n)),
                               n - 2)
    np.testing.assert_allclose(float(sh.get_mip(jnp.float32(1.0), n)), n - 1)


def test_pbr_shading_shapes_and_range():
    H, W = 12, 16
    rng = np.random.default_rng(2)
    base = jnp.asarray(rng.uniform(0.2, 0.8, (6, 32, 32, 3)).astype(np.float32))
    diffuse, specular = cm.build_mips(base)
    n = rng.normal(size=(H, W, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = -n + rng.normal(scale=0.1, size=(H, W, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    out = sh.pbr_shading(diffuse, specular, jnp.asarray(n.astype(np.float32)),
                         jnp.asarray((-v).astype(np.float32)),
                         albedo=jnp.full((H, W, 3), 0.5),
                         roughness=jnp.full((H, W, 1), 0.3),
                         brdf_lut=sh.get_brdf_lut(),
                         metallic=jnp.full((H, W, 1), 0.2))
    for k in ("render_rgb", "diffuse_rgb", "specular_rgb"):
        assert out[k].shape == (H, W, 3)
        assert np.isfinite(np.asarray(out[k])).all()
    assert (np.asarray(out["render_rgb"]) >= 0).all()
    assert (np.asarray(out["render_rgb"]) <= 1).all()


def test_tonemap_curves():
    x = jnp.linspace(0, 1, 64)
    np.testing.assert_allclose(np.asarray(sh.srgb_to_linear(sh.linear_to_srgb(x))),
                               np.asarray(x), atol=1e-3)
    a = sh.aces_film(x)
    assert (np.asarray(a) >= 0).all() and (np.asarray(a) <= 1).all()


@pytest.mark.slow
def test_material_training_step_runs(tmp_path):
    """One full material-stage train step executes and produces finite light grads."""
    from tests.make_synthetic_scene import build

    from gs2m_tpu.core.config import ModelConfig, OptimConfig, PipelineConfig
    from gs2m_tpu.data.scene import Scene
    from gs2m_tpu.pbr import make_pbr_fns
    from gs2m_tpu.train.trainer import Trainer

    src = build(str(tmp_path / "scene"), n_views=6, width=48, height=32,
                n_points=60)
    mc = ModelConfig(source_path=src, resolution=1, material=True,
                     model_path=str(tmp_path / "out"))
    pipe = PipelineConfig(chunk=64, use_pallas=False)
    opt = OptimConfig(iterations=20, geometry_from_iter=2,
                      densify_from_iter=1000, multi_view_max_angle=179.0,
                      multi_view_max_dist=100.0, nearby_cam_max_angle=179.0,
                      nearby_cam_max_dist=100.0, nearby_cam_min_angle=0.0,
                      nearby_cam_min_dist=0.0, multi_view_sample_num=128,
                      lambda_plane=1.0, use_multi_view_trim=False,
                      prune_init_points=False)
    scene = Scene(mc, opt)
    pbr_fns = make_pbr_fns(base_res=64)
    trainer = Trainer(mc, pipe, opt, scene, capacity=64, pbr_fns=pbr_fns)
    assert trainer.material_from_iter == opt.geometry_from_iter
    light0 = np.asarray(trainer.light_state).copy()
    for _ in range(4):
        m = trainer.train_step()
        assert np.isfinite(float(m["loss"])), m
    assert float(m["Lmat"]) != 0.0
    # Light received updates and stayed non-negative.
    assert np.abs(np.asarray(trainer.light_state) - light0).max() > 0
    assert float(trainer.light_state.min()) >= 0.0
