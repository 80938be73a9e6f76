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


def test_pad_cube_interior_identity_and_constant():
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(size=(6, 8, 8, 3)).astype(np.float32))
    p = cm.pad_cube(c)
    assert p.shape == (6, 10, 10, 3)
    np.testing.assert_array_equal(np.asarray(p[:, 1:-1, 1:-1]), np.asarray(c))
    np.testing.assert_allclose(
        np.asarray(cm.pad_cube(jnp.full((6, 8, 8, 3), 0.7))), 0.7, atol=1e-7)


def _smooth_field(d):
    """Low-order smooth RGB function of direction (continuous on the sphere)."""
    return np.stack([0.5 + 0.5 * d[..., 0],
                     0.5 + 0.5 * d[..., 1] * d[..., 2],
                     0.5 + 0.3 * d[..., 2]], -1).astype(np.float32)


def test_cube_lookup_seamless_across_edges():
    """Seam-aware bilinear (nvdiffrast boundary_mode='cube' semantics,
    textureCUDA.cu): walking a great-circle path across a face edge must stay
    continuous, unlike clamp-to-face filtering."""
    res = 16
    cmap = jnp.asarray(_smooth_field(cm.cube_dirs(res)))
    t = np.linspace(-0.3, 0.3, 801)
    walk = np.stack([np.cos(np.pi / 4 + t), np.full_like(t, 0.1),
                     np.sin(np.pi / 4 + t)], -1)
    walk /= np.linalg.norm(walk, axis=-1, keepdims=True)
    walk = jnp.asarray(walk.astype(np.float32))
    out = np.asarray(cm.cube_lookup(cmap, walk))
    out_clamp = np.asarray(cm.cube_lookup(cmap, walk, seamless=False))
    step = np.abs(np.diff(out, axis=0)).max()
    step_clamp = np.abs(np.diff(out_clamp, axis=0)).max()
    assert step < 1e-3, step                 # measured 0.00035
    assert step < step_clamp / 10            # clamp measured 0.0227
    truth = _smooth_field(np.asarray(walk))
    assert np.abs(out - truth).max() < 3e-3  # measured 0.0011


def _exact_ggx_prefilter(base, roughness, out_dirs, cutoff=0.99):
    """Dense per-texel GGX split-sum integral at the base resolution — the
    numpy oracle for the reference's brute-force prefilter
    (render-utils c_src/cubemap.cu:246-298 with render_utils/ops.py:403's
    weight-sum normalization), no band-limiting."""
    res = base.shape[1]
    d = cm.cube_dirs(res).reshape(-1, 3)
    area = np.tile(cm.texel_solid_angle(res)[None], (6, 1, 1)).reshape(-1)
    cos_cut = cm.ndf_cutoff_angle(roughness, cutoff)
    alpha_sqr = roughness ** 4
    flat = base.reshape(-1, 3).astype(np.float64)
    out = np.zeros((len(out_dirs), 3))
    for i in range(0, len(out_dirs), 64):  # block to bound memory
        cos = out_dirs[i:i + 64] @ d.T
        h = np.sqrt(np.clip((1.0 + cos) / 2.0, 0.0, 1.0))
        ndf = alpha_sqr / (((h * alpha_sqr - h) * h + 1.0) ** 2 * np.pi)
        w = np.clip(cos, 0.0, None) * ndf * area[None, :] / 4.0
        w = np.where(cos >= cos_cut, w, 0.0)
        w /= np.maximum(w.sum(1, keepdims=True), 1e-12)
        out[i:i + 64] = w @ flat
    return out


@pytest.mark.parametrize("res", [64, 128])
def test_specular_prefilter_vs_exact_oracle(res):
    """Numeric bound for the band-limited prefilter (VERDICT r3 missing #5):
    every specular level stays within 6% max / 1% mean relative error of the
    EXACT dense integral on a harsh light (smooth HDR field + bright blob).
    Measured 2026-08-18: worst level 4.4% max / 0.4% mean (mid-roughness at
    16^2 band limit); native-res levels <= 0.7% max."""
    rng = np.random.default_rng(3)
    d = cm.cube_dirs(res)
    base = ((0.6 + 0.4 * d[..., 0] + 0.3 * d[..., 1] * d[..., 2]
             + 0.5 * d[..., 2] ** 2)[..., None]
            * np.array([1.0, 0.8, 1.2]) + 0.05)
    blob = np.array([0.3, 0.5, 0.81])
    blob /= np.linalg.norm(blob)
    base = (base + 4.0 * np.exp((d @ blob - 1.0) / 0.02)[..., None]
            ).astype(np.float32)
    _, spec = cm.build_mips(jnp.asarray(base))
    roughs = cm.level_roughness(cm.num_levels(res))
    sel = rng.choice(6 * res * res, 256, replace=False)
    out_dirs = cm.cube_dirs(res).reshape(-1, 3)[sel]
    for lvl, r in zip(spec, roughs):
        exact = _exact_ggx_prefilter(base, float(r), out_dirs)
        got = np.asarray(cm.cube_lookup(
            lvl, jnp.asarray(out_dirs.astype(np.float32))))
        rel = np.abs(got - exact) / np.maximum(np.abs(exact), 1e-3)
        assert rel.max() < 0.06, (r, rel.max())
        assert rel.mean() < 0.01, (r, rel.mean())


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
    # metallic=True: trains the metallic latent AND exercises the
    # blend_metallic eval path (feature_count 10; a missing blend_metallic
    # in evaluate_views' render would slice an EMPTY metallic_map).
    mc = ModelConfig(source_path=src, resolution=1, material=True,
                     metallic=True,
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

    # Material-stage evaluation (training_utils.py:95-168): evaluate_views
    # must report the PBR render's PSNR alongside the RGB blend's.
    from gs2m_tpu.train.reporting import TrainingReporter, evaluate_views
    rep = TrainingReporter(str(tmp_path / "tb"))
    res = evaluate_views(trainer, scene.train_cameras[:2],
                         scene.gt_images[:2], n_views=2,
                         log_images_to=rep, iteration=trainer.iteration)
    rep.close()
    assert np.isfinite(res["psnr"]) and np.isfinite(res["l1"])
    assert "psnr_pbr" in res and np.isfinite(res["psnr_pbr"]), res
    assert np.isfinite(res["l1_pbr"])
