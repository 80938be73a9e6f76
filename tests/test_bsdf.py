"""BSDF op library vs the reference's pure-PyTorch twins (golden-twin tests,
mirroring render-utils/tests/test_bsdf.py's value+gradient comparisons)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from gs2m_tpu.pbr import bsdf as B


def rand(*shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def torch_lambert(nrm, wi):
    return torch.clamp(torch.sum(nrm * wi, -1, keepdim=True), min=0.0) / math.pi


def test_lambert_matches_torch():
    n = rand(64, 3, seed=1)
    wi = rand(64, 3, seed=2)
    ours = np.asarray(B.bsdf_lambert(jnp.asarray(n), jnp.asarray(wi)))
    ref = torch_lambert(torch.tensor(n), torch.tensor(wi)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_ggx_terms_match_reference_formulas():
    a2 = np.abs(rand(32, 1, seed=3)) * 0.5 + 0.01
    ct = rand(32, 1, seed=4) * 0.5 + 0.5
    d = np.asarray(B.bsdf_ndf_ggx(jnp.asarray(a2), jnp.asarray(ct)))
    c = np.clip(ct, 1e-4, 1 - 1e-4)
    dd = (c * a2 - c) * c + 1
    np.testing.assert_allclose(d, a2 / (dd * dd * math.pi), rtol=1e-5)

    lam = np.asarray(B.bsdf_lambda_ggx(jnp.asarray(a2), jnp.asarray(ct)))
    t2 = (1 - c * c) / (c * c)
    np.testing.assert_allclose(lam, 0.5 * (np.sqrt(1 + a2 * t2) - 1), rtol=1e-5)


def test_pbr_bsdf_energy_and_grads():
    rng = np.random.default_rng(5)
    pos = rng.normal(size=(128, 3)).astype(np.float32)
    nrm = pos / np.linalg.norm(pos, axis=-1, keepdims=True)
    view = pos + nrm * 2.0 + rng.normal(scale=0.1, size=(128, 3)).astype(np.float32)
    light = pos + nrm * 3.0
    kd = rng.uniform(0, 1, (128, 3)).astype(np.float32)
    arm = rng.uniform(0.1, 0.9, (128, 3)).astype(np.float32)

    for mode in (0, 1):
        out = B.bsdf_pbr(jnp.asarray(kd), jnp.asarray(arm), jnp.asarray(pos),
                         jnp.asarray(nrm), jnp.asarray(view),
                         jnp.asarray(light), bsdf=mode)
        o = np.asarray(out)
        assert np.isfinite(o).all()
        assert (o >= 0).all()

    g = jax.grad(lambda k: jnp.sum(B.bsdf_pbr(
        k, jnp.asarray(arm), jnp.asarray(pos), jnp.asarray(nrm),
        jnp.asarray(view), jnp.asarray(light))))(jnp.asarray(kd))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_prepare_shading_normal_two_sided():
    pos = jnp.zeros((4, 3))
    view = jnp.asarray(np.array([[0, 0, 1]] * 4, np.float32))
    geom = jnp.asarray(np.array([[0, 0, -1]] * 4, np.float32))  # backfacing
    smooth = geom
    tng = jnp.asarray(np.array([[1, 0, 0]] * 4, np.float32))
    pert = jnp.asarray(np.array([[0, 0, 1]] * 4, np.float32))
    out = B.prepare_shading_normal(pos, view, pert, smooth, tng, geom,
                                   two_sided_shading=True, opengl=False)
    # Two-sided flips the backfacing normal toward the viewer.
    assert float(out[0, 2]) > 0.9


def test_image_losses_match_torch():
    rng = np.random.default_rng(6)
    img = rng.uniform(0, 4, (8, 16, 3)).astype(np.float32)
    tgt = rng.uniform(0, 4, (8, 16, 3)).astype(np.float32)
    ti, tt = torch.tensor(img), torch.tensor(tgt)

    np.testing.assert_allclose(
        float(B.image_loss(jnp.asarray(img), jnp.asarray(tgt), "smape")),
        float(torch.mean(torch.abs(ti - tt) / (torch.abs(ti) + torch.abs(tt) + 0.01))),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(B.image_loss(jnp.asarray(img), jnp.asarray(tgt), "relmse")),
        float(torch.mean((ti - tt) ** 2 / (ti * ti + tt * tt + 0.1))), rtol=1e-5)
    # log_srgb tonemapper path
    v = float(B.image_loss(jnp.asarray(img), jnp.asarray(tgt), "mse", "log_srgb"))
    li = torch.log(torch.clamp(ti, 0, 65535) + 1)
    lt = torch.log(torch.clamp(tt, 0, 65535) + 1)
    tm = lambda f: torch.where(f > 0.0031308,
                               torch.pow(torch.clamp(f, min=0.0031308), 1 / 2.4) * 1.055 - 0.055,
                               12.92 * f)
    np.testing.assert_allclose(v, float(torch.mean((tm(li) - tm(lt)) ** 2)), rtol=1e-5)


def test_xfm_points():
    pts = rand(10, 3, seed=7)
    M = np.eye(4, dtype=np.float32)
    M[:3, 3] = [1, 2, 3]
    out = np.asarray(B.xfm_points(jnp.asarray(pts), jnp.asarray(M)))
    np.testing.assert_allclose(out[:, :3], pts + np.array([1, 2, 3]), atol=1e-6)
    np.testing.assert_allclose(out[:, 3], 1.0)
