"""Independent gradient oracle hand-ported from the reference CUDA backward.

Every oracle here is derived from the reference implementation
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
backward.cu), NOT from this repo's golden/_compose semantics — so a bug in
the compositing recurrence that golden, blend_xla and blend_pallas all share
would be caught here (VERDICT round-1 item #3; BASELINE gate "grad allclose
vs CUDA ref on fixtures").

Port map (all numpy, f32 gates / f64 accumulation):
  _ref_blend_forward   <- forward.cu:246-372   (renderCUDA fwd)
  _ref_blend_backward  <- backward.cu:412-598  (renderCUDA bwd: T-division
                          from final_T, accum_rec/last_color recurrence,
                          n_contrib countdown, bg term, AbsGS abs channels)
  _ref_cov3d_backward  <- backward.cu:283-347  (computeCov3D scale/quat)
  _ref_cov2d_backward  <- backward.cu:153-281  (computeCov2DCUDA conic ->
                          cov3D + mean-through-J chain)
  _ref_sh_backward     <- backward.cu:21-148   (computeColorFromSH)
  _ref_mean2d_backward <- backward.cu:375-392  (preprocessCUDA projection)

Convention notes (cited at the comparison sites):
  * The reference stores HALF the true off-diagonal conic gradient
    (backward.cu:591) and compensates with a factor 2 in dL_db
    (backward.cu:219). Our chain carries the true derivative.
  * The reference's backward adds a +0.3 dilation (backward.cu:205-207)
    that its own forward in THIS fork does not apply (forward.cu:101 inverts
    the raw covariance) — an inherited fork inconsistency. The oracle uses
    dilation = 0 to match the actual forward semantics.
  * The reference backward ignores the 0.99 alpha clamp in the alpha chain
    (backward.cu:528,575); our kernels gate it. Fixtures keep opacity <= 0.9
    so no alpha reaches the clamp and the conventions agree.
  * means2D grads are pixel-space here; the reference's are NDC
    (ddelx_dx = 0.5*W, backward.cu:490-491) — handled at the call sites.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gs2m_tpu.core.gaussians import quat_to_rotmat
from gs2m_tpu.ops.binning import bin_gaussians
from gs2m_tpu.ops.blend_pallas import blend_tiles_pallas
from gs2m_tpu.ops.blend_xla import blend_tiles_xla
from gs2m_tpu.ops.projection import compute_cov2d, project
from gs2m_tpu.ops.rasterize import build_features, pack_values

from tests.test_golden import make_camera, make_scene

CHUNK = 256


# =============================================================================
# Blend oracle (renderCUDA): vectorized over pixels like the CUDA thread
# block, sequential over the depth-sorted Gaussian list.
# =============================================================================

def _ref_blend_forward(means2d, depths, conics, opac, values, rect_min,
                       rect_max, valid, H, W, tile):
    """forward.cu:246-372 in numpy. Returns (image16, final_T, n_contrib,
    in_rect_total, observe, order)."""
    f32 = np.float32
    C, K = values.shape
    order = np.argsort(np.where(valid, depths, np.inf), kind="stable")
    px, py = np.meshgrid(np.arange(W, dtype=f32), np.arange(H, dtype=f32))
    tx = (np.arange(W, dtype=np.int32) // tile)[None, :]
    ty = (np.arange(H, dtype=np.int32) // tile)[:, None]

    T = np.ones((H, W), f32)
    done = np.zeros((H, W), bool)
    acc = np.zeros((K, H, W), np.float64)
    pos = np.zeros((H, W), np.int32)            # 1-based index in tile list
    n_contrib = np.zeros((H, W), np.int32)      # forward.cu:358 last_contributor
    observe = np.zeros((C,), np.int64)

    for g in order:
        if not valid[g]:
            continue
        in_rect = ((tx >= rect_min[g, 0]) & (tx < rect_max[g, 0])
                   & (ty >= rect_min[g, 1]) & (ty < rect_max[g, 1]))
        pos += in_rect
        dx = f32(means2d[g, 0]) - px
        dy = f32(means2d[g, 1]) - py
        a, b, c = (f32(conics[g, 0]), f32(conics[g, 1]), f32(conics[g, 2]))
        power = (-f32(0.5) * (a * dx * dx + c * dy * dy) - b * dx * dy).astype(f32)
        alpha = np.minimum(f32(0.99), f32(opac[g]) * np.exp(power)).astype(f32)
        can = in_rect & ~done & (power <= 0.0) & (alpha >= f32(1.0 / 255.0))
        test_T = (T * (1 - alpha)).astype(f32)
        term = can & (test_T < f32(1e-4))       # forward.cu:345: done, not added
        contrib = can & ~term
        w = np.where(contrib, alpha * T, f32(0.0))
        acc += w[None].astype(np.float64) * values[g][:, None, None].astype(np.float64)
        observe[g] = int((contrib & (T > 0.5)).sum())    # forward.cu:352-354
        n_contrib = np.where(contrib, pos, n_contrib)
        T = np.where(contrib, test_T, T)
        done |= term
    return acc, T, n_contrib, pos, observe, order


def _ref_blend_backward(means2d, depths, conics, opac, values, rect_min,
                        rect_max, valid, H, W, tile, g_img, gT):
    """backward.cu:412-598 in numpy, walking the list back-to-front.

    gT is the cotangent on final_T; it plays exactly the role of
    bg_color . dL_dpixel in backward.cu:569-572 (this repo composites the
    background OUTSIDE the blend, rasterize.py, so the bg term surfaces as
    the final_T cotangent)."""
    f32 = np.float32
    C, K = values.shape
    fwd_acc, final_T, n_contrib, pos_total, _, order = _ref_blend_forward(
        means2d, depths, conics, opac, values, rect_min, rect_max, valid,
        H, W, tile)
    px, py = np.meshgrid(np.arange(W, dtype=f32), np.arange(H, dtype=f32))
    tx = (np.arange(W, dtype=np.int32) // tile)[None, :]
    ty = (np.arange(H, dtype=np.int32) // tile)[:, None]

    T = final_T.copy()                           # backward.cu:463-464
    accum = np.zeros((K, H, W), f32)             # accum_rec/accum_buf:471-472
    last_alpha = np.zeros((H, W), f32)
    last_val = np.zeros((K, H, W), f32)          # last_color/last_features
    cnt = pos_total.copy()                       # contributor countdown:468

    d_values = np.zeros((C, K), np.float64)
    d_m2d = np.zeros((C, 2), np.float64)
    d_abs = np.zeros((C, 2), np.float64)
    d_con = np.zeros((C, 3), np.float64)
    d_op = np.zeros((C,), np.float64)
    g_img = g_img.astype(f32)
    gT = gT.astype(f32)

    for g in order[::-1]:
        if not valid[g]:
            continue
        in_rect = ((tx >= rect_min[g, 0]) & (tx < rect_max[g, 0])
                   & (ty >= rect_min[g, 1]) & (ty < rect_max[g, 1]))
        cnt -= in_rect                           # 0-based index of g in list
        dx = f32(means2d[g, 0]) - px
        dy = f32(means2d[g, 1]) - py
        a, b, c = (f32(conics[g, 0]), f32(conics[g, 1]), f32(conics[g, 2]))
        power = (-f32(0.5) * (a * dx * dx + c * dy * dy) - b * dx * dy).astype(f32)
        G = np.exp(power).astype(f32)
        alpha = np.minimum(f32(0.99), f32(opac[g]) * G).astype(f32)
        # backward.cu:516-517 (contributor >= last_contributor -> skip) +
        # 524-530 (power/alpha re-skips).
        act = (in_rect & (cnt < n_contrib) & (power <= 0.0)
               & (alpha >= f32(1.0 / 255.0)))

        T = np.where(act, T / (1 - alpha), T)    # backward.cu:532
        dchannel = (alpha * T).astype(f32)       # backward.cu:533

        # Channel recurrence (backward.cu:540-561): accum/last updated with
        # the PREVIOUS last_alpha before dL_dalpha uses the new accum.
        accum_new = last_alpha[None] * last_val + (1 - last_alpha[None]) * accum
        accum = np.where(act[None], accum_new, accum)
        last_val = np.where(act[None], values[g][:, None, None].astype(f32),
                            last_val)
        dL_dalpha = ((values[g][:, None, None].astype(f32) - accum)
                     * g_img).sum(0).astype(f32)
        d_values[g] = np.where(act[None], dchannel[None] * g_img,
                               0.0).sum((1, 2))
        dL_dalpha = (dL_dalpha * T).astype(f32)  # backward.cu:563
        last_alpha = np.where(act, alpha, last_alpha)

        # Background / final_T term (backward.cu:569-572).
        dL_dalpha = dL_dalpha + (-final_T / (1 - alpha)) * gT
        dL_dalpha = np.where(act, dL_dalpha, f32(0.0))

        dL_dG = f32(opac[g]) * dL_dalpha         # backward.cu:575
        gdx, gdy = G * dx, G * dy
        dG_ddelx = -gdx * a - gdy * b            # backward.cu:578-579
        dG_ddely = -gdy * c - gdx * b
        # Pixel-space means2D grads (the reference's ddelx_dx = 0.5*W NDC
        # factor, backward.cu:490-491/582-587, is applied by our projection
        # chain instead).
        mx = (dL_dG * dG_ddelx).astype(np.float64)
        my = (dL_dG * dG_ddely).astype(np.float64)
        d_m2d[g] = [mx.sum(), my.sum()]
        d_abs[g] = [np.abs(mx).sum(), np.abs(my).sum()]
        # Reference conic convention: off-diagonal stored at HALF the true
        # derivative (backward.cu:590-592).
        d_con[g] = [(-0.5 * gdx * dx * dL_dG).sum(),
                    (-0.5 * gdx * dy * dL_dG).sum(),
                    (-0.5 * gdy * dy * dL_dG).sum()]
        d_op[g] = (G * dL_dalpha).sum()          # backward.cu:595
    return d_values, d_m2d, d_abs, d_con, d_op


def _setup(seed=7, n=80, capacity=128, w=64, h=48):
    rng = np.random.default_rng(seed)
    cam = make_camera(width=w, height=h)
    g = make_scene(rng, n=n, capacity=capacity, random_pose=True)
    proj = project(g, cam, g.max_sh_degree)
    # Keep alpha <= 0.9 so the 0.99-clamp convention difference (see module
    # docstring) never triggers.
    opa = jnp.minimum(g.get_opacity[:, 0] * 8.0, 0.9)
    feats = build_features(g, cam)
    values = pack_values(proj.colors, feats, 10)
    binning = bin_gaussians(proj, h, w, 16, instance_cap=2 ** 13, chunk=CHUNK)
    assert int(binning.dropped) == 0
    return cam, g, proj, opa, values, binning, (h, w)


def _np(x):
    return np.asarray(x)


def test_blend_forward_matches_reference_oracle():
    cam, g, proj, opa, values, binning, (h, w) = _setup()
    img_ref, fT_ref, _, _, obs_ref, _ = _ref_blend_forward(
        _np(proj.means2d), _np(proj.depths), _np(proj.conics), _np(opa),
        _np(values), _np(proj.rect_min), _np(proj.rect_max), _np(proj.valid),
        h, w, 16)
    out = blend_tiles_pallas(values, proj.means2d, proj.conics, opa, binning,
                             h, w, 16, CHUNK, interpret=True)
    np.testing.assert_allclose(_np(out.image)[:, :h, :w], img_ref,
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(_np(out.final_T)[:h, :w], fT_ref,
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(_np(out.observe), obs_ref)


def _backend_vjp(blend_fn, values, proj, opa, binning, h, w, g_img, gT,
                 with_abs):
    """d(blend)/d(values, means2d, conics, opacities[, abs_sink]) under the
    cotangents (g_img on the cropped 16-channel image, gT on final_T)."""
    def f(v, m, c, o, s):
        kw = dict(m2d_abs_sink=s) if with_abs else {}
        out = blend_fn(v, m, c, o, binning, h, w, 16, CHUNK, **kw)
        return out.image[:, :h, :w], out.final_T[:h, :w]

    sink = jnp.zeros((values.shape[0], 2))
    _, vjp = jax.vjp(f, values, proj.means2d, proj.conics, opa, sink)
    return vjp((jnp.asarray(g_img, jnp.float32), jnp.asarray(gT, jnp.float32)))


def _assert_close(name, mine, oracle, rtol=5e-3, atol_scale=5e-5):
    mine, oracle = _np(mine), np.asarray(oracle, np.float32)
    assert np.isfinite(mine).all(), name
    scale = np.abs(oracle).max() + 1e-10
    np.testing.assert_allclose(mine, oracle, atol=atol_scale * scale,
                               rtol=rtol, err_msg=name)


def test_blend_backward_matches_reference_oracle():
    cam, g, proj, opa, values, binning, (h, w) = _setup(seed=12)
    rng = np.random.default_rng(0)
    g_img = rng.normal(size=(16, h, w)).astype(np.float32)
    gT = rng.normal(size=(h, w)).astype(np.float32)

    d_values, d_m2d, d_abs, d_con, d_op = _ref_blend_backward(
        _np(proj.means2d), _np(proj.depths), _np(proj.conics), _np(opa),
        _np(values), _np(proj.rect_min), _np(proj.rect_max), _np(proj.valid),
        h, w, 16, g_img, gT)
    # Our chain carries the TRUE off-diagonal conic derivative; the reference
    # stores half and doubles inside computeCov2D (backward.cu:219,591).
    d_con_true = d_con * np.array([1.0, 2.0, 1.0])

    import functools
    for blend_fn, with_abs in ((functools.partial(blend_tiles_pallas,
                                                  interpret=True), True),
                               (blend_tiles_xla, False)):
        got = _backend_vjp(blend_fn, values, proj, opa, binning, h, w,
                           g_img, gT, with_abs=with_abs)
        _assert_close("values", got[0], d_values)
        _assert_close("means2d", got[1], d_m2d)
        _assert_close("conics", got[2], d_con_true)
        _assert_close("opacities", got[3], d_op)
        if with_abs:
            _assert_close("abs(AbsGS)", got[4], d_abs, rtol=5e-3)


# =============================================================================
# Preprocess chain oracles (computeCov3D / computeCov2DCUDA /
# computeColorFromSH / preprocessCUDA projection)
# =============================================================================

def _ref_cov3d_backward(scale, quat, d_cov3d):
    """backward.cu:283-347 (computeCov3D): d(cov3D 6-vec) -> (d_scale,
    d_normalized_quat). Verbatim glm transcription: glm mat3 M[col][row] is
    numpy Mt = M_math.T indexed Mt[col, row]."""
    r, x, y, z = quat
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
    ])
    # glm: R above is constructed column-major, so glm's math matrix is R.T;
    # S diag; M = S * R  (math: S @ R_glm = S @ R.T).
    Rg = R.T
    S = np.diag(scale)
    M = S @ Rg
    dc = d_cov3d
    dL_dSigma = np.array([
        [dc[0], 0.5 * dc[1], 0.5 * dc[2]],
        [0.5 * dc[1], dc[3], 0.5 * dc[4]],
        [0.5 * dc[2], 0.5 * dc[4], dc[5]],
    ])
    dL_dM = 2.0 * M @ dL_dSigma                   # backward.cu:322
    # glm indexing: Rt = transpose(R_glm); Rt[i] is COLUMN i of Rt = row i of
    # R_glm. dL_dMt = transpose(dL_dM).
    Rt = Rg.T
    dL_dMt = dL_dM.T
    d_scale = np.array([Rt[:, 0] @ dL_dMt[:, 0],
                        Rt[:, 1] @ dL_dMt[:, 1],
                        Rt[:, 2] @ dL_dMt[:, 2]])  # backward.cu:329-331
    dMt = dL_dMt.copy()
    dMt[:, 0] *= scale[0]
    dMt[:, 1] *= scale[1]
    dMt[:, 2] *= scale[2]
    # glm dL_dMt[i][j] = numpy dMt[j, i] (column i, row j).
    m = lambda i, j: dMt[j, i]
    dq = np.array([
        2 * z * (m(0, 1) - m(1, 0)) + 2 * y * (m(2, 0) - m(0, 2))
        + 2 * x * (m(1, 2) - m(2, 1)),
        2 * y * (m(1, 0) + m(0, 1)) + 2 * z * (m(2, 0) + m(0, 2))
        + 2 * r * (m(1, 2) - m(2, 1)) - 4 * x * (m(2, 2) + m(1, 1)),
        2 * x * (m(1, 0) + m(0, 1)) + 2 * r * (m(2, 0) - m(0, 2))
        + 2 * z * (m(1, 2) + m(2, 1)) - 4 * y * (m(2, 2) + m(0, 0)),
        2 * r * (m(0, 1) - m(1, 0)) + 2 * x * (m(2, 0) + m(0, 2))
        + 2 * y * (m(1, 2) + m(2, 1)) - 4 * z * (m(1, 1) + m(0, 0)),
    ])
    return d_scale, dq


def test_cov3d_chain_matches_reference_oracle():
    rng = np.random.default_rng(3)
    n = 64
    scales = rng.uniform(0.05, 0.5, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    ct = rng.normal(size=(n, 6)).astype(np.float32)

    def cov3d_fn(s, q):
        R = quat_to_rotmat(q)
        L = R * s[:, None, :]
        sig = L @ jnp.swapaxes(L, -1, -2)
        return jnp.stack([sig[:, 0, 0], sig[:, 0, 1], sig[:, 0, 2],
                          sig[:, 1, 1], sig[:, 1, 2], sig[:, 2, 2]], -1)

    ds, dq = jax.vjp(cov3d_fn, jnp.asarray(scales), jnp.asarray(quats))[1](
        jnp.asarray(ct))
    for i in range(n):
        ds_ref, dq_ref = _ref_cov3d_backward(
            scales[i].astype(np.float64), quats[i].astype(np.float64),
            ct[i].astype(np.float64))
        _assert_close(f"d_scale[{i}]", ds[i], ds_ref, rtol=1e-4)
        _assert_close(f"d_quat[{i}]", dq[i], dq_ref, rtol=1e-4)

    # Also check the production elementwise path (Gaussians.get_covariance
    # uses quat_to_rotmat_elems) agrees with the same oracle.
    from gs2m_tpu.core.gaussians import quat_to_rotmat_elems

    def cov3d_elem(s, q):
        e = quat_to_rotmat_elems(q)
        s0, s1, s2 = s[:, 0] ** 2, s[:, 1] ** 2, s[:, 2] ** 2

        def sig(i, j):
            return (s0 * e[3 * i] * e[3 * j] + s1 * e[3 * i + 1] * e[3 * j + 1]
                    + s2 * e[3 * i + 2] * e[3 * j + 2])

        return jnp.stack([sig(0, 0), sig(0, 1), sig(0, 2),
                          sig(1, 1), sig(1, 2), sig(2, 2)], -1)

    ds2, dq2 = jax.vjp(cov3d_elem, jnp.asarray(scales), jnp.asarray(quats))[1](
        jnp.asarray(ct))
    _assert_close("d_scale elementwise", ds2, _np(ds), rtol=1e-4)
    _assert_close("d_quat elementwise", dq2, _np(dq), rtol=1e-4)


def _ref_cov2d_backward(mean, cov3d, view, fx, fy, tanfovx, tanfovy,
                        d_conic_ref):
    """backward.cu:153-281 (computeCov2DCUDA) with dilation = 0 (this fork's
    forward inverts the RAW covariance, forward.cu:101/205-209; the +0.3 at
    backward.cu:205-207 is an inherited inconsistency). d_conic_ref is in
    the reference's HALVED off-diagonal convention. Returns (d_mean3d,
    d_cov3d 6-vec)."""
    view = np.asarray(view, np.float64)   # row-vector convention (our Camera)
    t = mean @ view[:3, :3] + view[3, :3]
    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    txtz, tytz = t[0] / t[2], t[1] / t[2]
    tx = min(limx, max(-limx, txtz)) * t[2]
    ty = min(limy, max(-limy, tytz)) * t[2]
    x_mul = 0.0 if (txtz < -limx or txtz > limx) else 1.0
    y_mul = 0.0 if (tytz < -limy or tytz > limy) else 1.0
    tz = t[2]

    # glm J/W/T as math matrices; glm X[i][j] = math X.T[i, j] handled by
    # transcribing with X_[i, j] where X_ = X_math.T.
    Jm = np.array([[fx / tz, 0, 0], [0, fy / tz, 0],
                   [-fx * tx / tz ** 2, -fy * ty / tz ** 2, 0]])
    Wm = view[:3, :3]
    Tm = Wm @ Jm
    Vrk = np.array([
        [cov3d[0], cov3d[1], cov3d[2]],
        [cov3d[1], cov3d[3], cov3d[4]],
        [cov3d[2], cov3d[4], cov3d[5]],
    ])
    cov2d = Tm.T @ Vrk.T @ Tm
    a, b, c = cov2d[0, 0], cov2d[0, 1], cov2d[1, 1]   # dilation = 0

    denom = a * c - b * b
    dL_dconic = d_conic_ref
    denom2inv = 1.0 / (denom * denom + 1e-7)
    dL_da = denom2inv * (-c * c * dL_dconic[0] + 2 * b * c * dL_dconic[1]
                         + (denom - a * c) * dL_dconic[2])
    dL_dc = denom2inv * (-a * a * dL_dconic[2] + 2 * a * b * dL_dconic[1]
                         + (denom - a * c) * dL_dconic[0])
    dL_db = denom2inv * 2 * (b * c * dL_dconic[0]
                             - (denom + 2 * b * b) * dL_dconic[1]
                             + a * b * dL_dconic[2])

    T_ = Tm.T   # glm T[i][j] == T_[i, j]
    d_cov = np.array([
        T_[0, 0] * T_[0, 0] * dL_da + T_[0, 0] * T_[1, 0] * dL_db
        + T_[1, 0] * T_[1, 0] * dL_dc,
        2 * T_[0, 0] * T_[0, 1] * dL_da
        + (T_[0, 0] * T_[1, 1] + T_[0, 1] * T_[1, 0]) * dL_db
        + 2 * T_[1, 0] * T_[1, 1] * dL_dc,
        2 * T_[0, 0] * T_[0, 2] * dL_da
        + (T_[0, 0] * T_[1, 2] + T_[0, 2] * T_[1, 0]) * dL_db
        + 2 * T_[1, 0] * T_[1, 2] * dL_dc,
        T_[0, 1] * T_[0, 1] * dL_da + T_[0, 1] * T_[1, 1] * dL_db
        + T_[1, 1] * T_[1, 1] * dL_dc,
        2 * T_[0, 2] * T_[0, 1] * dL_da
        + (T_[0, 1] * T_[1, 2] + T_[0, 2] * T_[1, 1]) * dL_db
        + 2 * T_[1, 1] * T_[1, 2] * dL_dc,
        T_[0, 2] * T_[0, 2] * dL_da + T_[0, 2] * T_[1, 2] * dL_db
        + T_[1, 2] * T_[1, 2] * dL_dc,
    ])[[0, 1, 2, 3, 4, 5]]
    # Reorder to (xx, xy, xz, yy, yz, zz): entries above are already written
    # in the reference's dL_dcov[0,1,2,3,4,5] slot order.
    d_cov = np.array([d_cov[0], d_cov[1], d_cov[2], d_cov[3], d_cov[4],
                      d_cov[5]])

    V_ = Vrk    # symmetric
    dL_dT00 = (2 * (T_[0, 0] * V_[0, 0] + T_[0, 1] * V_[0, 1]
                    + T_[0, 2] * V_[0, 2]) * dL_da
               + (T_[1, 0] * V_[0, 0] + T_[1, 1] * V_[0, 1]
                  + T_[1, 2] * V_[0, 2]) * dL_db)
    dL_dT01 = (2 * (T_[0, 0] * V_[1, 0] + T_[0, 1] * V_[1, 1]
                    + T_[0, 2] * V_[1, 2]) * dL_da
               + (T_[1, 0] * V_[1, 0] + T_[1, 1] * V_[1, 1]
                  + T_[1, 2] * V_[1, 2]) * dL_db)
    dL_dT02 = (2 * (T_[0, 0] * V_[2, 0] + T_[0, 1] * V_[2, 1]
                    + T_[0, 2] * V_[2, 2]) * dL_da
               + (T_[1, 0] * V_[2, 0] + T_[1, 1] * V_[2, 1]
                  + T_[1, 2] * V_[2, 2]) * dL_db)
    dL_dT10 = (2 * (T_[1, 0] * V_[0, 0] + T_[1, 1] * V_[0, 1]
                    + T_[1, 2] * V_[0, 2]) * dL_dc
               + (T_[0, 0] * V_[0, 0] + T_[0, 1] * V_[0, 1]
                  + T_[0, 2] * V_[0, 2]) * dL_db)
    dL_dT11 = (2 * (T_[1, 0] * V_[1, 0] + T_[1, 1] * V_[1, 1]
                    + T_[1, 2] * V_[1, 2]) * dL_dc
               + (T_[0, 0] * V_[1, 0] + T_[0, 1] * V_[1, 1]
                  + T_[0, 2] * V_[1, 2]) * dL_db)
    dL_dT12 = (2 * (T_[1, 0] * V_[2, 0] + T_[1, 1] * V_[2, 1]
                    + T_[1, 2] * V_[2, 2]) * dL_dc
               + (T_[0, 0] * V_[2, 0] + T_[0, 1] * V_[2, 1]
                  + T_[0, 2] * V_[2, 2]) * dL_db)

    W_ = Wm.T   # glm W[i][j] == W_[i, j]
    dL_dJ00 = W_[0, 0] * dL_dT00 + W_[0, 1] * dL_dT01 + W_[0, 2] * dL_dT02
    dL_dJ02 = W_[2, 0] * dL_dT00 + W_[2, 1] * dL_dT01 + W_[2, 2] * dL_dT02
    dL_dJ11 = W_[1, 0] * dL_dT10 + W_[1, 1] * dL_dT11 + W_[1, 2] * dL_dT12
    dL_dJ12 = W_[2, 0] * dL_dT10 + W_[2, 1] * dL_dT11 + W_[2, 2] * dL_dT12

    tzi = 1.0 / tz
    tz2, tz3 = tzi * tzi, tzi * tzi * tzi
    dL_dtx = x_mul * -fx * tz2 * dL_dJ02
    dL_dty = y_mul * -fy * tz2 * dL_dJ12
    dL_dtz = (-fx * tz2 * dL_dJ00 - fy * tz2 * dL_dJ11
              + (2 * fx * tx) * tz3 * dL_dJ02 + (2 * fy * ty) * tz3 * dL_dJ12)
    # transformVec4x3Transpose (auxiliary.h): d_mean = R_w2c^T @ d_t; in our
    # row-vector convention t = mean @ view[:3,:3], so d_mean = view @ d_t.
    d_mean = view[:3, :3] @ np.array([dL_dtx, dL_dty, dL_dtz])
    return d_mean, d_cov


def test_cov2d_conic_chain_matches_reference_oracle():
    rng = np.random.default_rng(5)
    cam = make_camera(width=64, height=48)
    g = make_scene(rng, n=48, capacity=48, random_pose=True)
    proj = project(g, cam, g.max_sh_degree)
    valid = _np(proj.valid)
    cov3d = _np(g.get_covariance())
    xyz = _np(g.xyz)
    ct = rng.normal(size=(48, 3)).astype(np.float32)

    def conic_fn(x, c6):
        cov = compute_cov2d(x, c6, cam)
        det = cov[:, 0] * cov[:, 2] - cov[:, 1] ** 2
        det_inv = 1.0 / det
        return jnp.stack([cov[:, 2] * det_inv, -cov[:, 1] * det_inv,
                          cov[:, 0] * det_inv], -1)

    d_xyz, d_cov3d = jax.vjp(conic_fn, jnp.asarray(xyz),
                             jnp.asarray(cov3d))[1](jnp.asarray(ct))
    n_checked = 0
    for i in range(48):
        if not valid[i]:
            continue
        # Reference halved off-diagonal convention on the way in.
        ct_ref = ct[i].astype(np.float64) * np.array([1.0, 0.5, 1.0])
        dm_ref, dc_ref = _ref_cov2d_backward(
            xyz[i].astype(np.float64), cov3d[i].astype(np.float64),
            cam.world_view, float(cam.fx), float(cam.fy),
            float(cam.tanfovx), float(cam.tanfovy), ct_ref)
        _assert_close(f"d_cov3d[{i}]", d_cov3d[i], dc_ref, rtol=2e-3)
        _assert_close(f"d_mean_cov[{i}]", d_xyz[i], dm_ref, rtol=2e-3,
                      atol_scale=2e-4)
        n_checked += 1
    assert n_checked > 20


def _ref_sh_backward(deg, sh, pos, campos, d_rgb_in):
    """backward.cu:21-148 (computeColorFromSH). sh: (16, 3). Returns
    (d_sh (16,3), d_mean (3,))."""
    from gs2m_tpu.core.sh import C0, C1, C2, C3
    dir_orig = pos - campos
    ln = np.linalg.norm(dir_orig)
    d = dir_orig / ln
    x, y, z = d

    # Forward RGB for the clamp mask (forward.cu applies +0.5 then max(0)).
    from gs2m_tpu.core import sh as shlib
    rgb = np.asarray(shlib.eval_sh(deg, jnp.asarray(sh)[None],
                                   jnp.asarray(d)[None]))[0] + 0.5
    clamped = rgb < 0
    dL_dRGB = d_rgb_in * np.where(clamped, 0.0, 1.0)     # backward.cu:43-46

    d_sh = np.zeros((16, 3))
    dRGBdx = np.zeros(3)
    dRGBdy = np.zeros(3)
    dRGBdz = np.zeros(3)
    d_sh[0] = C0 * dL_dRGB
    if deg > 0:
        d_sh[1] = -C1 * y * dL_dRGB
        d_sh[2] = C1 * z * dL_dRGB
        d_sh[3] = -C1 * x * dL_dRGB
        dRGBdx = -C1 * sh[3]
        dRGBdy = -C1 * sh[1]
        dRGBdz = C1 * sh[2]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            d_sh[4] = C2[0] * xy * dL_dRGB
            d_sh[5] = C2[1] * yz * dL_dRGB
            d_sh[6] = C2[2] * (2 * zz - xx - yy) * dL_dRGB
            d_sh[7] = C2[3] * xz * dL_dRGB
            d_sh[8] = C2[4] * (xx - yy) * dL_dRGB
            dRGBdx = dRGBdx + (C2[0] * y * sh[4] + C2[2] * 2 * -x * sh[6]
                               + C2[3] * z * sh[7] + C2[4] * 2 * x * sh[8])
            dRGBdy = dRGBdy + (C2[0] * x * sh[4] + C2[1] * z * sh[5]
                               + C2[2] * 2 * -y * sh[6] + C2[4] * 2 * -y * sh[8])
            dRGBdz = dRGBdz + (C2[1] * y * sh[5] + C2[2] * 4 * z * sh[6]
                               + C2[3] * x * sh[7])
            if deg > 2:
                d_sh[9] = C3[0] * y * (3 * xx - yy) * dL_dRGB
                d_sh[10] = C3[1] * xy * z * dL_dRGB
                d_sh[11] = C3[2] * y * (4 * zz - xx - yy) * dL_dRGB
                d_sh[12] = C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * dL_dRGB
                d_sh[13] = C3[4] * x * (4 * zz - xx - yy) * dL_dRGB
                d_sh[14] = C3[5] * z * (xx - yy) * dL_dRGB
                d_sh[15] = C3[6] * x * (xx - 3 * yy) * dL_dRGB
                dRGBdx = dRGBdx + (
                    C3[0] * sh[9] * 3 * 2 * xy + C3[1] * sh[10] * yz
                    + C3[2] * sh[11] * -2 * xy + C3[3] * sh[12] * -3 * 2 * xz
                    + C3[4] * sh[13] * (-3 * xx + 4 * zz - yy)
                    + C3[5] * sh[14] * 2 * xz + C3[6] * sh[15] * 3 * (xx - yy))
                dRGBdy = dRGBdy + (
                    C3[0] * sh[9] * 3 * (xx - yy) + C3[1] * sh[10] * xz
                    + C3[2] * sh[11] * (-3 * yy + 4 * zz - xx)
                    + C3[3] * sh[12] * -3 * 2 * yz + C3[4] * sh[13] * -2 * xy
                    + C3[5] * sh[14] * -2 * yz + C3[6] * sh[15] * -3 * 2 * xy)
                dRGBdz = dRGBdz + (
                    C3[1] * sh[10] * xy + C3[2] * sh[11] * 4 * 2 * yz
                    + C3[3] * sh[12] * 3 * (2 * zz - xx - yy)
                    + C3[4] * sh[13] * 4 * 2 * xz + C3[5] * sh[14] * (xx - yy))

    dL_ddir = np.array([dRGBdx @ dL_dRGB, dRGBdy @ dL_dRGB, dRGBdz @ dL_dRGB])
    # dnormvdv (auxiliary.h): d/dv of v/|v| applied to dL_ddir.
    v = dir_orig
    sum2 = v @ v
    invsum32 = 1.0 / (sum2 * np.sqrt(sum2))
    d_mean = (dL_ddir * sum2 - v * (v @ dL_ddir)) * invsum32
    return d_sh, d_mean


def test_sh_chain_matches_reference_oracle():
    from gs2m_tpu.core import sh as shlib
    rng = np.random.default_rng(11)
    n = 32
    deg = 3
    sh = rng.normal(scale=0.4, size=(n, 16, 3)).astype(np.float32)
    sh[:, 0] += 0.8
    pos = rng.normal(scale=2.0, size=(n, 3)).astype(np.float32)
    campos = np.array([0.0, 0.0, 4.0], np.float32)
    ct = rng.normal(size=(n, 3)).astype(np.float32)

    def rgb_fn(s, p):
        dirs = p - campos[None]
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        return shlib.sh_to_rgb(deg, s, dirs)

    d_sh, d_pos = jax.vjp(rgb_fn, jnp.asarray(sh), jnp.asarray(pos))[1](
        jnp.asarray(ct))
    for i in range(n):
        ds_ref, dm_ref = _ref_sh_backward(deg, sh[i].astype(np.float64),
                                          pos[i].astype(np.float64),
                                          campos.astype(np.float64),
                                          ct[i].astype(np.float64))
        _assert_close(f"d_sh[{i}]", d_sh[i], ds_ref, rtol=1e-4)
        _assert_close(f"d_mean_sh[{i}]", d_pos[i], dm_ref, rtol=1e-4)


def test_mean2d_projection_chain_matches_reference_oracle():
    """backward.cu:375-392: pixel-space means2D cotangent -> d_mean3D through
    the full-projection chain (with the reference's 1e-7 w-epsilon and the
    ddelx_dx = 0.5*W NDC factor)."""
    rng = np.random.default_rng(13)
    cam = make_camera(width=64, height=48)
    g = make_scene(rng, n=32, capacity=32, random_pose=True)
    xyz = _np(g.xyz)
    ct_pix = rng.normal(size=(32, 2)).astype(np.float32)
    W, H = cam.width, cam.height

    def m2d_fn(x):
        p_hom = jnp.concatenate([x, jnp.ones_like(x[:, :1])], -1) @ cam.full_proj
        p_w = 1.0 / (p_hom[:, 3] + 1e-7)
        px = ((p_hom[:, 0] * p_w + 1.0) * W - 1.0) * 0.5
        py = ((p_hom[:, 1] * p_w + 1.0) * H - 1.0) * 0.5
        return jnp.stack([px, py], -1)

    (d_xyz,) = jax.vjp(m2d_fn, jnp.asarray(xyz))[1](jnp.asarray(ct_pix))

    proj = np.asarray(cam.full_proj, np.float64)  # row-vector convention
    for i in range(32):
        m = xyz[i].astype(np.float64)
        hom = np.append(m, 1.0) @ proj
        m_w = 1.0 / (hom[3] + 1e-7)
        # NDC cotangent (backward.cu:490-491 ddelx_dx factor).
        dndc = ct_pix[i].astype(np.float64) * np.array([0.5 * W, 0.5 * H])
        # p[col-major flat] of math P == full_proj row-major flat (P = F^T).
        p = proj.flatten()
        mul1 = (p[0] * m[0] + p[4] * m[1] + p[8] * m[2] + p[12]) * m_w * m_w
        mul2 = (p[1] * m[0] + p[5] * m[1] + p[9] * m[2] + p[13]) * m_w * m_w
        dm_ref = np.array([
            (p[0] * m_w - p[3] * mul1) * dndc[0]
            + (p[1] * m_w - p[3] * mul2) * dndc[1],
            (p[4] * m_w - p[7] * mul1) * dndc[0]
            + (p[5] * m_w - p[7] * mul2) * dndc[1],
            (p[8] * m_w - p[11] * mul1) * dndc[0]
            + (p[9] * m_w - p[11] * mul2) * dndc[1],
        ])
        _assert_close(f"d_mean2d_chain[{i}]", d_xyz[i], dm_ref, rtol=1e-4)
