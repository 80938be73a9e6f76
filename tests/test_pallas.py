"""Pallas blend kernels vs the XLA twin: forward, gradients, AbsGS channel.

Runs in Pallas interpret mode on CPU (SURVEY.md §4 golden-twin strategy).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2m_tpu.ops.binning import bin_gaussians
from gs2m_tpu.ops.blend_pallas import blend_tiles_pallas
from gs2m_tpu.ops.blend_xla import blend_tiles_xla
from gs2m_tpu.ops.projection import project
from gs2m_tpu.ops.rasterize import build_features, pack_values

from tests.test_golden import make_camera, make_scene

CHUNK = 256  # pallas chunk = P for dense MXU blocks


def setup(seed=7, n=80, capacity=128, w=64, h=48, boost=8.0):
    rng = np.random.default_rng(seed)
    cam = make_camera(width=w, height=h)
    g = make_scene(rng, n=n, capacity=capacity, random_pose=True)
    proj = project(g, cam, g.max_sh_degree)
    opa = jnp.minimum(g.get_opacity[:, 0] * boost, 0.995)
    feats = build_features(g, cam)
    values = pack_values(proj.colors, feats, 10)
    binning = bin_gaussians(proj, h, w, 16, instance_cap=2 ** 13, chunk=CHUNK)
    assert int(binning.dropped) == 0
    return cam, g, proj, opa, values, binning, (h, w)


def test_pallas_forward_matches_xla():
    cam, g, proj, opa, values, binning, (h, w) = setup()
    out_x = blend_tiles_xla(values, proj.means2d, proj.conics, opa, binning,
                            h, w, 16, CHUNK)
    out_p = blend_tiles_pallas(values, proj.means2d, proj.conics, opa, binning,
                               h, w, 16, CHUNK, interpret=True)
    np.testing.assert_allclose(np.asarray(out_p.image), np.asarray(out_x.image),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.final_T),
                               np.asarray(out_x.final_T), atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_p.observe),
                                  np.asarray(out_x.observe))


def test_pallas_forward_heavy_occlusion():
    # Stacked opaque gaussians: early termination path.
    from gs2m_tpu.core.gaussians import Gaussians
    n = 32
    rng = np.random.default_rng(10)
    pts = np.tile(np.array([[0.0, 0.0, 0.0]], np.float32), (n, 1))
    pts[:, 2] = np.linspace(-0.5, 0.5, n)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    g = Gaussians.create(pts, cols, 0, capacity=n, mean_sq_dist=np.full(n, 0.05))
    cam = make_camera(width=32, height=32)
    proj = project(g, cam, 0)
    opa = jnp.minimum(g.get_opacity[:, 0] * 9.9, 0.995)
    feats = build_features(g, cam)
    values = pack_values(proj.colors, feats, 10)
    binning = bin_gaussians(proj, 32, 32, 16, instance_cap=2 ** 12, chunk=CHUNK)
    out_x = blend_tiles_xla(values, proj.means2d, proj.conics, opa, binning,
                            32, 32, 16, CHUNK)
    out_p = blend_tiles_pallas(values, proj.means2d, proj.conics, opa, binning,
                               32, 32, 16, CHUNK, interpret=True)
    np.testing.assert_allclose(np.asarray(out_p.image), np.asarray(out_x.image),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_p.observe),
                                  np.asarray(out_x.observe))
    assert float(out_p.final_T[16, 16]) < 1e-3


def _grads(backend_fn, values, proj, opa, binning, h, w, target):
    def loss(values, m2d, con, op, abs_sink):
        if abs_sink is None:
            out = backend_fn(values, m2d, con, op, binning, h, w, 16, CHUNK)
        else:
            out = backend_fn(values, m2d, con, op, binning, h, w, 16, CHUNK,
                             m2d_abs_sink=abs_sink)
        img = out.image[:, :h, :w]
        return (jnp.mean(jnp.abs(img[:3] - target))
                + 0.05 * jnp.mean(img[3:13] ** 2)
                + 0.1 * jnp.mean(out.final_T[:h, :w]))

    if backend_fn is blend_tiles_xla:
        f = lambda v, m, c, o: loss(v, m, c, o, None)
        return jax.grad(f, argnums=(0, 1, 2, 3))(values, proj.means2d,
                                                 proj.conics, opa), None
    abs_sink = jnp.zeros((values.shape[0], 2))
    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(values, proj.means2d,
                                                proj.conics, opa, abs_sink)
    return g[:4], g[4]


def test_pallas_grads_match_xla_autodiff():
    cam, g, proj, opa, values, binning, (h, w) = setup(seed=12)
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))

    import functools
    pallas_fn = functools.partial(blend_tiles_pallas, interpret=True)
    gx, _ = _grads(blend_tiles_xla, values, proj, opa, binning, h, w, target)
    gp, abs_grad = _grads(pallas_fn, values, proj, opa, binning, h, w, target)

    names = ["values", "means2d", "conics", "opacities"]
    for name, a, b in zip(names, gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), name
        scale = np.abs(b).max() + 1e-10
        np.testing.assert_allclose(a, b, atol=5e-5 * scale, rtol=5e-3,
                                   err_msg=name)

    # AbsGS channel: >= |signed| componentwise, > 0 where signed is nonzero.
    abs_grad = np.asarray(abs_grad)
    signed = np.asarray(gp[1])
    assert (abs_grad >= np.abs(signed) - 1e-6).all()
    assert abs_grad.sum() > np.abs(signed).sum()  # cancellation happened


def test_pallas_empty_tiles_clean():
    # A tiny cluster leaves most tiles empty: their pixels must be bg (T=1).
    cam, g, proj, opa, values, binning, (h, w) = setup(n=4, capacity=8,
                                                       w=64, h=64)
    out_p = blend_tiles_pallas(values, proj.means2d, proj.conics, opa, binning,
                               h, w, 16, CHUNK, interpret=True)
    out_x = blend_tiles_xla(values, proj.means2d, proj.conics, opa, binning,
                            h, w, 16, CHUNK)
    np.testing.assert_allclose(np.asarray(out_p.final_T),
                               np.asarray(out_x.final_T), atol=1e-6)
    assert np.isfinite(np.asarray(out_p.image)).all()


def test_pallas_overflow_drops_finite_and_match_xla():
    """Instance-cap overflow must stay finite and keep backend parity.

    Regression: overflow can cut ALL of a tile's chunks, leaving that tile's
    kernel output block uninitialized (NaN in interpret mode, garbage on
    hardware); _untile must `where` it out, not multiply by the mask
    (NaN * 0 == NaN). Mirrors the reference's behavior of simply truncating
    the instance list when buffers are fixed (rasterizer_impl.cu:263-296
    allocates exactly; our static-shape analog drops + reports)."""
    rng = np.random.default_rng(21)
    cam = make_camera(width=128, height=128)
    g = make_scene(rng, n=400, capacity=512, random_pose=True)
    proj = project(g, cam, g.max_sh_degree)
    opa = jnp.minimum(g.get_opacity[:, 0] * 8.0, 0.995)
    feats = build_features(g, cam)
    values = pack_values(proj.colors, feats, 10)
    # Deliberately too small: forces both expansion and alignment drops.
    binning = bin_gaussians(proj, 128, 128, 16, instance_cap=2 ** 12,
                            chunk=CHUNK)
    assert int(binning.dropped) > 0
    out_p = blend_tiles_pallas(values, proj.means2d, proj.conics, opa, binning,
                               128, 128, 16, CHUNK, interpret=True)
    out_x = blend_tiles_xla(values, proj.means2d, proj.conics, opa, binning,
                            128, 128, 16, CHUNK)
    assert np.isfinite(np.asarray(out_p.image)).all()
    assert np.isfinite(np.asarray(out_p.final_T)).all()
    np.testing.assert_allclose(np.asarray(out_p.image), np.asarray(out_x.image),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.final_T),
                               np.asarray(out_x.final_T), atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_p.observe),
                                  np.asarray(out_x.observe))


def test_pallas_grads_with_cull_match_xla():
    """Ellipse-tile instance culling (binning with opacities) must keep
    pallas grads matching the XLA autodiff twin — exercises the fast
    segment-rank path where culled expansion ids are absent from the
    aligned layout."""
    cam, g, proj, opa, values, binning, (h, w) = setup(seed=31)
    culled = bin_gaussians(proj, h, w, 16, instance_cap=2 ** 13, chunk=CHUNK,
                           opacities=opa)
    assert int(culled.num_aligned) <= int(binning.num_aligned)
    target = jnp.zeros((16, h, w))

    def loss(blend_fn, b, v, m, c, o):
        out = blend_fn(v, m, c, o, b, h, w, 16, CHUNK)
        return jnp.sum((out.image[:, :h, :w] - target) ** 2) + jnp.sum(
            out.final_T[:h, :w])

    import functools
    gp = jax.grad(functools.partial(loss, functools.partial(
        blend_tiles_pallas, interpret=True), culled), argnums=(0, 1, 2, 3))(
        values, proj.means2d, proj.conics, opa)
    gx = jax.grad(functools.partial(loss, blend_tiles_xla, binning),
                  argnums=(0, 1, 2, 3))(values, proj.means2d, proj.conics, opa)
    for a, b, name in zip(gp, gx, ("values", "means2d", "conics", "opac")):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), name
        scale = np.abs(b).max() + 1e-10
        np.testing.assert_allclose(a, b, atol=1e-5 * scale, rtol=1e-4,
                                   err_msg=name)


def test_degenerate_conic_keeps_grads_finite():
    """Razor-thin splats round det(cov2d) negative -> indefinite conic ->
    power > 0 at some pixels. The gated lanes must NOT leak inf into the
    backward (inf * 0 = NaN killed opacity grads in a real training run);
    projection also culls det <= 0 outright."""
    from gs2m_tpu.core.gaussians import Gaussians
    from gs2m_tpu.models.render import render

    rng = np.random.default_rng(41)
    n, cap = 60, 64
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    g = Gaussians.create(pts, cols, max_sh_degree=1, capacity=cap)
    import dataclasses
    # Degenerate: one axis at exp(-24) (the plane loss drives this),
    # mimicking the failure scene.
    sc = np.array(g.scaling)
    sc[:, 2] = -24.0
    sc[: n // 2, 1] = -24.0  # some doubly-degenerate
    g = dataclasses.replace(g, scaling=jnp.asarray(sc))

    from tests.test_golden import make_camera
    cam = make_camera(width=64, height=48)
    target = jnp.zeros((3, 48, 64))

    for backend in ("pallas", "xla"):
        def loss(params):
            pkg = render(g.with_params(params), cam, jnp.zeros(3), 1,
                         geometry_stage=True, backend=backend, chunk=CHUNK,
                         instance_cap=2 ** 13)
            return (jnp.mean(jnp.abs(pkg["render"] - target))
                    + jnp.mean(jnp.abs(pkg["normal_map"])))

        grads = jax.grad(loss)(g.params_dict())
        for k, v in grads.items():
            assert np.isfinite(np.asarray(v)).all(), f"{backend}/{k}"


@pytest.mark.slow
def test_pair_render_matches_two_singles():
    """The fused pair render (models/render.render_pair — shared instance
    gather + shared backward reduction) must reproduce two independent
    pallas renders exactly: forward maps, observe counts, AND gradients
    including both sink channels."""
    import dataclasses

    from gs2m_tpu.models.render import render, render_pair

    from gs2m_tpu.core.camera import Camera

    rng = np.random.default_rng(11)
    g = make_scene(rng, n=300, capacity=512, sh_degree=2, random_pose=True)
    cam_a = make_camera(96, 80)
    th = 0.4
    R = np.array([[np.cos(th), 0, np.sin(th)],
                  [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]], np.float32)
    cam_b = Camera.create(R, np.array([0.3, 0.1, 4.0]), fovx=0.9, fovy=0.9,
                          width=96, height=80)

    kw = dict(tile=16, chunk=64, instance_cap=2 ** 14)

    def single(params, sink, abs_sink):
        g2 = g.with_params(params)
        pkg = render(g2, cam_a, jnp.zeros(3), 2, geometry_stage=True,
                     sobel_normal=True, m2d_sink=sink, m2d_abs_sink=abs_sink,
                     backend="pallas", **kw)
        npkg = render(g2, cam_b, jnp.zeros(3), 2, geometry_stage=True,
                      backend="pallas", **kw)
        return pkg, npkg

    def paired(params, sink, abs_sink):
        g2 = g.with_params(params)
        return render_pair(g2, cam_a, cam_b, jnp.zeros(3), 2,
                           geometry_stage=True, sobel_normal=True,
                           m2d_sink=sink, m2d_abs_sink=abs_sink, **kw)

    def loss_of(fn):
        def f(params, sink, abs_sink):
            pkg, npkg = fn(params, sink, abs_sink)
            loss = (jnp.sum(pkg["render"] ** 2)
                    + jnp.sum(pkg["depth_map"] ** 2)
                    + 0.3 * jnp.sum(npkg["normal_map"] ** 2)
                    + 0.7 * jnp.sum(npkg["depth_map"]))
            return loss, (pkg, npkg)
        return f

    sink = jnp.zeros((g.capacity, 2))
    abs_sink = jnp.zeros((g.capacity, 2))
    params = g.params_dict()
    (l_s, (pkg_s, npkg_s)), gr_s = jax.value_and_grad(
        loss_of(single), argnums=(0, 1, 2), has_aux=True)(params, sink, abs_sink)
    (l_p, (pkg_p, npkg_p)), gr_p = jax.value_and_grad(
        loss_of(paired), argnums=(0, 1, 2), has_aux=True)(params, sink, abs_sink)

    np.testing.assert_allclose(float(l_s), float(l_p), rtol=1e-6)
    for a, b, tag in ((pkg_s, pkg_p, "main"), (npkg_s, npkg_p, "nbr")):
        for key in ("render", "depth_map", "normal_map", "alpha_map",
                    "final_T"):
            np.testing.assert_allclose(np.asarray(a[key]), np.asarray(b[key]),
                                       atol=1e-6, err_msg=f"{tag}/{key}")
        np.testing.assert_array_equal(np.asarray(a["observe"]),
                                      np.asarray(b["observe"]), f"{tag}/observe")
    # Gradients agree up to prefix reassociation: the pair reduction's
    # global block prefix spans BOTH views, so per-Gaussian grads are
    # differences of larger f32 prefixes than in the single path — ~1e-3
    # of the leaf scale on this workload (forward maps match at 1e-6; a
    # structural bug would show O(1) relative errors on large elements).
    for i, name in ((0, "params"), (1, "sink"), (2, "abs_sink")):
        sa, pa = gr_s[i], gr_p[i]
        for la, lb in zip(jax.tree.leaves(sa), jax.tree.leaves(pa)):
            scale = np.abs(np.asarray(la)).max() + 1e-8
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=5e-3 * scale + 1e-9,
                                       err_msg=name)


def test_observe_only_matches_full_blend():
    """The geometry-only observe pass (blend_pallas.observe_tiles_pallas /
    render.count_observed) must count bit-identically to the full forward —
    it is the multi-view trim's input (train.py:236-245)."""
    from gs2m_tpu.models.render import count_observed, render
    from gs2m_tpu.ops.blend_pallas import observe_tiles_pallas

    cam, g, proj, opa, values, binning, (h, w) = setup(seed=11, n=96)
    out_p = blend_tiles_pallas(values, proj.means2d, proj.conics, opa, binning,
                               h, w, 16, CHUNK, interpret=True)
    obs = observe_tiles_pallas(proj.means2d, proj.conics, opa, binning,
                               h, w, 16, CHUNK, interpret=True)
    np.testing.assert_array_equal(np.asarray(obs), np.asarray(out_p.observe))
    assert int(jnp.sum(obs)) > 0  # scene actually observes something

    # End-to-end: count_observed (color-free projection + opacity-aware
    # rects) vs the full render's observe, both backends, real opacities.
    for backend in ("pallas", "xla"):
        pkg = render(g, cam, jnp.zeros(3), g.max_sh_degree, backend=backend,
                     chunk=CHUNK, instance_cap=2 ** 13)
        counts, dropped = count_observed(g, cam, backend=backend, chunk=CHUNK,
                                         instance_cap=2 ** 13)
        assert int(dropped) == 0
        np.testing.assert_array_equal(np.asarray(counts),
                                      np.asarray(pkg["observe"]), backend)


def test_segmented_reduce_conditioned_at_scale():
    """The reduce must stay accurate when the GLOBAL sum dwarfs per-segment
    sums (same-sign channels at millions of instances). The original
    two-level prefix-difference rounded every segment at ULP(global total):
    measured 1-30% relative error on color grads at bench scale on-chip
    (r4, BENCH_AUX grad gate breach). This distills that failure onto CPU:
    1M same-sign instances in 256k segments -> old scheme ~1e-2 rel error,
    levelwise three-level scheme ~1e-6."""
    from gs2m_tpu.ops.blend_pallas import _segmented_reduce

    rng = np.random.default_rng(3)
    chunk = 128
    I = 2 ** 20
    seg = 4
    C = I // seg
    key = jnp.asarray(np.repeat(np.arange(C, dtype=np.int32), seg))
    vals = rng.uniform(0.5, 1.5, I).astype(np.float32)      # same-sign
    alt = (vals * np.where(np.arange(I) % 2 == 0, 1, -1)).astype(np.float32)
    dvals = jnp.asarray(vals)[None, :]
    dgeom = jnp.stack([jnp.asarray(alt)] * 8, 0)
    pres = jnp.full((C,), seg, jnp.int32)
    out = np.asarray(_segmented_reduce(dvals, dgeom, key, pres,
                                       jnp.int32(0), chunk))
    exact = vals.astype(np.float64).reshape(C, seg).sum(1)
    rel = np.abs(out[0] - exact) / np.abs(exact)
    # Gate each level of the decomposition separately (r4 ADVICE): a segment
    # is classified by the block/superblock of its two PREFIX ranks
    # (lo = start-1, hi = end-1). Expected conditioning, at ~3x margin over
    # the measured max for this workload (values ~1, seg=4):
    #   inside one block:   P0 only, ULP(block prefix ~ 128)      -> ~5e-6
    #   crossing blocks:    + loc1e, ULP(superblock prefix ~ 16k) -> ~6e-4
    #   crossing superblks: + centered loc2e (random-walk prefix) -> ~2e-4
    # A regression in any single level (e.g. breaking only the mean-centered
    # top level, which just ~63 of 256k segments exercise here) now trips
    # its own assertion instead of hiding under a global 1e-3.
    starts = np.arange(C) * seg
    lo, hi = np.clip(starts - 1, 0, None), starts + seg - 1
    cross_blk = (lo // chunk) != (hi // chunk)
    SB = chunk * 128
    cross_sb = (lo // SB) != (hi // SB)
    assert rel[~cross_blk].max() < 2e-5, \
        f"inside-block rows ill-conditioned: {rel[~cross_blk].max()}"
    assert rel[cross_blk & ~cross_sb].max() < 2e-3, \
        f"cross-block rows ill-conditioned: {rel[cross_blk & ~cross_sb].max()}"
    assert cross_sb.sum() > 0 and rel[cross_sb].max() < 1e-3, \
        f"cross-superblock rows ill-conditioned: {rel[cross_sb].max()}"
    assert rel.max() < 2e-3, f"same-sign reduce ill-conditioned: {rel.max()}"
    exact_alt = alt.astype(np.float64).reshape(C, seg).sum(1)
    scale = np.abs(exact_alt).max()
    assert np.abs(out[1] - exact_alt).max() / scale < 1e-3


def test_pair_backward_compaction_exact():
    """bwd_cap compaction must not change gradients when the cap covers the
    live (non-terminated) chunks: dropped chunks have identically-zero
    grads, so the compacted backward differs only by reduce reassociation.
    Heavy-occlusion scene so termination actually kills chunks."""
    import dataclasses

    from gs2m_tpu.core.gaussians import Gaussians
    from gs2m_tpu.ops.blend_pallas import (_compact_alive,
                                           blend_tiles_pallas_pair)
    from gs2m_tpu.ops.binning import num_tiles

    n, chunk = 192, 64
    rng = np.random.default_rng(13)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.12
    pts[:, 2] = np.linspace(-0.6, 0.6, n)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    g = Gaussians.create(pts, cols, 0, capacity=n,
                         mean_sq_dist=np.full(n, 0.08))
    h = w = 32
    cam = make_camera(width=w, height=h)
    proj = project(g, cam, 0)
    opa = jnp.minimum(g.get_opacity[:, 0] * 9.9, 0.995)
    feats = build_features(g, cam)
    values = pack_values(proj.colors, feats, 5)
    binning = bin_gaussians(proj, h, w, 16, instance_cap=2 ** 12, chunk=chunk,
                            opacities=opa)
    assert int(binning.dropped) == 0

    def loss(values2, m2, c2, o2, bwd_cap):
        a, b, live = blend_tiles_pallas_pair(
            values2, m2, c2, o2, binning, binning, h, w, 16, chunk,
            interpret=True, bwd_cap=bwd_cap)
        return (jnp.sum(a.image ** 2) + 0.3 * jnp.sum(b.image)
                + jnp.sum(a.final_T) + 0.5 * jnp.sum(b.final_T ** 2)), live

    v2 = jnp.concatenate([values, values * 0.7])
    m2 = jnp.concatenate([proj.means2d, proj.means2d])
    c2 = jnp.concatenate([proj.conics, proj.conics])
    o2 = jnp.concatenate([opa, opa])

    (l0, live), g0 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                        has_aux=True)(v2, m2, c2, o2, None)
    live = int(live)
    I = binning.gid.shape[0]
    assert 0 < live < I, f"scene must terminate some chunks (live={live}/{I})"

    # Exact-fit cap (covers all live chunks): grads match the uncompacted
    # path to reduce-reassociation tolerance.
    cap = -(-live // chunk) * chunk
    (l1, _), g1 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                     has_aux=True)(v2, m2, c2, o2, cap)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(g1, g0):
        scale = np.abs(np.asarray(b)).max() + 1e-12
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6 * scale, rtol=1e-5)

    # Oversized cap (padding positions in play): still exact.
    (l2, _), g2 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                     has_aux=True)(v2, m2, c2, o2,
                                                   min(cap + 2 * chunk, I))
    for a, b in zip(g2, g0):
        scale = np.abs(np.asarray(b)).max() + 1e-12
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6 * scale, rtol=1e-5)

    # Undersized cap: loses the overflowing chunks' grads — must stay finite
    # and the forward (incl. live report) must be unchanged.
    (l3, live3), g3 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                         has_aux=True)(
        v2, m2, c2, o2, max(chunk, cap - 2 * chunk))
    assert int(live3) == live
    np.testing.assert_allclose(float(l3), float(l0), rtol=1e-6)
    for a in g3:
        assert np.isfinite(np.asarray(a)).all()


def test_pair_term_cut_exact():
    """The binning termination cut (4x4-block guaranteed-termination bounds)
    must leave the pair render's outputs AND gradients unchanged while
    actually cutting instances on a dense opaque scene — the aligned layout
    can then live under a SMALLER static cap than the expansion side."""
    import dataclasses

    from gs2m_tpu.core.camera import Camera
    from gs2m_tpu.core.gaussians import Gaussians
    from gs2m_tpu.models.render import render_pair
    from gs2m_tpu.ops.binning import bin_gaussians

    rng = np.random.default_rng(23)
    n = 3000
    pts = np.stack([rng.uniform(-1.2, 1.2, n), rng.uniform(-0.9, 0.9, n),
                    rng.uniform(-0.6, 0.6, n)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    g = Gaussians.create(pts, cols, 2, capacity=4096)
    g = dataclasses.replace(
        g, opacity=jnp.full_like(g.opacity, float(np.log(0.9 / 0.1))),
        scaling=jnp.full_like(g.scaling, float(np.log(0.25))))
    h, w = 48, 64
    cam_a = make_camera(width=w, height=h)
    th = 0.3
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]], np.float32)
    cam_b = Camera.create(R, np.array([0.2, 0.0, 4.0]), fovx=0.9, fovy=0.7,
                          width=w, height=h)

    # The cut must actually fire on this scene.
    from gs2m_tpu.ops.projection import project
    opac = g.get_opacity[:, 0]
    proj = project(g, cam_a, 2, opacities=opac)
    b0 = bin_gaussians(proj, h, w, 16, 2 ** 15, 64, opacities=opac)
    assert int(b0.dropped) == 0
    b1 = bin_gaussians(proj, h, w, 16, 2 ** 15, 64, opacities=opac,
                       term_cut=True, with_present=False)
    assert int(b1.num_aligned) < int(b0.num_aligned) * 0.8, (
        int(b0.num_aligned), int(b1.num_aligned))
    assert int(b1.num_aligned) <= 2 ** 14  # the term_cut cap below

    def loss_of(term_cut):
        kw = dict(tile=16, chunk=64,
                  instance_cap=2 ** 14 if term_cut else 2 ** 15,
                  term_cut=term_cut,
                  expand_cap=2 ** 15 if term_cut else None)

        def f(params, sink, abs_sink):
            g2 = g.with_params(params)
            pkg, npkg = render_pair(g2, cam_a, cam_b, jnp.zeros(3), 2,
                                    geometry_stage=True, sobel_normal=True,
                                    m2d_sink=sink, m2d_abs_sink=abs_sink,
                                    **kw)
            loss = (jnp.sum(pkg["render"] ** 2)
                    + jnp.sum(pkg["depth_map"] ** 2)
                    + 0.3 * jnp.sum(npkg["normal_map"] ** 2)
                    + 0.7 * jnp.sum(npkg["depth_map"]))
            return loss, (pkg, npkg)
        return f

    sink = jnp.zeros((g.capacity, 2))
    abs_sink = jnp.zeros((g.capacity, 2))
    params = g.params_dict()
    (l0, (p0, n0)), g0 = jax.value_and_grad(
        loss_of(False), argnums=(0, 1, 2), has_aux=True)(params, sink, abs_sink)
    (l1, (p1, n1)), g1 = jax.value_and_grad(
        loss_of(True), argnums=(0, 1, 2), has_aux=True)(params, sink, abs_sink)

    assert int(p1["dropped"]) == 0 and int(n1["dropped"]) == 0
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b, tag in ((p0, p1, "main"), (n0, n1, "nbr")):
        for key in ("render", "depth_map", "normal_map", "alpha_map",
                    "final_T"):
            np.testing.assert_allclose(np.asarray(b[key]), np.asarray(a[key]),
                                       atol=1e-6, rtol=1e-5,
                                       err_msg=f"{tag}:{key}")
        np.testing.assert_array_equal(np.asarray(b["observe"]),
                                      np.asarray(a["observe"]), tag)
    for a, b in zip(g1, g0):
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        for x, y in zip(la, lb):
            scale = np.abs(np.asarray(y)).max() + 1e-12
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=5e-6 * scale, rtol=1e-5)


def test_single_render_term_cut_exact():
    """Single-path term_cut (rasterize_from_projected term_cut=True) must be
    gradient-exact too: its backward switches to exact_rank because binning's
    gauss_present no longer matches the cut layout."""
    import dataclasses

    from gs2m_tpu.core.gaussians import Gaussians
    from gs2m_tpu.models.render import render

    rng = np.random.default_rng(29)
    n = 2000
    pts = np.stack([rng.uniform(-1.2, 1.2, n), rng.uniform(-0.9, 0.9, n),
                    rng.uniform(-0.6, 0.6, n)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    g = Gaussians.create(pts, cols, 2, capacity=2048)
    g = dataclasses.replace(
        g, opacity=jnp.full_like(g.opacity, float(np.log(0.9 / 0.1))),
        scaling=jnp.full_like(g.scaling, float(np.log(0.25))))
    h, w = 48, 64
    cam = make_camera(width=w, height=h)

    def loss_of(term_cut):
        def f(params):
            pkg = render(g.with_params(params), cam, jnp.zeros(3), 2,
                         geometry_stage=True, backend="pallas", chunk=64,
                         instance_cap=2 ** 14,
                         term_cut=term_cut,
                         expand_cap=2 ** 14 if term_cut else None)
            return (jnp.sum(pkg["render"] ** 2)
                    + jnp.sum(pkg["depth_map"] ** 2)), pkg
        return f

    params = g.params_dict()
    (l0, p0), g0 = jax.value_and_grad(loss_of(False), has_aux=True)(params)
    (l1, p1), g1 = jax.value_and_grad(loss_of(True), has_aux=True)(params)
    assert int(p1["dropped"]) == 0
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for k in g0:
        scale = np.abs(np.asarray(g0[k])).max() + 1e-12
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g0[k]),
                                   atol=5e-6 * scale, rtol=1e-5, err_msg=k)
