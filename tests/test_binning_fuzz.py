"""Randomized structural oracle for ops/binning.bin_gaussians.

The binning is the framework's most intricate index machinery (expansion,
ellipse cull, lex sort, chunk alignment, overflow accounting) and the prime
target of future perf work — this test re-derives EVERY Binning field with a
slow, obviously-correct numpy oracle and asserts exact equality across random
scenes, including capacity-overflow regimes. bin semantics mirror the CUDA
duplicateWithKeys/sort/ranges steps (rasterizer_impl.cu:61-129,263-296)."""
import jax.numpy as jnp
import numpy as np
import pytest

from gs2m_tpu.ops.binning import bin_gaussians, num_tiles
from gs2m_tpu.ops.projection import project

from tests.test_golden import make_camera, make_scene


def numpy_binning_oracle(proj, opacities, H, W, tile, I, chunk):
    grid_y, grid_x = num_tiles(H, W, tile)
    T = grid_y * grid_x
    C = np.asarray(proj.means2d).shape[0]

    tt = np.asarray(proj.tiles_touched).astype(np.int64)
    offsets = np.cumsum(tt) - tt
    total = int(tt.sum())
    dropped_expand = max(total - I, 0)

    rmin = np.asarray(proj.rect_min).astype(np.int64)
    rmax = np.asarray(proj.rect_max).astype(np.int64)
    w = np.maximum(rmax[:, 0] - rmin[:, 0], 1)
    depths = np.asarray(proj.depths)
    m2d = np.asarray(proj.means2d)
    con = np.asarray(proj.conics)

    slots = np.arange(I)
    g = np.clip(np.searchsorted(offsets, slots, side="right") - 1, 0, C - 1)
    live = slots < total
    j = slots - offsets[g]
    q = j // w[g]
    tx = rmin[g, 0] + (j - q * w[g])
    ty = rmin[g, 1] + q

    keep = live.copy()
    if opacities is not None:
        op = np.asarray(opacities)
        ca, cb, cc = con[:, 0], con[:, 1], con[:, 2]
        lmin = np.maximum(
            0.5 * (ca + cc) - np.sqrt(0.25 * (ca - cc) ** 2 + cb * cb + 1e-20),
            0.0).astype(np.float32)
        qmax = (2.0 * np.log(np.maximum(op, 1e-12) * 255.0)).astype(np.float32)
        # Mirror the f32 packed-table arithmetic of binning.py:110-146.
        mx = m2d[g, 0].astype(np.float32)
        my = m2d[g, 1].astype(np.float32)
        cx = np.clip(mx, (tx * tile).astype(np.float32),
                     (tx * tile + (tile - 1)).astype(np.float32))
        cy = np.clip(my, (ty * tile).astype(np.float32),
                     (ty * tile + (tile - 1)).astype(np.float32))
        d2 = (mx - cx) ** 2 + (my - cy) ** 2
        keep &= lmin[g] * d2 <= qmax[g] + np.float32(1e-3)

    tile_id = np.where(keep, ty * grid_x + tx, T).astype(np.int64)
    depth = np.where(keep, depths[g], np.inf).astype(np.float32)

    # Per-Gaussian surviving instances within the expansion capacity window.
    kcs = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
    lo = np.clip(offsets, 0, I)
    hi = np.clip(offsets + tt, 0, I)
    gauss_present = (kcs[hi] - kcs[lo]).astype(np.int64)

    # Stable lexicographic (tile, depth, slot) order.
    order = np.lexsort((slots, depth, tile_id))
    tile_sorted = tile_id[order]
    g_sorted = g[order]
    live_sorted = live[order]
    slot_sorted = slots[order]

    start_fill = np.searchsorted(tile_sorted, np.arange(T + 1), side="left")
    start = start_fill[:T]
    counts = start_fill[1:] - start

    aligned = -(-counts // chunk) * chunk
    astart = np.cumsum(aligned) - aligned
    atotal = int(aligned.sum())
    dropped_align = max(atotal - I, 0)

    t_of = np.clip(np.searchsorted(astart, slots, side="right") - 1, 0, T - 1)
    k = slots - astart[t_of]
    in_tile = (slots < atotal) & (k < counts[t_of])
    src = np.clip(start[t_of] + k, 0, I - 1)
    gid = np.where(in_tile & live_sorted[src], g_sorted[src], 0)
    is_null = ~in_tile | ~live_sorted[src]

    chunk_starts = np.arange(I // chunk) * chunk
    chunk_tile = np.where(chunk_starts < atotal, t_of[chunk_starts], T)
    covered = np.zeros(T + 1, bool)
    covered[chunk_tile] = True
    tile_nonempty = (counts > 0) & covered[:T]

    return dict(
        gid=gid, is_null=is_null, chunk_tile=chunk_tile,
        tile_nonempty=tile_nonempty, num_instances=total,
        dropped=dropped_expand + dropped_align,
        gauss_offset=np.clip(offsets, 0, I),
        gauss_live=np.clip(np.minimum(tt, I - offsets), 0, None),
        num_aligned=min(atotal, I),
        gauss_present=gauss_present,
    )


@pytest.mark.parametrize("seed,n,cap_slack,use_opac", [
    (0, 60, 8.0, True),    # ample capacity
    (1, 60, 8.0, False),   # no ellipse cull
    (2, 120, 1.0, True),   # tight: alignment overflow likely
    (3, 120, 0.5, True),   # hard overflow: expansion truncation
    (4, 30, 8.0, True),    # sparse scene, many empty tiles
])
def test_binning_matches_numpy_oracle(seed, n, cap_slack, use_opac):
    rng = np.random.default_rng(seed)
    H, W, tile, chunk = 72, 56, 16, 32  # non-multiple dims on purpose
    cam = make_camera(width=W, height=H)
    g = make_scene(rng, n=n, capacity=max(n, 64), random_pose=True)
    opac = jnp.minimum(g.get_opacity[:, 0] * 6.0, 0.99) if use_opac else None
    proj = project(g, cam, g.max_sh_degree,
                   opacities=opac if use_opac else None)

    demand = int(np.asarray(proj.tiles_touched).sum())
    I = max(int(-(-demand * cap_slack // chunk)) * chunk, 2 * chunk)
    b = bin_gaussians(proj, H, W, tile, I, chunk, opacities=opac)
    o = numpy_binning_oracle(proj, opac, H, W, tile, I, chunk)

    np.testing.assert_array_equal(np.asarray(b.gid), o["gid"], err_msg="gid")
    np.testing.assert_array_equal(np.asarray(b.is_null), o["is_null"],
                                  err_msg="is_null")
    np.testing.assert_array_equal(np.asarray(b.chunk_tile), o["chunk_tile"],
                                  err_msg="chunk_tile")
    np.testing.assert_array_equal(np.asarray(b.tile_nonempty),
                                  o["tile_nonempty"], err_msg="tile_nonempty")
    assert int(b.num_instances) == o["num_instances"]
    assert int(b.dropped) == o["dropped"]
    np.testing.assert_array_equal(np.asarray(b.gauss_offset),
                                  o["gauss_offset"], err_msg="gauss_offset")
    np.testing.assert_array_equal(np.asarray(b.gauss_live), o["gauss_live"],
                                  err_msg="gauss_live")
    assert int(b.num_aligned) == o["num_aligned"]
    np.testing.assert_array_equal(np.asarray(b.gauss_present),
                                  o["gauss_present"], err_msg="gauss_present")


@pytest.mark.parametrize("seed,n,opaque,cap_slack", [
    (10, 120, True, 8.0),    # dense opaque: the cut fires
    (11, 120, False, 8.0),   # translucent: cut mostly idle
    (12, 160, True, 1.0),    # tight aligned cap: alignment overflow + cut
    (13, 60, True, 8.0),     # sparse
])
def test_term_cut_is_prefix_of_base_layout(seed, n, opaque, cap_slack):
    """term_cut's contract, fuzzed: each tile's aligned segment must be a
    PREFIX of the base (uncut) layout's segment — same gids, same order —
    and the blended output must be exactly the base output (the cut only
    removes guaranteed-zero-contribution instances). Checked without
    re-deriving the conservative bound (its exp/log1p quantization is not
    bit-mirrorable across backends); the prefix property + output equality
    IS the spec."""
    import dataclasses

    from gs2m_tpu.ops.blend_xla import blend_tiles_xla
    from gs2m_tpu.ops.rasterize import build_features, pack_values

    rng = np.random.default_rng(seed)
    H, W, tile, chunk = 72, 56, 16, 32
    cam = make_camera(width=W, height=H)
    g = make_scene(rng, n=n, capacity=max(n, 64), random_pose=True)
    if opaque:
        # Big overlapping opaque splats: deep per-block occlusion so the
        # conservative bound actually crosses.
        g = dataclasses.replace(
            g, opacity=jnp.full_like(g.opacity, float(np.log(9.0))),
            scaling=jnp.full_like(g.scaling, float(np.log(0.55))))
    opac = jnp.minimum(g.get_opacity[:, 0], 0.99)
    proj = project(g, cam, g.max_sh_degree, opacities=opac)

    T0 = num_tiles(H, W, tile)[0] * num_tiles(H, W, tile)[1]
    demand = int(np.asarray(proj.tiles_touched).sum())
    IE = max(int(-(-demand // chunk)) * chunk + chunk, 2 * chunk)
    IB = IE + T0 * chunk  # + alignment floor so the base never drops
    I = max(int(-(-int(demand * cap_slack) // chunk)) * chunk, 2 * chunk)
    base = bin_gaussians(proj, H, W, tile, IB, chunk, opacities=opac)
    cut = bin_gaussians(proj, H, W, tile, I, chunk, opacities=opac,
                        term_cut=True, expand_cap=IE, with_present=False)
    assert int(base.dropped) == 0  # IB sized to fit everything uncut

    # Per-tile prefix property over the aligned layouts.
    T = num_tiles(H, W, tile)[0] * num_tiles(H, W, tile)[1]
    bgid, bnull = np.asarray(base.gid), np.asarray(base.is_null)
    cgid, cnull = np.asarray(cut.gid), np.asarray(cut.is_null)
    bct = np.repeat(np.asarray(base.chunk_tile), chunk)
    cct = np.repeat(np.asarray(cut.chunk_tile), chunk)
    clipped = int(cut.dropped) > 0
    for t in range(T):
        bseg = bgid[(bct == t) & ~bnull]
        cseg = cgid[(cct == t) & ~cnull]
        assert len(cseg) <= len(bseg), t
        if not clipped:
            np.testing.assert_array_equal(cseg, bseg[:len(cseg)],
                                          err_msg=f"tile {t}")

    if not clipped:
        feats = build_features(g, cam)
        vals = pack_values(proj.colors, feats, 5)
        o0 = blend_tiles_xla(vals, proj.means2d, proj.conics, opac, base,
                             H, W, tile, chunk)
        o1 = blend_tiles_xla(vals, proj.means2d, proj.conics, opac, cut,
                             H, W, tile, chunk)
        np.testing.assert_array_equal(np.asarray(o1.image),
                                      np.asarray(o0.image))
        np.testing.assert_array_equal(np.asarray(o1.final_T),
                                      np.asarray(o0.final_T))
        np.testing.assert_array_equal(np.asarray(o1.observe),
                                      np.asarray(o0.observe))
        if opaque and n >= 120:
            assert int(cut.num_aligned) < int(base.num_aligned), \
                "cut never fired on the dense opaque scene"
