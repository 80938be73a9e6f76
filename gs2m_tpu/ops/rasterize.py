"""Public rasterizer API: project -> bin -> blend, with selectable backends.

Mirrors the Python-visible surface of the reference rasterizer
(/root/reference/submodules/diff-gaussian-rasterization/
diff_gaussian_rasterization/__init__.py:143-218): inputs are per-Gaussian
parameters + camera; outputs are color (3,H,W), radii (C,), observe (C,) and
the 10-channel feature buffer (10,H,W), with `feature_count` selecting how
many feature channels blend (1/5/9/10, gaussian_renderer/__init__.py:86-96).

Backends:
  "golden"  — O(C*H*W) per-pixel reference (ops/golden.py), tiny scenes only.
  "xla"     — tiled chunked blend as a lax.scan (ops/blend_xla.py), runs
              anywhere, differentiable by autodiff.
  "pallas"  — Pallas TPU kernels with hand-derived backward
              (ops/blend_pallas.py), the production path.

Densification statistics: the reference hacks screen-space gradients into a
dummy means2D tensor with signed (.xy) and absolute (.zw) channels
(backward.cu:582-587). Here `m2d_sink`/`m2d_abs_sink` zero inputs serve that
role — their gradients carry dL/d(ndc mean2d) and the per-pixel-absolute
version, scaled by (0.5*W, 0.5*H) exactly like ddelx_dx (backward.cu:490-491).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gs2m_tpu.core.camera import Camera
from gs2m_tpu.core.gaussians import Gaussians
from gs2m_tpu.ops import golden as golden_mod
from gs2m_tpu.ops.binning import bin_gaussians, num_tiles
from gs2m_tpu.ops.blend_xla import blend_tiles_xla
from gs2m_tpu.ops.projection import Projected, project


class RasterOut(NamedTuple):
    color: jnp.ndarray     # (3, H, W) background-composited
    buffer: jnp.ndarray    # (10, H, W)
    final_T: jnp.ndarray   # (H, W)
    radii: jnp.ndarray     # (C,) int32
    observe: jnp.ndarray   # (C,) int32
    dropped: jnp.ndarray   # () int32 — binning overflow diagnostic
    # () int32 — backward-compaction demand (slots in non-terminated chunks,
    # pair path only; None elsewhere). The Trainer sizes bwd_cap from it.
    # (Default None, not jnp.int32(0): a module-import-time jnp constant
    # would initialize the JAX backend before tests/apps pick a platform.)
    bwd_live: jnp.ndarray | None = None
    # term_cut cap-management signals (pair path): the expansion-cap part of
    # `dropped`, and the aligned-slot demand the instance cap must cover.
    dropped_expand: jnp.ndarray | None = None
    aligned_demand: jnp.ndarray | None = None


def value_width(feature_count: int) -> int:
    """Blend-value channel count: 3 RGB + feature_count, rounded up to the
    f32 sublane tile (8). The warmup/geometry stages (feature_count 1/5) ride
    an 8-wide table — half the gather/sort/matmul traffic of the material
    stage's 16 — and every channel beyond feature_count is exactly zero, so
    all backends stay output-identical across widths."""
    return 8 if feature_count + 3 <= 8 else 16


def pack_values(colors: jnp.ndarray, features: jnp.ndarray,
                feature_count: int) -> jnp.ndarray:
    """(C,3) colors + (C,10) features -> (C,V) value rows; channels beyond
    feature_count are zeroed (forward.cu:345-346 blends only featureCount)."""
    C = colors.shape[0]
    V = value_width(feature_count)
    nf = V - 3
    mask = (jnp.arange(nf) < feature_count).astype(features.dtype)
    feats = features[:, :nf] if nf <= 10 else jnp.concatenate(
        [features, jnp.zeros((C, nf - 10), features.dtype)], axis=-1)
    return jnp.concatenate([colors, feats * mask[None, :]], axis=-1)


def rasterize_from_projected(
    proj: Projected,
    opacities: jnp.ndarray,       # (C,)
    features: jnp.ndarray,        # (C, 10)
    bg: jnp.ndarray,              # (3,)
    camera: Camera,
    feature_count: int = 10,
    tile: int = 16,
    chunk: int = 128,
    instance_cap: int = 2 ** 17,
    backend: str = "xla",
    m2d_sink: jnp.ndarray | None = None,
    m2d_abs_sink: jnp.ndarray | None = None,
    term_cut: bool = False,
    expand_cap: int | None = None,
) -> RasterOut:
    H, W = camera.height, camera.width
    C = proj.means2d.shape[0]

    # means2d sinks let gradients for densification stats escape.
    means2d = proj.means2d
    if m2d_sink is not None:
        means2d = means2d + m2d_sink

    if backend == "golden":
        out = golden_mod.golden_rasterize(
            means2d, proj.depths, proj.conics, opacities, proj.colors,
            features, proj.rect_min, proj.rect_max, proj.valid, bg,
            H, W, tile, feature_count)
        return RasterOut(color=out.color, buffer=out.buffer, final_T=out.final_T,
                         radii=proj.radii, observe=out.observe,
                         dropped=jnp.int32(0))

    # term_cut changes the per-Gaussian aligned counts, so the pallas
    # backward must count present ids itself (exact_rank); the XLA twin
    # differentiates through the layout directly and never uses the counts.
    binning = bin_gaussians(proj, H, W, tile, instance_cap, chunk,
                            opacities=opacities, term_cut=term_cut,
                            with_present=not term_cut, expand_cap=expand_cap)
    values = pack_values(proj.colors, features, feature_count)

    if backend == "xla":
        out = blend_tiles_xla(values, means2d, proj.conics, opacities, binning,
                              H, W, tile, chunk)
        image, final_T, observe = out.image, out.final_T, out.observe
    elif backend == "pallas":
        from gs2m_tpu.ops.blend_pallas import blend_tiles_pallas
        image, final_T, observe = blend_tiles_pallas(
            values, means2d, proj.conics, opacities, binning, H, W, tile, chunk,
            m2d_abs_sink=m2d_abs_sink, exact_rank=term_cut)
    else:
        raise ValueError(f"unknown backend {backend!r}")

    image = image[:, :H, :W]
    final_T = final_T[:H, :W]
    color = image[0:3] + final_T[None] * bg[:, None, None]
    # Narrow value widths (warmup/geometry) blend fewer channels; the public
    # buffer surface stays (10, H, W) — channels beyond feature_count are
    # zero by construction either way.
    buffer = image[3:13]
    if buffer.shape[0] < 10:
        buffer = jnp.concatenate(
            [buffer, jnp.zeros((10 - buffer.shape[0], H, W), image.dtype)])
    return RasterOut(color=color, buffer=buffer, final_T=final_T,
                     radii=proj.radii, observe=observe, dropped=binning.dropped)


def observe_from_projected(
    proj: Projected,
    opacities: jnp.ndarray,       # (C,)
    camera: Camera,
    tile: int = 16,
    chunk: int = 128,
    instance_cap: int = 2 ** 17,
    backend: str = "pallas",
    term_cut: bool = False,
    expand_cap: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-Gaussian observe counts (C,) int32 + binning `dropped` scalar,
    WITHOUT blending any values — the multi-view trim (train.py:236-245)
    consumes only visibility bits, which depend solely on geometry/opacity.
    Identical counts to rasterize_from_projected(...).observe; the pallas
    backend rides a geometry-only kernel (blend_pallas.observe_tiles_pallas),
    other backends fall back to a zero-value blend."""
    H, W = camera.height, camera.width
    # Observe never reduces gradients, so binning's survivor-count piece is
    # dead weight on the pallas path (the xla fallback's blend backward is
    # unused too, but its forward reads gauss_present's shape only).
    binning = bin_gaussians(proj, H, W, tile, instance_cap, chunk,
                            opacities=opacities,
                            with_present=(backend != "pallas"),
                            term_cut=term_cut and backend == "pallas",
                            expand_cap=expand_cap)
    if backend == "pallas":
        from gs2m_tpu.ops.blend_pallas import observe_tiles_pallas
        observe = observe_tiles_pallas(proj.means2d, proj.conics, opacities,
                                       binning, H, W, tile, chunk)
    else:
        C = proj.means2d.shape[0]
        values = jnp.zeros((C, 8), proj.means2d.dtype)
        out = blend_tiles_xla(values, proj.means2d, proj.conics, opacities,
                              binning, H, W, tile, chunk)
        observe = out.observe
    return observe, binning.dropped


def rasterize_pair_from_projected(
    proj_a: Projected, proj_b: Projected,
    opacities: jnp.ndarray,        # (C,) shared Gaussians
    features_a: jnp.ndarray, features_b: jnp.ndarray,   # (C, 10) per view
    bg: jnp.ndarray,
    camera_a: Camera, camera_b: Camera,
    feature_count: int = 10,
    tile: int = 16,
    chunk: int = 128,
    instance_cap: int = 2 ** 17,
    m2d_sink: jnp.ndarray | None = None,
    m2d_abs_sink: jnp.ndarray | None = None,
    observe_b: bool = True,
    bwd_cap: int | None = None,
    term_cut: bool = False,
    expand_cap: int | None = None,
) -> tuple[RasterOut, RasterOut]:
    """Two views of the SAME Gaussians through ONE pair custom_vjp
    (ops/blend_pallas.blend_tiles_pallas_pair): shares the instance-table
    gather and the backward segmented reduction between the main and the
    neighbor render of a geometry train step. Pallas backend only; sinks
    apply to view a (the main view). Cameras must share width/height."""
    from gs2m_tpu.ops.blend_pallas import blend_tiles_pallas_pair

    H, W = camera_a.height, camera_a.width
    assert (camera_b.height, camera_b.width) == (H, W)
    C = proj_a.means2d.shape[0]

    means2d_a = proj_a.means2d
    if m2d_sink is not None:
        means2d_a = means2d_a + m2d_sink

    # Compacting/term-cut pair backwards count present ids at reduce time
    # (exact_rank: compaction and the termination cut both change the
    # per-Gaussian aligned counts), so their binnings skip the 10.9 ms/view
    # survivor-count piece; the plain path keeps it (an exact_rank scatter
    # at full I costs MORE than the piece — 17 ms / 2M updates, laws r5).
    exact_rank = bwd_cap is not None or term_cut
    bkw = dict(opacities=opacities, with_present=not exact_rank,
               term_cut=term_cut, expand_cap=expand_cap)
    bin_a = bin_gaussians(proj_a, H, W, tile, instance_cap, chunk, **bkw)
    bin_b = bin_gaussians(proj_b, H, W, tile, instance_cap, chunk, **bkw)
    values2 = jnp.concatenate([
        pack_values(proj_a.colors, features_a, feature_count),
        pack_values(proj_b.colors, features_b, feature_count)])
    means2d2 = jnp.concatenate([means2d_a, proj_b.means2d])
    conics2 = jnp.concatenate([proj_a.conics, proj_b.conics])
    opacities2 = jnp.concatenate([opacities, opacities])
    abs2 = None
    if m2d_abs_sink is not None:
        abs2 = jnp.concatenate([m2d_abs_sink,
                                jnp.zeros_like(m2d_abs_sink)])

    out_a, out_b, bwd_live = blend_tiles_pallas_pair(
        values2, means2d2, conics2, opacities2, bin_a, bin_b, H, W, tile,
        chunk, m2d_abs_sink2=abs2, observe_b=observe_b, bwd_cap=bwd_cap,
        exact_rank=exact_rank)

    results = []
    for out, proj, b in ((out_a, proj_a, bin_a), (out_b, proj_b, bin_b)):
        image = out.image[:, :H, :W]
        final_T = out.final_T[:H, :W]
        color = image[0:3] + final_T[None] * bg[:, None, None]
        buffer = image[3:13]
        if buffer.shape[0] < 10:
            buffer = jnp.concatenate(
                [buffer, jnp.zeros((10 - buffer.shape[0], H, W), image.dtype)])
        results.append(RasterOut(color=color, buffer=buffer, final_T=final_T,
                                 radii=proj.radii, observe=out.observe,
                                 dropped=b.dropped, bwd_live=bwd_live,
                                 dropped_expand=b.dropped_expand,
                                 aligned_demand=b.num_aligned))
    return results[0], results[1]


def build_features(gaussians: Gaussians, camera: Camera,
                   z_depth: bool = False,
                   normals: jnp.ndarray | None = None) -> jnp.ndarray:
    """The 10-channel per-Gaussian feature matrix
    (gaussian_renderer/__init__.py:86-96): [1, plane-distance |n.x_cam| (or
    z-depth), world normal x3, albedo x3, roughness, metallic]."""
    C = gaussians.capacity
    if normals is None:
        normals = gaussians.get_normals(camera.cam_center)
    cam_n = normals @ camera.world_view[:3, :3]
    cam_p = gaussians.xyz @ camera.world_view[:3, :3] + camera.world_view[3, :3]
    if z_depth:
        dist = cam_p[:, 2]
    else:
        dist = jnp.abs(jnp.sum(cam_n * cam_p, axis=-1))
    return jnp.concatenate([
        jnp.ones((C, 1), gaussians.xyz.dtype),
        dist[:, None],
        normals,
        gaussians.get_albedo,
        gaussians.get_roughness,
        gaussians.get_metallic,
    ], axis=-1)
