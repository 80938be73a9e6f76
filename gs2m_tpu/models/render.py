"""Scene renderer: feature packing -> tiled rasterization -> derived maps.

Behavioral reference: /root/reference/gaussian_renderer/__init__.py:21-175.
Produces the same output surface as the reference's `render()` dict:

  render (3,H,W) | alpha_map (1,H,W) | distance_map (1,H,W) | depth_map (1,H,W)
  normal_map (3,H,W world) | local_normal_map (3,H,W camera) |
  albedo_map (3,H,W) | roughness_map (1,H,W) | metallic_map (1,H,W) |
  normal_mask (1,H,W) | radii (C,) | visibility_filter (C,) | observe (C,) |
  sobel_map (3,H,W, optional) | dropped () diagnostic

feature_count staging matches gaussian_renderer/__init__.py:86-96:
1 (RGB warmup) / 5 (+distance+normal, geometry) / 9 (+albedo+roughness,
material) / +1 when blending metallic.

TPU-first: a pure function of (Gaussians, Camera) pytrees with static stage
flags — each stage is its own jit specialization; no Python branching on
traced values. Densification statistics flow through the `m2d_sink` /
`m2d_abs_sink` zero tensors (the reference's screenspace_points trick,
gaussian_renderer/__init__.py:36-43) so `jax.grad` can surface them.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gs2m_tpu.core.camera import Camera
from gs2m_tpu.core.gaussians import Gaussians
from gs2m_tpu.ops.normals import normal_from_depth_image
from gs2m_tpu.ops.projection import project
from gs2m_tpu.ops.rasterize import (build_features, observe_from_projected,
                                    rasterize_from_projected)


def feature_count_for(geometry_stage: bool, material_stage: bool,
                      blend_metallic: bool) -> int:
    fc = 9 if material_stage else 5 if geometry_stage else 1
    return fc + (1 if blend_metallic else 0)


def render(
    gaussians: Gaussians,
    camera: Camera,
    bg: jnp.ndarray,
    active_sh_degree: int,
    geometry_stage: bool = False,
    material_stage: bool = False,
    sobel_normal: bool = False,
    blend_metallic: bool = False,
    z_depth: bool = False,
    backend: str = "xla",
    tile: int = 16,
    chunk: int = 256,
    instance_cap: int = 2 ** 18,
    m2d_sink: jnp.ndarray | None = None,
    m2d_abs_sink: jnp.ndarray | None = None,
    term_cut: bool = False,
    expand_cap: int | None = None,
) -> dict:
    H, W = camera.height, camera.width
    feature_count = feature_count_for(geometry_stage, material_stage, blend_metallic)

    normals = gaussians.get_normals(camera.cam_center)
    features = build_features(gaussians, camera, z_depth=z_depth, normals=normals)
    proj = project(gaussians, camera, active_sh_degree, tile=tile,
                   opacities=gaussians.get_opacity[:, 0])
    out = rasterize_from_projected(
        proj, gaussians.get_opacity[:, 0], features, bg, camera,
        feature_count=feature_count, tile=tile, chunk=chunk,
        instance_cap=instance_cap, backend=backend,
        m2d_sink=m2d_sink, m2d_abs_sink=m2d_abs_sink,
        term_cut=term_cut, expand_cap=expand_cap)
    return derive_render_pkg(out, camera, bg, z_depth=z_depth,
                             sobel_normal=sobel_normal)


def count_observed(
    gaussians: Gaussians,
    camera: Camera,
    backend: str = "xla",
    tile: int = 16,
    chunk: int = 256,
    instance_cap: int = 2 ** 18,
    term_cut: bool = False,
    expand_cap: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-Gaussian observe counts for THIS view + binning overflow scalar —
    what the multi-view trim consumes (train.py:236-245), at a fraction of
    render()'s cost: color-free projection (observe never depends on SH or
    blended values) + a geometry-only blend sweep. Counts are bit-identical
    to render(...)["observe"]."""
    opac = gaussians.get_opacity[:, 0]
    proj = project(gaussians, camera, 0, tile=tile, opacities=opac,
                   with_colors=False)
    return observe_from_projected(proj, opac, camera, tile=tile, chunk=chunk,
                                  instance_cap=instance_cap, backend=backend,
                                  term_cut=term_cut, expand_cap=expand_cap)


def render_pair(
    gaussians: Gaussians,
    camera_a: Camera,
    camera_b: Camera,
    bg: jnp.ndarray,
    active_sh_degree: int,
    geometry_stage: bool = False,
    material_stage: bool = False,
    sobel_normal: bool = False,
    blend_metallic: bool = False,
    z_depth: bool = False,
    tile: int = 16,
    chunk: int = 256,
    instance_cap: int = 2 ** 18,
    m2d_sink: jnp.ndarray | None = None,
    m2d_abs_sink: jnp.ndarray | None = None,
    observe_b: bool = True,
    bwd_cap: int | None = None,
    term_cut: bool = False,
    expand_cap: int | None = None,
) -> tuple[dict, dict]:
    """Render the SAME Gaussians from two cameras through the fused pair
    rasterizer (ops/rasterize.rasterize_pair_from_projected) — the geometry
    train step's main + nearest renders share one instance gather and one
    backward reduction. Pallas only; sinks and sobel apply to view a.
    Outputs match two independent render(..., backend='pallas') calls."""
    from gs2m_tpu.ops.rasterize import rasterize_pair_from_projected

    feature_count = feature_count_for(geometry_stage, material_stage,
                                      blend_metallic)
    opac = gaussians.get_opacity[:, 0]
    feats, projs = [], []
    for cam in (camera_a, camera_b):
        normals = gaussians.get_normals(cam.cam_center)
        feats.append(build_features(gaussians, cam, z_depth=z_depth,
                                    normals=normals))
        projs.append(project(gaussians, cam, active_sh_degree, tile=tile,
                             opacities=opac))
    out_a, out_b = rasterize_pair_from_projected(
        projs[0], projs[1], opac, feats[0], feats[1], bg,
        camera_a, camera_b, feature_count=feature_count, tile=tile,
        chunk=chunk, instance_cap=instance_cap,
        m2d_sink=m2d_sink, m2d_abs_sink=m2d_abs_sink, observe_b=observe_b,
        bwd_cap=bwd_cap, term_cut=term_cut, expand_cap=expand_cap)
    pkg_a = derive_render_pkg(out_a, camera_a, bg, z_depth=z_depth,
                              sobel_normal=sobel_normal)
    pkg_b = derive_render_pkg(out_b, camera_b, bg, z_depth=z_depth)
    return pkg_a, pkg_b


def derive_render_pkg(out, camera: Camera, bg: jnp.ndarray,
                      z_depth: bool = False,
                      sobel_normal: bool = False) -> dict:
    """Raster surface (RasterOut) -> the reference's 13-map render dict
    (gaussian_renderer/__init__.py:126-158). Shared by the single-chip
    render() and the tile-sharded SP path (parallel/sp.py), whose outputs
    concatenate to the same RasterOut surface."""
    H, W = camera.height, camera.width
    buffer = out.buffer
    normal_map = buffer[2:5]
    normal_mask = jax.lax.stop_gradient(
        jnp.all(normal_map != 0.0, axis=0, keepdims=True))

    # World -> camera normals (gaussian_renderer/__init__.py:129-133).
    n_flat = normal_map.transpose(1, 2, 0).reshape(-1, 3)
    local_n = n_flat @ camera.world_view[:3, :3]
    local_normal_map = local_n.reshape(H, W, 3).transpose(2, 0, 1)

    # Plane depth = distance / -(n_cam . ray) (gaussian_renderer/__init__.py:136-141).
    distance_map = buffer[1:2]
    if z_depth:
        depth_map = distance_map
    else:
        rays = camera.get_rays().reshape(-1, 3)
        denoms = jnp.sum(local_n * rays, axis=-1).reshape(1, H, W)
        depth_map = distance_map / -(denoms + 1e-8)

    pkg = {
        "render": out.color,
        "radii": out.radii,
        "visibility_filter": out.radii > 0,
        "observe": out.observe,
        "alpha_map": buffer[0:1],
        "distance_map": distance_map,
        "depth_map": depth_map,
        "normal_map": normal_map,
        "albedo_map": buffer[5:8],
        "roughness_map": buffer[8:9],
        "metallic_map": buffer[9:10],
        "normal_mask": normal_mask,
        "local_normal_map": local_normal_map,
        "final_T": out.final_T,
        "dropped": out.dropped,
        "bwd_live": (out.bwd_live if getattr(out, "bwd_live", None)
                     is not None else jnp.int32(0)),
        "dropped_expand": (out.dropped_expand
                           if getattr(out, "dropped_expand", None)
                           is not None else jnp.int32(0)),
        "aligned_demand": (out.aligned_demand
                           if getattr(out, "aligned_demand", None)
                           is not None else jnp.int32(0)),
    }

    if sobel_normal:
        pkg["sobel_map"] = render_normal_from_depth_map(
            camera, depth_map[0], bg, pkg["alpha_map"][0])
    return pkg


def render_normal_from_depth_map(camera: Camera, depth: jnp.ndarray,
                                 bg: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """World-space normals from the rendered depth, alpha-composited over the
    background (gaussian_renderer/__init__.py:167-175)."""
    w2c = camera.world_view.T
    c2w = jnp.linalg.inv(w2c)
    n = normal_from_depth_image(depth, camera.get_K(), c2w)  # (H, W, 3)
    n = n * alpha[..., None] + bg[None, None, :] * (1.0 - alpha[..., None])
    return n.transpose(2, 0, 1)


# Convenience jitted wrapper: the stage/backend/shape arguments are static.
# active_sh_degree stays traced (core/sh.py masks bands above it) so
# SH-degree changes never recompile.
render_jit = partial(jax.jit, static_argnames=(
    "geometry_stage", "material_stage", "sobel_normal",
    "blend_metallic", "z_depth", "backend", "tile", "chunk", "instance_cap"))(render)
