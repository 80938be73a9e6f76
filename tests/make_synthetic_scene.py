"""Build a tiny synthetic COLMAP-format dataset by rendering a known Gaussian
cloud from a ring of cameras with the golden renderer. Used by data-layer and
end-to-end training tests (the scene is perfectly fittable by construction).
"""
from __future__ import annotations

import os

import numpy as np


def ring_camera(theta: float, dist: float = 4.0, height: float = 0.8):
    """c2w looking at the origin from a ring; returns (R_transposed_w2c, T_w2c)."""
    eye = np.array([dist * np.sin(theta), height, -dist * np.cos(theta)])
    forward = -eye / np.linalg.norm(eye)           # +z view axis toward origin
    up = np.array([0.0, -1.0, 0.0])                 # COLMAP y-down
    right = np.cross(up, forward)
    right /= np.linalg.norm(right)
    true_up = np.cross(forward, right)
    R_c2w = np.stack([right, true_up, forward], axis=1)  # columns
    w2c_R = R_c2w.T
    T = -w2c_R @ eye
    return R_c2w, T  # reference convention: R stored as transposed w2c = c2w


def make_scene_data(n_points: int = 300, seed: int = 0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n_points, 3)).astype(np.float32) * 0.6
    cols = ((pts - pts.min(0)) / (pts.max(0) - pts.min(0))).astype(np.float32)
    return pts, cols


def make_sphere_data(n_points: int = 4000, radius: float = 1.0, seed: int = 0,
                     texture: str = "smooth"):
    """Points ON a sphere surface (analytic geometry ground truth for the
    train -> mesh -> chamfer quality gate).

    texture="noise" mixes per-point random color into the smooth normal
    coding: high-frequency appearance detail the optimizer can only fit by
    densifying — the DTU-shaped production gate needs sustained clone/split
    pressure to reach reference-scale point counts (a smooth sphere
    converges at ~10^4 Gaussians)."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n_points, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = (v * radius).astype(np.float32)
    if texture == "noise":
        cols = (0.3 + 0.3 * v
                + 0.4 * rng.uniform(0, 1, (n_points, 3))).astype(np.float32)
        cols = np.clip(cols, 0.0, 1.0)
    else:
        cols = (0.5 + 0.45 * v).astype(np.float32)  # smooth normal coding
    return pts, cols


# ---------------------------------------------------------------------------
# Composite scene: sphere + box resting on a finite ground plane.
#
# Single source of truth for BOTH the scene builder and the analytic chamfer
# in scripts/run_quality_gate.py. The sphere-only gate's chamfer is bounded
# by the splat thickness of a smooth convex surface; this scene adds the
# failure modes real reconstruction is judged on: sharp box edges, a large
# planar region (where the depth-normal prior must flatten the splats),
# object-ground contact lines, and inter-object occlusion.
#
# Coordinates: COLMAP y-down (world-up is -y). The ground is the square
# y = GROUND_Y, |x|,|z| <= GROUND_HALF; objects rest on it (bottoms tangent).
# ---------------------------------------------------------------------------

COMPOSITE = {
    "ground_y": 0.5, "ground_half": 1.6,
    "sphere_c": np.array([-0.55, 0.0, 0.1]), "sphere_r": 0.5,
    "box_c": np.array([0.6, 0.1, -0.1]), "box_h": np.array([0.35, 0.4, 0.3]),
    # visible-surface exclusions (regions no ring camera can see)
    "contact_eps": 0.04,   # sphere cap / plane ring this close to contact
}


def composite_surface_distance(pts: np.ndarray) -> np.ndarray:
    """Exact unsigned distance from (N, 3) points to the composite surface
    (min over primitives; finite-plane distance includes the square edges)."""
    c = COMPOSITE
    d_sph = np.abs(np.linalg.norm(pts - c["sphere_c"], axis=1) - c["sphere_r"])
    q = np.abs(pts - c["box_c"]) - c["box_h"]
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=1)
    inside = np.minimum(np.max(q, axis=1), 0.0)
    d_box = np.abs(outside + inside)
    dy = np.abs(pts[:, 1] - c["ground_y"])
    dx = np.maximum(np.abs(pts[:, 0]) - c["ground_half"], 0.0)
    dz = np.maximum(np.abs(pts[:, 2]) - c["ground_half"], 0.0)
    d_pln = np.sqrt(dy * dy + dx * dx + dz * dz)
    return np.minimum(np.minimum(d_sph, d_box), d_pln)


def _plane_footprint_free(p: np.ndarray) -> np.ndarray:
    """Mask of plane points NOT under the sphere or the box (invisible)."""
    c = COMPOSITE
    in_sph = (np.linalg.norm(p[:, [0, 2]] - c["sphere_c"][[0, 2]], axis=1)
              < c["sphere_r"] + c["contact_eps"])
    in_box = (np.all(np.abs(p[:, [0, 2]] - c["box_c"][[0, 2]])
                     < c["box_h"][[0, 2]] + c["contact_eps"], axis=1))
    return ~(in_sph | in_box)


def sample_composite_surface(n_points: int, seed: int = 0) -> np.ndarray:
    """Area-weighted samples of the VISIBLE composite surface: sphere minus
    the contact cap, box minus the bottom face, plane minus the object
    footprints. Used for the builder's splat centers and for the chamfer's
    surface->mesh coverage term."""
    c = COMPOSITE
    rng = np.random.default_rng(seed)
    r, h, E = c["sphere_r"], c["box_h"], c["ground_half"]
    area_sph = 4 * np.pi * r * r
    # box faces: +-x (hy*hz), +-z (hx*hy), top only in y (hx*hz)
    fa = np.array([h[1] * h[2], h[1] * h[2], h[0] * h[1], h[0] * h[1],
                   h[0] * h[2]]) * 4.0
    area_box = fa.sum()
    area_pln = (2 * E) ** 2 - np.pi * r ** 2 - 4 * h[0] * h[2]
    w = np.array([area_sph, area_box, area_pln])
    n_sph, n_box = (np.floor(n_points * w[:2] / w.sum())).astype(int)
    n_pln = n_points - n_sph - n_box

    out = []
    # Sphere minus the contact cap (y > ground - eps is touching the plane).
    need = n_sph
    while need > 0:
        v = rng.normal(size=(2 * need + 16, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        p = c["sphere_c"] + r * v
        p = p[p[:, 1] < c["ground_y"] - c["contact_eps"]][:need]
        out.append(p)
        need -= len(p)
    # Box faces (skip the bottom +y face flush with the ground).
    face = rng.choice(5, size=n_box, p=fa / fa.sum())
    u = rng.uniform(-1, 1, (n_box, 2))
    bp = np.zeros((n_box, 3))
    for f, (ax, sgn) in enumerate([(0, 1), (0, -1), (2, 1), (2, -1), (1, -1)]):
        m = face == f
        oth = [a for a in range(3) if a != ax]
        bp[m, ax] = sgn * h[ax]
        bp[m, oth[0]] = u[m, 0] * h[oth[0]]
        bp[m, oth[1]] = u[m, 1] * h[oth[1]]
    out.append(c["box_c"] + bp)
    # Plane minus object footprints.
    need = n_pln
    while need > 0:
        p = np.column_stack([rng.uniform(-E, E, 2 * need + 16),
                             np.full(2 * need + 16, c["ground_y"]),
                             rng.uniform(-E, E, 2 * need + 16)])
        p = p[_plane_footprint_free(p)][:need]
        out.append(p)
        need -= len(p)
    return np.concatenate(out).astype(np.float32)


def make_composite_data(n_points: int = 40_000, seed: int = 0):
    """Composite-scene splat centers + noise-textured colors (per-primitive
    base tones so the photometric loss carries segmentation structure, plus
    per-point noise so densification has to work)."""
    c = COMPOSITE
    pts = sample_composite_surface(n_points, seed)
    rng = np.random.default_rng(seed + 7)
    on_sph = (np.abs(np.linalg.norm(pts - c["sphere_c"], axis=1)
                     - c["sphere_r"]) < 1e-4)
    on_pln = np.abs(pts[:, 1] - c["ground_y"]) < 1e-4
    base = np.where(on_sph[:, None], np.array([[0.75, 0.40, 0.30]]),
                    np.where(on_pln[:, None], np.array([[0.45, 0.50, 0.40]]),
                             np.array([[0.30, 0.50, 0.75]])))
    cols = np.clip(0.75 * base + 0.35 * rng.uniform(0, 1, (len(pts), 3)),
                   0.0, 1.0).astype(np.float32)
    return pts, cols


def build(out_dir: str, n_views: int = 10, width: int = 64, height: int = 48,
          n_points: int = 300, seed: int = 0, surface: bool = False,
          opacity_boost: float = 6.0, point_scale: float | None = None,
          texture: str = "smooth", instance_cap: int = 2 ** 15,
          sfm_fraction: float = 0.5, scene: str | None = None):
    import jax.numpy as jnp
    from PIL import Image

    from gs2m_tpu.core.camera import Camera
    from gs2m_tpu.core.gaussians import Gaussians
    from gs2m_tpu.data import colmap as cm
    from gs2m_tpu.ops.projection import project
    from gs2m_tpu.ops.rasterize import build_features, rasterize_from_projected

    if scene is None:
        scene = "sphere" if surface else "cloud"
    if scene == "composite":
        pts, cols = make_composite_data(n_points, seed=seed)
        # Cameras on the world-up (-y) side, two interleaved heights so the
        # box sides, the ground, and the occlusion boundaries all get views.
        ring = lambda i: ring_camera(2 * np.pi * i / n_views, dist=3.4,
                                     height=(-1.6 if i % 2 else -0.9))
    elif scene == "sphere":
        pts, cols = make_sphere_data(n_points, seed=seed, texture=texture)
        ring = lambda i: ring_camera(2 * np.pi * i / n_views)
    else:
        pts, cols = make_scene_data(n_points, seed)
        ring = lambda i: ring_camera(2 * np.pi * i / n_views)
    msd = (np.full(pts.shape[0], point_scale ** 2, np.float32)
           if point_scale is not None else None)
    g = Gaussians.create(pts, cols, max_sh_degree=1, capacity=pts.shape[0],
                         mean_sq_dist=msd)

    fx = fy = 0.9 * width
    os.makedirs(os.path.join(out_dir, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)

    cams, imgs = {}, {}
    cams[1] = cm.ColmapCamera(1, "PINHOLE", width, height,
                              np.array([fx, fy, width / 2, height / 2], np.float64))
    for i in range(n_views):
        R, T = ring(i)
        name = f"view_{i:03d}.png"
        imgs[i + 1] = cm.ColmapImage(i + 1, cm.rotmat_to_qvec(R.T), T, 1, name)

        cam = Camera.create(R, T, fovx=2 * np.arctan(width / (2 * fx)),
                            fovy=2 * np.arctan(height / (2 * fy)),
                            width=width, height=height)
        proj = project(g, cam, g.max_sh_degree)
        opa = jnp.minimum(g.get_opacity[:, 0] * opacity_boost, 0.99)
        feats = build_features(g, cam)
        cap = instance_cap
        while True:
            out = rasterize_from_projected(proj, opa, feats, jnp.zeros(3), cam,
                                           feature_count=1, chunk=64,
                                           instance_cap=cap, backend="xla")
            if int(out.dropped) == 0 or cap >= 2 ** 24:
                break
            cap *= 2
        instance_cap = cap  # carry the grown cap to the remaining views
        img = np.clip(np.asarray(out.color).transpose(1, 2, 0), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(out_dir, "images", name))

    cm.write_cameras_binary(os.path.join(out_dir, "sparse/0/cameras.bin"), cams)
    cm.write_images_binary(os.path.join(out_dir, "sparse/0/images.bin"), imgs)
    # Noisy subset of the true points as the SfM cloud.
    rng = np.random.default_rng(seed + 1)
    sel = rng.choice(pts.shape[0],
                     size=max(50, int(pts.shape[0] * sfm_fraction)),
                     replace=False)
    noisy = pts[sel] + rng.normal(scale=0.02, size=(len(sel), 3)).astype(np.float32)
    cm.write_points3d_binary(os.path.join(out_dir, "sparse/0/points3D.bin"),
                             noisy.astype(np.float64), (cols[sel] * 255))
    return out_dir


def analytic_env(dirs: np.ndarray, power_scale: float = 1.0) -> np.ndarray:
    """Known analytic environment light: three colored directional lobes +
    ambient. `dirs` (..., 3) unit; returns (..., 3) linear RGB. The material
    quality gate trains against images shaded under THIS light and compares
    the recovered cubemap to it (scripts/run_material_gate.py)."""
    lobes = [
        (np.array([0.0, -1.0, 0.0]), np.array([1.5, 1.3, 0.9]), 8.0),   # warm top (y-down)
        (np.array([1.0, 0.0, 0.3]), np.array([0.4, 0.6, 1.4]), 6.0),    # cool side
        (np.array([-0.8, 0.3, -0.5]), np.array([0.8, 0.3, 0.2]), 4.0),  # red back
    ]
    out = np.full(dirs.shape[:-1] + (3,), 0.12, np.float64)
    for u, c, p in lobes:
        u = u / np.linalg.norm(u)
        d = np.maximum(np.einsum("...k,k->...", dirs, u), 0.0)
        out += c * (d ** (p * power_scale))[..., None]
    return out


def build_glossy(out_dir: str, n_views: int = 36, width: int = 400,
                 height: int = 300, n_points: int = 20_000, seed: int = 0,
                 test_every: int = 8):
    """Specular sphere under the analytic_env light, COLMAP layout + masks.

    The material-stage quality gate's scene (mirrors the GlossyBlender
    protocol, /root/reference/scripts/run_glossy.py:36): view-dependent GT
    (diffuse banding + sharp/rough specular per hemisphere) that only a
    material decomposition can fit. Two roughness zones (glossy north 0.1 /
    rough south 0.5 band) give the roughness map a recoverable structure.
    """
    import jax.numpy as jnp
    from PIL import Image

    from gs2m_tpu.core.camera import Camera
    from gs2m_tpu.core.gaussians import Gaussians
    from gs2m_tpu.data import colmap as cm
    from gs2m_tpu.ops.projection import project
    from gs2m_tpu.ops.rasterize import build_features, rasterize_from_projected

    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n_points, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v.astype(np.float32)

    # Albedo: two-tone bands (recoverable structure, no high-freq noise —
    # the specular term supplies the view-dependence).
    band = (np.sin(4.0 * np.arctan2(v[:, 0], v[:, 2])) > 0)
    albedo = np.where(band[:, None], np.array([[0.7, 0.25, 0.2]]),
                      np.array([[0.2, 0.45, 0.7]])).astype(np.float64)
    # Roughness: glossy north (y-down world: y<0 is up), rough south.
    rough = np.where(v[:, 1] < 0.0, 0.1, 0.5)

    g = Gaussians.create(pts, albedo.astype(np.float32), max_sh_degree=1,
                         capacity=n_points,
                         mean_sq_dist=np.full(n_points, 0.03 ** 2, np.float32))

    fx = fy = 0.9 * width
    os.makedirs(os.path.join(out_dir, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "masks"), exist_ok=True)

    # Diffuse irradiance of the analytic env (lobes blurred to power 1).
    irr = analytic_env(v, power_scale=1.0 / 8.0)

    cams, imgs = {}, {}
    cams[1] = cm.ColmapCamera(1, "PINHOLE", width, height,
                              np.array([fx, fy, width / 2, height / 2],
                                       np.float64))
    cap = 2 ** 18
    for i in range(n_views):
        # Two rings (low + high) so reflections sweep the full env sphere.
        theta = 2 * np.pi * i / n_views
        h = 0.8 if i % 2 == 0 else -1.2
        R, T = ring_camera(theta, dist=4.0, height=h)
        name = f"view_{i:03d}.png"
        imgs[i + 1] = cm.ColmapImage(i + 1, cm.rotmat_to_qvec(R.T), T, 1, name)

        cam = Camera.create(R, T, fovx=2 * np.arctan(width / (2 * fx)),
                            fovy=2 * np.arctan(height / (2 * fy)),
                            width=width, height=height)
        eye = np.asarray(cam.cam_center, np.float64)
        w = eye[None, :] - v
        w /= np.linalg.norm(w, axis=1, keepdims=True)
        ndw = np.sum(v * w, axis=1, keepdims=True)
        r = 2.0 * ndw * v - w
        # Per-point specular sharpness by roughness zone: the glossy zone
        # sees sharp lobes (power x4), the rough zone broad ones (power /4).
        spec = np.where((rough < 0.3)[:, None],
                        analytic_env(r, power_scale=4.0),
                        analytic_env(r, power_scale=0.25))
        color = albedo * irr + 0.35 * spec * np.maximum(ndw, 0.0)
        color = np.clip(color, 0.0, 1.0).astype(np.float32)

        proj = project(g, cam, 0)
        proj = proj._replace(colors=jnp.asarray(color))
        opa = jnp.minimum(g.get_opacity[:, 0] * 8.0, 0.99)
        feats = build_features(g, cam)
        while True:
            out = rasterize_from_projected(proj, opa, feats, jnp.ones(3), cam,
                                           feature_count=1, chunk=64,
                                           instance_cap=cap, backend="xla")
            if int(out.dropped) == 0 or cap >= 2 ** 24:
                break
            cap *= 2
        img = np.clip(np.asarray(out.color).transpose(1, 2, 0), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(out_dir, "images", name))
        alpha = 1.0 - np.asarray(out.final_T)
        Image.fromarray((np.clip(alpha, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, "masks", f"view_{i:03d}.png"))

    cm.write_cameras_binary(os.path.join(out_dir, "sparse/0/cameras.bin"), cams)
    cm.write_images_binary(os.path.join(out_dir, "sparse/0/images.bin"), imgs)
    rng2 = np.random.default_rng(seed + 1)
    sel = rng2.choice(n_points, size=n_points // 3, replace=False)
    noisy = pts[sel] + rng2.normal(scale=0.01, size=(len(sel), 3)).astype(np.float32)
    cm.write_points3d_binary(os.path.join(out_dir, "sparse/0/points3D.bin"),
                             noisy.astype(np.float64),
                             (albedo[sel] * 255))
    # Ground-truth material summary for the gate's recovery checks.
    import json
    with open(os.path.join(out_dir, "gt_material.json"), "w") as f:
        json.dump({"roughness_glossy": 0.1, "roughness_rough": 0.5,
                   "glossy_zone": "y<0", "spec_strength": 0.35}, f)
    return out_dir


if __name__ == "__main__":
    import sys

    import jax
    jax.config.update("jax_platforms", "cpu")
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/gs2m_synthetic")
    print("wrote synthetic scene")
