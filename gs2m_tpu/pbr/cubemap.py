"""Cubemap environment light: lookup, mip chain, diffuse/GGX prefilter.

Behavioral reference: /root/reference/pbr/light.py:29-126 (mip chain with
avg-pool, diffuse irradiance from the coarsest mip, GGX-prefiltered specular
per mip with the 0.04->0.5 roughness ramp) and /root/reference/submodules/
render-utils/c_src/cubemap.cu (cube_to_dir face conventions at :31-45,
solid-angle texel weights at :17-29, cosine-hemisphere diffuse integral at
:110-139, GGX-NDF split-sum prefilter at :246-298 with the 99%-energy cutoff
of render_utils/ops.py:373-390).

TPU-native design — the CUDA kernels' per-texel loops with AABB culling
become PRECOMPUTED WEIGHT MATRICES applied as MXU matmuls:

* diffuse: the coarsest mip has 6*16*16 = 1536 texels, so the full cosine
  integral is ONE (1536, 1536) matmul — mathematically identical to the CUDA
  brute-force loop, and the backward is the exact matmul adjoint (the CUDA
  version hand-codes it with atomics).
* specular level i (roughness r_i): the GGX lobe is isotropic around the
  reflection direction, so the prefiltered map is smooth at the lobe's
  angular scale. We therefore (a) skip filtering when the 99%-energy lobe is
  narrower than a texel (identity — true for r=0.04 at 512^2), else
  (b) downsample to the smallest cube resolution S_i that still resolves the
  lobe (>= ~2 texels per lobe radius, capped at 32), run the EXACT NDF-
  weighted integral as one dense (6S^2, 6S^2) matmul, and bilinearly
  upsample back. Recorded deviation from the reference: band-limited
  approximation of the same integral (the light is a learned latent — the
  optimization absorbs the difference). Measured against the dense exact
  per-texel integral (tests/test_pbr.py::test_specular_prefilter_vs_exact_
  oracle, smooth HDR light + bright blob, 2026-08-18): max relative error
  4.4% / mean 0.4% at the worst level (mid-roughness band-limited to 16^2),
  <=2.5% at 32^2-limited levels, exact at native-res levels; identity levels
  (sub-texel lobes) <=0.03%. Edge filtering is seamless (pad_cube blends
  across face edges like nvdiffrast's boundary_mode="cube"; pad corners
  nearest-pick one of the three meeting faces instead of averaging them);
  measured on a smooth spherical field at 16^2: max cross-seam step 0.00035
  vs 0.0227 for clamp-to-face, truth error 0.0011 vs 0.0117.

All weight matrices are computed once per (resolution, roughness) in numpy
and cached as device constants; build_mips is pure jnp and differentiable
end-to-end (gradients flow through avg-pool + matmuls into the light base,
replacing cubemap.cu's hand-written backward).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LIGHT_MIN_RES = 16
MIN_ROUGHNESS = 0.04
MAX_ROUGHNESS = 0.5
PREFILTER_MAX_RES = 32  # dense-integral cap (6*32^2 = 6144 texels)


class CubemapConfig:
    base_res: int = 512


# --- direction <-> face/uv maps (cubemap.cu:31-60 conventions) ----------------

def cube_dirs(res: int) -> np.ndarray:
    """(6, res, res, 3) unit direction of each texel center."""
    fx = (np.arange(res) + 0.5) / res * 2.0 - 1.0
    gx, gy = np.meshgrid(fx, fx, indexing="xy")  # gx varies along x (cols)
    one = np.ones_like(gx)
    faces = [
        np.stack([one, -gy, -gx], -1),
        np.stack([-one, -gy, gx], -1),
        np.stack([gx, one, gy], -1),
        np.stack([gx, -one, -gy], -1),
        np.stack([gx, -gy, one], -1),
        np.stack([-gx, -gy, -one], -1),
    ]
    d = np.stack(faces, 0)
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def texel_solid_angle(res: int) -> np.ndarray:
    """(res, res) EXACT solid angle of each texel via the corner formula
    sigma(x, y) = atan2(x*y, sqrt(x^2 + y^2 + 1)); texel sums cover exactly
    4*pi over 6 faces. (Recorded deviation: the reference's pixel_area,
    cubemap.cu:17-29, is a separable mirrored-atan approximation that does
    not integrate to 4*pi; we use the exact element.)"""
    b = np.arange(res + 1) / res * 2.0 - 1.0  # texel borders in [-1, 1]
    bx, by = np.meshgrid(b, b, indexing="xy")
    sigma = np.arctan2(bx * by, np.sqrt(bx * bx + by * by + 1.0))
    area = (sigma[1:, 1:] - sigma[:-1, 1:] - sigma[1:, :-1] + sigma[:-1, :-1])
    return area.astype(np.float32)  # (y, x)


def dir_to_face_uv(dirs: jnp.ndarray):
    """(..., 3) directions -> (face int, u, v in [0, 1]) inverting cube_dirs."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    # Face selection: dominant axis and its sign.
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(is_x, jnp.where(x > 0, 0, 1),
                     jnp.where(is_y, jnp.where(y > 0, 2, 3),
                               jnp.where(z > 0, 4, 5)))
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az)) + 1e-12
    # Per-face (fx, fy) such that cube_dirs(face, fx, fy) == dir:
    #   0: (+1, -fy, -fx)   1: (-1, -fy, +fx)
    #   2: (fx, +1,  fy)    3: (fx, -1, -fy)
    #   4: (fx, -fy, +1)    5: (-fx, -fy, -1)
    fx = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-z / ma, z / ma, x / ma, x / ma, x / ma, -x / ma])
    fy = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-y / ma, -y / ma, z / ma, -z / ma, -y / ma, -y / ma])
    u = (fx + 1.0) * 0.5
    v = (fy + 1.0) * 0.5
    return face, u, v


@functools.lru_cache(maxsize=None)
def _pad_gather_indices(res: int):
    """(face, row, col) int32 numpy arrays, each (6, res+2, res+2), mapping
    every texel of the 1-texel-padded cube onto the NEAREST texel of the
    unpadded cube. Interior texels map to themselves; the border ring maps
    across the seam onto the adjacent face's edge texels (pad corners pick one
    of the three meeting faces — recorded deviation from corner averaging).

    Derivation is convention-free: extrapolate the face's (fx, fy) grid one
    texel beyond [-1, 1], renormalize the (now off-face) direction, and invert
    it with the same dominant-axis rules as dir_to_face_uv."""
    g = (np.arange(-1, res + 1) + 0.5) / res * 2.0 - 1.0  # padded texel centers
    fx, fy = np.meshgrid(g, g, indexing="xy")  # fx varies along cols
    one = np.ones_like(fx)
    faces = [
        np.stack([one, -fy, -fx], -1),
        np.stack([-one, -fy, fx], -1),
        np.stack([fx, one, fy], -1),
        np.stack([fx, -one, -fy], -1),
        np.stack([fx, -fy, one], -1),
        np.stack([-fx, -fy, -one], -1),
    ]
    d = np.stack(faces, 0)  # (6, res+2, res+2, 3), unnormalized
    face, u, v = _dir_to_face_uv_np(d)  # dominant-axis rules, scale-invariant
    col = np.clip(np.floor(u * res), 0, res - 1).astype(np.int32)
    row = np.clip(np.floor(v * res), 0, res - 1).astype(np.int32)
    return face, row, col


def pad_cube(cubemap: jnp.ndarray) -> jnp.ndarray:
    """(6, R, R, C) -> (6, R+2, R+2, C) with a 1-texel cross-face border, the
    TPU form of nvdiffrast's seamless-cube filtering (textureCUDA.cu boundary_
    mode="cube"): bilinear taps that cross a face edge land on the neighbor
    face's edge texels instead of clamping. Only the border ring is gathered
    (~24*(R+2) texels); the interior is passed through by concatenation, so
    the op stays cheap and its vjp is a small scatter-add."""
    res = cubemap.shape[1]
    F, Rw, Cw = _pad_gather_indices(res)

    def g(sl):
        return cubemap[F[sl], Rw[sl], Cw[sl]]

    top = g(np.s_[:, 0, :])        # (6, res+2, C)
    bot = g(np.s_[:, -1, :])
    left = g(np.s_[:, 1:-1, 0])    # (6, res, C)
    right = g(np.s_[:, 1:-1, -1])
    mid = jnp.concatenate([left[:, :, None], cubemap, right[:, :, None]], axis=2)
    return jnp.concatenate([top[:, None], mid, bot[:, None]], axis=1)


def cube_lookup(cubemap: jnp.ndarray, dirs: jnp.ndarray,
                seamless: bool = True) -> jnp.ndarray:
    """Differentiable bilinear cubemap lookup (the dr.texture 'cube' mode of
    pbr/shade.py:155-159). cubemap (6, R, R, C); dirs (..., 3) (need not be
    normalized). Returns (..., C). seamless=True blends across face edges via
    pad_cube (nvdiffrast boundary_mode="cube" semantics up to the nearest-
    texel border ring); False clamps to the owning face."""
    face, u, v = dir_to_face_uv(dirs)
    return _bilinear_cube(cubemap, face, u, v, seamless)


def _bilinear_cube(cubemap: jnp.ndarray, face, u, v,
                   seamless: bool) -> jnp.ndarray:
    R = cubemap.shape[1]
    if seamless:
        cubemap = pad_cube(cubemap)
        off, hi = 0.5, R + 1  # +1 texel pad shifts the grid by one
    else:
        off, hi = -0.5, R - 1
    # Texel centers at (i + 0.5) / R.
    gu = u * R + off
    gv = v * R + off
    u0 = jnp.floor(gu)
    v0 = jnp.floor(gv)
    wu = (gu - u0)[..., None]
    wv = (gv - v0)[..., None]
    u0i = jnp.clip(u0, 0, hi).astype(jnp.int32)
    u1i = jnp.clip(u0 + 1, 0, hi).astype(jnp.int32)
    v0i = jnp.clip(v0, 0, hi).astype(jnp.int32)
    v1i = jnp.clip(v0 + 1, 0, hi).astype(jnp.int32)
    c00 = cubemap[face, v0i, u0i]
    c01 = cubemap[face, v0i, u1i]
    c10 = cubemap[face, v1i, u0i]
    c11 = cubemap[face, v1i, u1i]
    top = c00 * (1 - wu) + c01 * wu
    bot = c10 * (1 - wu) + c11 * wu
    return top * (1 - wv) + bot * wv


def _dir_to_face_uv_np(d: np.ndarray):
    """Host-side dir_to_face_uv (same dominant-axis rules), for STATIC
    direction grids: computing face/uv under jit makes XLA constant-fold the
    whole select/reduce chain at compile time (>12 s per shape, observed)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = np.where(is_x, np.where(x > 0, 0, 1),
                    np.where(is_y, np.where(y > 0, 2, 3),
                             np.where(z > 0, 4, 5)))
    ma = np.where(is_x, ax, np.where(is_y, ay, az)) + 1e-12
    sel = [face == k for k in range(6)]
    fx = np.select(sel, [-z / ma, z / ma, x / ma, x / ma, x / ma, -x / ma])
    fy = np.select(sel, [-y / ma, -y / ma, z / ma, -z / ma, -y / ma, -y / ma])
    return face.astype(np.int32), ((fx + 1.0) * 0.5).astype(np.float32), \
        ((fy + 1.0) * 0.5).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _texel_face_uv(res: int):
    """face/u/v of the res-grid texel-center directions (they depend only on
    the DESTINATION grid; the source cubemap just gets sampled there)."""
    return _dir_to_face_uv_np(cube_dirs(res))


def upsample_cube(cubemap: jnp.ndarray, res: int) -> jnp.ndarray:
    """Bilinear upsample of a (6, S, S, C) cubemap to (6, res, res, C) by
    direction lookup (cube-aware, smooth across the prefiltered field).
    Face/uv are host-precomputed constants (static direction grid)."""
    face, u, v = _texel_face_uv(res)
    return _bilinear_cube(cubemap, jnp.asarray(face), jnp.asarray(u),
                          jnp.asarray(v), seamless=True)


# --- prefilter weight matrices (host-side, cached) -----------------------------

def _ndf_ggx(alpha_sqr: np.ndarray, cos_theta: np.ndarray) -> np.ndarray:
    c = np.clip(cos_theta, 0.0, 1.0)
    d = (c * alpha_sqr - c) * c + 1.0
    return alpha_sqr / (d * d * np.pi)


@functools.lru_cache(maxsize=None)
def ndf_cutoff_angle(roughness: float, cutoff: float = 0.99) -> float:
    """cos(theta) containing `cutoff` of GGX lobe energy
    (render_utils/ops.py:373-385)."""
    n = 1_000_000
    costheta = np.cos(np.linspace(0, np.pi / 2.0, n))
    D = np.cumsum(_ndf_ggx(roughness ** 4, costheta))
    idx = int(np.argmax(D >= D[-1] * cutoff))
    return float(costheta[idx])


@functools.lru_cache(maxsize=None)
def _diffuse_weights(res: int) -> np.ndarray:
    """(6R^2, 6R^2) cosine-hemisphere weights (cubemap.cu:110-139)."""
    d = cube_dirs(res).reshape(-1, 3)
    area = np.tile(texel_solid_angle(res)[None], (6, 1, 1)).reshape(-1)
    cos = np.clip(d @ d.T, 0.0, 0.999)
    return (cos * area[None, :] / np.pi).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _specular_weights(res: int, roughness: float, cutoff: float = 0.99):
    """Normalized (6R^2, 6R^2) GGX split-sum weights (cubemap.cu:246-298 +
    the wsum normalization of render_utils/ops.py:403)."""
    d = cube_dirs(res).reshape(-1, 3)
    area = np.tile(texel_solid_angle(res)[None], (6, 1, 1)).reshape(-1)
    cos_cut = ndf_cutoff_angle(roughness, cutoff)
    alpha_sqr = roughness ** 4
    cos = d @ d.T  # dot(VNR_i, L_j)
    # H = normalize(L + VNR); VNR.H = sqrt((1 + cos)/2).
    vnr_dot_h = np.sqrt(np.clip((1.0 + cos) / 2.0, 0.0, 1.0))
    w = np.clip(cos, 0.0, None) * _ndf_ggx(alpha_sqr, vnr_dot_h) * area[None, :] / 4.0
    w = np.where(cos >= cos_cut, w, 0.0)
    w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return w.astype(np.float32)


def _prefilter_res(base_res: int, roughness: float) -> int:
    """Smallest cube resolution resolving the lobe (>= ~2 texels per 99%
    radius), capped at PREFILTER_MAX_RES; 0 means identity (sub-texel lobe)."""
    theta = float(np.arccos(np.clip(ndf_cutoff_angle(roughness), -1, 1)))
    texel = 2.0 / base_res  # angular texel size at face center
    if theta < 1.5 * texel:
        return 0
    need = int(2 ** np.ceil(np.log2(max(4.0 / max(theta, 1e-6), LIGHT_MIN_RES))))
    return min(min(need, PREFILTER_MAX_RES), base_res)


# --- the light -----------------------------------------------------------------

def init_cubemap(key, base_res: int = 512, scale: float = 0.5,
                 bias: float = 0.25) -> jnp.ndarray:
    """Learnable base environment (pbr/light.py:64-69)."""
    return jax.random.uniform(key, (6, base_res, base_res, 3)) * scale + bias


def num_levels(base_res: int) -> int:
    n = 1
    while base_res > LIGHT_MIN_RES:
        base_res //= 2
        n += 1
    return n


def level_roughness(n_levels: int) -> list[float]:
    """The mip roughness ramp (pbr/light.py:96-99): levels 0..n-2 ramp
    MIN->MAX, the final level is roughness 1.0."""
    if n_levels <= 2:  # tiny test cubemaps; the reference always has 6 levels
        return [MIN_ROUGHNESS] * (n_levels - 1) + [1.0]
    ramp = [(i / (n_levels - 2)) * (MAX_ROUGHNESS - MIN_ROUGHNESS)
            + MIN_ROUGHNESS for i in range(n_levels - 1)]
    return ramp + [1.0]


def _avg_pool_cube(c: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool per face (pbr/light.py:29-35), NHWC."""
    six, R, _, C = c.shape
    return c.reshape(six, R // 2, 2, R // 2, 2, C).mean(axis=(2, 4))


def build_mips(base: jnp.ndarray, cutoff: float = 0.99):
    """-> (diffuse (6,16,16,3), [specular levels at mip resolutions])
    (pbr/light.py:89-99). Differentiable in `base`."""
    base_res = base.shape[1]
    mips = [base]
    while mips[-1].shape[1] > LIGHT_MIN_RES:
        mips.append(_avg_pool_cube(mips[-1]))
    n = len(mips)

    coarse = mips[-1]
    S = coarse.shape[1]
    Wd = jnp.asarray(_diffuse_weights(S))
    diffuse = (Wd @ coarse.reshape(-1, 3)).reshape(6, S, S, 3)

    roughs = level_roughness(n)
    specular = []
    for mip, r in zip(mips, roughs):
        R = mip.shape[1]
        S_i = _prefilter_res(R, r)
        if S_i == 0:
            specular.append(mip)
            continue
        src = mip
        while src.shape[1] > S_i:
            src = _avg_pool_cube(src)
        Ws = jnp.asarray(_specular_weights(src.shape[1], float(r), cutoff))
        out = (Ws @ src.reshape(-1, 3)).reshape(6, src.shape[1], src.shape[1], 3)
        specular.append(upsample_cube(out, R) if R != src.shape[1] else out)
    return diffuse, specular


@functools.lru_cache(maxsize=None)
def _latlong_face_uv(h: int, w: int):
    gy = np.linspace(0.0 + 1.0 / h, 1.0 - 1.0 / h, h)
    gx = np.linspace(-1.0 + 1.0 / w, 1.0 - 1.0 / w, w)
    gy, gx = np.meshgrid(gy, gx, indexing="ij")
    sint, cost = np.sin(gy * np.pi), np.cos(gy * np.pi)
    sinp, cosp = np.sin(gx * np.pi), np.cos(gx * np.pi)
    refl = np.stack([sint * sinp, cost, -sint * cosp], -1)
    return _dir_to_face_uv_np(refl)


def cubemap_to_latlong(base: jnp.ndarray, res=(512, 1024)) -> jnp.ndarray:
    """Equirectangular export (pbr/light.py:101-126). Static direction grid
    -> host-precomputed face/uv."""
    face, u, v = _latlong_face_uv(*res)
    return _bilinear_cube(base, jnp.asarray(face), jnp.asarray(u),
                          jnp.asarray(v), seamless=True)
