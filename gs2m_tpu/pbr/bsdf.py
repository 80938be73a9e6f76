"""Point-light BSDF op library + HDR image losses (render-utils parity).

Behavioral reference: /root/reference/submodules/render-utils/render_utils/
bsdf.py:1-151 and loss.py:1-41 — the pure-PyTorch twins of the CUDA ops in
c_src/bsdf.cu and loss.cu (Lambert/Frostbite diffuse, Fresnel-Schlick,
GGX NDF/lambda/correlated-Smith masking, full pbr_bsdf with the kd/ks
metallic split, shading-normal preparation with two-sided bending and
tangent-space perturbation; SMAPE/RelMSE/MSE/L1 with the log-sRGB
tonemapper). These ops are not on GS-2M's train path (only the cubemap
prefilters are — pbr/light.py:10) but belong to the framework's op surface.

Pure jnp, fully differentiable — on TPU the "CUDA vs Python twin" split
collapses into one implementation, and XLA fuses the pointwise chains.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

NORMAL_THRESHOLD = 0.1
SPECULAR_EPSILON = 1e-4


def dot(x, y):
    return jnp.sum(x * y, axis=-1, keepdims=True)


def reflect(x, n):
    return 2.0 * dot(x, n) * n - x


def safe_normalize(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


# --- shading-normal preparation (bsdf.py:29-52) --------------------------------

def bend_normal(view_vec, smooth_nrm, geom_nrm, two_sided_shading: bool):
    if two_sided_shading:
        front = dot(geom_nrm, view_vec) > 0
        smooth_nrm = jnp.where(front, smooth_nrm, -smooth_nrm)
        geom_nrm = jnp.where(front, geom_nrm, -geom_nrm)
    t = jnp.clip(dot(view_vec, smooth_nrm) / NORMAL_THRESHOLD, 0.0, 1.0)
    return geom_nrm + (smooth_nrm - geom_nrm) * t


def perturb_normal(perturbed_nrm, smooth_nrm, smooth_tng, opengl: bool):
    bitang = safe_normalize(jnp.cross(smooth_tng, smooth_nrm))
    sign = -1.0 if opengl else 1.0
    shading = (smooth_tng * perturbed_nrm[..., 0:1]
               + sign * bitang * perturbed_nrm[..., 1:2]
               + smooth_nrm * jnp.clip(perturbed_nrm[..., 2:3], 0.0, None))
    return safe_normalize(shading)


def prepare_shading_normal(pos, view_pos, perturbed_nrm, smooth_nrm,
                           smooth_tng, geom_nrm, two_sided_shading: bool,
                           opengl: bool):
    smooth_nrm = safe_normalize(smooth_nrm)
    smooth_tng = safe_normalize(smooth_tng)
    view_vec = safe_normalize(view_pos - pos)
    shading = perturb_normal(perturbed_nrm, smooth_nrm, smooth_tng, opengl)
    return bend_normal(view_vec, shading, geom_nrm, two_sided_shading)


# --- diffuse terms (bsdf.py:54-82) ----------------------------------------------

def bsdf_lambert(nrm, wi):
    return jnp.clip(dot(nrm, wi), 0.0, None) / math.pi


def bsdf_fresnel_shlick(f0, f90, cos_theta):
    c = jnp.clip(cos_theta, SPECULAR_EPSILON, 1.0 - SPECULAR_EPSILON)
    return f0 + (f90 - f0) * (1.0 - c) ** 5.0


def bsdf_frostbite(nrm, wi, wo, linear_roughness):
    wi_n = dot(wi, nrm)
    wo_n = dot(wo, nrm)
    h = safe_normalize(wo + wi)
    wi_h = dot(wi, h)
    energy_bias = 0.5 * linear_roughness
    energy_factor = 1.0 - (0.51 / 1.51) * linear_roughness
    f90 = energy_bias + 2.0 * wi_h * wi_h * linear_roughness
    res = (bsdf_fresnel_shlick(1.0, f90, wi_n)
           * bsdf_fresnel_shlick(1.0, f90, wo_n) * energy_factor)
    return jnp.where((wi_n > 0.0) & (wo_n > 0.0), res, 0.0)


def bsdf_phong(nrm, wo, wi, N):
    dp_r = jnp.clip(dot(reflect(wo, nrm), wi), 0.0, 1.0)
    dp_l = jnp.clip(dot(nrm, wi), 0.0, 1.0)
    return (dp_r ** N) * dp_l * (N + 2) / (2 * math.pi)


# --- GGX specular (bsdf.py:92-131) ----------------------------------------------

def bsdf_ndf_ggx(alpha_sqr, cos_theta):
    c = jnp.clip(cos_theta, SPECULAR_EPSILON, 1.0 - SPECULAR_EPSILON)
    d = (c * alpha_sqr - c) * c + 1.0
    return alpha_sqr / (d * d * math.pi)


def bsdf_lambda_ggx(alpha_sqr, cos_theta):
    c = jnp.clip(cos_theta, SPECULAR_EPSILON, 1.0 - SPECULAR_EPSILON)
    c2 = c * c
    tan2 = (1.0 - c2) / c2
    return 0.5 * (jnp.sqrt(1.0 + alpha_sqr * tan2) - 1.0)


def bsdf_masking_smith_ggx_correlated(alpha_sqr, cos_i, cos_o):
    return 1.0 / (1.0 + bsdf_lambda_ggx(alpha_sqr, cos_i)
                  + bsdf_lambda_ggx(alpha_sqr, cos_o))


def bsdf_pbr_specular(col, nrm, wo, wi, alpha, min_roughness: float = 0.08):
    a = jnp.clip(alpha, min_roughness * min_roughness, 1.0)
    alpha_sqr = a * a
    h = safe_normalize(wo + wi)
    wo_n = dot(wo, nrm)
    wi_n = dot(wi, nrm)
    wo_h = dot(wo, h)
    n_h = dot(nrm, h)
    D = bsdf_ndf_ggx(alpha_sqr, n_h)
    G = bsdf_masking_smith_ggx_correlated(alpha_sqr, wo_n, wi_n)
    F = bsdf_fresnel_shlick(col, 1.0, wo_h)
    w = F * D * G * 0.25 / jnp.clip(wo_n, SPECULAR_EPSILON, None)
    front = (wo_n > SPECULAR_EPSILON) & (wi_n > SPECULAR_EPSILON)
    return jnp.where(front, w, 0.0)


def bsdf_pbr(kd, arm, pos, nrm, view_pos, light_pos,
             min_roughness: float = 0.08, bsdf: int = 0):
    """Full point-light PBR (bsdf.py:133-151): arm = (spec_str, rough, metal);
    bsdf 0 = Lambert diffuse, 1 = Frostbite."""
    wo = safe_normalize(view_pos - pos)
    wi = safe_normalize(light_pos - pos)
    spec_str = arm[..., 0:1]
    roughness = arm[..., 1:2]
    metallic = arm[..., 2:3]
    ks = (0.04 * (1.0 - metallic) + kd * metallic) * (1.0 - spec_str)
    kd = kd * (1.0 - metallic)
    if bsdf == 0:
        diffuse = kd * bsdf_lambert(nrm, wi)
    else:
        diffuse = kd * bsdf_frostbite(nrm, wi, wo, roughness)
    specular = bsdf_pbr_specular(ks, nrm, wo, wi, roughness * roughness,
                                 min_roughness=min_roughness)
    return diffuse + specular


# --- point/vector transforms (render_utils/ops.py mesh ops) ---------------------

def xfm_points(points, matrix):
    """(..., N, 3) points through a (4, 4) row-vector matrix -> (..., N, 4)."""
    ones = jnp.ones_like(points[..., :1])
    return jnp.concatenate([points, ones], -1) @ jnp.swapaxes(matrix, -1, -2)


def xfm_vectors(vectors, matrix):
    return vectors @ jnp.swapaxes(matrix[..., :3, :3], -1, -2)


# --- HDR image losses (loss.py:15-41) --------------------------------------------

def _tonemap_srgb(f):
    return jnp.where(f > 0.0031308,
                     jnp.clip(f, 0.0031308, None) ** (1.0 / 2.4) * 1.055 - 0.055,
                     12.92 * f)


def smape(img, target, eps: float = 0.01):
    return jnp.mean(jnp.abs(img - target)
                    / (jnp.abs(img) + jnp.abs(target) + eps))


def relmse(img, target, eps: float = 0.1):
    return jnp.mean((img - target) ** 2 / (img * img + target * target + eps))


def image_loss(img, target, loss: str = "l1", tonemapper: str = "none"):
    if tonemapper == "log_srgb":
        img = _tonemap_srgb(jnp.log(jnp.clip(img, 0.0, 65535.0) + 1.0))
        target = _tonemap_srgb(jnp.log(jnp.clip(target, 0.0, 65535.0) + 1.0))
    if loss == "mse":
        return jnp.mean((img - target) ** 2)
    if loss == "smape":
        return smape(img, target)
    if loss == "relmse":
        return relmse(img, target)
    return jnp.mean(jnp.abs(img - target))
