"""Differentiable SSIM with a fused backward, TPU-native.

Behavioral reference: fused-ssim (/root/reference/submodules/fused-ssim/
ssim.cu:9-319 and fused_ssim/__init__.py:8-41): 11x11 separable Gaussian
window (sigma 1.5), C1 = 0.01^2, C2 = 0.03^2, "same" padding, returning the
mean SSIM; its backward re-convolves stored per-pixel partials with the same
Gaussian window instead of re-deriving through autograd.

TPU-first design: the separable 11x11 blur maps onto two XLA convolutions
executed on the MXU — that IS the fused kernel here (XLA fuses the
elementwise SSIM-map math into the conv epilogue). The custom_vjp implements
the same stored-partials trick (one extra blur pass in backward), with the
gradient flowing to img1 only, matching fused-ssim's train mode.
The hand-derived backward is validated against jax.grad of `ssim_reference`
in tests (the golden-twin pattern of fused-ssim/tests/test.py:77-91).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

C1 = 0.01 ** 2
C2 = 0.03 ** 2


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


_WIN = _gaussian_window()


def _blur(x: jnp.ndarray) -> jnp.ndarray:
    """Separable 11x11 Gaussian blur, 'same' zero padding. x: (B, C, H, W)."""
    w = jnp.asarray(_WIN, x.dtype)
    kh = w.reshape(1, 1, 11, 1)
    kw = w.reshape(1, 1, 1, 11)
    b, c, h, wd = x.shape
    xc = x.reshape(b * c, 1, h, wd)
    # precision=HIGHEST: TPU's default bf16 conv makes blur(x^2) - mu^2 go
    # negative past C2, blowing SSIM outside [-1, 1] and NaN-ing gradients.
    hi = jax.lax.Precision.HIGHEST
    y = jax.lax.conv_general_dilated(xc, kh, (1, 1), [(5, 5), (0, 0)],
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"),
                                     precision=hi)
    y = jax.lax.conv_general_dilated(y, kw, (1, 1), [(0, 0), (5, 5)],
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"),
                                     precision=hi)
    return y.reshape(b, c, h, wd)


def _ssim_terms(img1, img2):
    mu1 = _blur(img1)
    mu2 = _blur(img2)
    sigma1_sq = _blur(img1 * img1) - mu1 * mu1
    sigma2_sq = _blur(img2 * img2) - mu2 * mu2
    sigma12 = _blur(img1 * img2) - mu1 * mu2
    A = 2.0 * mu1 * mu2 + C1
    B = 2.0 * sigma12 + C2
    C = mu1 * mu1 + mu2 * mu2 + C1
    D = sigma1_sq + sigma2_sq + C2
    m = (A * B) / (C * D)
    return m, mu1, mu2, A, B, C, D


@jax.custom_vjp
def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) per-pixel SSIM map; gradient flows to img1 only."""
    return _ssim_terms(img1, img2)[0]


def _ssim_fwd(img1, img2):
    m, mu1, mu2, A, B, C, D = _ssim_terms(img1, img2)
    # Per-pixel partials of m wrt (mu1, s11, s12) where s11 = blur(img1^2),
    # s12 = blur(img1*img2), sigma1_sq = s11 - mu1^2, sigma12 = s12 - mu1*mu2:
    #   dm/ds11 = -m/D
    #   dm/ds12 = 2A/(CD)
    #   dm/dmu1 = 2 mu2 B/(CD) - 2 mu1 m/C + 2 mu1 m/D - 2 mu2 A/(CD)
    inv_CD = 1.0 / (C * D)
    g_mu1 = 2.0 * mu2 * B * inv_CD - 2.0 * mu1 * m / C + 2.0 * mu1 * m / D - 2.0 * mu2 * A * inv_CD
    g_s11 = -m / D
    g_s12 = 2.0 * A * inv_CD
    return m, (img1, img2, g_mu1, g_s11, g_s12)


def _ssim_bwd(res, g):
    img1, img2, g_mu1, g_s11, g_s12 = res
    # The Gaussian window is symmetric, so the blur is self-adjoint:
    # dL/dimg1 = blur(g*g_mu1) + 2*img1*blur(g*g_s11) + img2*blur(g*g_s12).
    dimg1 = _blur(g * g_mu1) + 2.0 * img1 * _blur(g * g_s11) + img2 * _blur(g * g_s12)
    return dimg1, jnp.zeros_like(img2)


ssim_map.defvjp(_ssim_fwd, _ssim_bwd)


def fused_ssim(img1: jnp.ndarray, img2: jnp.ndarray,
               padding: str = "same") -> jnp.ndarray:
    """Mean SSIM over a (B, C, H, W) batch; grads to img1 only.

    padding="valid" averages only pixels whose 11x11 window lies fully
    inside the image (fused_ssim/__init__.py:34-41 crops 5 px per side) —
    identical to valid-window SSIM since interior windows never touch the
    zero padding."""
    m = ssim_map(img1, img2)
    if padding == "valid":
        m = m[:, :, 5:-5, 5:-5]
    elif padding != "same":
        raise ValueError(f"padding must be 'same' or 'valid', got {padding!r}")
    return jnp.mean(m)


def ssim_reference(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Plain autodiff SSIM mean (golden twin; utils/loss_utils.py:30-70)."""
    return jnp.mean(_ssim_terms(img1, img2)[0])
