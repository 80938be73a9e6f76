"""LPIPS perceptual metric (VGG16 backbone), pure JAX.

Behavioral reference: /root/reference/lpipsPyTorch/ (modules/lpips.py,
networks.py, utils.py) — imagenet-normalized input, VGG16 features at the
five pre-pool ReLU stages, channel-unit-normalized activations, learned
1x1 linear heads, spatial mean, summed over stages.

Weight gating: this environment ships no pretrained weights (no torchvision
download, zero egress), so LPIPS is computed ONLY when a weights file is
supplied — a pickle/npz containing torchvision-layout VGG16 conv weights
(`features.N.weight/bias`) plus LPIPS linear heads (`lin{i}.model.1.weight`).
`lpips(..., weights_path=...)` raises a clear error otherwise; the metrics
app reports LPIPS as null in that case (recorded limitation).
"""
from __future__ import annotations

import os
import pickle

import numpy as np

# torchvision VGG16 `features` conv indices per stage (pre-pool ReLU blocks):
# 0,2 | 5,7 | 10,12,14 | 17,19,21 | 24,26,28.
_VGG16_STAGES = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_weights(path: str) -> dict:
    if path.endswith(".npz"):
        return dict(np.load(path))
    with open(path, "rb") as f:
        return {k: np.asarray(v) for k, v in pickle.load(f).items()}


def _conv(x, w, b):
    import jax

    # x (N, C, H, W); w (O, I, 3, 3) torchvision layout.
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return y + b.reshape(1, -1, 1, 1)


def _vgg_stages(x, weights):
    import jax
    import jax.numpy as jnp

    feats = []
    for stage in _VGG16_STAGES:
        for idx in stage:
            w = jnp.asarray(weights[f"features.{idx}.weight"])
            b = jnp.asarray(weights[f"features.{idx}.bias"])
            x = jax.nn.relu(_conv(x, w, b))
        feats.append(x)
        # 2x2 max pool between stages (except after the last).
        if stage is not _VGG16_STAGES[-1]:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    return feats


def lpips(img1, img2, weights_path: str | None = None):
    """img1/img2 (3, H, W) or (N, 3, H, W) in [0, 1]. Returns scalar mean
    LPIPS (lpipsPyTorch/__init__.py:6-18 semantics, vgg backbone)."""
    import jax.numpy as jnp

    weights_path = weights_path or os.environ.get("GS2M_LPIPS_WEIGHTS", "")
    if not weights_path or not os.path.exists(weights_path):
        raise FileNotFoundError(
            "LPIPS requires pretrained VGG16 + linear-head weights; none are "
            "bundled in this environment. Export them once (torchvision "
            "vgg16 features.* + lpips lin heads) to a pickle/npz and pass "
            "weights_path= or set GS2M_LPIPS_WEIGHTS.")
    weights = load_weights(weights_path)

    def prep(x):
        x = jnp.asarray(x)
        if x.ndim == 3:
            x = x[None]
        mean = jnp.asarray(_IMAGENET_MEAN).reshape(1, 3, 1, 1)
        std = jnp.asarray(_IMAGENET_STD).reshape(1, 3, 1, 1)
        return (x - mean) / std

    f1 = _vgg_stages(prep(img1), weights)
    f2 = _vgg_stages(prep(img2), weights)

    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        key = f"lin{i}.model.1.weight"
        if key in weights:
            w = jnp.asarray(weights[key]).reshape(1, -1, 1, 1)
            d = jnp.sum(d * w, axis=1, keepdims=True)
        else:  # uncalibrated fallback: plain channel mean
            d = jnp.mean(d, axis=1, keepdims=True)
        total = total + jnp.mean(d, axis=(1, 2, 3))
    return jnp.mean(total)
