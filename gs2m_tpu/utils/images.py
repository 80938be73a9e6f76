"""Image save/convert helpers for the render/metrics apps.

Behavioral reference: /root/reference/utils/image_utils.py:19-134 (psnr,
depth colormap with 1/99-percentile clipping, camera-space normal export
with the Y-up/Z-back flip, RGBA compositing with the alpha mask).
"""
from __future__ import annotations

import numpy as np


def save_image(path, img_chw: np.ndarray) -> None:
    """(C, H, W) float [0, 1] -> PNG."""
    from PIL import Image

    arr = np.asarray(img_chw)
    if arr.ndim == 3:
        arr = arr.transpose(1, 2, 0)
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
    arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def save_rgba(path, img_chw: np.ndarray, alpha_1hw: np.ndarray) -> None:
    """map_to_rgba equivalent (image_utils.py:119-134)."""
    from PIL import Image

    m = (np.clip(np.asarray(img_chw), 0, 1) * 255).astype(np.uint8)
    a = (np.clip(np.asarray(alpha_1hw), 0, 1) * 255).astype(np.uint8)
    if m.shape[0] == 1:
        m = np.repeat(m, 3, axis=0)
    rgba = np.concatenate([m, a], 0).transpose(1, 2, 0)
    Image.fromarray(rgba, "RGBA").save(path)


def save_depth_colormap(path, depth_hw: np.ndarray) -> None:
    """Magma colormap with 1/99-percentile normalization
    (image_utils.py:79-88)."""
    import matplotlib

    d = np.asarray(depth_hw, np.float64)
    lo, hi = np.percentile(d, 1), np.percentile(d, 99)
    normed = np.clip((np.clip(d, lo, hi) - lo) / (hi - lo + 1e-8), 0, 1)
    colored = matplotlib.colormaps["magma"](normed)[..., :3]
    save_image(path, colored.transpose(2, 0, 1))


def convert_normal_for_save(normal_chw: np.ndarray, camera,
                            world_space: bool = False) -> np.ndarray:
    """(3, H, W) world normals -> displayable [0, 1] map; camera space gets
    the Y-up/Z-back flip (image_utils.py:100-116)."""
    n = np.asarray(normal_chw).transpose(1, 2, 0).reshape(-1, 3)
    n = n / (np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
    if not world_space:
        n = n @ np.asarray(camera.world_view[:3, :3])
        n = n * np.array([1.0, -1.0, -1.0])
    n = n * 0.5 + 0.5
    H, W = camera.height, camera.width
    return n.reshape(H, W, 3).transpose(2, 0, 1)


def psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(img1) - np.asarray(img2)) ** 2))
    return float(20.0 * np.log10(1.0 / np.sqrt(max(mse, 1e-12))))
