"""Mean squared distance to the 3 nearest neighbors (Gaussian scale init).

Behavioral reference: simple-knn's `distCUDA2`
(/root/reference/submodules/simple-knn/simple_knn.cu:44-204): Morton-sorted
1024-point boxes with AABB rejection, producing for each point the MEAN of the
SQUARED distances to its 3 nearest neighbors (used once at init,
scene/gaussian_model.py:190-191).

TPU-native design: this is a one-shot host-side computation whose speed is
uncritical, so the default path is an exact scipy cKDTree query on CPU (no
approximation, unlike the reference's box heuristic). A pure-JAX exact
O(N^2) variant is provided for small problems / tests.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mean_sq_dist_to_3nn(points: np.ndarray) -> np.ndarray:
    """(N,3) -> (N,) mean of squared distances to the 3 nearest neighbors."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    if n <= 3:
        # Degenerate tiny clouds: use all available neighbors.
        d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        k = max(1, n - 1)
        part = np.sort(d2, axis=1)[:, :k]
        return part.mean(axis=1)
    from scipy.spatial import cKDTree
    tree = cKDTree(points)
    d, _ = tree.query(points, k=4)  # self + 3 NN
    return (d[:, 1:] ** 2).mean(axis=1).astype(np.float32)


def mean_sq_dist_to_3nn_jax(points: jnp.ndarray) -> jnp.ndarray:
    """Exact O(N^2) JAX version (small N only; useful under jit/tests)."""
    d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    n = points.shape[0]
    d2 = d2 + jnp.eye(n, dtype=points.dtype) * jnp.inf
    nearest3 = jnp.sort(d2, axis=1)[:, :3]
    return jnp.mean(nearest3, axis=1)
