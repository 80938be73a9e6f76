"""Gaussian point-cloud state: fixed-capacity padded pytree with alive mask.

Behavioral reference: /root/reference/scene/gaussian_model.py:26-208
(parameter set, activations, normals-from-shortest-axis, initialisation).

TPU-first design: XLA requires static shapes, so instead of growing/shrinking
tensors (the reference's optimizer-state surgery, gaussian_model.py:372-457)
we keep every array at a fixed capacity `C` with a boolean `alive` mask.
Densification mutates rows in place and flips mask bits; capacity only grows
at host-side re-jit boundaries (powers of two, bounding recompiles).

Raw (pre-activation) parameters, as in the reference:
  xyz (C,3) | features_dc (C,1,3) | features_rest (C,K-1,3) | scaling (C,3 log)
  rotation (C,4 quat) | opacity (C,1 logit) | albedo (C,3 logit)
  roughness (C,1 logit) | metallic (C,1 logit)
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gs2m_tpu.core import sh as shlib


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def quat_to_rotmat_elems(q: jnp.ndarray) -> tuple:
    """(…,4) normalized quaternion (r,x,y,z) -> the 9 rotation-matrix entries
    as a row-major tuple of (…,) arrays. Elementwise on purpose: batched
    (C,3,3) matmuls hit TPU's worst layout (T(4,128) dot_generals cost ~10ms
    per pass at C=500k); scalar expansion fuses into one VPU pass.

    Same element layout as the reference's build_rotation
    (utils/general_utils.py) so covariances/normals match bit-for-bit.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(…,4) normalized quaternion (r,x,y,z) -> (…,3,3) rotation matrix."""
    e = quat_to_rotmat_elems(q)
    return jnp.stack([jnp.stack(e[0:3], -1), jnp.stack(e[3:6], -1),
                      jnp.stack(e[6:9], -1)], axis=-2)


@partial(jax.tree_util.register_dataclass,
         data_fields=["xyz", "features_dc", "features_rest", "scaling", "rotation",
                      "opacity", "albedo", "roughness", "metallic", "alive"],
         meta_fields=["max_sh_degree"])
@dataclasses.dataclass(frozen=True)
class Gaussians:
    xyz: jnp.ndarray            # (C, 3)
    features_dc: jnp.ndarray    # (C, 1, 3)
    features_rest: jnp.ndarray  # (C, K-1, 3)
    scaling: jnp.ndarray        # (C, 3) log-scales
    rotation: jnp.ndarray       # (C, 4) unnormalized quaternion
    opacity: jnp.ndarray        # (C, 1) logit
    albedo: jnp.ndarray         # (C, 3) logit
    roughness: jnp.ndarray      # (C, 1) logit
    metallic: jnp.ndarray       # (C, 1) logit
    alive: jnp.ndarray          # (C,) bool — padded slots are False
    max_sh_degree: int

    # --- activations (gaussian_model.py:27-44) ------------------------------

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive)

    @property
    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    @property
    def get_rotation(self) -> jnp.ndarray:
        q = self.rotation
        return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-20)

    @property
    def get_opacity(self) -> jnp.ndarray:
        # Dead slots get opacity exactly 0 so they never rasterize.
        return jax.nn.sigmoid(self.opacity) * self.alive[:, None]

    @property
    def get_albedo(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.albedo)

    @property
    def get_roughness(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.roughness)

    @property
    def get_metallic(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.metallic)

    @property
    def get_features(self) -> jnp.ndarray:
        """(C, K, 3) concatenated SH coefficients."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_covariance(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        """(C, 6) upper-triangular world covariance: Sigma = L L^T, L = R S
        (gaussian_model.py:28-32 / forward.cu:109-142). Fully elementwise —
        sigma_ij = sum_k s_k^2 R_ik R_jk — to stay on the VPU (no batched
        3x3 dot_generals)."""
        e = quat_to_rotmat_elems(self.get_rotation)
        s = self.get_scaling * scaling_modifier
        s0, s1, s2 = s[:, 0] ** 2, s[:, 1] ** 2, s[:, 2] ** 2

        def sig(i, j):
            return (s0 * e[3 * i] * e[3 * j] + s1 * e[3 * i + 1] * e[3 * j + 1]
                    + s2 * e[3 * i + 2] * e[3 * j + 2])

        return jnp.stack([sig(0, 0), sig(0, 1), sig(0, 2),
                          sig(1, 1), sig(1, 2), sig(2, 2)], axis=-1)

    def get_normals(self, cam_center: jnp.ndarray) -> jnp.ndarray:
        """(C, 3) world normals: the rotation column of the shortest axis,
        flipped toward the camera (gaussian_model.py:146-160). The column
        select is a where-chain matching argmin's first-min tie-break."""
        scales = self.get_scaling
        e = quat_to_rotmat_elems(self.get_rotation)
        s0, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]
        m0 = (s0 <= s1) & (s0 <= s2)
        m1 = ~m0 & (s1 <= s2)

        def col(i):
            return jnp.where(m0, e[3 * i], jnp.where(m1, e[3 * i + 1], e[3 * i + 2]))

        normals = jnp.stack([col(0), col(1), col(2)], axis=-1)
        view_dirs = cam_center[None, :] - self.xyz
        flip = jnp.sum(normals * view_dirs, axis=-1, keepdims=True) < 0.0
        normals = jnp.where(flip, -normals, normals)
        return normals / jnp.sqrt(jnp.sum(normals * normals, axis=-1,
                                          keepdims=True) + 1e-20)

    # --- construction --------------------------------------------------------

    @staticmethod
    def create(points: np.ndarray, colors: np.ndarray, max_sh_degree: int,
               capacity: int, mean_sq_dist: np.ndarray | None = None) -> "Gaussians":
        """Initialize from an SfM/random point cloud (gaussian_model.py:178-208):
        SH DC from RGB, log-scales from sqrt(mean 3-NN sq-distance), identity
        rotations, opacity 0.1, white materials; padded to `capacity`."""
        n = points.shape[0]
        if capacity < n:
            raise ValueError(f"capacity {capacity} < number of points {n}")
        K = shlib.num_sh_coeffs(max_sh_degree)

        if mean_sq_dist is None:
            from gs2m_tpu.ops.knn import mean_sq_dist_to_3nn
            mean_sq_dist = np.asarray(mean_sq_dist_to_3nn(np.asarray(points, np.float32)))
        dist2 = np.maximum(np.asarray(mean_sq_dist, np.float32), 1e-7)
        scales = np.repeat(np.log(np.sqrt(dist2))[:, None], 3, axis=1)

        def pad(a, fill=0.0):
            out = np.full((capacity,) + a.shape[1:], fill, dtype=np.float32)
            out[:n] = a
            return jnp.asarray(out)

        rots = np.zeros((n, 4), np.float32)
        rots[:, 0] = 1.0
        dc = np.asarray(shlib.rgb_to_sh_dc(np.asarray(colors, np.float32)))[:, None, :]

        alive = np.zeros((capacity,), bool)
        alive[:n] = True
        # Padded rotation rows stay (1,0,0,0) so normalization is well-defined.
        rot_pad = np.zeros((capacity, 4), np.float32)
        rot_pad[:, 0] = 1.0
        rot_pad[:n] = rots

        return Gaussians(
            xyz=pad(np.asarray(points, np.float32)),
            features_dc=pad(dc),
            features_rest=pad(np.zeros((n, K - 1, 3), np.float32)),
            scaling=pad(scales, fill=-10.0),
            rotation=jnp.asarray(rot_pad),
            opacity=pad(np.full((n, 1), float(inverse_sigmoid(jnp.float32(0.1))), np.float32),
                        fill=-12.0),
            # Raw material logits start at 1.0 (sigmoid -> 0.73), matching
            # gaussian_model.py:196-198 where the raw params are torch.ones.
            albedo=pad(np.ones((n, 3), np.float32)),
            roughness=pad(np.ones((n, 1), np.float32)),
            metallic=pad(np.ones((n, 1), np.float32)),
            alive=jnp.asarray(alive),
            max_sh_degree=max_sh_degree,
        )

    @staticmethod
    def from_raw(raw: dict, max_sh_degree: int,
                 capacity: int | None = None) -> "Gaussians":
        """Build from raw (pre-activation) numpy arrays, e.g. a loaded PLY
        snapshot (data/ply.py load_gaussian_ply), padded to `capacity`."""
        n = raw["xyz"].shape[0]
        cap = capacity or n
        if cap < n:
            raise ValueError(f"capacity {cap} < {n}")

        def pad(a):
            out = np.zeros((cap,) + a.shape[1:], np.float32)
            out[:n] = a
            return jnp.asarray(out)

        rot = np.zeros((cap, 4), np.float32)
        rot[:, 0] = 1.0
        rot[:n] = raw["rotation"]
        alive = np.zeros((cap,), bool)
        alive[:n] = True
        opacity = np.full((cap, 1), -12.0, np.float32)
        opacity[:n] = raw["opacity"]
        scaling = np.full((cap, 3), -10.0, np.float32)
        scaling[:n] = raw["scaling"]
        return Gaussians(
            xyz=pad(raw["xyz"]), features_dc=pad(raw["f_dc"]),
            features_rest=pad(raw["f_rest"]), scaling=jnp.asarray(scaling),
            rotation=jnp.asarray(rot), opacity=jnp.asarray(opacity),
            albedo=pad(raw["albedo"]), roughness=pad(raw["roughness"]),
            metallic=pad(raw["metallic"]), alive=jnp.asarray(alive),
            max_sh_degree=max_sh_degree)

    def params_dict(self) -> dict:
        """The optimizable leaves, keyed like the reference's param groups
        (gaussian_model.py:230-240)."""
        return {
            "xyz": self.xyz,
            "f_dc": self.features_dc,
            "f_rest": self.features_rest,
            "opacity": self.opacity,
            "scaling": self.scaling,
            "rotation": self.rotation,
            "albedo": self.albedo,
            "roughness": self.roughness,
            "metallic": self.metallic,
        }

    def with_params(self, params: dict) -> "Gaussians":
        return dataclasses.replace(
            self,
            xyz=params["xyz"], features_dc=params["f_dc"], features_rest=params["f_rest"],
            opacity=params["opacity"], scaling=params["scaling"], rotation=params["rotation"],
            albedo=params["albedo"], roughness=params["roughness"], metallic=params["metallic"],
        )
