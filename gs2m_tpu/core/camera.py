"""Camera model: pinhole projection, GL-style z in [0,1], row-vector matrices.

Behavioral reference: /root/reference/scene/cameras.py:19-117 and
/root/reference/utils/graphics_utils.py:31-77. Conventions preserved exactly:

* `world_view` is the world-to-camera matrix stored TRANSPOSED so points
  transform as row vectors: ``p_cam = [p, 1] @ world_view`` (matching the
  torch code's ``world_view_transform`` and the CUDA ``transformPoint4x3``
  indexing, auxiliary.h:67-84).
* `full_proj` = world_view @ projection (both transposed), so
  ``p_clip = [p, 1] @ full_proj``.
* Projection matrix maps z to [znear, zfar] -> [0, 1] (graphics_utils.py:51-71).

TPU-first design notes: the camera is a JAX pytree whose array leaves are the
matrices/intrinsics (so a batch of cameras stacks into leading axes for vmap),
while image height/width are static aux data (XLA needs static shapes).
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view_matrix(R: np.ndarray, T: np.ndarray, translate=None, scale: float = 1.0) -> np.ndarray:
    """w2c 4x4 (NOT transposed). R is the transposed w2c rotation (= c2w rotation),
    T the w2c translation — the COLMAP-loader convention (cameras.py:27-28)."""
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = T
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate)
        C2W = np.linalg.inv(Rt)
        cam_center = (C2W[:3, 3] + translate) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """GL-style perspective with z in [0, 1] (graphics_utils.py:51-71)."""
    tan_y = math.tan(fovy / 2.0)
    tan_x = math.tan(fovx / 2.0)
    top = tan_y * znear
    right = tan_x * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


@partial(jax.tree_util.register_dataclass,
         data_fields=["world_view", "full_proj", "cam_center", "fx", "fy", "cx", "cy",
                      "tanfovx", "tanfovy"],
         meta_fields=["width", "height", "znear", "zfar"])
@dataclasses.dataclass(frozen=True)
class Camera:
    """A single view. Array leaves are JAX arrays; width/height are static."""

    world_view: jnp.ndarray   # (4, 4) transposed w2c: p_cam = [p,1] @ world_view
    full_proj: jnp.ndarray    # (4, 4) transposed w2c @ proj
    cam_center: jnp.ndarray   # (3,)
    fx: jnp.ndarray           # scalar focal in pixels
    fy: jnp.ndarray
    cx: jnp.ndarray           # principal point (W/2, H/2 in the reference)
    cy: jnp.ndarray
    tanfovx: jnp.ndarray
    tanfovy: jnp.ndarray
    width: int
    height: int
    znear: float = 0.01
    zfar: float = 100.0

    @staticmethod
    def create(R: np.ndarray, T: np.ndarray, fovx: float, fovy: float,
               width: int, height: int, znear: float = 0.01, zfar: float = 100.0,
               trans=None, scale: float = 1.0) -> "Camera":
        w2c = world_to_view_matrix(np.asarray(R), np.asarray(T), trans, scale)
        world_view = w2c.T
        proj = projection_matrix(znear, zfar, fovx, fovy).T
        full_proj = world_view @ proj
        c2w = np.linalg.inv(w2c)
        return Camera(
            world_view=jnp.asarray(world_view, jnp.float32),
            full_proj=jnp.asarray(full_proj, jnp.float32),
            cam_center=jnp.asarray(c2w[:3, 3], jnp.float32),
            fx=jnp.float32(fov2focal(fovx, width)),
            fy=jnp.float32(fov2focal(fovy, height)),
            cx=jnp.float32(0.5 * width),
            cy=jnp.float32(0.5 * height),
            tanfovx=jnp.float32(math.tan(fovx * 0.5)),
            tanfovy=jnp.float32(math.tan(fovy * 0.5)),
            width=int(width),
            height=int(height),
            znear=float(znear),
            zfar=float(zfar),
        )

    # --- derived quantities -------------------------------------------------

    @property
    def R_w2c(self) -> jnp.ndarray:
        """(3,3) world-to-camera rotation (true orientation, not transposed)."""
        return self.world_view[:3, :3].T

    @property
    def T_w2c(self) -> jnp.ndarray:
        return self.world_view[3, :3]

    def get_rays(self, scale: float = 1.0) -> jnp.ndarray:
        """(H', W', 3) camera-space ray directions through pixel centers
        (cameras.py:72-81 — note the reference's scale quirks are preserved)."""
        h, w = int(self.height / scale), int(self.width / scale)
        u, v = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                            jnp.arange(h, dtype=jnp.float32), indexing="xy")
        rx = (scale * u - self.cx / scale) / self.fx
        ry = (scale * v - self.cy / scale) / self.fy
        return jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)

    def get_canonical_rays(self) -> jnp.ndarray:
        """(H*W, 3) un-normalized pixel-center rays (scene/__init__.py:206-215)."""
        x, y = jnp.meshgrid(jnp.arange(self.width, dtype=jnp.float32),
                            jnp.arange(self.height, dtype=jnp.float32), indexing="xy")
        dirs = jnp.stack([(x.ravel() - self.cx + 0.5) / self.fx,
                          (y.ravel() - self.cy + 0.5) / self.fy,
                          jnp.ones(self.height * self.width, jnp.float32)], axis=-1)
        return dirs

    def get_K(self, scale: float = 1.0) -> jnp.ndarray:
        return jnp.array([[self.fx / scale, 0.0, self.cx / scale],
                          [0.0, self.fy / scale, self.cy / scale],
                          [0.0, 0.0, 1.0]], jnp.float32)

    def get_inv_K(self, scale: float = 1.0) -> jnp.ndarray:
        """Matches the reference's (approximate) inverse-K (cameras.py:98-103)."""
        return jnp.array([[scale / self.fx, 0.0, -self.cx / self.fx],
                          [0.0, scale / self.fy, -self.cy / self.fy],
                          [0.0, 0.0, 1.0]], jnp.float32)

    def world_to_cam(self, pts: jnp.ndarray) -> jnp.ndarray:
        """(N,3) world points -> camera space."""
        return pts @ self.world_view[:3, :3] + self.world_view[3, :3]

    def cam_to_world(self, pts: jnp.ndarray) -> jnp.ndarray:
        R = self.world_view[:3, :3]  # transposed w2c rotation
        return (pts - self.world_view[3, :3]) @ R.T
