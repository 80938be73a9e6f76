"""Scene state: camera stacks, GT pixel buffers, neighbor graph, point cloud.

Behavioral reference: /root/reference/scene/__init__.py:32-215 — dataset
sniffing, cameras_extent, per-camera nearest/nearby neighbor indices (the
PGSR multi-view graph), luma gray images at NCC scale, canonical rays, and
model snapshot save/load.

TPU-first design: instead of a Python list of per-view GPU tensors, every
view's data lives in STACKED device-resident arrays — a batched Camera pytree
(leading axis V) plus (V, C, H, W) image buffers — so a training step can
`jax.lax.dynamic_index` its view inside jit and neighbor renders need no
host round-trip. Neighbor indices are fixed-width int32 tables padded with
self-index (sampling a pad = rendering the reference view, a no-op loss).
"""
from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gs2m_tpu.core.camera import Camera
from gs2m_tpu.core.config import ModelConfig, OptimConfig
from gs2m_tpu.data.readers import (SceneInfo, detect_and_read_scene, focal2fov,
                                   load_view_arrays, pick_resolution)


def stack_cameras(cams: list[Camera]) -> Camera:
    """Stack per-view Camera pytrees into one batched Camera (array leaves get
    a leading V axis; static width/height must agree)."""
    assert len({(c.width, c.height) for c in cams}) == 1, \
        "all views must share one resolution for the stacked camera"
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *cams)


def index_camera(batch: Camera, i) -> Camera:
    """Dynamic-index view i out of a stacked Camera (jit-safe)."""
    return jax.tree.map(lambda x: x[i], batch)


def camera_to_json(idx: int, info) -> dict:
    w2c = np.eye(4)
    w2c[:3, :3] = info.R.T
    w2c[:3, 3] = info.T
    c2w = np.linalg.inv(w2c)
    return {
        "id": idx,
        "img_name": info.image_name,
        "width": info.width,
        "height": info.height,
        "position": c2w[:3, 3].tolist(),
        "rotation": [r.tolist() for r in c2w[:3, :3]],
        "fx": info.fx,
        "fy": info.fy,
    }


def build_neighbor_tables(cam_infos, opt: OptimConfig):
    """Per-view nearest (multi-view loss) and nearby (roughness loss) index
    tables (scene/__init__.py:150-191). Returns two (V, K) int32 arrays padded
    with the view's own index, plus (V, K) bool validity masks."""
    V = len(cam_infos)
    centers = np.stack([-(c.R @ c.T) for c in cam_infos], 0)
    # Optical axis = 3rd column of the (transposed-w2c) rotation.
    rays = np.stack([c.R[:, 2] for c in cam_infos], 0)
    rays = rays / (np.linalg.norm(rays, axis=-1, keepdims=True) + 1e-12)
    dists = np.linalg.norm(centers[:, None] - centers[None], axis=-1)
    cosang = np.clip((rays[:, None] * rays[None]).sum(-1), -1.0, 1.0)
    angles = np.arccos(cosang) * 180.0 / 3.14159

    def make_table(k, select):
        table = np.tile(np.arange(V, dtype=np.int32)[:, None], (1, k))
        mask = np.zeros((V, k), bool)
        for i in range(V):
            order = np.lexsort((angles[i], dists[i]))
            chosen = select(order, angles[i][order], dists[i][order])
            m = min(len(chosen), k)
            table[i, :m] = chosen[:m]
            mask[i, :m] = True
        return table, mask

    def nearest_select(order, a, d):
        keep = (a <= opt.multi_view_max_angle) & (d > opt.multi_view_min_dist) \
               & (d < opt.multi_view_max_dist)
        return order[keep][:opt.multi_view_num]

    def nearby_select(order, a, d):
        keep = ((a <= opt.nearby_cam_max_angle) & (a >= opt.nearby_cam_min_angle)
                & (d >= opt.nearby_cam_min_dist) & (d <= opt.nearby_cam_max_dist))
        idx = order[keep]
        n = min(opt.nearby_cam_num, len(idx))
        if n == 0:
            return idx[:0]
        pos = np.round(np.linspace(0, len(idx) - 1, n)).astype(int)
        return idx[pos]

    nearest, nearest_mask = make_table(opt.multi_view_num, nearest_select)
    nearby, nearby_mask = make_table(opt.nearby_cam_num, nearby_select)
    return nearest, nearest_mask, nearby, nearby_mask


class Scene:
    """Loads a dataset and owns the stacked device-side view buffers."""

    def __init__(self, model_cfg: ModelConfig, opt: OptimConfig | None = None,
                 resolution_scale: float = 1.0, shuffle: bool = True,
                 load_images: bool = True, scene_info: SceneInfo | None = None):
        self.model_cfg = model_cfg
        info = scene_info or detect_and_read_scene(
            model_cfg.source_path, model_cfg.images, model_cfg.masks,
            model_cfg.depths, model_cfg.eval)
        self.info = info
        self.cameras_extent = info.radius

        if shuffle:
            rng = np.random.default_rng(0)
            rng.shuffle(info.train_cameras)
            rng.shuffle(info.test_cameras)

        if model_cfg.model_path:
            os.makedirs(model_cfg.model_path, exist_ok=True)
            cams_json = [camera_to_json(i, c) for i, c in
                         enumerate(info.test_cameras + info.train_cameras)]
            with open(os.path.join(model_cfg.model_path, "cameras.json"), "w") as f:
                json.dump(cams_json, f)
            # Initial point cloud copy (scene/__init__.py:69-71).
            if info.ply_path and os.path.exists(info.ply_path):
                import shutil
                shutil.copyfile(info.ply_path,
                                os.path.join(model_cfg.model_path, "input.ply"))

        self.resolution_scale = resolution_scale
        self.train_camera_infos = info.train_cameras
        self.test_camera_infos = info.test_cameras
        self.train_cameras = [self._make_camera(c) for c in info.train_cameras]
        self.test_cameras = [self._make_camera(c) for c in info.test_cameras]

        self.gt_images = None
        self.alpha_masks = None
        self.gray_images = None
        self.ncc_scale = 1.0
        if load_images and self.train_cameras:
            self._load_train_images()

        if opt is not None and self.train_cameras:
            self.training_setup(opt)

    # --- construction helpers ------------------------------------------------

    def _resolution_for(self, ci) -> tuple[int, int]:
        return pick_resolution(ci.width, ci.height, self.model_cfg.resolution,
                               self.resolution_scale)

    def _make_camera(self, ci) -> Camera:
        w, h = self._resolution_for(ci)
        return Camera.create(ci.R, ci.T, fovx=focal2fov(ci.fx, ci.width),
                             fovy=focal2fov(ci.fy, ci.height), width=w, height=h)

    def _load_train_images(self, subset=None):
        """Fill the (V, C, H, W) GT stacks. With `subset` (multi-host DP:
        parallel/dp.py partition_views + host_view_closure), only those view
        indices are READ from disk; other rows stay zero. The device arrays
        keep the full V extent — indices stay global and the replicated-array
        contract holds shape-wise — but a host only pays decode/IO for its
        own views (rows it never indexes are never read by its devices)."""
        keep = None if subset is None else set(int(v) for v in subset)
        rgbs, alphas = [], []
        for i, (ci, cam) in enumerate(zip(self.train_camera_infos,
                                          self.train_cameras)):
            if keep is not None and i not in keep:
                rgbs.append(np.zeros((3, cam.height, cam.width), np.float32))
                alphas.append(np.ones((1, cam.height, cam.width), np.float32))
                continue
            rgb, alpha = load_view_arrays(ci, (cam.width, cam.height),
                                          self.model_cfg.mask_gt)
            if self.model_cfg.white_background and alpha is not None:
                rgb = rgb * alpha + (1.0 - alpha)
            rgbs.append(rgb)
            alphas.append(alpha if alpha is not None
                          else np.ones_like(rgb[:1]))
        self.gt_images = jnp.asarray(np.stack(rgbs, 0))       # (V, 3, H, W)
        self.alpha_masks = jnp.asarray(np.stack(alphas, 0))   # (V, 1, H, W)

    def load_train_image_subset(self, subset):
        """Multi-host path: load GT images for `subset` only (after
        training_setup built the neighbor tables), then derive gray images."""
        self._load_train_images(subset=subset)
        self._populate_gray_images(subset=subset)

    def load_test_images(self) -> list:
        """GT images for the held-out split, loaded lazily on first use
        (training_report evaluates the full test split,
        utils/training_utils.py:59-168). Kept as host numpy — the test split
        is touched a handful of times per run, not worth pinning in HBM."""
        if getattr(self, "_test_images", None) is None:
            imgs = []
            for ci, cam in zip(self.test_camera_infos, self.test_cameras):
                rgb, alpha = load_view_arrays(ci, (cam.width, cam.height),
                                              self.model_cfg.mask_gt)
                if self.model_cfg.white_background and alpha is not None:
                    rgb = rgb * alpha + (1.0 - alpha)
                imgs.append(rgb)
            self._test_images = imgs
        return self._test_images

    # --- training-time state (scene/__init__.py:123-204) ----------------------

    def training_setup(self, opt: OptimConfig):
        (self.nearest_table, self.nearest_mask,
         self.nearby_table, self.nearby_mask) = build_neighbor_tables(
            self.train_camera_infos, opt)
        self.nearest_table = jnp.asarray(self.nearest_table)
        self.nearest_mask = jnp.asarray(self.nearest_mask)
        self.nearby_table = jnp.asarray(self.nearby_table)
        self.nearby_mask = jnp.asarray(self.nearby_mask)

        if opt.multi_view_ncc_scale > 0:
            self.ncc_scale = opt.multi_view_ncc_scale
        elif self.model_cfg.resolution in (1, 2, 4, 8):
            self.ncc_scale = 1.0 / self.model_cfg.resolution
        else:
            self.ncc_scale = 1.0

        if self.gt_images is not None:
            self._populate_gray_images()

        self.camera_stack = stack_cameras(self.train_cameras)

    def _populate_gray_images(self, subset=None):
        """Per-view luma at NCC scale (scene/__init__.py:193-204). With
        `subset` (multi-host), only those views are re-read at NCC scale."""
        keep = None if subset is None else set(int(v) for v in subset)
        if self.ncc_scale == 1.0:
            rgb = self.gt_images
        else:
            rgbs = []
            for i, (ci, cam) in enumerate(zip(self.train_camera_infos,
                                              self.train_cameras)):
                res = (int(cam.width / self.ncc_scale),
                       int(cam.height / self.ncc_scale))
                if keep is not None and i not in keep:
                    rgbs.append(np.zeros((3, res[1], res[0]), np.float32))
                    continue
                r, a = load_view_arrays(ci, res, self.model_cfg.mask_gt)
                if self.model_cfg.white_background and a is not None:
                    r = r * a + (1.0 - a)
                rgbs.append(r)
            rgb = jnp.asarray(np.stack(rgbs, 0))
        self.gray_images = (rgb[:, 0:1] * 0.299 + rgb[:, 1:2] * 0.587
                            + rgb[:, 2:3] * 0.114)  # (V, 1, H', W')

    # --- snapshot I/O (scene/__init__.py:108-115) ------------------------------

    def save_dir(self, iteration: int) -> str:
        d = os.path.join(self.model_cfg.model_path, "point_cloud",
                         f"iteration_{iteration}")
        os.makedirs(d, exist_ok=True)
        return d


def search_max_iteration(point_cloud_dir: str) -> int:
    """Largest saved iteration_* folder (utils/system_utils.py behavior)."""
    subs = [p.name for p in Path(point_cloud_dir).iterdir() if p.is_dir()]
    iters = [int(s.split("_")[-1]) for s in subs if s.startswith("iteration_")]
    if not iters:
        raise FileNotFoundError(f"no iteration_* under {point_cloud_dir}")
    return max(iters)
