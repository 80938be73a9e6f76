"""SIBR-viewer TCP bridge: JSON camera in -> raw RGB bytes out.

Behavioral reference: /root/reference/gaussian_renderer/network_gui.py:26-86
— same wire protocol (4-byte little-endian length + JSON request with
resolution/fov/near/far/view matrices, y/z column flips; response is raw
HxWx3 bytes followed by a length-prefixed verify string).
"""
from __future__ import annotations

import json
import socket
import traceback

import numpy as np


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn = None

    def try_connect(self):
        try:
            self.conn, addr = self.listener.accept()
            print(f"\n[>] Viewer connected by {addr}")
            self.conn.settimeout(None)
        except (BlockingIOError, socket.timeout):
            pass

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer closed")
            buf += chunk
        return buf

    def read(self) -> dict:
        n = int.from_bytes(self._read_exact(4), "little")
        return json.loads(self._read_exact(n).decode("utf-8"))

    def send(self, image_bytes: bytes | None, verify: str):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))

    def receive(self):
        """-> (camera kwargs or None, do_training, keep_alive, scaling_modifier)."""
        msg = self.read()
        width, height = msg["resolution_x"], msg["resolution_y"]
        if width == 0 or height == 0:
            return None, None, None, None
        try:
            wv = np.asarray(msg["view_matrix"], np.float32).reshape(4, 4)
            wv[:, 1] *= -1
            wv[:, 2] *= -1
            fp = np.asarray(msg["view_projection_matrix"], np.float32).reshape(4, 4)
            fp[:, 1] *= -1
            cam = dict(width=width, height=height, fovx=msg["fov_x"],
                       fovy=msg["fov_y"], znear=msg["z_near"],
                       zfar=msg["z_far"], world_view=wv, full_proj=fp)
        except Exception as e:
            traceback.print_exc()
            raise e
        return (cam, bool(msg["train"]), bool(msg["keep_alive"]),
                msg["scaling_modifier"])


def camera_from_viewer(cam_kwargs: dict):
    """MiniCam equivalent (scene/cameras.py:106-117): build a Camera pytree
    directly from the viewer's (transposed) matrices."""
    import math

    import jax.numpy as jnp

    from gs2m_tpu.core.camera import Camera

    wv = cam_kwargs["world_view"]
    c2w = np.linalg.inv(wv.T)
    w, h = cam_kwargs["width"], cam_kwargs["height"]
    return Camera(
        world_view=jnp.asarray(wv),
        full_proj=jnp.asarray(cam_kwargs["full_proj"]),
        cam_center=jnp.asarray(c2w[:3, 3].astype(np.float32)),
        fx=jnp.float32(w / (2.0 * math.tan(cam_kwargs["fovx"] * 0.5))),
        fy=jnp.float32(h / (2.0 * math.tan(cam_kwargs["fovy"] * 0.5))),
        cx=jnp.float32(0.5 * w), cy=jnp.float32(0.5 * h),
        tanfovx=jnp.float32(math.tan(cam_kwargs["fovx"] * 0.5)),
        tanfovy=jnp.float32(math.tan(cam_kwargs["fovy"] * 0.5)),
        width=int(w), height=int(h),
        znear=float(cam_kwargs["znear"]), zfar=float(cam_kwargs["zfar"]))


def serve_render(gui: NetworkGUI, gaussians, source_path: str,
                 backend: str = "xla", chunk: int = 256,
                 instance_cap: int = 2 ** 18):
    """One request/response cycle (the network_gui loop body of upstream
    3DGS train.py). Returns do_training or None when idle."""
    import jax.numpy as jnp

    from gs2m_tpu.models.render import render

    if gui.conn is None:
        gui.try_connect()
        return None
    try:
        cam_kwargs, do_training, keep_alive, scale_mod = gui.receive()
        img_bytes = None
        if cam_kwargs is not None:
            cam = camera_from_viewer(cam_kwargs)
            pkg = render(gaussians, cam, jnp.zeros(3), gaussians.max_sh_degree,
                         backend=backend, chunk=chunk,
                         instance_cap=instance_cap)
            img = np.clip(np.asarray(pkg["render"]), 0, 1)
            img_bytes = memoryview(
                (img.transpose(1, 2, 0) * 255).astype(np.uint8)).tobytes()
        gui.send(img_bytes, source_path)
        return do_training
    except Exception:
        gui.conn = None
        return None
