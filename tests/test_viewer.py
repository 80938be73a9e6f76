"""Network viewer bridge: wire protocol roundtrip over a local socket."""
import json
import socket
import threading

import numpy as np

from gs2m_tpu.apps.network_gui import NetworkGUI, camera_from_viewer, serve_render

from tests.test_golden import make_camera, make_scene


def viewer_request(cam, width, height):
    """Client-side message mimicking SIBR (inverse of the server's flips)."""
    wv = np.asarray(cam.world_view).copy()
    wv[:, 1] *= -1
    wv[:, 2] *= -1
    fp = np.asarray(cam.full_proj).copy()
    fp[:, 1] *= -1
    return {
        "resolution_x": width, "resolution_y": height,
        "train": True, "fov_x": 0.9, "fov_y": 0.9,
        "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": True, "scaling_modifier": 1.0,
        "view_matrix": wv.reshape(-1).tolist(),
        "view_projection_matrix": fp.reshape(-1).tolist(),
    }


def test_viewer_roundtrip():
    rng = np.random.default_rng(0)
    g = make_scene(rng, n=40, capacity=64)
    cam = make_camera(width=32, height=32)

    gui = NetworkGUI(port=0)  # ephemeral port
    port = gui.listener.getsockname()[1]

    W = H = 32
    result = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port))
        msg = json.dumps(viewer_request(cam, W, H)).encode()
        s.sendall(len(msg).to_bytes(4, "little") + msg)
        img = b""
        while len(img) < W * H * 3:
            img += s.recv(W * H * 3 - len(img))
        vlen = int.from_bytes(s.recv(4), "little")
        verify = s.recv(vlen).decode("ascii")
        result["img"] = np.frombuffer(img, np.uint8).reshape(H, W, 3)
        result["verify"] = verify
        s.close()

    t = threading.Thread(target=client)
    t.start()
    do_training = None
    for _ in range(200):
        do_training = serve_render(gui, g, "srcpath", backend="xla",
                                   chunk=32, instance_cap=2 ** 12)
        if do_training is not None:
            break
        import time
        time.sleep(0.05)  # give the client thread time to connect under load
    t.join(timeout=10)

    assert do_training is True
    assert result["verify"] == "srcpath"
    img = result["img"]
    assert img.shape == (H, W, 3)
    assert img.max() > 0  # something rendered

    # The camera reconstructed from the wire matches the original.
    req = viewer_request(cam, W, H)
    wv = np.asarray(req["view_matrix"], np.float32).reshape(4, 4)
    wv[:, 1] *= -1
    wv[:, 2] *= -1
    cam2 = camera_from_viewer(dict(width=W, height=H, fovx=0.9, fovy=0.9,
                                   znear=0.01, zfar=100.0, world_view=wv,
                                   full_proj=np.asarray(cam.full_proj)))
    np.testing.assert_allclose(np.asarray(cam2.world_view),
                               np.asarray(cam.world_view), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam2.cam_center),
                               np.asarray(cam.cam_center), atol=1e-5)
