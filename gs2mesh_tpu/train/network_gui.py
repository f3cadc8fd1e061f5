"""SIBR remote-viewer bridge: TCP server streaming live renders mid-training.

Protocol-compatible port of the reference network_gui
(third_party/gaussian-splatting/gaussian_renderer/network_gui.py:26-85):
length-prefixed JSON camera/settings messages in, raw RGB bytes + verify
string out — so the SIBR gaussianviewer remote client works against the JAX
trainer unmodified.
"""

from __future__ import annotations

import json
import socket
from typing import Optional, Tuple

import numpy as np


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.host = host
        self.port = port
        self.conn: Optional[socket.socket] = None
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)

    def try_connect(self) -> None:
        if self.conn is not None:
            return
        try:
            self.conn, addr = self.listener.accept()
            print(f"\nConnected by {addr}")
            self.conn.settimeout(None)
        except (BlockingIOError, OSError):
            pass

    def _read(self) -> dict:
        assert self.conn is not None
        length = int.from_bytes(self.conn.recv(4), "little")
        payload = b""
        while len(payload) < length:
            payload += self.conn.recv(length - len(payload))
        return json.loads(payload.decode("utf-8"))

    def send(self, image_bytes: Optional[bytes], verify: str) -> None:
        assert self.conn is not None
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))

    def receive(self) -> Tuple[Optional[dict], Optional[bool], bool, float]:
        """Returns (camera_message | None, do_training, keep_alive,
        scaling_modifier); camera_message carries the raw matrices + dims
        with the SIBR→GS sign flips applied (network_gui.py:60-82)."""
        message = self._read()
        width = message["resolution_x"]
        height = message["resolution_y"]
        if width == 0 or height == 0:
            return None, None, False, 1.0
        view = np.asarray(message["view_matrix"],
                          np.float32).reshape(4, 4)
        view[:, 1] = -view[:, 1]
        view[:, 2] = -view[:, 2]
        proj = np.asarray(message["view_projection_matrix"],
                          np.float32).reshape(4, 4)
        proj[:, 1] = -proj[:, 1]
        cam = dict(width=width, height=height,
                   fovx=message["fov_x"], fovy=message["fov_y"],
                   znear=message["z_near"], zfar=message["z_far"],
                   world_view=view, full_proj=proj)
        return (cam, bool(message["train"]), bool(message["keep_alive"]),
                float(message["scaling_modifier"]))

    def disconnect(self) -> None:
        if self.conn is not None:
            self.conn.close()
            self.conn = None


def serve_step(gui: NetworkGUI, render_fn, iteration: int, total: int,
               source_path: str) -> bool:
    """One training-loop GUI poll (the try/except dance of train.py:52-66).

    render_fn(cam_dict, scaling_modifier) -> (3, H, W) float image in [0,1].
    Returns keep_training_connected."""
    import math

    from gs2mesh_tpu.core.camera import Camera
    import jax.numpy as jnp

    gui.try_connect()
    while gui.conn is not None:
        try:
            net_image_bytes = None
            cam_msg, do_training, keep_alive, scaling = gui.receive()
            if cam_msg is not None:
                cam = Camera(
                    world_view=jnp.asarray(cam_msg["world_view"]),
                    full_proj=jnp.asarray(cam_msg["full_proj"]),
                    cam_center=jnp.asarray(np.linalg.inv(
                        cam_msg["world_view"])[3, :3]),
                    tan_fovx=jnp.float32(math.tan(cam_msg["fovx"] * 0.5)),
                    tan_fovy=jnp.float32(math.tan(cam_msg["fovy"] * 0.5)),
                    width=cam_msg["width"], height=cam_msg["height"])
                image = render_fn(cam, scaling)
                arr = np.asarray(image)
                net_image_bytes = memoryview(
                    (np.clip(arr, 0, 1) * 255).astype(np.uint8)
                    .transpose(1, 2, 0).copy()).tobytes()
            gui.send(net_image_bytes, source_path)
            if do_training and (iteration < total or not keep_alive):
                return True
        except Exception:
            gui.disconnect()
    return False
