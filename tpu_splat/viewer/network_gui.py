"""SIBR remote-viewer protocol server (role of reference
gaussian_renderer/network_gui.py + utils/image_utils.py:render_net_image).

Non-blocking TCP listener speaking the same wire protocol: on connect, send a
JSON list of render-mode names; receive() parses a JSON header
{resolution_x/y, train, fov_y/x, z_near/z_far, keep_alive, scaling_modifier,
view_matrix (16 floats), view_projection_matrix (16), render_mode} followed
by flattened matrices; send() streams raw RGB bytes + the source-path string
+ a metrics JSON. Camera matrices arrive in the viewer's (transposed-GLM)
convention with the same axis flips as the reference (network_gui.py:88-91).
"""
from __future__ import annotations

import json
import socket
import struct
import traceback

import numpy as np

RENDER_MODES = [
    # the reference's ten modes (utils/image_utils.py:51-77), served in the
    # same spellings: Edge = surf_normal, Curvature = Sobel gradient of the
    # rendered normal, Mask = env-scope mask
    "RGB",
    "Alpha",
    "Normal",
    "Depth",
    "Base Color",
    "Refl. Strength",
    "Refl. Color",
    "Edge",
    "Curvature",
    "Mask",
    "RGB raw",
]


def _turbo(x: np.ndarray) -> np.ndarray:
    """Cheap turbo-like colormap for single-channel maps, [H,W] -> [H,W,3]."""
    x = np.clip(x, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(2.0 * x - 1.5), 0, 1)
    g = np.clip(1.5 - np.abs(2.0 * x - 1.0), 0, 1)
    b = np.clip(1.5 - np.abs(2.0 * x - 0.5), 0, 1)
    return np.stack([r, g, b], axis=-1)


def render_net_image(out, mode: str) -> np.ndarray:
    """Multiplex a RenderOutput into a viewer image [H,W,3] float in [0,1]
    (role of utils/image_utils.py:51-84)."""
    if mode == "Alpha":
        return _turbo(np.asarray(out.alpha)[..., 0])
    if mode == "Normal":
        return np.asarray(out.normal) * 0.5 + 0.5
    if mode == "Depth":
        d = np.asarray(out.surf_depth)[..., 0]
        return _turbo(d / (d.max() + 1e-8))
    if mode == "Base Color":
        return np.asarray(out.base_color)
    if mode == "Refl. Strength":
        return _turbo(np.asarray(out.refl_strength)[..., 0])
    if mode == "Refl. Color":
        return np.asarray(out.refl_color)
    if mode == "Edge":
        # reference 'edge' serves the depth-derived pseudo normal
        # (image_utils.py:70-72)
        return np.asarray(out.surf_normal) * 0.5 + 0.5
    if mode == "Curvature":
        from tpu_splat.eval.image_utils import gradient_map

        nrm = np.asarray(out.normal) * 0.5 + 0.5
        return _turbo(gradient_map(nrm)[..., 0])
    if mode == "Mask":
        return np.repeat(np.asarray(out.scope_mask), 3, axis=-1)
    return np.asarray(out.render)


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn = None
        self.addr = None

    def try_connect(self):
        try:
            self.conn, self.addr = self.listener.accept()
            self.conn.settimeout(None)
            # announce render modes (reference network_gui.py:47-55)
            self._send_json(RENDER_MODES)
        except Exception:
            self.conn = None

    def _read(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return buf

    def _send_json(self, obj):
        payload = json.dumps(obj).encode("utf-8")
        self.conn.sendall(struct.pack("<I", len(payload)) + payload)

    def receive(self):
        """-> (camera_dict | None, do_training, keep_alive, scaling_modifier,
        render_mode)."""
        (n,) = struct.unpack("<I", self._read(4))
        header = json.loads(self._read(n).decode("utf-8"))
        width = header["resolution_x"]
        height = header["resolution_y"]
        if width == 0 or height == 0:
            return None, header.get("train", False), header.get(
                "keep_alive", False
            ), header.get("scaling_modifier", 1.0), header.get("render_mode", 0)
        fovy = header["fov_y"]
        fovx = header["fov_x"]
        znear = header["z_near"]
        zfar = header["z_far"]
        view = np.frombuffer(self._read(4 * 16), np.float32).reshape(4, 4).copy()
        view_proj = np.frombuffer(self._read(4 * 16), np.float32).reshape(4, 4).copy()
        # reference axis flips (network_gui.py:88-91): negate 2nd/3rd columns
        view[:, 1] = -view[:, 1]
        view[:, 2] = -view[:, 2]
        view_proj[:, 1] = -view_proj[:, 1]
        cam = dict(
            width=width, height=height, fovx=fovx, fovy=fovy,
            znear=znear, zfar=zfar,
            world_view=view.T,  # stored transposed in the protocol
            full_proj=view_proj.T,
        )
        return (
            cam,
            header.get("train", False),
            header.get("keep_alive", False),
            header.get("scaling_modifier", 1.0),
            header.get("render_mode", 0),
        )

    def send(self, image: np.ndarray | None, source_path: str, metrics: dict):
        """image [H,W,3] float -> raw bytes + path + metrics JSON
        (reference network_gui.py:65-71)."""
        if self.conn is None:
            return
        try:
            if image is not None:
                img8 = (np.clip(image, 0, 1) * 255 + 0.5).astype(np.uint8)
                self.conn.sendall(img8.tobytes())
            path = source_path.encode("utf-8")
            self.conn.sendall(struct.pack("<I", len(path)) + path)
            self._send_json(metrics)
        except Exception:
            traceback.print_exc()
            self.conn = None

    def close(self):
        if self.conn is not None:
            self.conn.close()
        self.listener.close()
