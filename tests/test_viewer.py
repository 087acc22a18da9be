"""Viewer protocol round-trip over a real localhost socket (the reference's
only coverage was the live test-rasterizer.py smoke path,
test-rasterizer.py:15-45; here the handshake, header parse, matrix flips,
frame bytes, and all render modes are asserted automatically)."""
from __future__ import annotations

import json
import socket
import struct
import threading

import numpy as np
import pytest

from tpu_splat.viewer.network_gui import (
    NetworkGUI,
    RENDER_MODES,
    render_net_image,
)


def _recv(sock, n):
    buf = b""
    while len(buf) < n:
        c = sock.recv(n - len(buf))
        assert c, "server closed"
        buf += c
    return buf


def _client_request(sock, width, height, mode_idx, view, view_proj):
    header = dict(
        resolution_x=width, resolution_y=height, train=True,
        fov_y=0.8, fov_x=1.2, z_near=0.01, z_far=100.0, keep_alive=True,
        scaling_modifier=1.0, render_mode=mode_idx,
    )
    payload = json.dumps(header).encode()
    sock.sendall(struct.pack("<I", len(payload)) + payload)
    sock.sendall(view.astype(np.float32).tobytes())
    sock.sendall(view_proj.astype(np.float32).tobytes())


def test_viewer_socket_roundtrip():
    gui = NetworkGUI(port=0)  # ephemeral port
    port = gui.listener.getsockname()[1]
    gui.listener.settimeout(5.0)

    W, Hh = 64, 48
    view = np.arange(16, dtype=np.float32).reshape(4, 4) / 16.0
    view_proj = (np.arange(16, dtype=np.float32).reshape(4, 4) + 3) / 16.0

    results = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        try:
            # handshake: mode list announcement
            (n,) = struct.unpack("<I", _recv(s, 4))
            results["modes"] = json.loads(_recv(s, n).decode())
            # one camera request
            _client_request(s, W, Hh, 2, view, view_proj)
            # frame: raw RGB bytes + source path + metrics JSON
            results["frame"] = _recv(s, W * Hh * 3)
            (pn,) = struct.unpack("<I", _recv(s, 4))
            results["path"] = _recv(s, pn).decode()
            (mn,) = struct.unpack("<I", _recv(s, 4))
            results["metrics"] = json.loads(_recv(s, mn).decode())
            # empty-resolution request (control-only message)
            _client_request(
                s, 0, 0, 0, np.zeros((0,), np.float32), np.zeros((0,), np.float32)
            )
        finally:
            s.close()

    t = threading.Thread(target=client)
    t.start()
    try:
        gui.try_connect()
        assert gui.conn is not None

        cam, train, keep_alive, smod, mode = gui.receive()
        assert train and keep_alive and smod == 1.0 and mode == 2
        assert cam["width"] == W and cam["height"] == Hh
        assert cam["fovx"] == pytest.approx(1.2)
        # axis flips + transpose (reference network_gui.py:88-91)
        flipped = view.copy()
        flipped[:, 1] *= -1
        flipped[:, 2] *= -1
        np.testing.assert_allclose(cam["world_view"], flipped.T)
        vp = view_proj.copy()
        vp[:, 1] *= -1
        np.testing.assert_allclose(cam["full_proj"], vp.T)

        img = np.linspace(0, 1, Hh * W * 3, dtype=np.float32).reshape(Hh, W, 3)
        gui.send(img, "/tmp/scene", {"iteration": 7, "num_gaussians": 123})

        cam2, *_ = gui.receive()
        assert cam2 is None  # zero-resolution control message
    finally:
        t.join(timeout=10)
        gui.close()

    assert results["modes"] == RENDER_MODES
    assert len(RENDER_MODES) == 11  # the reference's ten + RGB raw
    frame = np.frombuffer(results["frame"], np.uint8).reshape(Hh, W, 3)
    np.testing.assert_array_equal(
        frame, (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
    )
    assert results["path"] == "/tmp/scene"
    assert results["metrics"]["num_gaussians"] == 123


def test_render_net_image_all_modes():
    """Every announced mode produces a well-formed [H,W,3] image in [0,1]
    from a RenderOutput (reference utils/image_utils.py:51-84)."""
    from tpu_splat.renderer.render import RenderOutput

    Hh, W = 24, 32
    rng = np.random.default_rng(0)
    f = lambda c: rng.uniform(0, 1, (Hh, W, c)).astype(np.float32)
    z = np.zeros((5,), np.float32)
    out = RenderOutput(
        render=f(3), base_color=f(3), refl_color=f(3), refl_strength=f(1),
        alpha=f(1), normal=f(3) * 2 - 1, dist=f(1), surf_depth=f(1),
        surf_normal=f(3) * 2 - 1, scope_mask=(f(1) > 0.5).astype(np.float32),
        radii=z, gaussian_weights=z, visibility=z > 0,
        num_instances=np.int32(0), max_area=np.int32(0),
        max_tile_count=np.int32(0), pad_overflow=np.int32(0),
    )
    for mode in RENDER_MODES:
        img = render_net_image(out, mode)
        assert img.shape == (Hh, W, 3), mode
        assert np.isfinite(img).all(), mode
        assert img.min() >= -1e-6 and img.max() <= 1 + 1e-6, mode
