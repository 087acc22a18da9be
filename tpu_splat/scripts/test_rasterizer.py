"""Viewer smoke test (role of reference test-rasterizer.py + StageScene):
serve a 5-Gaussian stage scene over the SIBR viewer protocol, or render one
frame headless with --headless."""
from __future__ import annotations

from argparse import ArgumentParser

import numpy as np


def stage_state(capacity: int = 8):
    """5 random Gaussians near the origin (reference StageScene,
    scene/__init__.py:26-42)."""
    from tpu_splat.model import init_from_pcd

    rng = np.random.default_rng(0)
    pts = rng.normal(scale=0.5, size=(5, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 1.0, (5, 3)).astype(np.float32)
    return init_from_pcd(pts, cols, capacity=capacity, cubemap_resolution=8)


def main(argv=None):
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    import jax.numpy as jnp

    from tpu_splat.data import orbit_camera
    from tpu_splat.raster.config import RasterConfig
    from tpu_splat.renderer import render_fast

    parser = ArgumentParser()
    parser.add_argument("--headless", action="store_true")
    parser.add_argument("--ip", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    args = parser.parse_args(argv)

    state = stage_state()
    cfg = RasterConfig(max_tiles_per_gaussian=16, max_instances=4096, tile_depth=128, chunk=16)
    bg = jnp.zeros(3)

    if args.headless:
        cam = orbit_camera(128, 128, radius=4.0)
        out = render_fast(state, cam, cfg, bg)
        img = np.asarray(out.render)
        print(
            f"stage render: {img.shape}, coverage "
            f"{float((np.asarray(out.alpha) > 0.1).mean()):.3f}, "
            f"nan={np.isnan(img).any()}"
        )
        return

    from tpu_splat.core.graphics import Camera
    from tpu_splat.viewer import NetworkGUI, render_net_image, RENDER_MODES
    import jax.numpy as jnp

    gui = NetworkGUI(args.ip, args.port)
    print(f"serving stage scene on {args.ip}:{args.port}")
    while True:
        gui.try_connect()
        while gui.conn is not None:
            try:
                cam_dict, _, keep_alive, scale_mod, mode = gui.receive()
                if cam_dict is None:
                    gui.send(None, "stage", {})
                    continue
                cam = Camera(
                    world_view=jnp.asarray(cam_dict["world_view"]),
                    proj=jnp.eye(4),
                    full_proj=jnp.asarray(cam_dict["full_proj"]),
                    camera_center=jnp.asarray(
                        np.linalg.inv(np.asarray(cam_dict["world_view"]))[:3, 3]
                    ),
                    K=jnp.eye(3),
                    height=cam_dict["height"],
                    width=cam_dict["width"],
                    fovx=cam_dict["fovx"],
                    fovy=cam_dict["fovy"],
                )
                out = render_fast(state, cam, cfg, bg, scaling_modifier=scale_mod)
                img = render_net_image(out, RENDER_MODES[mode])
                gui.send(img, "stage", {"num_gaussians": 5})
                if not keep_alive:
                    break
            except (ConnectionError, OSError):
                gui.conn = None


if __name__ == "__main__":
    main()
