"""Serve a trained model to the SIBR remote viewer (role of reference
view.py).

Loads a model dir (PLY snapshot at --iteration, or a training checkpoint via
--start_checkpoint) and answers viewer requests with render_fast frames in
the requested render mode (view.py:53-78).
"""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import numpy as np


def main(argv=None):
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    import jax.numpy as jnp

    from tpu_splat.config import build_parser, get_combined_args
    from tpu_splat.core.graphics import Camera
    from tpu_splat.model.io import load_ply
    from tpu_splat.raster.config import RasterConfig
    from tpu_splat.renderer import render_fast
    from tpu_splat.scripts.render import find_max_iteration
    from tpu_splat.viewer import NetworkGUI, render_net_image, RENDER_MODES

    parser = build_parser(fill_none_model=True)
    parser.add_argument("--ip", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--start_checkpoint", default=None)
    args = get_combined_args(parser, argv)

    if args.start_checkpoint:
        from tpu_splat.scripts.render import load_state_from_checkpoint

        state, iteration = load_state_from_checkpoint(args)
    else:
        iteration = (
            args.iteration
            if args.iteration > 0
            else find_max_iteration(args.model_path)
        )
        ply = os.path.join(
            args.model_path,
            "point_cloud",
            f"iteration_{iteration}",
            "point_cloud.ply",
        )
        state = load_ply(ply)

    cfg = RasterConfig(
        max_tiles_per_gaussian=64,
        max_instances=1 << 21,
        tile_depth=1024,
        chunk=32,
    )
    bg = (
        jnp.ones(3) if getattr(args, "white_background", False) else jnp.zeros(3)
    )
    n_alive = int(np.asarray(state.alive).sum())

    gui = NetworkGUI(args.ip, args.port)
    print(f"View: {args.model_path} — serving on {args.ip}:{args.port}")
    while True:
        gui.try_connect()
        while gui.conn is not None:
            try:
                cam_dict, _, keep_alive, scale_mod, mode = gui.receive()
                if cam_dict is None:
                    gui.send(None, args.source_path or "", {})
                    continue
                wv = np.asarray(cam_dict["world_view"])
                cam = Camera(
                    world_view=jnp.asarray(wv),
                    proj=jnp.eye(4),
                    full_proj=jnp.asarray(cam_dict["full_proj"]),
                    camera_center=jnp.asarray(np.linalg.inv(wv)[:3, 3]),
                    K=jnp.eye(3),
                    height=cam_dict["height"],
                    width=cam_dict["width"],
                    fovx=cam_dict["fovx"],
                    fovy=cam_dict["fovy"],
                )
                out = render_fast(state, cam, cfg, bg, scaling_modifier=scale_mod)
                img = render_net_image(out, RENDER_MODES[mode])
                gui.send(
                    img,
                    args.source_path or "",
                    {"#": n_alive, "it": iteration},
                )
                if not keep_alive:
                    break
            except (ConnectionError, OSError):
                gui.conn = None


if __name__ == "__main__":
    sys.exit(main())
