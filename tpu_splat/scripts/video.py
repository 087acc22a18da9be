"""Trajectory video rendering (role of reference video.py / render-videos.py).

Generates an ellipse path fitted to the training cameras, renders frames
with render_fast, writes PNG frames (and an MP4 when imageio/ffmpeg is
available — mediapy is not in this image)."""
from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np


def main(argv=None):
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    import jax.numpy as jnp

    from tpu_splat.config import build_parser, get_combined_args
    from tpu_splat.data.scene import Scene
    from tpu_splat.eval.trajectories import generate_path
    from tpu_splat.model.io import load_ply
    from tpu_splat.raster.config import RasterConfig
    from tpu_splat.renderer import render_fast
    from tpu_splat.scripts.render import find_max_iteration, save_image_u8

    parser = build_parser(fill_none_model=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--n_frames", type=int, default=120)
    parser.add_argument("--fps", type=int, default=30)
    args = get_combined_args(parser, argv)

    it = args.iteration if args.iteration > 0 else find_max_iteration(args.model_path)
    state = load_ply(
        os.path.join(args.model_path, "point_cloud", f"iteration_{it}",
                     "point_cloud.ply"),
        max_sh_degree=args.sh_degree,
    )
    scene = Scene(
        args.source_path, args.model_path, images=args.images,
        resolution=args.resolution, eval_split=False, shuffle=False,
    )
    # PCA-canonical ellipse path warped back to world coordinates
    # (reference generate_path, render_utils.py:176-208)
    cams = generate_path(scene.train_cameras, n_frames=args.n_frames)

    cfg = RasterConfig()
    bg = jnp.zeros(3)
    out_dir = os.path.join(args.model_path, "traj", f"ours_{it}")
    frames = []
    for i, cam in enumerate(cams):
        img = np.asarray(render_fast(state, cam, cfg, bg).render)
        save_image_u8(os.path.join(out_dir, f"{i:05d}.png"), img)
        frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
    print(f"wrote {len(frames)} frames to {out_dir}")

    try:
        import imageio.v2 as imageio

        mp4 = os.path.join(args.model_path, f"traj_{it}.mp4")
        imageio.mimwrite(mp4, frames, fps=args.fps)
        print(f"wrote {mp4}")
    except Exception as e:  # imageio/ffmpeg optional
        print(f"(video muxing unavailable: {e}; PNG frames saved)")


if __name__ == "__main__":
    main()
