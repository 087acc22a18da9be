"""Offline rendering CLI (role of reference render.py).

    python -m tpu_splat.scripts.render -m <model_dir> [-s <scene>] [--skip_train]

Loads a trained snapshot, renders train/test sets with render_fast, writes
renders/ + gt/ under <model>/{train,test}/ours_<iter>/ (the layout metrics.py
consumes) and two lat-long env-map previews.
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np


def save_image_u8(path: str, img: np.ndarray):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)).save(path)


def find_max_iteration(model_path: str) -> int:
    """reference utils/system_utils.py:26-28 searchForMaxIteration."""
    root = os.path.join(model_path, "point_cloud")
    iters = [
        int(d.split("_")[-1]) for d in os.listdir(root) if d.startswith("iteration_")
    ]
    return max(iters)


def load_state_from_checkpoint(args):
    """Restore a GaussianState from a chkpntN.npz (reference render.py's
    --start_checkpoint path, render.py:80-90)."""
    from tpu_splat.model.io import load_checkpoint_gaussians

    return load_checkpoint_gaussians(args.start_checkpoint)


def render_sets(args):
    import jax.numpy as jnp

    from tpu_splat.config import ModelParams, PipelineParams
    from tpu_splat.data.scene import Scene
    from tpu_splat.model.io import load_ply
    from tpu_splat.raster.config import RasterConfig
    from tpu_splat.renderer import render_fast, render_env_map

    model = ModelParams.extract(args).finalize()
    pipe = PipelineParams.extract(args)
    isp = None
    if getattr(args, "start_checkpoint", None):
        state, it = load_state_from_checkpoint(args)
        print(f"Loaded checkpoint {args.start_checkpoint} (iteration {it})")
        if model.post_process:
            from tpu_splat.model.io import load_checkpoint_isp

            isp = load_checkpoint_isp(args.start_checkpoint)
            if isp is not None:
                print("Applying trained ISP to renders (post_process)")
    else:
        it = (
            args.iteration if args.iteration > 0
            else find_max_iteration(model.model_path)
        )
        ply = os.path.join(
            model.model_path, "point_cloud", f"iteration_{it}", "point_cloud.ply"
        )
        state = load_ply(ply, max_sh_degree=model.sh_degree)
        print(f"Loaded {int(np.asarray(state.alive).sum())} Gaussians from {ply}")

    scene = Scene(
        model.source_path,
        model.model_path,
        images=model.images,
        resolution=model.resolution,
        eval_split=model.eval,
        shuffle=False,
    )
    cfg = RasterConfig(
        max_tiles_per_gaussian=args.max_tiles_per_gaussian,
        max_instances=args.max_instances,
        tile_depth=args.tile_depth,
        depth_ratio=pipe.depth_ratio,
    )
    bg = jnp.asarray([1.0, 1.0, 1.0] if model.white_background else [0.0, 0.0, 0.0])

    env = render_env_map(state)
    for k, v in env.items():
        save_image_u8(
            os.path.join(model.model_path, f"{k}.png"), np.asarray(v)
        )

    sets = []
    if not args.skip_train:
        sets.append(("train", scene.train_cameras))
    if not args.skip_test:
        sets.append(("test", scene.test_cameras))
    for name, cams in sets:
        base = os.path.join(model.model_path, name, f"ours_{it}")
        for idx, lc in enumerate(cams):
            out = render_fast(state, lc.camera, cfg, bg)
            img = out.render
            if isp is not None:
                # train views keep their per-frame transform; test views use
                # the shared controller (reference render.py:58-59:
                # frame_idx=-1 for unknown frames)
                from tpu_splat.isp.ppisp import apply_isp

                fi = lc.frame_idx if name == "train" else -1
                img = apply_isp(isp, img, frame_idx=fi)
            save_image_u8(
                os.path.join(base, "renders", f"{idx:05d}.png"), np.asarray(img)
            )
            save_image_u8(os.path.join(base, "gt", f"{idx:05d}.png"), lc.image)
            if args.save_normals:
                save_image_u8(
                    os.path.join(base, "normals", f"{idx:05d}.png"),
                    np.asarray(out.normal) * 0.5 + 0.5,
                )
            if args.save_refl:
                save_image_u8(
                    os.path.join(base, "refl", f"{idx:05d}.png"),
                    np.asarray(out.refl_strength).repeat(3, -1),
                )
        print(f"{name}: rendered {len(cams)} views to {base}")


def main(argv=None):
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    from tpu_splat.config import build_parser, get_combined_args

    parser = build_parser(fill_none_model=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--save_normals", action="store_true")
    parser.add_argument("--save_refl", action="store_true")
    parser.add_argument("--max_tiles_per_gaussian", type=int, default=64)
    parser.add_argument("--max_instances", type=int, default=1 << 20)
    parser.add_argument("--tile_depth", type=int, default=1024)
    args = get_combined_args(parser, argv)
    render_sets(args)


if __name__ == "__main__":
    main()
