"""Prune Gaussians invisible from every training view (role of reference
visible-gaussians.py): renders all views, keeps those with max blend weight
> 0 anywhere, saves the pruned model + visible.txt."""
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
    from tpu_splat.model.io import load_ply, save_ply
    from tpu_splat.raster.config import RasterConfig
    from tpu_splat.renderer import render_fast
    from tpu_splat.scripts.render import find_max_iteration

    parser = build_parser(fill_none_model=True)
    parser.add_argument("--iteration", type=int, default=-1)
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
    cfg = RasterConfig()
    bg = jnp.zeros(3)

    seen = np.zeros(state.capacity, bool)
    for lc in scene.train_cameras:
        out = render_fast(state, lc.camera, cfg, bg)
        seen |= np.asarray(out.gaussian_weights) > 0.0
    total = int(np.asarray(state.alive).sum())
    visible = int((seen & np.asarray(state.alive)).sum())
    print(f"visible: {visible}/{total}")

    pruned = state.replace(alive=state.alive & jnp.asarray(seen))
    out_dir = os.path.join(
        args.model_path, "point_cloud", f"iteration_{it}_visible"
    )
    save_ply(pruned, os.path.join(out_dir, "point_cloud.ply"))
    with open(os.path.join(args.model_path, "visible.txt"), "w") as f:
        f.write(f"{visible}\n{total}\n")


if __name__ == "__main__":
    main()
