"""Rendering-speed harness (role of reference eval_fps.py): mean FPS over
N renders per test view + Gaussian count -> fps.txt."""
from __future__ import annotations

import os
import time
from argparse import ArgumentParser

import numpy as np


def main(argv=None):
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tpu_splat.config import build_parser, get_combined_args
    from tpu_splat.data.scene import Scene
    from tpu_splat.model.io import load_ply
    from tpu_splat.raster.config import RasterConfig
    from tpu_splat.renderer import render_fast
    from tpu_splat.scripts.render import find_max_iteration

    parser = build_parser(fill_none_model=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--repeats", type=int, default=100)
    parser.add_argument("--max_tiles_per_gaussian", type=int, default=64)
    parser.add_argument("--max_instances", type=int, default=1 << 20)
    parser.add_argument("--tile_depth", type=int, default=1024)
    args = get_combined_args(parser, argv)

    isp = None
    if args.start_checkpoint:
        from tpu_splat.model.io import load_checkpoint_gaussians, load_checkpoint_isp

        state, it = load_checkpoint_gaussians(args.start_checkpoint)
        if getattr(args, "post_process", True):
            # the reference times renders WITH the ISP applied
            # (eval_fps.py:17 imports ppisp and post-processes each frame)
            isp = load_checkpoint_isp(args.start_checkpoint)
    else:
        it = args.iteration if args.iteration > 0 else find_max_iteration(args.model_path)
        ply = os.path.join(
            args.model_path, "point_cloud", f"iteration_{it}", "point_cloud.ply"
        )
        state = load_ply(ply, max_sh_degree=args.sh_degree)
    n_gauss = int(np.asarray(state.alive).sum())

    scene = Scene(
        args.source_path, args.model_path, images=args.images,
        resolution=args.resolution, eval_split=True, shuffle=False,
    )
    cams = scene.test_cameras or scene.train_cameras[:5]
    cfg = RasterConfig(
        max_tiles_per_gaussian=args.max_tiles_per_gaussian,
        max_instances=args.max_instances,
        tile_depth=args.tile_depth,
    )
    bg = jnp.zeros(3)

    if isp is not None:
        from tpu_splat.isp.ppisp import apply_isp

        fwd = jax.jit(
            lambda s, c: apply_isp(
                isp,
                render_fast(s, c, cfg, bg, collect_weights=False).render,
                -1,
            )
        )
    else:
        fwd = jax.jit(
            lambda s, c: render_fast(s, c, cfg, bg, collect_weights=False).render
        )
    # warm up per camera shape
    out = fwd(state, cams[0].camera)
    jax.block_until_ready(out)

    times = []
    for lc in cams:
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            out = fwd(state, lc.camera)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / args.repeats)
    fps = 1.0 / np.mean(times)
    with open(os.path.join(args.model_path, "fps.txt"), "w") as f:
        f.write(f"{fps}\n{n_gauss}\n")
    print(f"FPS: {fps:.2f} over {len(cams)} views, {n_gauss} Gaussians")


if __name__ == "__main__":
    main()
