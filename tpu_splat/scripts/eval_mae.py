"""Normal mean-angular-error eval (role of reference eval_mae.py +
utils/mae_utils.py): renders normal maps for test views, compares against GT
normal images with alpha masking -> mae.txt (degrees)."""
from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np


def mae_degrees(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray | None = None):
    """Mean angular error in degrees between normal maps in [-1,1]^3."""
    pn = pred / (np.linalg.norm(pred, axis=-1, keepdims=True) + 1e-8)
    gn = gt / (np.linalg.norm(gt, axis=-1, keepdims=True) + 1e-8)
    cos = np.clip(np.sum(pn * gn, axis=-1), -1.0, 1.0)
    ang = np.degrees(np.arccos(cos))
    if mask is not None:
        m = mask > 0.5
        return float(ang[m].mean()) if m.any() else float("nan")
    return float(ang.mean())


def main(argv=None):
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    import jax.numpy as jnp

    from tpu_splat.config import build_parser, get_combined_args
    from tpu_splat.data.scene import Scene
    from tpu_splat.model.io import load_ply
    from tpu_splat.raster.config import RasterConfig
    from tpu_splat.renderer import render_fast
    from tpu_splat.scripts.render import find_max_iteration
    from PIL import Image

    parser = build_parser(fill_none_model=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--gt_normals_dir", type=str, default=None,
                        help="dir of GT normal images (default <src>/normals)")
    args = get_combined_args(parser, argv)

    it = args.iteration if args.iteration > 0 else find_max_iteration(args.model_path)
    state = load_ply(
        os.path.join(args.model_path, "point_cloud", f"iteration_{it}",
                     "point_cloud.ply"),
        max_sh_degree=args.sh_degree,
    )
    scene = Scene(
        args.source_path, args.model_path, images=args.images,
        resolution=args.resolution, eval_split=True, shuffle=False,
    )
    gt_dir = args.gt_normals_dir or os.path.join(args.source_path, "normals")
    cfg = RasterConfig()
    bg = jnp.zeros(3)

    maes = []
    for lc in scene.test_cameras:
        gt_path = os.path.join(gt_dir, lc.image_name + ".png")
        if not os.path.exists(gt_path):
            continue
        out = render_fast(state, lc.camera, cfg, bg)
        pred = np.asarray(out.normal)
        alpha = np.asarray(out.alpha)[..., 0]
        gt = np.asarray(Image.open(gt_path).convert("RGB")) / 255.0 * 2.0 - 1.0
        maes.append(mae_degrees(pred, gt, alpha))
    if maes:
        mae = float(np.mean(maes))
        with open(os.path.join(args.model_path, "mae.txt"), "w") as f:
            f.write(f"{mae}\n")
        print(f"MAE: {mae:.3f} deg over {len(maes)} views")
    else:
        print("No GT normal maps found; skipping")


if __name__ == "__main__":
    main()
