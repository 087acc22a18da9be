"""TSDF mesh extraction CLI (restores the 2DGS mesh-export capability the
reference stripped; role of utils/mesh_utils.py + utils/mcube_utils.py).

    python -m tpu_splat.scripts.extract_mesh -m <model_dir> [--resolution 128]

Renders every train view, TSDF-fuses the surf_depth maps over the scene
bounds, triangulates the zero level set and writes <model>/mesh/fuse.ply.
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    import jax.numpy as jnp

    from tpu_splat.config import build_parser, get_combined_args
    from tpu_splat.data.scene import Scene
    from tpu_splat.eval.mesh import GaussianExtractor, save_mesh_ply
    from tpu_splat.model.io import load_ply
    from tpu_splat.raster.config import RasterConfig
    from tpu_splat.scripts.render import find_max_iteration

    parser = build_parser(fill_none_model=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--mesh_res", type=int, default=128)
    parser.add_argument("--bounds", type=float, default=None,
                        help="half-extent of the fusion cube (default: from cameras)")
    parser.add_argument("--depth_trunc", type=float, default=None)
    parser.add_argument("--num_views", type=int, default=None)
    parser.add_argument("--max_tiles_per_gaussian", type=int, default=64)
    parser.add_argument("--max_instances", type=int, default=1 << 20)
    parser.add_argument("--tile_depth", type=int, default=1024)
    parser.add_argument("--export_images", action="store_true")
    args = get_combined_args(parser, argv)

    it = (
        args.iteration if args.iteration > 0
        else find_max_iteration(args.model_path)
    )
    ply = os.path.join(
        args.model_path, "point_cloud", f"iteration_{it}", "point_cloud.ply"
    )
    state = load_ply(ply)
    scene = Scene(
        args.source_path,
        args.model_path,
        images=args.images,
        resolution=-1,
        eval_split=False,
        shuffle=False,
    )
    cams = [lc.camera for lc in scene.train_cameras]
    if args.num_views:
        cams = cams[:: max(1, len(cams) // args.num_views)][: args.num_views]

    cfg = RasterConfig(
        max_tiles_per_gaussian=args.max_tiles_per_gaussian,
        max_instances=args.max_instances,
        tile_depth=args.tile_depth,
    )
    bg = jnp.ones(3) if args.white_background else jnp.zeros(3)
    ex = GaussianExtractor(state, cfg, bg=bg)
    print(f"Rendering {len(cams)} views for fusion...")
    ex.reconstruction(cams)

    if args.bounds is not None:
        bmin = -np.ones(3) * args.bounds
        bmax = np.ones(3) * args.bounds
    else:
        centers = np.stack([np.asarray(c.camera_center) for c in cams])
        mid = centers.mean(0)
        r = float(np.linalg.norm(centers - mid, axis=1).max())
        bmin, bmax = mid - r, mid + r

    print(f"Fusing TSDF at {args.mesh_res}^3 over {bmin} .. {bmax}")
    mesh = ex.export_mesh(
        bmin, bmax, resolution=args.mesh_res, depth_trunc=args.depth_trunc
    )
    out = os.path.join(args.model_path, "mesh", "fuse.ply")
    save_mesh_ply(mesh, out)
    print(f"wrote {out}: {len(mesh.vertices)} verts, {len(mesh.faces)} faces")
    if args.export_images:
        ex.export_image(os.path.join(args.model_path, "mesh"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
