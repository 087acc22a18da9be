"""Training CLI (role of reference train.py).

    python -m tpu_splat.scripts.train -s <scene_dir> -m <model_dir> [flags]

Implements the reference's full schedule: two-stage deferred reflection,
densification window, normal propagation, color sabotage, opacity-LR pulsing,
env-map doubling, xyz freeze, PPISP-style ISP with late scene freeze, plus
checkpointing, PLY snapshots and cfg_args persistence.
"""
from __future__ import annotations

import math
import os
import random
import sys
import time
from argparse import ArgumentParser, Namespace

import numpy as np


def training(args, argv_namespace=None):
    import jax
    import jax.numpy as jnp

    from tpu_splat.config import (
        ModelParams,
        OptimizationParams,
        PipelineParams,
        save_cfg_args,
    )
    from tpu_splat.data.scene import Scene
    from tpu_splat.model import init_from_pcd
    from tpu_splat.model.io import save_checkpoint, load_checkpoint
    from tpu_splat.raster.config import RasterConfig, production_config
    from tpu_splat.train.step import TrainState, make_train_step
    from tpu_splat.train.loop import run_scheduled_events, is_scene_frozen, EventLog
    from tpu_splat.train.grow import check_growth

    model = ModelParams.extract(args).finalize()
    opt = OptimizationParams.extract(args)
    pipe = PipelineParams.extract(args)
    if getattr(args, "normal_propagation", None) is False:
        opt.disable_normal_propagation = True
    if getattr(args, "color_sabotage", None) is False:
        opt.disable_color_sabotage = True

    os.makedirs(model.model_path, exist_ok=True)
    if argv_namespace is not None:
        save_cfg_args(model.model_path, argv_namespace)

    print(f"Loading scene {model.source_path}")
    scene = Scene(
        model.source_path,
        model.model_path,
        images=model.images,
        resolution=model.resolution,
        eval_split=model.eval,
        num_points=model.num_points,
    )
    scene.save_cameras_json()
    pts, cols = scene.point_cloud
    capacity = 1 << max(int(np.ceil(np.log2(max(len(pts) * 4, 1 << 14)))), 14)
    state = init_from_pcd(
        pts,
        cols,
        capacity=capacity,
        max_sh_degree=model.sh_degree,
        init_refl_value=1e-3,  # reference create_from_pcd local default
        cubemap_resolution=model.cubemap_resol,
    )
    print(
        f"{len(pts)} points, capacity {capacity}, extent {scene.cameras_extent:.2f}"
    )

    # the SHIPPED config (one config story): production_config carries the
    # canonical switch set certified by VALID_r04 and measured by bench.py;
    # only workload capacities and explicit user overrides vary here.
    # --exact_grads / a nonzero depth_ratio fall back to the exact f32
    # full-channel path (grad_channels="train" requires depth_ratio == 0).
    exact = pipe.depth_ratio != 0.0 or bool(getattr(args, "exact_grads", False))
    cfg = production_config(
        max_tiles_per_gaussian=args.max_tiles_per_gaussian,
        max_instances=args.max_instances,
        tile_depth=args.tile_depth,
        chunk=32,
        depth_ratio=pipe.depth_ratio,
        **(
            dict(grad_channels="full", bf16_grads=False, bf16_feats=False)
            if exact
            else {}
        ),
        # per-column tight binning (PARITY.md D2): ~35-40% fewer instances
        # on anisotropic scenes, but the two-level decode currently costs
        # more than the savings at 1080p — opt-in (quality-certified either
        # way by the r3 A/B).
        tight_culling=bool(getattr(args, "tight_culling", False)),
        # opacity-aware rect (accept-mask-exact; measured -4.2% instances
        # on trained loads, PERF.md) — ON by default since round 5
        # (VALID_r05-certified); --no_opacity_rect opts out
        opacity_rect=bool(getattr(args, "opacity_rect", True)),
    )

    ts = TrainState.create(
        state,
        opt,
        num_frames=len(scene.train_cameras) if model.post_process else None,
    )
    first_iter = 0
    if args.start_checkpoint:
        ts, first_iter = load_checkpoint(args.start_checkpoint, ts)
        print(f"Restored checkpoint at iteration {first_iter}")

    isp_cfg = None
    if model.post_process:
        from tpu_splat.isp import ISPConfig

        isp_cfg = ISPConfig(
            controller_activation_ratio=(opt.iterations - 5000) / opt.iterations
        )

    bg = jnp.asarray([1.0, 1.0, 1.0] if model.white_background else [0.0, 0.0, 0.0])

    # multi-chip: --mesh tiles shards the tile sweep across chips (grads
    # psum'd by the shard_map transpose); --mesh dp renders one camera per
    # chip and pmeans grads (SURVEY §2.16). Both ride jax.sharding.Mesh over
    # the local devices (ICI collectives; multi-host via jax.distributed).
    mesh_mode = getattr(args, "mesh", "none")
    mesh = None
    dp_n = 1
    if mesh_mode in ("tiles", "dp"):
        from tpu_splat.dist import make_mesh

        n_dev = getattr(args, "mesh_devices", 0) or jax.device_count()
        mesh = make_mesh(n_dev, axis=mesh_mode)
        if mesh_mode == "dp":
            dp_n = n_dev
            sizes = {(lc.camera.height, lc.camera.width) for lc in scene.train_cameras}
            if len(sizes) > 1:
                # camera-size bucketing: pad every camera to ONE max shape
                # (Camera.pad_to keeps original pixels fixed) and mask the
                # loss over the pad region, so mixed-resolution COLMAP
                # captures (the reference's resolution policy yields
                # per-image sizes, utils/camera_utils.py:26-35) batch
                # across chips
                Hmax = max(h for h, _ in sizes)
                Wmax = max(w for _, w in sizes)
                print(
                    f"--mesh dp: bucketing {len(sizes)} camera sizes to "
                    f"{Hmax}x{Wmax} with loss masks"
                )
                for lc in scene.train_cameras:
                    h0, w0 = lc.image.shape[:2]
                    mask = np.zeros((Hmax, Wmax, 1), np.float32)
                    mask[:h0, :w0] = 1.0
                    lc.pix_mask = mask
                    lc.camera = lc.camera.pad_to(Hmax, Wmax)
                    lc.image = np.pad(
                        lc.image, ((0, Hmax - h0), (0, Wmax - w0), (0, 0))
                    )
                    if lc.alpha is not None:
                        lc.alpha = np.pad(
                            lc.alpha,
                            ((0, Hmax - h0), (0, Wmax - w0), (0, 0)),
                        )
        print(f"mesh: {mesh_mode} over {n_dev} devices")

    def build_step(raster_cfg):
        common = dict(
            spatial_lr_scale=scene.cameras_extent,
            use_env_scope=opt.use_env_scope,
            env_scope_center=opt.env_scope_center,
            env_scope_radius=opt.env_scope_radius,
            isp_cfg=isp_cfg,
        )
        if mesh_mode == "dp":
            from tpu_splat.train.step import make_train_step_dp

            return jax.jit(
                make_train_step_dp(opt, raster_cfg, mesh=mesh, **common)
            )
        return jax.jit(
            make_train_step(
                opt, raster_cfg,
                mesh=mesh if mesh_mode == "tiles" else None,
                mesh_axis="tiles",
                **common,
            )
        )

    step_fn = build_step(cfg)

    from tpu_splat.train.report import TrainReporter

    reporter = TrainReporter(model.model_path, enable_tb=not args.quiet)

    gui = None
    if not args.disable_viewer:
        try:
            from tpu_splat.viewer import NetworkGUI

            gui = NetworkGUI(args.ip, args.port)
        except OSError as e:
            print(f"viewer disabled (cannot bind {args.ip}:{args.port}: {e})")
    eval_cfg = RasterConfig(
        max_tiles_per_gaussian=args.max_tiles_per_gaussian,
        max_instances=args.max_instances,
        tile_depth=args.tile_depth,
        depth_ratio=pipe.depth_ratio,
    )
    bg_list = [1.0, 1.0, 1.0] if model.white_background else [0.0, 0.0, 0.0]

    cams = scene.train_cameras
    order = []
    rng = random.Random(0)
    ema_loss = 0.0
    log = EventLog()
    t_start = time.time()

    for iteration in range(first_iter + 1, opt.iterations + 1):
        frozen = is_scene_frozen(iteration, opt, model.post_process)
        if dp_n > 1:
            # camera-batch DP: one camera per chip per step, drawn from the
            # same without-replacement epoch shuffle
            vinds = []
            while len(vinds) < dp_n:
                if not order:
                    order = list(range(len(cams)))
                    rng.shuffle(order)
                vinds.append(order.pop())
            batch = [cams[v] for v in vinds]
            cam = batch[0]  # representative for snapshots/logging
            gt = jnp.asarray(np.stack([lc.image for lc in batch]))
            # Camera.fovx/fovy/znear/zfar are STATIC pytree fields — they
            # must agree across the stacked batch (and across steps, or
            # every batch re-jits). The surfel render path never reads fov
            # (projection rides full_proj; rays/normals ride K), so pin
            # them to the first scene camera's values.
            c0 = cams[0].camera
            cam_b = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[
                    lc.camera.replace(
                        fovx=c0.fovx, fovy=c0.fovy,
                        znear=c0.znear, zfar=c0.zfar,
                    )
                    for lc in batch
                ],
            )
            if all(lc.alpha is not None for lc in batch):
                alpha = jnp.asarray(np.stack([lc.alpha for lc in batch]))
            else:
                alpha = None
            if any(getattr(lc, "pix_mask", None) is not None for lc in batch):
                pixm = jnp.asarray(np.stack([lc.pix_mask for lc in batch]))
            else:
                pixm = None
            ts, aux = step_fn(
                ts, cam_b, gt, bg, gt_alphas=alpha, frozen=frozen,
                frame_idx=jnp.asarray(vinds, jnp.int32), pix_masks=pixm,
            )
            gt = gt[0]  # for the failure-snapshot path below
        else:
            if not order:
                order = list(range(len(cams)))
                rng.shuffle(order)
            vind = order.pop()
            cam = cams[vind]

            gt = jnp.asarray(cam.image)
            alpha = jnp.asarray(cam.alpha) if cam.alpha is not None else None
            ts, aux = step_fn(
                ts, cam.camera, gt, bg, gt_alpha=alpha, frozen=frozen,
                frame_idx=vind,
            )

        # device-side EMA: float() would force a per-step host sync, which
        # serializes dispatch on high-latency links; read only when printing
        ema_loss = 0.4 * aux.loss + 0.6 * ema_loss
        if iteration % 100 == 0 or iteration == 1:
            loss_now = float(aux.loss)
            if not math.isfinite(loss_now):
                # reference-style failure snapshot (diff_surfel_rasterization/
                # __init__.py:91-98): dump every rasterizer input once, then
                # abort so the failure is reproducible offline
                from tpu_splat.train.debug_dump import dump_snapshot

                p = dump_snapshot(
                    model.model_path, ts.gaussians, cam.camera, gt, iteration,
                    f"non-finite loss {loss_now} at iteration {iteration}",
                    cfg=cfg, bg=bg,
                )
                raise RuntimeError(
                    f"non-finite loss at iteration {iteration}; "
                    f"rasterizer inputs dumped to {p or 'existing snapshot_fw.npz'}"
                )
            print(
                f"[{iteration}] loss {float(ema_loss):.5f} psnr {float(aux.psnr):.2f} "
                f"pts {int(aux.n_alive)} inst {int(aux.num_instances)} "
                f"maxtile {int(aux.max_tile_count)} "
                f"({(time.time()-t_start):.0f}s)"
            )
        prev_overflow = log.overflowed
        ts = run_scheduled_events(
            ts,
            iteration,
            opt,
            cameras_extent=scene.cameras_extent,
            cameras_mean=scene.cameras_mean,
            scene_frozen=frozen,
            log=log,
        )

        # geometric capacity growth (functional analogue of the reference's
        # resize callback, rasterize_points.cu:31-37): whenever diagnostics
        # report a (nearly) full buffer, pad state/opt/stats, bump the
        # RasterConfig, and re-jit. Checked after densify events and every
        # 100 steps (the host reads below sync anyway).
        if log.overflowed != prev_overflow or iteration % 100 == 0:
            dec = check_growth(
                ts,
                cfg,
                n_alive=int(aux.n_alive),
                num_instances=int(aux.num_instances),
                max_tile_count=int(aux.max_tile_count),
                densify_overflow=log.overflowed - prev_overflow,
                pad_overflow=int(aux.pad_overflow),
            )
            if dec.grew:
                ts, cfg = dec.ts, dec.cfg
                print(f"[{iteration}] GROW: " + "; ".join(dec.reasons))
                step_fn = build_step(cfg)
            elif int(aux.num_instances) >= cfg.max_instances:
                # instance capacity overflowed and growth did not trigger:
                # the forward silently dropped instances this step — keep a
                # one-shot reference-style snapshot for offline repro
                from tpu_splat.train.debug_dump import dump_snapshot

                p = dump_snapshot(
                    model.model_path, ts.gaussians, cam.camera, gt, iteration,
                    f"instance overflow {int(aux.num_instances)} >= "
                    f"{cfg.max_instances} at iteration {iteration}",
                    cfg=cfg, bg=bg,
                )
                if p:
                    print(f"[{iteration}] OVERFLOW snapshot -> {p}")

        if iteration % 100 == 0:
            reporter.scalars(
                iteration,
                {
                    "train_loss_patches/total_loss": float(aux.loss),
                    "train_loss_patches/l1_loss": float(aux.l1),
                    "train_loss_patches/normal_loss": float(aux.normal_loss),
                    "total_points": int(aux.n_alive),
                },
            )
        if iteration in args.test_iterations:
            reporter.evaluate(
                iteration, ts.gaussians, eval_cfg, bg_list,
                scene.test_cameras, scene.train_cameras,
            )
            reporter.model_stats(iteration, ts.gaussians)

        if gui is not None:
            _service_viewer(
                gui, ts.gaussians, eval_cfg, bg, model.source_path, iteration,
                isp=ts.isp,
            )

        if iteration in args.save_iterations:
            print(f"[ITER {iteration}] Saving Gaussians")
            scene.save(ts.gaussians, iteration)
        if iteration in args.checkpoint_iterations:
            print(f"[ITER {iteration}] Saving Checkpoint")
            save_checkpoint(
                os.path.join(model.model_path, f"chkpnt{iteration}.npz"),
                ts,
                iteration,
            )

    if gui is not None:
        gui.close()
    reporter.close()
    scene.save(ts.gaussians, opt.iterations)
    dt_min = (time.time() - t_start) / 60
    print(f"Training complete in {dt_min:.1f} min; events: {len(log.events)}, "
          f"densified {log.densified}, pruned {log.pruned}, overflow {log.overflowed}")
    return ts


def _service_viewer(gui, state, cfg, bg, source_path, iteration, isp=None):
    """Answer one pending viewer request per iteration (non-blocking accept;
    reference train.py:322-349 — which post-processes the streamed frame
    with PPISP; viewer frames are unknown views, so the controller path)."""
    import numpy as np
    import jax.numpy as jnp

    from tpu_splat.core.graphics import Camera
    from tpu_splat.renderer import render_fast
    from tpu_splat.viewer import RENDER_MODES, render_net_image

    if gui.conn is None:
        gui.try_connect()
        if gui.conn is None:
            return
    try:
        cam_dict, _train, keep_alive, scale_mod, mode = gui.receive()
        if cam_dict is None:
            gui.send(None, source_path, {"it": iteration})
            return
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
        if isp is not None and RENDER_MODES[mode] == "RGB":
            from tpu_splat.isp.ppisp import apply_isp

            out = out._replace(render=apply_isp(isp, out.render, -1))
        img = render_net_image(out, RENDER_MODES[mode])
        gui.send(img, source_path, {"it": iteration})
        if not keep_alive:
            gui.conn.close()
            gui.conn = None
    except (ConnectionError, OSError):
        gui.conn = None


def main(argv=None):
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    from tpu_splat.config import build_parser

    parser = build_parser()
    parser.add_argument("--iterations_override", type=int, default=None)
    parser.add_argument("--test_iterations", nargs="+", type=int, default=[7000, 30000])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[7000, 30000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--max_tiles_per_gaussian", type=int, default=64)
    parser.add_argument("--max_instances", type=int, default=1 << 20)
    parser.add_argument("--tile_depth", type=int, default=1024)
    parser.add_argument(
        "--exact_grads", action="store_true",
        help="disable bf16 compression of per-instance gradient rows",
    )
    parser.add_argument(
        "--tight_culling", action="store_true",
        help="per-column 3-sigma-conic tile binning (PARITY.md D2): fewer "
        "instances on anisotropic scenes at higher binning cost",
    )
    from argparse import BooleanOptionalAction

    parser.add_argument(
        "--opacity_rect", action=BooleanOptionalAction,
        default=True,
        help="opacity-aware tile rect: stop emitting (gaussian, tile) "
        "overlaps that can only contribute alpha < 1/255 (accept-mask-"
        "exact; measured -4.2%% instances on trained loads). Default on; "
        "--no-opacity_rect disables",
    )
    parser.add_argument(
        "--mesh", type=str, default="none", choices=["none", "tiles", "dp"],
        help="multi-chip mode: shard the tile sweep (tiles) or render one "
        "camera per chip (dp) over a jax.sharding.Mesh",
    )
    parser.add_argument(
        "--mesh_devices", type=int, default=0,
        help="devices in the mesh (0 = all local devices)",
    )
    parser.add_argument("--quiet", "-q", action="store_true")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--disable_viewer", action="store_true")
    parser.add_argument("--auto_test", action="store_true",
                        help="test every 5000 iterations (reference train.py:515-516)")
    args = parser.parse_args(argv)
    args.save_iterations = list(args.save_iterations)
    if args.iterations_override:
        args.iterations = args.iterations_override
    if args.auto_test:
        args.test_iterations = list(range(5000, args.iterations + 1, 5000))
    if args.iterations not in args.save_iterations:
        args.save_iterations.append(args.iterations)
    training(args, argv_namespace=args)


if __name__ == "__main__":
    main()
