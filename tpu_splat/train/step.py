"""Jitted training step + scheduled mutation events.

Role of the reference train.py:120-320 inner loop, reorganized TPU-style:
- ONE compiled function per image shape covers every iteration: stage
  switches (initial/deferred), the xyz LR schedule, opacity-LR pulsing,
  xyz freezing and scene freezing are traced scalars, not recompiles.
- Structural events (densify/prune, opacity/refl/scale resets, color
  sabotage, env-map doubling) run between steps at their scheduled
  intervals as separate jitted transforms (tpu_splat.model.densify / ops).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from tpu_splat.core.graphics import Camera
from tpu_splat.model.state import GaussianState
from tpu_splat.model.optim import (
    AdamState,
    adam_init,
    adam_step,
    default_lrs,
    xyz_lr_schedule,
)
from tpu_splat.model.densify import DensifyStats, add_stats
from tpu_splat.isp.ppisp import ISPConfig, ISPParams, init_isp, apply_isp, isp_regularization
from tpu_splat.raster.config import TILE, RasterConfig
from tpu_splat.renderer.render import render
from tpu_splat.train.losses import l1_loss, ssim


def _isp_leaves(isp: ISPParams) -> dict:
    return {
        "isp_gain": isp.gain,
        "isp_bias": isp.bias,
        "isp_log_gamma": isp.log_gamma,
        "isp_ctrl_gain": isp.ctrl_gain,
        "isp_ctrl_bias": isp.ctrl_bias,
        "isp_ctrl_log_gamma": isp.ctrl_log_gamma,
        "isp_vig_coef": isp.vig_coef,
        "isp_vig_center": isp.vig_center,
    }


def _isp_from_leaves(p: dict) -> ISPParams:
    return ISPParams(
        gain=p["isp_gain"],
        bias=p["isp_bias"],
        log_gamma=p["isp_log_gamma"],
        ctrl_gain=p["isp_ctrl_gain"],
        ctrl_bias=p["isp_ctrl_bias"],
        ctrl_log_gamma=p["isp_ctrl_log_gamma"],
        vig_coef=p["isp_vig_coef"],
        vig_center=p["isp_vig_center"],
    )


@struct.dataclass
class TrainState:
    gaussians: GaussianState
    opt: AdamState
    stats: DensifyStats
    step: jnp.ndarray  # [] int32 (1-based like the reference loop)
    opacity_lr: jnp.ndarray  # [] f32, pulsed by normal-prop events
    key: jax.Array
    isp: ISPParams | None = None  # learned per-frame ISP (PPISP role)

    @classmethod
    def create(
        cls, gaussians: GaussianState, opt_cfg, seed: int = 0,
        num_frames: int | None = None,
    ) -> "TrainState":
        isp = init_isp(num_frames) if num_frames is not None else None
        params = gaussians.param_pytree()
        if isp is not None:
            params = {**params, **_isp_leaves(isp)}
        return cls(
            gaussians=gaussians,
            opt=adam_init(params),
            stats=DensifyStats.zeros(gaussians.capacity),
            step=jnp.zeros((), jnp.int32),
            opacity_lr=jnp.asarray(opt_cfg.opacity_lr, jnp.float32),
            key=jax.random.PRNGKey(seed),
            isp=isp,
        )


class StepAux(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    ssim: jnp.ndarray
    normal_loss: jnp.ndarray
    psnr: jnp.ndarray
    num_instances: jnp.ndarray
    max_tile_count: jnp.ndarray
    n_alive: jnp.ndarray
    pad_overflow: jnp.ndarray


def make_train_step(
    opt_cfg,
    cfg: RasterConfig,
    spatial_lr_scale: float,
    use_env_scope: bool = False,
    env_scope_center=(0.0, 0.0, 0.0),
    env_scope_radius: float = 0.0,
    isp_cfg: ISPConfig | None = None,
    mesh=None,
    mesh_axis: str = "tiles",
):
    """Build the jitted train step. `opt_cfg` is an OptimizationParams-like
    object (static). When `isp_cfg` is given (and TrainState.isp is present),
    the render is post-processed by the learned per-frame ISP before the loss
    and the ISP regularization joins the objective (PPISP role,
    train.py:162-165,194-196); the ISP keeps training while the scene is
    frozen, and unknown frames (frame_idx=-1) use the shared controller.
    """
    xyz_sched = xyz_lr_schedule(opt_cfg, spatial_lr_scale)
    base_lrs = default_lrs(opt_cfg, spatial_lr_scale)
    lambda_dssim = opt_cfg.lambda_dssim
    lambda_normal = opt_cfg.lambda_normal
    refl_mask_loss_weight = 0.4  # train.py:60 refl_mask_loss_weight
    freeze_xyz_from = opt_cfg.iterations - opt_cfg.freeze_xyz_last_iters  # train.py:232-233

    def loss_fn(params, screen_offset, state: GaussianState, camera, gt_image,
                gt_alpha, bg, initial_stage, frame_idx, frozen_f,
                pix_mask=None):
        g = state.with_params(params)
        out = render(
            g,
            camera,
            cfg,
            bg,
            initial_stage=initial_stage,
            env_scope_center=jnp.asarray(env_scope_center)
            if use_env_scope
            else None,
            env_scope_radius=env_scope_radius if use_env_scope else 0.0,
            screen_offset=screen_offset,
            mesh=mesh,
            mesh_axis=mesh_axis,
        )
        rgb = out.render
        gt = gt_image
        if mesh is not None and camera.height % (TILE * mesh.shape[mesh_axis]) == 0:
            # keep the image-space loss tail (L1 + SSIM convs + their VJPs)
            # sharded over pixel rows instead of letting SPMD replicate it —
            # the halo exchange for the 11x11 SSIM window is inserted by XLA
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            rows = NamedSharding(mesh, P(mesh_axis))
            rgb = jax.lax.with_sharding_constraint(rgb, rows)
            gt = jax.lax.with_sharding_constraint(gt, rows)
        if gt_alpha is not None:
            # composite both over bg with their alphas (train.py:154-159)
            gt = gt * gt_alpha + (1 - gt_alpha) * bg
            rgb = rgb * out.alpha + (1 - out.alpha) * bg
        if isp_cfg is not None:
            isp = _isp_from_leaves(params)
            rgb = apply_isp(isp, rgb, frame_idx, use_controller=frozen_f)

        if pix_mask is None:
            l1 = l1_loss(rgb, gt)
            ssim_v = ssim(rgb, gt)
        else:
            # camera-size bucketing (mixed-resolution DP): padded pixels
            # are excluded from every image-space objective; the SSIM
            # window sees zeros across the pad boundary (border effect on
            # <11 px — the reference pads its convs the same way)
            m = pix_mask
            denom = jnp.maximum(jnp.sum(m), 1.0)
            l1 = jnp.sum(jnp.abs(rgb - gt) * m) / (denom * rgb.shape[-1])
            smap = ssim(rgb, gt, return_map=True)
            ssim_v = jnp.sum(smap * m) / (denom * smap.shape[-1])
        loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_v)

        if use_env_scope:
            # suppress reflections outside the scope sphere (train.py:56-63,176-179)
            outside = (
                jnp.sum((g.xyz - jnp.asarray(env_scope_center)[None]) ** 2, axis=-1)
                > env_scope_radius**2
            )
            refls = g.get_refl()
            denom = jnp.maximum(jnp.sum(outside & g.alive), 1)
            refl_msk_loss = jnp.sum(refls * (outside & g.alive)) / denom
            loss = loss + refl_mask_loss_weight * refl_msk_loss

        # normal consistency (train.py:182-189)
        normal_err = 1.0 - jnp.sum(out.normal * out.surf_normal, axis=-1, keepdims=True)
        if use_env_scope:
            normal_err = normal_err * out.scope_mask
        if pix_mask is None:
            normal_loss = lambda_normal * jnp.mean(normal_err)
        else:
            normal_loss = lambda_normal * (
                jnp.sum(normal_err * pix_mask)
                / jnp.maximum(jnp.sum(pix_mask), 1.0)
            )
        if not opt_cfg.disable_normal_consistentcy_loss:
            loss = loss + normal_loss

        if isp_cfg is not None:
            loss = loss + isp_regularization(_isp_from_leaves(params), isp_cfg)

        if pix_mask is None:
            mse = jnp.mean((rgb - gt) ** 2)
        else:
            mse = jnp.sum((rgb - gt) ** 2 * pix_mask) / jnp.maximum(
                jnp.sum(pix_mask) * rgb.shape[-1], 1.0
            )
        aux = (out, l1, ssim_v, normal_loss, mse)
        return loss, aux

    def train_step(
        ts: TrainState,
        camera: Camera,
        gt_image: jnp.ndarray,
        bg: jnp.ndarray,
        gt_alpha: jnp.ndarray | None = None,
        frozen: jnp.ndarray | bool = False,
        frame_idx: jnp.ndarray | int = -1,
        pix_mask: jnp.ndarray | None = None,
    ) -> tuple[TrainState, StepAux]:
        step = ts.step + 1
        initial_stage = step < opt_cfg.init_until_iter
        frozen_f = jnp.asarray(frozen, bool)
        params = ts.gaussians.param_pytree()
        if isp_cfg is not None:
            params = {**params, **_isp_leaves(ts.isp)}
        so = jnp.zeros((ts.gaussians.capacity, 2))

        (loss, (out, l1, ssim_v, normal_loss, mse)), (gparams, gso) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, so, ts.gaussians, camera, gt_image, gt_alpha, bg,
                initial_stage, jnp.asarray(frame_idx, jnp.int32), frozen_f,
                pix_mask,
            )
        )

        # learning rates: traced schedule (train.py:126-129, 232-233, 260-281)
        lrs = dict(base_lrs)
        lrs["xyz"] = xyz_sched(step)
        lrs["opacity"] = ts.opacity_lr
        frozen_xyz = step > freeze_xyz_from
        lrs["xyz"] = jnp.where(frozen_xyz, 0.0, lrs["xyz"])
        lrs["rotation"] = jnp.where(frozen_xyz, 0.0, base_lrs["rotation"])
        # scene freeze zeroes every Gaussian lr; the ISP keeps training
        # (reference train.py:292-306)
        lrs = {
            k: jnp.where(frozen_f, 0.0, jnp.asarray(v, jnp.float32))
            for k, v in lrs.items()
        }
        lrs["isp"] = jnp.asarray(base_lrs["isp"], jnp.float32)

        new_params, new_opt = adam_step(params, gparams, ts.opt, lrs)
        new_g = ts.gaussians.with_params(new_params)
        new_isp = _isp_from_leaves(new_params) if isp_cfg is not None else ts.isp

        # SH degree ramp every 1000 its after feature_rest_from_iter
        # (train.py:131-132; gated on post_process like the reference)
        bump = (
            (step > opt_cfg.feature_rest_from_iter)
            & (step % 1000 == 0)
            & ~frozen_f
        )
        new_deg = jnp.minimum(
            new_g.active_sh_degree + bump.astype(jnp.int32), new_g.max_sh_degree
        )
        new_g = new_g.replace(active_sh_degree=new_deg)

        stats = add_stats(
            ts.stats, gso, out.visibility, out.gaussian_weights, out.radii
        )

        aux = StepAux(
            loss=loss,
            l1=l1,
            ssim=ssim_v,
            normal_loss=normal_loss,
            psnr=-10.0 * jnp.log10(mse),
            num_instances=out.num_instances,
            max_tile_count=out.max_tile_count,
            n_alive=new_g.num_alive,
            pad_overflow=out.pad_overflow,
        )
        return (
            ts.replace(
                gaussians=new_g, opt=new_opt, stats=stats, step=step,
                isp=new_isp,
            ),
            aux,
        )

    # expose internals so make_train_step_dp can reuse the exact same loss
    train_step._loss_fn = loss_fn
    train_step._schedules = (base_lrs, xyz_sched, freeze_xyz_from)
    return train_step


def make_train_step_dp(
    opt_cfg,
    cfg: RasterConfig,
    spatial_lr_scale: float,
    mesh,
    dp_axis: str = "dp",
    **step_kwargs,
):
    """Camera-batch data-parallel train step (SURVEY §2.16 "batch parallelism
    across cameras" — absent in the B=1 reference train.py:134-140): render B
    cameras per step, one per chip along the `dp_axis` of `mesh`, psum/pmean
    gradients over ICI, and take ONE replicated Adam step on the mean grad.

    Inputs are stacked pytrees with a leading batch axis B == mesh.shape
    [dp_axis]: cameras (equal static H/W), gt images [B,H,W,3], frame_idx [B].
    Gaussian/optimizer state stays replicated (it is ~100s of MB at 3M
    Gaussians — fits per chip); densify statistics combine across the batch
    exactly as B sequential `add_stats` calls would (sum accumulators, max
    radii/weights), so density-control semantics are preserved.
    """
    from jax.sharding import PartitionSpec as P

    n_dp = mesh.shape[dp_axis]
    # per-device render is unsharded (DP outer axis only); tile sharding and
    # camera DP compose by giving `mesh`/`mesh_axis` through step_kwargs only
    # for the single-camera path — here each chip owns its whole frame.
    base = make_train_step(opt_cfg, cfg, spatial_lr_scale, **step_kwargs)
    loss_fn = base._loss_fn
    base_lrs, xyz_sched, freeze_xyz_from = base._schedules
    isp_on = step_kwargs.get("isp_cfg") is not None

    def dp_step(
        ts: TrainState,
        cameras: Camera,  # stacked pytree, array leaves [B,...]
        gt_images: jnp.ndarray,  # [B,H,W,3]
        bg: jnp.ndarray,  # [3] replicated
        gt_alphas: jnp.ndarray | None = None,  # [B,H,W,1]
        frozen: jnp.ndarray | bool = False,
        frame_idx: jnp.ndarray | None = None,  # [B] int32
        pix_masks: jnp.ndarray | None = None,  # [B,H,W,1] bucketing masks
    ) -> tuple[TrainState, StepAux]:
        step = ts.step + 1
        initial_stage = step < opt_cfg.init_until_iter
        frozen_f = jnp.asarray(frozen, bool)
        if frame_idx is None:
            frame_idx = -jnp.ones((n_dp,), jnp.int32)

        params = ts.gaussians.param_pytree()
        if isp_on:
            params = {**params, **_isp_leaves(ts.isp)}

        def device_fn(params, gaussians, cam_b, gt_b, alpha_b, fidx_b,
                      bg_r, initial_r, frozen_r, pixm_b):
            cam = jax.tree.map(lambda x: x[0], cam_b)
            gt = gt_b[0]
            alpha = None if alpha_b is None else alpha_b[0]
            pixm = None if pixm_b is None else pixm_b[0]
            so = jnp.zeros((gaussians.capacity, 2))
            (loss, (out, l1, ssim_v, normal_loss, mse)), (gp, gso) = (
                jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                    params, so, gaussians, cam, gt, alpha, bg_r,
                    initial_r, fidx_b[0], frozen_r, pixm,
                )
            )
            pmean = lambda t: jax.lax.pmean(t, dp_axis)
            gp = jax.tree.map(pmean, gp)
            loss, l1, ssim_v, normal_loss, mse = map(
                pmean, (loss, l1, ssim_v, normal_loss, mse)
            )
            # densify statistics: combine the B per-camera contributions the
            # way B sequential add_stats calls would (densify.py:60-78)
            vis = out.visibility.astype(jnp.float32)
            gnorm = jnp.linalg.norm(gso, axis=-1)
            w = out.gaussian_weights
            wmask = (w > 0.0).astype(jnp.float32)
            psum = lambda t: jax.lax.psum(t, dp_axis)
            stat_contrib = (
                psum(gnorm * vis),
                psum(vis),
                psum(w * wmask),
                psum(wmask),
                jax.lax.pmax(out.radii.astype(jnp.float32) * vis, dp_axis),
            )
            diag = (
                jax.lax.pmax(out.num_instances, dp_axis),
                jax.lax.pmax(out.max_tile_count, dp_axis),
                jax.lax.pmax(out.pad_overflow, dp_axis),
            )
            return gp, stat_contrib, diag, (loss, l1, ssim_v, normal_loss, mse)

        cam_specs = jax.tree.map(lambda _: P(dp_axis), cameras)
        alpha_spec = None if gt_alphas is None else P(dp_axis)
        pixm_spec = None if pix_masks is None else P(dp_axis)
        rep = jax.tree.map(lambda _: P(), params)
        g_rep = jax.tree.map(lambda _: P(), ts.gaussians)
        gparams, stat_contrib, diag, losses = jax.shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(rep, g_rep, cam_specs, P(dp_axis), alpha_spec, P(dp_axis),
                      P(), P(), P(), pixm_spec),
            out_specs=(rep, P(), P(), P()),
            check_vma=False,
        )(params, ts.gaussians, cameras, gt_images, gt_alphas, frame_idx,
          jnp.asarray(bg, jnp.float32), initial_stage, frozen_f, pix_masks)
        loss, l1, ssim_v, normal_loss, mse = losses

        # identical traced-schedule update as the single-camera step
        lrs = dict(base_lrs)
        lrs["xyz"] = xyz_sched(step)
        lrs["opacity"] = ts.opacity_lr
        frozen_xyz = step > freeze_xyz_from
        lrs["xyz"] = jnp.where(frozen_xyz, 0.0, lrs["xyz"])
        lrs["rotation"] = jnp.where(frozen_xyz, 0.0, base_lrs["rotation"])
        lrs = {
            k: jnp.where(frozen_f, 0.0, jnp.asarray(v, jnp.float32))
            for k, v in lrs.items()
        }
        lrs["isp"] = jnp.asarray(base_lrs["isp"], jnp.float32)

        new_params, new_opt = adam_step(params, gparams, ts.opt, lrs)
        new_g = ts.gaussians.with_params(new_params)
        new_isp = _isp_from_leaves(new_params) if isp_on else ts.isp

        bump = (
            (step > opt_cfg.feature_rest_from_iter)
            & (step % 1000 == 0)
            & ~frozen_f
        )
        new_deg = jnp.minimum(
            new_g.active_sh_degree + bump.astype(jnp.int32), new_g.max_sh_degree
        )
        new_g = new_g.replace(active_sh_degree=new_deg)

        d_grad, d_vis, d_w, d_wm, d_rad = stat_contrib
        stats = DensifyStats(
            grad_accum=ts.stats.grad_accum + d_grad,
            denom=ts.stats.denom + d_vis,
            accum_w=ts.stats.accum_w + d_w,
            denom_w=ts.stats.denom_w + d_wm,
            max_radii=jnp.maximum(ts.stats.max_radii, d_rad),
        )

        aux = StepAux(
            loss=loss,
            l1=l1,
            ssim=ssim_v,
            normal_loss=normal_loss,
            psnr=-10.0 * jnp.log10(mse),
            num_instances=diag[0],
            max_tile_count=diag[1],
            n_alive=new_g.num_alive,
            pad_overflow=diag[2],
        )
        return (
            ts.replace(
                gaussians=new_g, opt=new_opt, stats=stats, step=step,
                isp=new_isp,
            ),
            aux,
        )

    return dp_step
