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
from tpu_splat.raster.config import RasterConfig
from tpu_splat.renderer.render import render
from tpu_splat.train.losses import l1_loss, ssim


@struct.dataclass
class TrainState:
    gaussians: GaussianState
    opt: AdamState
    stats: DensifyStats
    step: jnp.ndarray  # [] int32 (1-based like the reference loop)
    opacity_lr: jnp.ndarray  # [] f32, pulsed by normal-prop events
    key: jax.Array

    @classmethod
    def create(cls, gaussians: GaussianState, opt_cfg, seed: int = 0) -> "TrainState":
        return cls(
            gaussians=gaussians,
            opt=adam_init(gaussians.param_pytree()),
            stats=DensifyStats.zeros(gaussians.capacity),
            step=jnp.zeros((), jnp.int32),
            opacity_lr=jnp.asarray(opt_cfg.opacity_lr, jnp.float32),
            key=jax.random.PRNGKey(seed),
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


def make_train_step(
    opt_cfg,
    cfg: RasterConfig,
    spatial_lr_scale: float,
    use_env_scope: bool = False,
    env_scope_center=(0.0, 0.0, 0.0),
    env_scope_radius: float = 0.0,
    isp_apply=None,
    mesh=None,
    mesh_axis: str = "tiles",
):
    """Build the jitted train step. `opt_cfg` is an OptimizationParams-like
    object (static). `isp_apply(params, img, frame_idx) -> img` optionally
    post-processes the render before the loss (PPISP role, train.py:162-165);
    ISP params then ride in the grad pytree of the caller (see isp module).
    """
    xyz_sched = xyz_lr_schedule(opt_cfg, spatial_lr_scale)
    base_lrs = default_lrs(opt_cfg, spatial_lr_scale)
    lambda_dssim = opt_cfg.lambda_dssim
    lambda_normal = opt_cfg.lambda_normal
    refl_mask_loss_weight = 0.4  # train.py:60 refl_mask_loss_weight
    freeze_xyz_from = opt_cfg.iterations - 10_000  # train.py:232-233

    def loss_fn(params, screen_offset, state: GaussianState, camera, gt_image,
                gt_alpha, bg, initial_stage):
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
        if gt_alpha is not None:
            # composite both over bg with their alphas (train.py:154-159)
            gt = gt * gt_alpha + (1 - gt_alpha) * bg
            rgb = rgb * out.alpha + (1 - out.alpha) * bg
        if isp_apply is not None:
            rgb = isp_apply(params, rgb)

        l1 = l1_loss(rgb, gt)
        ssim_v = ssim(rgb, gt)
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
        normal_loss = lambda_normal * jnp.mean(normal_err)
        if not opt_cfg.disable_normal_consistentcy_loss:
            loss = loss + normal_loss

        mse = jnp.mean((rgb - gt) ** 2)
        aux = (out, l1, ssim_v, normal_loss, mse)
        return loss, aux

    def train_step(
        ts: TrainState,
        camera: Camera,
        gt_image: jnp.ndarray,
        bg: jnp.ndarray,
        gt_alpha: jnp.ndarray | None = None,
        frozen: jnp.ndarray | bool = False,
    ) -> tuple[TrainState, StepAux]:
        step = ts.step + 1
        initial_stage = step < opt_cfg.init_until_iter
        params = ts.gaussians.param_pytree()
        so = jnp.zeros((ts.gaussians.capacity, 2))

        (loss, (out, l1, ssim_v, normal_loss, mse)), (gparams, gso) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, so, ts.gaussians, camera, gt_image, gt_alpha, bg,
                initial_stage,
            )
        )

        # learning rates: traced schedule (train.py:126-129, 232-233, 260-281)
        lrs = dict(base_lrs)
        lrs["xyz"] = xyz_sched(step)
        lrs["opacity"] = ts.opacity_lr
        frozen_xyz = step > freeze_xyz_from
        lrs["xyz"] = jnp.where(frozen_xyz, 0.0, lrs["xyz"])
        lrs["rotation"] = jnp.where(frozen_xyz, 0.0, base_lrs["rotation"])
        frozen_f = jnp.asarray(frozen, bool)
        lrs = {k: jnp.where(frozen_f, 0.0, jnp.asarray(v, jnp.float32)) for k, v in lrs.items()}

        new_params, new_opt = adam_step(params, gparams, ts.opt, lrs)
        new_g = ts.gaussians.with_params(new_params)

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
        )
        return (
            ts.replace(gaussians=new_g, opt=new_opt, stats=stats, step=step),
            aux,
        )

    return train_step
