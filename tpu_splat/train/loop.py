"""Training orchestration: the scheduled-event state machine around the step.

Role of the reference train.py:201-320 no_grad block: densification window,
opacity resets, opacity-LR pulsing, normal propagation, color sabotage,
env-map doubling, scene freezing — at the reference's exact intervals and
gatings. Events mutate TrainState between jitted steps; each event is itself
a jitted transform.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from tpu_splat.model.densify import densify_and_prune
from tpu_splat.model import ops as gops
from tpu_splat.train.step import TrainState


@dataclasses.dataclass
class EventLog:
    densified: int = 0
    pruned: int = 0
    overflowed: int = 0
    events: list = dataclasses.field(default_factory=list)


def outside_scope_mask(state, opt_cfg):
    """train.py:60-63 get_outside_msk."""
    if not opt_cfg.use_env_scope:
        return None
    c = jnp.asarray(opt_cfg.env_scope_center)
    return (
        jnp.sum((state.xyz - c[None]) ** 2, axis=-1) > opt_cfg.env_scope_radius**2
    )


def run_scheduled_events(
    ts: TrainState,
    iteration: int,
    opt_cfg,
    cameras_extent: float,
    cameras_mean: np.ndarray,
    scene_frozen: bool = False,
    log: Optional[EventLog] = None,
) -> TrainState:
    """Apply every event scheduled at `iteration` (host-side control flow;
    each branch condition is a python int comparison exactly as in
    train.py:227-290)."""
    log = log if log is not None else EventLog()
    densify_until = opt_cfg.densify_until_iter + opt_cfg.longer_prop_iter
    normal_prop_until = opt_cfg.normal_prop_until_iter + opt_cfg.longer_prop_iter
    sabotage_until = opt_cfg.color_sabotage_until_iter + opt_cfg.longer_prop_iter

    g, opt = ts.gaussians, ts.opt

    if iteration == densify_until:
        g, opt = gops.double_env_map(g, opt)
        log.events.append((iteration, "double_env_map"))

    opacity_reset_0 = False
    if (not scene_frozen) and iteration < densify_until:
        in_prop_window = opt_cfg.init_until_iter < iteration <= normal_prop_until
        interval = (
            opt_cfg.densification_interval_when_prop
            if (not opt_cfg.disable_normal_propagation and in_prop_window)
            else opt_cfg.densification_interval
        )
        if iteration > opt_cfg.densify_from_iter and iteration % interval == 0:
            size_prune = iteration > opt_cfg.opacity_reset_interval
            key, sub = jax.random.split(ts.key)
            res = densify_and_prune(
                g,
                opt,
                ts.stats,
                sub,
                grad_threshold=opt_cfg.densify_grad_threshold,
                percent_dense=opt_cfg.percent_dense,
                extent=cameras_extent,
                cameras_mean=jnp.asarray(cameras_mean),
                size_prune=size_prune,
            )
            g, opt = res.state, res.opt_state
            ts = ts.replace(stats=res.stats, key=key)
            log.densified += int(res.n_cloned) + int(res.n_split)
            log.pruned += int(res.n_pruned)
            log.overflowed += int(res.overflow)

        if iteration % opt_cfg.opacity_reset_interval == 0:
            opacity_reset_0 = True
            g, opt = gops.reset_opacity(g, opt)
            log.events.append((iteration, "reset_opacity"))

        if (
            opt_cfg.opac_lr0_interval > 0
            and (iteration - 500) % opt_cfg.opac_lr0_interval == 0
            and in_prop_window
        ):
            ts = ts.replace(opacity_lr=jnp.asarray(opt_cfg.opacity_lr, jnp.float32))

        if (iteration - 500) % opt_cfg.normal_prop_interval == 0 and in_prop_window:
            if not opacity_reset_0 and not opt_cfg.disable_normal_propagation:
                outside = outside_scope_mask(g, opt_cfg)
                opac_mask = jax.nn.sigmoid(g.opacity[:, 0]) > 0.9
                if outside is not None:
                    opac_mask = opac_mask | outside
                g, opt = gops.reset_opacity(g, opt, reset_value=0.9, exclusive_msk=opac_mask)

                scale_mask = jax.nn.sigmoid(g.refl[:, 0]) < 0.02
                if outside is not None:
                    scale_mask = scale_mask | outside
                g, opt = gops.reset_scale(g, opt, enlarge_scale=1.5, exclusive_msk=scale_mask)

                g, opt = gops.reset_refl(g, opt, opt_cfg.refl_init_value)

                if opt_cfg.opac_lr0_interval > 0 and iteration != normal_prop_until:
                    ts = ts.replace(opacity_lr=jnp.asarray(0.0, jnp.float32))
                log.events.append((iteration, "normal_prop"))

    if (
        (iteration - 500) % opt_cfg.color_sabotage_interval == 0
        and opt_cfg.init_until_iter < iteration <= sabotage_until
        and not opt_cfg.disable_color_sabotage
    ):
        color_mask = jax.nn.sigmoid(g.refl[:, 0]) > 0.1
        outside = outside_scope_mask(g, opt_cfg)
        if outside is not None:
            color_mask = color_mask | outside
        key, sub = jax.random.split(ts.key)
        g, opt = gops.dist_color(g, opt, sub, exclusive_msk=color_mask)
        ts = ts.replace(key=key)
        log.events.append((iteration, "color_sabotage"))

    return ts.replace(gaussians=g, opt=opt)


def is_scene_frozen(iteration: int, opt_cfg, post_process: bool) -> bool:
    """PPISP controller freeze (train.py:71-75,123-124): last 5000 iterations
    the Gaussians stop training and only the ISP refines."""
    if not post_process:
        return False
    ratio = (opt_cfg.iterations - 5000) / opt_cfg.iterations
    return iteration >= ratio * opt_cfg.iterations
