"""Learned per-frame ISP post-processing (PPISP role).

The reference imports a `ppisp` package that is NOT vendored in the repo and
absent from its requirements (train.py:27; see SURVEY.md §2.14) — its API is
reconstructed from the call sites:
  - PPISPConfig(use_controller, controller_distillation,
    controller_activation_ratio)                      (train.py:71-75)
  - PPISP(num_cameras, num_frames, config)(rgb_hwc, pixel_coords, resolution,
    camera_idx, frame_idx) -> rgb_hwc; frame_idx=-1 = unknown/test frame
    (utils/post_process_utils.py:20-41)
  - get_regularization_loss() -> scalar               (train.py:195)

This implementation: a per-frame affine color transform (3x3 gain matrix +
bias, identity-init) plus a per-frame smooth monotone tone curve (gamma-ish
via softplus exponent), and a shared "controller" transform. Before the
activation point each frame uses its own transform and the controller is
distilled toward the per-frame mean (controller_distillation); after it
(scene frozen, train.py:123-124) the controller alone is refined and unknown
frames (frame_idx = -1, test views) always use the controller.
Regularization pulls per-frame transforms toward identity.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ISPConfig(NamedTuple):
    use_controller: bool = True
    controller_distillation: bool = True
    controller_activation_ratio: float = 0.875
    reg_weight: float = 1e-3
    distill_weight: float = 1e-2


class ISPParams(NamedTuple):
    gain: jnp.ndarray  # [F, 3, 3] per-frame color matrix (identity init)
    bias: jnp.ndarray  # [F, 3]
    log_gamma: jnp.ndarray  # [F, 3] tone exponent (0 => gamma 1)
    ctrl_gain: jnp.ndarray  # [3, 3] controller
    ctrl_bias: jnp.ndarray  # [3]
    ctrl_log_gamma: jnp.ndarray  # [3]


def init_isp(num_frames: int) -> ISPParams:
    eye = jnp.eye(3)
    return ISPParams(
        gain=jnp.tile(eye[None], (num_frames, 1, 1)),
        bias=jnp.zeros((num_frames, 3)),
        log_gamma=jnp.zeros((num_frames, 3)),
        ctrl_gain=eye,
        ctrl_bias=jnp.zeros(3),
        ctrl_log_gamma=jnp.zeros(3),
    )


def _transform(rgb, gain, bias, log_gamma):
    out = jnp.einsum("hwc,dc->hwd", rgb, gain, precision="highest") + bias
    gamma = jnp.exp(log_gamma)
    return jnp.clip(out, 0.0, None) ** gamma


def apply_isp(
    params: ISPParams,
    rgb: jnp.ndarray,  # [H,W,3]
    frame_idx: jnp.ndarray | int,
    use_controller: jnp.ndarray | bool = False,
) -> jnp.ndarray:
    """frame_idx = -1 (unknown/test view) or `use_controller` selects the
    shared controller transform; otherwise the frame's own."""
    fi = jnp.asarray(frame_idx)
    unknown = (fi < 0) | jnp.asarray(use_controller)
    safe = jnp.maximum(fi, 0)
    gain = jnp.where(unknown, params.ctrl_gain, params.gain[safe])
    bias = jnp.where(unknown, params.ctrl_bias, params.bias[safe])
    lg = jnp.where(unknown, params.ctrl_log_gamma, params.log_gamma[safe])
    return _transform(rgb, gain, bias, lg)


def isp_regularization(params: ISPParams, cfg: ISPConfig) -> jnp.ndarray:
    """Identity pull + controller distillation toward the per-frame mean."""
    eye = jnp.eye(3)
    reg = (
        jnp.mean((params.gain - eye) ** 2)
        + jnp.mean(params.bias**2)
        + jnp.mean(params.log_gamma**2)
    )
    loss = cfg.reg_weight * reg
    if cfg.use_controller and cfg.controller_distillation:
        distill = (
            jnp.mean((params.ctrl_gain - jnp.mean(params.gain, axis=0)) ** 2)
            + jnp.mean((params.ctrl_bias - jnp.mean(params.bias, axis=0)) ** 2)
            + jnp.mean(
                (params.ctrl_log_gamma - jnp.mean(params.log_gamma, axis=0)) ** 2
            )
        )
        loss = loss + cfg.distill_weight * distill
    return loss
