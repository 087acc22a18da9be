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

Spatial surface: the reference call sites pass `pixel_coords [H,W,2]`,
`resolution=(W,H)` and `camera_idx` (utils/post_process_utils.py:20-41) —
i.e. the ISP has a position-dependent, per-camera component. We model it as
a classic even-polynomial vignette field with a learnable optical center per
camera: gain(x) = 1 + a1·r² + a2·r⁴ where r is the distance from the center
(in units of the half-diagonal). Identity init (a=0, center at the image
center); gradients flow to the per-camera params through pixel_coords.
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
    vig_coef: jnp.ndarray  # [C, 2] per-camera radial vignette (a1, a2)
    vig_center: jnp.ndarray  # [C, 2] optical-center offset, fraction of (W,H)


def init_isp(num_frames: int, num_cameras: int = 1) -> ISPParams:
    eye = jnp.eye(3)
    return ISPParams(
        gain=jnp.tile(eye[None], (num_frames, 1, 1)),
        bias=jnp.zeros((num_frames, 3)),
        log_gamma=jnp.zeros((num_frames, 3)),
        ctrl_gain=eye,
        ctrl_bias=jnp.zeros(3),
        ctrl_log_gamma=jnp.zeros(3),
        vig_coef=jnp.zeros((num_cameras, 2)),
        vig_center=jnp.zeros((num_cameras, 2)),
    )


def pixel_coord_grid(height: int, width: int) -> jnp.ndarray:
    """[H,W,2] (x, y) pixel-center coordinates — the grid the reference call
    sites hand to the ISP (utils/post_process_utils.py:20-41)."""
    x = jnp.arange(width, dtype=jnp.float32) + 0.5
    y = jnp.arange(height, dtype=jnp.float32) + 0.5
    return jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)


def _vignette_gain(params: ISPParams, pixel_coords, resolution, camera_idx):
    """[H,W,1] radial gain field 1 + a1 r² + a2 r⁴ for one camera."""
    ci = jnp.maximum(jnp.asarray(camera_idx), 0)
    w, h = resolution
    wh = jnp.asarray([w, h], jnp.float32)
    center = (0.5 + params.vig_center[ci]) * wh
    half_diag = 0.5 * jnp.sqrt(jnp.sum(wh**2))
    r2 = jnp.sum(((pixel_coords - center) / half_diag) ** 2, axis=-1)
    a1, a2 = params.vig_coef[ci, 0], params.vig_coef[ci, 1]
    return (1.0 + a1 * r2 + a2 * r2 * r2)[..., None]


def _transform(rgb, gain, bias, log_gamma):
    out = jnp.einsum("hwc,dc->hwd", rgb, gain, precision="highest") + bias
    gamma = jnp.exp(log_gamma)
    return jnp.clip(out, 0.0, None) ** gamma


def apply_isp(
    params: ISPParams,
    rgb: jnp.ndarray,  # [H,W,3]
    frame_idx: jnp.ndarray | int,
    use_controller: jnp.ndarray | bool = False,
    pixel_coords: jnp.ndarray | None = None,  # [H,W,2]
    resolution: tuple | None = None,  # (W, H)
    camera_idx: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """frame_idx = -1 (unknown/test view) or `use_controller` selects the
    shared controller transform; otherwise the frame's own. The per-camera
    vignette field multiplies the input before the color transform
    (signature parity with utils/post_process_utils.py:20-41)."""
    fi = jnp.asarray(frame_idx)
    unknown = (fi < 0) | jnp.asarray(use_controller)
    safe = jnp.maximum(fi, 0)
    gain = jnp.where(unknown, params.ctrl_gain, params.gain[safe])
    bias = jnp.where(unknown, params.ctrl_bias, params.bias[safe])
    lg = jnp.where(unknown, params.ctrl_log_gamma, params.log_gamma[safe])
    h, w = rgb.shape[0], rgb.shape[1]
    if pixel_coords is None:
        pixel_coords = pixel_coord_grid(h, w)
    if resolution is None:
        resolution = (w, h)
    rgb = rgb * _vignette_gain(params, pixel_coords, resolution, camera_idx)
    return _transform(rgb, gain, bias, lg)


def isp_regularization(params: ISPParams, cfg: ISPConfig) -> jnp.ndarray:
    """Identity pull + controller distillation toward the per-frame mean."""
    eye = jnp.eye(3)
    reg = (
        jnp.mean((params.gain - eye) ** 2)
        + jnp.mean(params.bias**2)
        + jnp.mean(params.log_gamma**2)
        + jnp.mean(params.vig_coef**2)
        + jnp.mean(params.vig_center**2)
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
