"""Quaternion / activation / schedule math (pure jnp).

Capability parity with reference utils/general_utils.py:18-110 and the
quaternion handling in diff-surfel-rasterization/cuda_rasterizer/auxiliary.h:217-296,
re-expressed as batched JAX ops (no per-element kernels; XLA vectorizes on the VPU).
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """L2-normalize along `axis`. eps>0 guards the zero vector."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / (n + eps) if eps else v / n


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w, x, y, z) unnormalized quaternion -> [..., 3, 3] rotation.

    Layout matches the reference parameter convention (w first:
    utils/general_utils.py:78-99); normalization is folded in like
    auxiliary.h:217-239 so gradients flow through the norm.
    Columns of R are the rotated basis axes; column 2 is the surfel normal.
    """
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1.0 - x))


def expon_lr_schedule(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1000000,
):
    """Log-linear lr decay with optional sine-warmup delay.

    Mirrors the Plenoxels-style schedule used for xyz learning rates
    (reference utils/general_utils.py:29-62). Returns a function usable both
    with python ints and traced step arrays (optax-compatible).
    """

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        return jnp.where(step < 0, 0.0, delay_rate * log_lerp)

    return schedule
