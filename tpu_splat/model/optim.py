"""Per-group Adam with runtime learning rates + functional state surgery.

Role of the reference's torch.optim.Adam setup (scene/gaussian_model.py:189-211)
and its optimizer "surgery" helpers (:395-482): here the Adam moments are an
explicit pytree mirroring the parameter dict, so densify/prune/reset rewrite
moment rows with the same masked ops as the parameters — no stateful
optimizer object to patch.

Learning rates are a dict of scalars supplied per step (so the xyz schedule
and the opacity-LR pulsing are traced values, not recompiles). Matches torch
Adam semantics: betas (0.9, 0.999), eps=1e-15 added OUTSIDE the sqrt, bias
correction by global step count.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_splat.core.transforms import expon_lr_schedule

B1, B2 = 0.9, 0.999
EPS = 1e-15

# param dict key -> lr group name (reference training_setup group names)
PARAM_GROUP = {
    "xyz": "xyz",
    "features_dc": "f_dc",
    "features_rest": "f_rest",
    "opacity": "opacity",
    "scaling": "scaling",
    "rotation": "rotation",
    "refl": "refl",
    "env_texture": "env",
    "env_fail": "env",
}


def param_group(key: str) -> str:
    if key.startswith("isp_"):
        return "isp"
    return PARAM_GROUP[key]


class AdamState(NamedTuple):
    mu: dict
    nu: dict
    count: jnp.ndarray  # [] int32


def adam_init(params: dict) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params), count=jnp.zeros((), jnp.int32))


def adam_step(
    params: dict, grads: dict, state: AdamState, lrs: dict
) -> tuple[dict, AdamState]:
    """lrs: group-name -> scalar lr (traced ok)."""
    count = state.count + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - B1**c
    bc2 = 1.0 - B2**c

    new_params, new_mu, new_nu = {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        mu = B1 * state.mu[k] + (1 - B1) * g
        nu = B2 * state.nu[k] + (1 - B2) * (g * g)
        update = (mu / bc1) / (jnp.sqrt(nu / bc2) + EPS)
        lr = lrs[param_group(k)]
        new_params[k] = p - lr * update
        new_mu[k] = mu
        new_nu[k] = nu
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)


def default_lrs(opt, spatial_lr_scale: float) -> dict:
    """Static base lrs (reference training_setup, gaussian_model.py:195-207)."""
    return {
        "xyz": opt.position_lr_init * spatial_lr_scale,
        "f_dc": opt.feature_lr,
        "f_rest": opt.feature_lr / 20.0,
        "opacity": opt.opacity_lr,
        "scaling": opt.scaling_lr,
        "rotation": opt.rotation_lr,
        "refl": opt.refl_lr,
        "env": opt.envmap_cubemap_lr,
        "isp": 1e-3,  # learned ISP group (PPISP role; dep absent in reference)
    }


def xyz_lr_schedule(opt, spatial_lr_scale: float):
    """The exponential-decay position schedule (reference :208-211)."""
    return expon_lr_schedule(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )


def reset_moments(state: AdamState, key: str) -> AdamState:
    """Zero Adam moments of one param (reference replace_tensor_to_optimizer,
    gaussian_model.py:395-408 — used by opacity/refl resets)."""
    mu = dict(state.mu)
    nu = dict(state.nu)
    mu[key] = jnp.zeros_like(mu[key])
    nu[key] = jnp.zeros_like(nu[key])
    return state._replace(mu=mu, nu=nu)


def remap_rows(state: AdamState, keys: list[str], src_idx: jnp.ndarray, keep: jnp.ndarray) -> AdamState:
    """Row-remap Adam moments during densification (reference
    _prune_optimizer/cat_tensors_to_optimizer, gaussian_model.py:410-482):
    moments follow their rows; newly created rows get zero moments
    (keep=False)."""
    def remap(a):
        out = a[src_idx]
        shape = (-1,) + (1,) * (a.ndim - 1)
        return out * keep.reshape(shape).astype(a.dtype)

    mu = dict(state.mu)
    nu = dict(state.nu)
    for k in keys:
        mu[k] = remap(mu[k])
        nu[k] = remap(nu[k])
    return state._replace(mu=mu, nu=nu)
