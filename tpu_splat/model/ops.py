"""Scheduled parameter mutations for reflection training.

Functional equivalents of the fork's GaussianModel ops
(scene/gaussian_model.py:213-294,374-393): opacity/refl resets, color
sabotage, scale enlargement, env-map doubling/sharpening. Each returns a new
state (and, where the reference resets Adam moments via
replace_tensor_to_optimizer, the matching moment reset)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_splat.core.transforms import inverse_sigmoid
from tpu_splat.envmap.cubemap import resize_cubemap, sharpen_cubemap
from tpu_splat.model.state import GaussianState
from tpu_splat.model.optim import AdamState, reset_moments


def _masked(new, old, exclusive_msk):
    if exclusive_msk is None:
        return new
    m = exclusive_msk.reshape((-1,) + (1,) * (new.ndim - 1))
    return jnp.where(m, old, new)


def reset_refl(
    state: GaussianState,
    opt_state: AdamState,
    init_refl_value: float,
    exclusive_msk=None,
):
    """Floor refl at its init value (reference reset_refl :264-269)."""
    refl_act = jax.nn.sigmoid(state.refl)
    new = inverse_sigmoid(jnp.maximum(refl_act, init_refl_value))
    new = _masked(new, state.refl, exclusive_msk)
    return state.replace(refl=new), reset_moments(opt_state, "refl")


def reset_opacity(
    state: GaussianState,
    opt_state: AdamState,
    reset_value: float = 0.01,
    exclusive_msk=None,
):
    """Cap opacity at reset_value (reference reset_opacity :271-276)."""
    opa_act = jax.nn.sigmoid(state.opacity)
    new = inverse_sigmoid(jnp.clip(jnp.minimum(opa_act, reset_value), 1e-7, 1 - 1e-7))
    new = _masked(new, state.opacity, exclusive_msk)
    return state.replace(opacity=new), reset_moments(opt_state, "opacity")


def raise_opacity(
    state: GaussianState,
    opt_state: AdamState,
    raise_value: float,
    exclusive_msk=None,
):
    """Raise opacity toward `raise_value` — the normal-propagation event uses
    reset_opacity with reset_value=0.9 which *lowers* anything above; the
    trainer excludes already-opaque points via exclusive mask
    (train.py:263-278). Provided for that call pattern."""
    return reset_opacity(state, opt_state, raise_value, exclusive_msk)


def dist_color(
    state: GaussianState,
    opt_state: AdamState,
    key: jax.Array,
    noise_range: float = 0.4,
    exclusive_msk=None,
):
    """Color sabotage: uniform noise on DC color (reference dist_color
    :278-284)."""
    noise = jax.random.uniform(
        key, state.features_dc.shape, minval=-noise_range, maxval=noise_range
    )
    new = _masked(state.features_dc + noise, state.features_dc, exclusive_msk)
    return state.replace(features_dc=new), reset_moments(opt_state, "features_dc")


def reset_scale(
    state: GaussianState,
    opt_state: AdamState,
    enlarge_scale: float = 1.5,
    exclusive_msk=None,
):
    """Enlarge all but the smallest axis (reference reset_scale :286-294)."""
    scales = jnp.exp(state.scaling)
    min_axis = jnp.argmin(scales, axis=-1)
    factor = jnp.full_like(scales, enlarge_scale)
    factor = factor.at[jnp.arange(scales.shape[0]), min_axis].set(1.0)
    new = jnp.log(scales * factor)
    new = _masked(new, state.scaling, exclusive_msk)
    return state.replace(scaling=new), reset_moments(opt_state, "scaling")


def double_env_map(state: GaussianState, opt_state: AdamState):
    """x2 cubemap resolution with bicubic upsample + env Adam-moment reset
    (reference double_env_map :375-379 + replace_env_map :384-393).
    NOTE: changes the env_texture leaf shape -> triggers one recompile."""
    new_env = resize_cubemap(state.env, state.env.resolution * 2)
    mu = dict(opt_state.mu)
    nu = dict(opt_state.nu)
    mu["env_texture"] = jnp.zeros_like(new_env.texture)
    nu["env_texture"] = jnp.zeros_like(new_env.texture)
    mu["env_fail"] = jnp.zeros_like(new_env.fail_value)
    nu["env_fail"] = jnp.zeros_like(new_env.fail_value)
    return state.replace(env=new_env), opt_state._replace(mu=mu, nu=nu)


def filter_env_map(state: GaussianState, opt_state: AdamState):
    """Sharpen the env map (reference filter_env_map :380-382)."""
    new_env = sharpen_cubemap(state.env)
    mu = dict(opt_state.mu)
    nu = dict(opt_state.nu)
    mu["env_texture"] = jnp.zeros_like(new_env.texture)
    nu["env_texture"] = jnp.zeros_like(new_env.texture)
    return state.replace(env=new_env), opt_state._replace(mu=mu, nu=nu)
