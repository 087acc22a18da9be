"""Adaptive density control — functional, static-capacity, jit-able.

Role of the reference densify/prune machinery (scene/gaussian_model.py:484-584
+ add_densification_stats) rebuilt without optimizer surgery: rows live in a
fixed-capacity array with an alive mask; pruning clears the mask, and
clone/split children are compacted into free slots with a prefix-sum ranking
(deterministic scatter — no dynamic allocation, no recompiles until capacity
is exceeded, reported via the returned `overflow` count).

Semantics preserved (in order, matching densify_and_prune :551-577):
1. weight pruning: rows whose mean max-blend-weight < 0.01 die;
2. clone: grad >= threshold and max scale <= percent_dense*extent -> copy;
3. split: grad >= threshold and max scale > percent_dense*extent -> two
   children sampled from the surfel (2D stds, zero 3rd axis, rotated), scales
   /(0.8*N); original dies;
4. world-size pruning: max scale > 0.1*extent inside the camera-mean sphere or
   > 1.5*extent outside (the reference's screen-radius prune is dead code:
   max_radii2D is zeroed by densification_postfix before it is read — we
   faithfully omit it);
5. all densification stats reset; Adam moments of new rows zeroed, surviving
   rows keep theirs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_splat.core.transforms import quat_to_rotmat
from tpu_splat.model.state import GaussianState
from tpu_splat.model.optim import AdamState

GAUSSIAN_PARAM_KEYS = [
    "xyz",
    "features_dc",
    "features_rest",
    "opacity",
    "scaling",
    "rotation",
    "refl",
]


class DensifyStats(NamedTuple):
    """Per-Gaussian accumulators (reference training_setup :190-193)."""

    grad_accum: jnp.ndarray  # [P] sum of screen-space grad norms
    denom: jnp.ndarray  # [P]
    accum_w: jnp.ndarray  # [P] sum of max blend weights
    denom_w: jnp.ndarray  # [P]
    max_radii: jnp.ndarray  # [P] max screen radius seen

    @classmethod
    def zeros(cls, capacity: int) -> "DensifyStats":
        z = jnp.zeros((capacity,), jnp.float32)
        return cls(z, z, z, z, z)


def add_stats(
    stats: DensifyStats,
    screen_grad: jnp.ndarray,  # [P,2] grad of the screen_offset probe
    visibility: jnp.ndarray,  # [P] bool (radii > 0)
    gaussian_weights: jnp.ndarray,  # [P] max blend weight this frame
    radii: jnp.ndarray,  # [P]
) -> DensifyStats:
    """Reference add_densification_stats (:579-584) + max_radii2D tracking
    (train.py:242-243)."""
    gnorm = jnp.linalg.norm(screen_grad, axis=-1)
    vis = visibility.astype(jnp.float32)
    wmask = (gaussian_weights > 0.0).astype(jnp.float32)
    return DensifyStats(
        grad_accum=stats.grad_accum + gnorm * vis,
        denom=stats.denom + vis,
        accum_w=stats.accum_w + gaussian_weights * wmask,
        denom_w=stats.denom_w + wmask,
        max_radii=jnp.maximum(stats.max_radii, radii.astype(jnp.float32) * vis),
    )


class DensifyResult(NamedTuple):
    state: GaussianState
    opt_state: AdamState
    stats: DensifyStats
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    overflow: jnp.ndarray  # candidates dropped for lack of capacity


def densify_and_prune(
    state: GaussianState,
    opt_state: AdamState,
    stats: DensifyStats,
    key: jax.Array,
    grad_threshold: float,
    percent_dense: float,
    extent: float,
    cameras_mean: jnp.ndarray,
    size_prune: bool | jnp.ndarray = True,
    weight_prune_threshold: float = 0.01,
    N: int = 2,
) -> DensifyResult:
    P = state.capacity
    alive = state.alive
    scaling = jnp.exp(state.scaling)  # [P,2]
    max_scale = jnp.max(scaling, axis=-1)

    # 1. weight pruning (:552-555)
    mean_w = jnp.where(stats.denom_w > 0, stats.accum_w / stats.denom_w, 0.0)
    w_prune = (mean_w < weight_prune_threshold) & alive
    survivors = alive & ~w_prune

    grads = jnp.where(stats.denom > 0, stats.grad_accum / stats.denom, 0.0)
    grads = jnp.nan_to_num(grads, 0.0)
    hot = survivors & (grads >= grad_threshold)
    clone_sel = hot & (max_scale <= percent_dense * extent)
    split_sel = hot & (max_scale > percent_dense * extent)

    # 4. world-size pruning (applies to originals; new children have the same
    # scales for clones, smaller for splits — reference applies it after
    # densification so clones can die immediately; we apply the same rule to
    # clone sources, which is equivalent since clones copy attributes)
    inside = jnp.sum((state.xyz - cameras_mean[None]) ** 2, axis=-1) < extent**2
    big_ws = ((max_scale > 0.1 * extent) & inside) | (
        (max_scale > 1.5 * extent) & ~inside
    )
    big_ws = big_ws & jnp.asarray(size_prune)
    clone_sel = clone_sel & ~big_ws

    keep = survivors & ~split_sel & ~big_ws

    # --- build candidate rows: [clone children; split children A; split B]
    # split children: x = R @ sample + mean, sample ~ N(0, diag(s1,s2,0))
    R = quat_to_rotmat(state.rotation)  # [P,3,3]
    eps = jax.random.normal(key, (N, P, 2))
    offs = jnp.einsum("pij,npj->npi", R[..., :, :2], eps * scaling[None])  # [N,P,3]
    split_xyz = state.xyz[None] + offs  # [N,P,3]
    split_scaling = jnp.log(scaling / (0.8 * N))  # [P,2]

    cand_mask = jnp.concatenate([clone_sel, split_sel, split_sel])  # [3P]
    src = jnp.concatenate([jnp.arange(P)] * 3)

    # free-slot compaction: rank candidates, map rank -> free slot
    free = ~keep
    n_free = jnp.sum(free)
    free_list = jnp.argsort(~free, stable=True)  # free slots first, row order
    rank = jnp.cumsum(cand_mask) - 1
    ok = cand_mask & (rank < n_free)
    dst = jnp.where(ok, free_list[jnp.clip(rank, 0, P - 1)], P)  # P = dump row

    def place(arr, cand_values):
        """arr [P,...]; cand_values [3P,...] -> arr with candidates placed."""
        padded = jnp.concatenate([arr, jnp.zeros_like(arr[:1])], axis=0)
        return padded.at[dst].set(cand_values)[:P]

    def cat3(a, b, c):
        return jnp.concatenate([a, b, c], axis=0)

    params = {k: getattr(state, k) for k in GAUSSIAN_PARAM_KEYS}
    new_params = {}
    for k, arr in params.items():
        if k == "xyz":
            cand = cat3(arr, split_xyz[0], split_xyz[1])
        elif k == "scaling":
            cand = cat3(arr, split_scaling, split_scaling)
        else:
            cand = cat3(arr, arr, arr)
        new_params[k] = place(arr, cand)

    new_alive = keep | (
        jnp.zeros((P + 1,), bool).at[dst].set(ok)[:P]
    )
    is_new = new_alive & ~keep

    new_state = state.replace(
        **new_params,
        alive=new_alive,
    )

    # Adam moments: survivors keep rows, new rows zeroed (reference
    # _prune_optimizer / cat_tensors_to_optimizer semantics)
    def zero_new(m):
        mask = is_new.reshape((-1,) + (1,) * (m.ndim - 1))
        return jnp.where(mask, 0.0, m)

    mu = dict(opt_state.mu)
    nu = dict(opt_state.nu)
    for k in GAUSSIAN_PARAM_KEYS:
        mk = "features_dc" if k == "features_dc" else k
        mu[k] = zero_new(mu[k])
        nu[k] = zero_new(nu[k])
    new_opt = opt_state._replace(mu=mu, nu=nu)

    return DensifyResult(
        state=new_state,
        opt_state=new_opt,
        stats=DensifyStats.zeros(P),
        n_cloned=jnp.sum(clone_sel),
        n_split=jnp.sum(split_sel),
        n_pruned=jnp.sum(alive) - jnp.sum(keep),
        overflow=jnp.sum(cand_mask) - jnp.sum(ok),
    )
