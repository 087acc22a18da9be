"""Gaussian model state: a functional pytree with static capacity.

Role of the reference GaussianModel parameter store
(scene/gaussian_model.py:31-187) redesigned for JAX: instead of torch
nn.Parameters resized by optimizer "surgery", all arrays are padded to a fixed
capacity with an `alive` mask; densify/prune rewrite rows functionally
(tpu_splat.model.densify) and optax state is remapped the same way. This keeps
every train step jit-compiled with static shapes; capacity grows geometrically
(recompile) only when full.

Raw (pre-activation) parameterization matches the reference:
  scaling = log(scale)  [P,2]  (2 axes: surfels are disks)
  opacity/refl = logit  [P,1]
  rotation = unnormalized quat (w,x,y,z) [P,4]
  features_dc [P,1,3], features_rest [P,(D+1)^2-1,3]
The SH degree ramp is a traced scalar: full-degree basis is always evaluated,
with bands above `active_sh_degree` masked (static shapes, no recompile per
bump — unlike the reference's oneupSHdegree).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from tpu_splat.core.sh import rgb_to_sh, num_sh_coeffs
from tpu_splat.core.transforms import inverse_sigmoid
from tpu_splat.envmap.cubemap import CubemapParams, init_cubemap


# band index of each SH coefficient (degree <= 3)
_BANDS = np.array([0] + [1] * 3 + [2] * 5 + [3] * 7, dtype=np.int32)


def sh_band_mask(active_degree: jnp.ndarray, n_coeffs: int) -> jnp.ndarray:
    """[n_coeffs] 0/1 mask of coefficients enabled at `active_degree`."""
    return (jnp.asarray(_BANDS[:n_coeffs]) <= active_degree).astype(jnp.float32)


@struct.dataclass
class GaussianState:
    xyz: jnp.ndarray  # [P,3]
    features_dc: jnp.ndarray  # [P,1,3]
    features_rest: jnp.ndarray  # [P,M-1,3]
    scaling: jnp.ndarray  # [P,2] log-scale
    rotation: jnp.ndarray  # [P,4] quat (w,x,y,z)
    opacity: jnp.ndarray  # [P,1] logit
    refl: jnp.ndarray  # [P,1] logit
    env: CubemapParams
    alive: jnp.ndarray  # [P] bool
    active_sh_degree: jnp.ndarray  # [] int32
    max_sh_degree: int = struct.field(pytree_node=False, default=3)

    # ---- activations (reference gaussian_model.py:33-52,118-158) ----
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive)

    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_opacity(self) -> jnp.ndarray:
        """[P] sigmoid opacity, zeroed for dead rows."""
        return jax.nn.sigmoid(self.opacity[:, 0]) * self.alive

    def get_refl(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.refl[:, 0])

    def get_features(self) -> jnp.ndarray:
        """[P,M,3] SH coefficients with inactive bands masked."""
        sh = jnp.concatenate([self.features_dc, self.features_rest], axis=1)
        m = sh_band_mask(self.active_sh_degree, sh.shape[1])
        return sh * m[None, :, None]

    def param_pytree(self) -> dict:
        """The optimizable leaves (excludes alive/active_sh_degree)."""
        return dict(
            xyz=self.xyz,
            features_dc=self.features_dc,
            features_rest=self.features_rest,
            scaling=self.scaling,
            rotation=self.rotation,
            opacity=self.opacity,
            refl=self.refl,
            env_texture=self.env.texture,
            env_fail=self.env.fail_value,
        )

    def with_params(self, p: dict) -> "GaussianState":
        return self.replace(
            xyz=p["xyz"],
            features_dc=p["features_dc"],
            features_rest=p["features_rest"],
            scaling=p["scaling"],
            rotation=p["rotation"],
            opacity=p["opacity"],
            refl=p["refl"],
            env=CubemapParams(texture=p["env_texture"], fail_value=p["env_fail"]),
        )


def _knn_mean_sq_dist(points: np.ndarray, k: int = 3, chunk: int = 1024) -> np.ndarray:
    """Mean squared distance to k nearest neighbors (role of simple-knn's
    distCUDA2, used once at init — scene/gaussian_model.py:170). Exact via a
    KD-tree (O(N log N): ~1M points in seconds); chunked-numpy O(N^2)
    fallback when scipy is unavailable."""
    n = points.shape[0]
    kk = min(k, max(1, n - 1))
    try:
        from scipy.spatial import cKDTree
    except ImportError:
        cKDTree = None
    if cKDTree is not None and n > 2:
        tree = cKDTree(np.asarray(points, np.float64))
        # kk+1 because the nearest hit of each point is itself (distance 0)
        d, _ = tree.query(points, k=kk + 1, workers=-1)
        return (d[:, 1:] ** 2).mean(axis=1).astype(np.float32)
    out = np.empty(n, dtype=np.float32)
    for s in range(0, n, chunk):
        blk = points[s : s + chunk]
        d2 = ((blk[:, None, :] - points[None, :, :]) ** 2).sum(-1)
        idx = np.arange(s, min(s + chunk, n))
        d2[np.arange(len(blk)), idx] = np.inf
        part = np.partition(d2, kk - 1, axis=1)[:, :kk]
        out[s : s + chunk] = part.mean(axis=1)
    return out


def init_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: int,
    max_sh_degree: int = 3,
    init_opacity: float = 0.1,
    init_refl_value: float = 1e-3,
    cubemap_resolution: int = 128,
    seed: int = 0,
) -> GaussianState:
    """Initialize from a point cloud (reference create_from_pcd,
    scene/gaussian_model.py:160-187): DC SH from RGB, log-scales from 3-NN
    mean distance (2 axes), random quats, opacity 0.1, refl 1e-3."""
    n = points.shape[0]
    assert capacity >= n
    m = num_sh_coeffs(max_sh_degree)
    rng = np.random.default_rng(seed)

    dist2 = np.clip(_knn_mean_sq_dist(points.astype(np.float32)), 1e-7, None)
    log_scale = np.log(np.sqrt(dist2))[:, None].repeat(2, axis=1)

    quats = rng.normal(size=(n, 4)).astype(np.float32)  # reference uses random
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)

    def pad(a, fill=0.0):
        out = np.full((capacity,) + a.shape[1:], fill, dtype=np.float32)
        out[:n] = a
        return jnp.asarray(out)

    fdc = rgb_to_sh(np.asarray(colors, np.float32))[:, None, :]
    frest = np.zeros((n, m - 1, 3), np.float32)
    opa = np.full((n, 1), float(np.log(init_opacity / (1 - init_opacity))), np.float32)
    rfl = np.full(
        (n, 1), float(np.log(init_refl_value / (1 - init_refl_value))), np.float32
    )
    alive = np.zeros(capacity, bool)
    alive[:n] = True

    env = init_cubemap(jax.random.PRNGKey(seed), 3, cubemap_resolution)
    return GaussianState(
        xyz=pad(points.astype(np.float32)),
        features_dc=pad(fdc),
        features_rest=pad(frest),
        scaling=pad(log_scale, fill=-10.0),
        rotation=pad(quats).at[n:, 0].set(1.0),
        opacity=pad(opa, fill=-10.0),
        refl=pad(rfl, fill=-10.0),
        env=env,
        alive=jnp.asarray(alive),
        active_sh_degree=jnp.asarray(0, jnp.int32),
        max_sh_degree=max_sh_degree,
    )
