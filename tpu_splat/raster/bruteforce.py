"""Brute-force per-pixel reference rasterizer (test oracle; tiny scenes only).

Independent re-implementation of the compositing semantics: every pixel
sequentially scans ALL Gaussians in global depth order (gated on tile
coverage, reproducing the binning result), with the exact skip/termination
rules of renderCUDA (forward.cu:357-460). Used to validate the production
chunked-prefix formulation in tpu_splat.raster.blend — O(H*W*P), do not use
beyond toy sizes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_splat.core.graphics import Camera
from tpu_splat.raster.config import (
    TILE,
    NEAR_N,
    FAR_N,
    ALPHA_MIN,
    ALPHA_MAX,
    T_EPS,
    FILTER_INV_SQUARE,
)
from tpu_splat.raster.preprocess import Preprocessed


def blend_bruteforce(
    prep: Preprocessed,
    opacity: jnp.ndarray,
    refl: jnp.ndarray,
    scope_mask: jnp.ndarray,
    bg: jnp.ndarray,
    height: int,
    width: int,
):
    P = opacity.shape[0]
    order = jnp.argsort(prep.depth, stable=True)

    def pixel(py, px):
        tile_x = px // TILE
        tile_y = py // TILE
        pxf = px.astype(jnp.float32)
        pyf = py.astype(jnp.float32)

        def step(carry, i):
            (T, done, C, N, D, R, dist, m1, m2, scope, med_d, med_i, ncon, rank) = carry
            g = order[i]
            rank = rank + jnp.where(
                prep.valid[g]
                & (prep.rect_min[g, 0] <= tile_x)
                & (tile_x < prep.rect_max[g, 0])
                & (prep.rect_min[g, 1] <= tile_y)
                & (tile_y < prep.rect_max[g, 1]),
                1,
                0,
            )
            covered = (
                prep.valid[g]
                & (prep.rect_min[g, 0] <= tile_x)
                & (tile_x < prep.rect_max[g, 0])
                & (prep.rect_min[g, 1] <= tile_y)
                & (tile_y < prep.rect_max[g, 1])
            )
            Tu = prep.hom[g, 0]
            Tv = prep.hom[g, 1]
            Tw = prep.hom[g, 2]
            k = pxf * Tw - Tu
            l = pyf * Tw - Tv
            p = jnp.cross(k, l)
            unstable = jnp.abs(p[2]) < 1e-4
            s = jnp.where(unstable, 0.0, p[:2] / jnp.where(unstable, 1.0, p[2]))
            rho3d = jnp.where(unstable, 1e8, jnp.sum(s * s))
            d2 = prep.xy[g] - jnp.array([pxf, pyf])
            rho2d = FILTER_INV_SQUARE * jnp.sum(d2 * d2)
            rho = jnp.minimum(rho3d, rho2d)
            # low-pass-branch depth grads freeze s (backward.cu:461-471;
            # see raster/blend.py)
            sd = jnp.where(rho3d <= rho2d, s, jax.lax.stop_gradient(s))
            depth = sd[0] * Tw[0] + sd[1] * Tw[1] + Tw[2]
            alpha = jnp.minimum(ALPHA_MAX, opacity[g] * jnp.exp(-0.5 * rho))
            ok = covered & (depth >= NEAR_N) & (alpha >= ALPHA_MIN) & ~done
            trig = ok & (T * (1 - alpha) < T_EPS)
            use = ok & ~trig
            w = jnp.where(use, alpha * T, 0.0)
            m = FAR_N / (FAR_N - NEAR_N) * (1 - NEAR_N / jnp.maximum(depth, NEAR_N))
            dist = dist + (m * m * (1 - T) + m2 - 2 * m * m1) * w
            m1 = m1 + m * w
            m2 = m2 + m * m * w
            med_hit = use & (T > 0.5)
            med_d = jnp.where(med_hit, depth, med_d)
            med_i = jnp.where(med_hit, rank, med_i)
            C = C + prep.color[g] * w
            N = N + prep.normal_view[g] * w
            D = D + depth * w
            R = R + refl[g] * w
            scope = scope | (use & scope_mask[g])
            ncon = jnp.where(use, rank, ncon)
            T = jnp.where(use, T * (1 - alpha), T)
            done = done | trig
            return (T, done, C, N, D, R, dist, m1, m2, scope, med_d, med_i, ncon, rank), None

        init = (
            jnp.float32(1.0),
            jnp.bool_(False),
            jnp.zeros(3),
            jnp.zeros(3),
            jnp.float32(0.0),
            jnp.float32(0.0),
            jnp.float32(0.0),
            jnp.float32(0.0),
            jnp.float32(0.0),
            jnp.bool_(False),
            jnp.float32(0.0),
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
        )
        (T, done, C, N, D, R, dist, m1, m2, scope, med_d, med_i, ncon, rank), _ = (
            jax.lax.scan(step, init, jnp.arange(P))
        )
        color = C + T * bg
        others = jnp.concatenate(
            [
                jnp.array([D, 1 - T]),
                N,
                jnp.array([med_d, dist, scope.astype(jnp.float32)]),
            ]
        )
        return color, others, R, T, ncon

    ys, xs = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
    return jax.vmap(jax.vmap(pixel))(ys, xs)
