"""Geometric capacity growth — the functional analogue of the reference's
resizable rasterizer buffers (rasterize_points.cu:31-37) and of torch's
implicit parameter-resize-on-densify.

Everything under jit has static shapes, so "allocation" means: pad every
capacity-sized pytree leaf (Gaussian rows, Adam moments, densification
accumulators) to a larger capacity and re-jit the train step with a larger
RasterConfig. The overflow diagnostics every step already reports
(n_alive, num_instances, max_tile_count, densify overflow) decide when.
Growth is geometric so recompiles are O(log) over a whole run.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from tpu_splat.raster.binning import INSTANCE_ALIGN
from tpu_splat.raster.config import RasterConfig


def _round_up(x: int, align: int) -> int:
    return ((int(x) + align - 1) // align) * align


# pad values matching init_from_pcd (model/state.py): dead rows must stay
# numerically inert — unit-w quats (quat normalize of 0 NaNs in the VJP),
# deeply negative log-scale / logits
_PAD_FILL = {"scaling": -10.0, "opacity": -10.0, "refl": -10.0}


def _pad_rows(x, old_cap: int, new_cap: int, fill: float = 0.0, w_one=False):
    if not hasattr(x, "shape") or x.ndim == 0 or x.shape[0] != old_cap:
        return x
    pad_shape = (new_cap - old_cap,) + x.shape[1:]
    if x.dtype == jnp.bool_:
        pad = jnp.zeros(pad_shape, x.dtype)
    else:
        pad = jnp.full(pad_shape, fill, x.dtype)
    out = jnp.concatenate([x, pad], axis=0)
    if w_one:
        out = out.at[old_cap:, 0].set(1.0)
    return out


def grow_capacity(ts, new_capacity: int):
    """Pad a TrainState's capacity-sized leaves to `new_capacity`.

    Gaussian rows get inert fills; Adam moments and densify accumulators get
    zeros (exactly what densification_postfix gives new rows in the
    reference, scene/gaussian_model.py:461-482)."""
    g = ts.gaussians
    old = g.capacity
    assert new_capacity > old
    g2 = g.replace(
        xyz=_pad_rows(g.xyz, old, new_capacity),
        features_dc=_pad_rows(g.features_dc, old, new_capacity),
        features_rest=_pad_rows(g.features_rest, old, new_capacity),
        scaling=_pad_rows(g.scaling, old, new_capacity, fill=-10.0),
        rotation=_pad_rows(g.rotation, old, new_capacity, w_one=True),
        opacity=_pad_rows(g.opacity, old, new_capacity, fill=-10.0),
        refl=_pad_rows(g.refl, old, new_capacity, fill=-10.0),
        alive=_pad_rows(g.alive, old, new_capacity),
    )
    import jax

    pad0 = lambda tree: jax.tree.map(
        lambda x: _pad_rows(x, old, new_capacity), tree
    )
    opt2 = ts.opt._replace(mu=pad0(ts.opt.mu), nu=pad0(ts.opt.nu))
    stats2 = type(ts.stats)(*[
        _pad_rows(x, old, new_capacity) for x in ts.stats
    ])
    return ts.replace(gaussians=g2, opt=opt2, stats=stats2)


class GrowthDecision(NamedTuple):
    ts: object
    cfg: RasterConfig
    grew: bool
    reasons: tuple


def check_growth(
    ts,
    cfg: RasterConfig,
    n_alive: int,
    num_instances: int,
    max_tile_count: int,
    densify_overflow: int,
    pad_overflow: int = 0,
    headroom: float = 0.9,
    factor: float = 1.5,
) -> GrowthDecision:
    """Grow whatever is (nearly) full. Called between jit segments (host
    control flow), typically right after scheduled densification events."""
    reasons = []
    new_ts, new_cfg = ts, cfg

    cap = ts.gaussians.capacity
    if densify_overflow > 0 or n_alive > headroom * cap:
        new_cap = _round_up(max(cap * factor, n_alive + 1024), 256)
        new_ts = grow_capacity(ts, new_cap)
        reasons.append(f"capacity {cap} -> {new_cap}")

    changes = {}
    if num_instances > headroom * cfg.max_instances:
        # 4096-aligned so the tight-culling / run-decode path (which
        # requires max_instances % 4096 == 0) survives capacity growth
        changes["max_instances"] = _round_up(
            cfg.max_instances * factor, 4096
        )
        reasons.append(
            f"max_instances {cfg.max_instances} -> {changes['max_instances']}"
        )
        if cfg.max_columns:
            # an explicit level-1 (tile column) capacity must grow alongside:
            # tight-mode column overflow is reported as num_instances >= cap,
            # so growing only max_instances would leave the column overflow
            # in place and grow capacity forever (round-3 advisor finding)
            changes["max_columns"] = _round_up(
                max(cfg.max_columns * factor, changes["max_instances"]), 4096
            )
            reasons.append(
                f"max_columns {cfg.max_columns} -> {changes['max_columns']}"
            )
    if max_tile_count > cfg.tile_depth and not cfg.use_pallas():
        # the XLA scan path truncates per-tile lists at tile_depth; the
        # Pallas path's aligned ranges are bounded only by max_instances
        changes["tile_depth"] = _round_up(max_tile_count * factor, cfg.chunk)
        reasons.append(f"tile_depth {cfg.tile_depth} -> {changes['tile_depth']}")
    if pad_overflow > 0 and cfg.pad_per_tile < 128:
        # budgeted pad capacity overflowed (see RasterConfig.pad_per_tile):
        # escalate straight to the exact worst case
        changes["pad_per_tile"] = 128
        reasons.append(f"pad_per_tile {cfg.pad_per_tile} -> 128")
    if changes:
        new_cfg = dataclasses.replace(cfg, **changes)

    return GrowthDecision(new_ts, new_cfg, bool(reasons), tuple(reasons))
