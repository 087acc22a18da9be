"""Tile binning: instance expansion + lexicographic depth sort + tile ranges.

Replaces the CUDA tile scheduler (rasterizer_impl.cu:70-138,282-313: CUB
prefix-sum -> duplicateWithKeys -> 64-bit radix sort -> identifyTileRanges)
with static-shape XLA: a scatter into a fixed-capacity instance buffer and a
stable multi-key `lax.sort` on (tile, depth). Positive-float radix order ==
numeric order, and both sorts are stable, so the resulting per-tile
front-to-back order matches the reference exactly (ties broken by emission
order = Gaussian index).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_splat.raster.config import RasterConfig, tile_grid
from tpu_splat.raster.preprocess import Preprocessed


class Binned(NamedTuple):
    tile_gid: jnp.ndarray  # [T, K] per-tile depth-sorted Gaussian ids
    tile_mask: jnp.ndarray  # [T, K] bool, True where a real instance exists
    num_instances: jnp.ndarray  # [] int32 true instance count (overflow check)
    max_area: jnp.ndarray  # [] int32 max tiles touched by one Gaussian
    tile_counts: jnp.ndarray  # [T] int32 instances per tile (pre-truncation)
    sorted_gid: jnp.ndarray  # [cap] instance-sorted Gaussian ids (pallas path)
    tile_starts: jnp.ndarray  # [T_padded] range start per tile in sorted order
    aligned_gid: jnp.ndarray | None  # [cap_al] 64-aligned exclusive layout
    aligned_valid: jnp.ndarray | None  # [cap_al] bool
    aligned_starts: jnp.ndarray | None  # [T_padded]


INSTANCE_ALIGN = 128  # kernels/tile_blend.py CI (lane-tile aligned)


def bin_gaussians(
    prep: Preprocessed, height: int, width: int, cfg: RasterConfig,
    pad_tiles_to: int = 1,
    aligned: bool = False,
) -> Binned:
    tiles_y, tiles_x = tile_grid(height, width)
    n_tiles = tiles_y * tiles_x
    n_tiles_padded = n_tiles + ((-n_tiles) % pad_tiles_to)
    P = prep.depth.shape[0]
    Kg = cfg.max_tiles_per_gaussian
    cap = cfg.max_instances

    area = prep.tiles_touched  # [P] int32, 0 for invalid

    # Two-stage sort (cheaper than a 64-bit (tile,depth) radix equivalent):
    # 1. depth-argsort the P Gaussians once (P << instances);
    # 2. emit instances in that order, then a SINGLE-key stable sort by tile.
    # Stability preserves emission order within a tile = front-to-back depth
    # with ties broken by Gaussian index — identical to the reference's
    # stable radix order (rasterizer_impl.cu:70-111).
    gkey = jnp.where(prep.valid, prep.depth, jnp.inf)
    gorder = jnp.argsort(gkey, stable=True).astype(jnp.int32)  # [P]
    area_o = area[gorder]
    rect_min_o = prep.rect_min[gorder]
    rect_max_o = prep.rect_max[gorder]
    offsets = jnp.cumsum(area_o) - area_o

    j = jnp.arange(Kg, dtype=jnp.int32)[None, :]  # [1,Kg]
    rect_w = (rect_max_o[:, 0] - rect_min_o[:, 0])[:, None]
    emit = (j < area_o[:, None]) & (j < Kg)
    safe_w = jnp.maximum(rect_w, 1)
    tx = rect_min_o[:, 0:1] + j % safe_w
    ty = rect_min_o[:, 1:2] + j // safe_w
    tile = ty * tiles_x + tx  # [P,Kg]

    pos = offsets[:, None] + j  # [P,Kg] target slot in instance buffer
    # Invalid / overflowing entries go to a dump slot (cap) that is sliced off.
    pos = jnp.where(emit & (pos < cap), pos, cap)

    gid = jnp.broadcast_to(gorder[:, None], (P, Kg))
    inst_tile = (
        jnp.full((cap + 1,), n_tiles, dtype=jnp.int32).at[pos.ravel()].set(tile.ravel())
    )[:cap]
    inst_gid = (
        jnp.zeros((cap + 1,), dtype=jnp.int32).at[pos.ravel()].set(gid.ravel())
    )[:cap]

    sorted_tile, sorted_gid = jax.lax.sort(
        (inst_tile, inst_gid), num_keys=1, is_stable=True
    )

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)
    counts = ends - starts

    if n_tiles_padded != n_tiles:
        pad = n_tiles_padded - n_tiles
        starts = jnp.concatenate([starts, jnp.zeros(pad, jnp.int32)])
        counts = jnp.concatenate([counts, jnp.zeros(pad, jnp.int32)])
    counts_capped = jnp.minimum(counts, cfg.tile_depth)
    k = jnp.arange(cfg.tile_depth, dtype=jnp.int32)[None, :]
    slots = jnp.clip(starts[:, None] + k, 0, cap - 1)
    tile_gid = sorted_gid[slots]  # [T_padded, K]
    tile_mask = k < counts_capped[:, None]

    aligned_gid = aligned_valid = aligned_starts = None
    if aligned:
        # Re-pack sorted instances so each tile's range starts on a
        # 128-instance boundary and ranges are mutually exclusive (the Pallas
        # kernel's aligned-DMA / exclusive-store contract).
        al = INSTANCE_ALIGN
        aligned_counts = ((counts + al - 1) // al) * al
        aligned_starts = jnp.cumsum(aligned_counts) - aligned_counts
        cap_al = cap + n_tiles_padded * al
        i = jnp.arange(cap, dtype=jnp.int32)
        tile_of = sorted_tile  # [cap]
        real = tile_of < n_tiles
        t_idx = jnp.clip(tile_of, 0, n_tiles_padded - 1)
        new_pos = aligned_starts[t_idx] + (i - starts[t_idx])
        new_pos = jnp.where(real, new_pos, cap_al)
        aligned_gid = (
            jnp.zeros((cap_al + 1,), jnp.int32).at[new_pos].set(sorted_gid)
        )[:cap_al]
        aligned_valid = (
            jnp.zeros((cap_al + 1,), bool).at[new_pos].set(real)
        )[:cap_al]

    num_instances = jnp.sum(area)
    return Binned(
        tile_gid=tile_gid,
        tile_mask=tile_mask,
        num_instances=num_instances,
        max_area=jnp.max(area),
        tile_counts=counts[:n_tiles],
        sorted_gid=sorted_gid,
        tile_starts=starts,
        aligned_gid=aligned_gid,
        aligned_valid=aligned_valid,
        aligned_starts=aligned_starts,
    )
