"""Fully-sharded tile-slab rasterization: binning + packing + blending all
run INSIDE one shard_map over horizontal tile-row slabs.

Round 3 sharded only the blend kernel (instances binned/sorted/packed
globally and replicated to every chip): SCALING.md measured 61% of
per-device FLOPs replicating, projecting ~62% efficiency at 2 chips vs the
>= 80% north star (BASELINE.json config 5). Here each chip:

- clips every Gaussian's tile rect to its slab of Rh tile rows (cheap [P]
  elementwise on replicated preprocess output),
- expands/sorts/packs ONLY the instances overlapping its slab, at a
  per-chip instance capacity of max_instances / n_devices,
- runs the Pallas blend kernel pair on its tiles against the per-chip
  slab,
- and (in the backward) regroups its own instance gradients into
  per-Gaussian partials; the shard_map transpose inserts ONE psum of the
  [P, F] per-Gaussian gradient table — the only cross-chip collective,
  riding ICI.

Remaining replicated work is O(P) small: preprocess (~2 ms at 1M), the
depth argsort, rect clipping, and the per-Gaussian un-rank gathers.
Everything O(instances) — the dominant cost — is 1/N per chip.

Tight culling falls back to rect binning under sharding (its conic tables
are global-pixel-space; the production config ships rect anyway).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpu_splat.raster.binning import bin_gaussians
from tpu_splat.raster.blend import BlendOutput, assemble_image
from tpu_splat.raster.config import TILE, RasterConfig, tile_grid
from tpu_splat.raster.preprocess import Preprocessed


def rasterize_tiles_sharded(
    prep: Preprocessed,
    opacity: jnp.ndarray,
    refl: jnp.ndarray,
    scope_mask: jnp.ndarray,
    bg: jnp.ndarray,
    height: int,
    width: int,
    cfg: RasterConfig,
    mesh,
    axis: str = "tiles",
):
    """-> (BlendOutput, num_instances, max_area, tile_counts, pad_overflow).

    num_instances is reported in GLOBAL capacity units: the busiest shard's
    local count scaled by n_shards, so check_growth's comparison against
    cfg.max_instances keeps its meaning (growth when any shard nears its
    local capacity)."""
    from tpu_splat.kernels import tile_blend as tb

    n = mesh.shape[axis]
    tiles_y, tiles_x = tile_grid(height, width)
    Rh = -(-tiles_y // n)  # tile rows per shard
    T_pad = Rh * n * tiles_x
    if cfg.max_instances % n:
        raise ValueError(
            f"max_instances {cfg.max_instances} must divide by the mesh "
            f"size {n} for sharded binning"
        )
    if cfg.tight_culling:
        # loud, not silent (round-4 verdict): the two-level conic decode
        # is built on global-pixel-space tables and does not compose with
        # per-slab rect clipping; sharded runs use the rect pipeline
        import warnings

        warnings.warn(
            "tight_culling does not compose with sharded tile-slab "
            "binning; falling back to the rect pipeline on every shard",
            stacklevel=3,
        )
    cfg_local = dataclasses.replace(
        cfg,
        max_instances=cfg.max_instances // n,
        tight_culling=False,
        max_columns=0,
    )
    full_grads = cfg.grad_channels != "train"

    t_idx = jnp.arange(T_pad, dtype=jnp.int32)
    org_x = (t_idx % tiles_x) * TILE
    # rows past tiles_y are shard padding: nothing bins there (rect clip
    # bounds instances by the true tiles_y), origins are harmless
    org_y = (t_idx // tiles_x) * TILE

    def local(prep_r, opa, rfl, scope, ox, oy):
        k = jax.lax.axis_index(axis)
        r0 = k * Rh
        ry0 = jnp.clip(prep_r.rect_min[:, 1] - r0, 0, Rh)
        ry1 = jnp.clip(prep_r.rect_max[:, 1] - r0, 0, Rh)
        rows = jnp.maximum(ry1 - ry0, 0)
        rw = jnp.maximum(prep_r.rect_max[:, 0] - prep_r.rect_min[:, 0], 0)
        area = jnp.where(prep_r.valid, rw * rows, 0)
        # bin_gaussians' expansion decode requires the depth-argsorted
        # emitting runs to form a contiguous prefix (zero-area rows must
        # sort PAST it via the inf depth key) — Gaussians clipped out of
        # this slab must therefore be marked invalid, not merely zero-area
        prep_l = prep_r._replace(
            valid=prep_r.valid & (area > 0),
            rect_min=jnp.stack([prep_r.rect_min[:, 0], ry0], axis=1),
            rect_max=jnp.stack([prep_r.rect_max[:, 0], ry1], axis=1),
            tiles_touched=area,
        )
        binned = bin_gaussians(prep_l, Rh * TILE, width, cfg_local, aligned=True)
        feats = tb.pack_features(
            binned.aligned_gid, binned.aligned_valid,
            prep_r.hom, prep_r.xy, opa, prep_r.normal_view, prep_r.color,
            rfl, scope,
            group_key=binned.aligned_rank, rank_of=binned.rank_of,
            seg_start=binned.seg_start, seg_end=binned.seg_end,
            bf16_grads=cfg.bf16_grads, bf16_feats=cfg.bf16_feats,
        )
        T_local = binned.aligned_starts.shape[0]
        counts_full = binned.tile_counts
        if counts_full.shape[0] < T_local:
            counts_full = jnp.concatenate(
                [
                    counts_full,
                    jnp.zeros(T_local - counts_full.shape[0], jnp.int32),
                ]
            )
        out_px, wmax = tb.blend_kernel(
            feats, binned.aligned_starts, counts_full, ox, oy,
            full_grads=full_grads, packed_feats=cfg.bf16_feats,
        )
        gw_by_rank = tb.segment_max_sorted(
            jnp.where(binned.aligned_valid, wmax, 0.0),
            binned.aligned_rank, binned.seg_start, binned.seg_end,
        )
        gw = gw_by_rank[binned.rank_of]
        diag = jnp.stack(
            [
                binned.num_instances,
                binned.max_area,
                binned.pad_overflow,
            ]
        )
        return out_px, gw[None], counts_full, diag[None]

    out_px, gw_parts, counts, diags = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,  # pallas out_shapes carry no vma annotation
    )(prep, opacity, refl, scope_mask, org_x, org_y)
    gw = jnp.max(gw_parts, axis=0)
    num_instances = jnp.max(diags[:, 0]) * n  # global capacity units
    max_area = jnp.max(diags[:, 1])
    pad_overflow = jnp.max(diags[:, 2])

    color_img, others, refl_img, T_img, ncon_img = assemble_image(
        out_px, Rh * n, tiles_x, height, width, bg,
        train_shape=not full_grads,
    )
    out = BlendOutput(
        color=color_img,
        others=others,
        refl_map=refl_img,
        final_T=T_img,
        n_contrib=ncon_img,
        gaussian_weights=gw,
    )
    n_tiles = tiles_y * tiles_x
    return out, num_instances, max_area, counts[:n_tiles], pad_overflow
