"""Tile blending: alpha compositing as chunked prefix ops (TPU-native).

This replaces renderCUDA (diff-surfel-rasterization/cuda_rasterizer/forward.cu:
258-489): instead of one CUDA thread per pixel walking a shared-memory batch
sequentially, we process the whole tile grid at once. The per-tile depth-sorted
instance list is consumed in chunks; within a chunk the sequential "over"
recurrence is rewritten as exclusive cumulative products of (1 - alpha) along
the chunk axis, vectorized across [tiles, chunk, 256 pixels] on the VPU. The
early-termination (T < 1e-4), skip (alpha < 1/255), median-depth and
depth-distortion semantics of the reference are reproduced exactly with
cumulative masks — deterministic, no atomics (the reference needs
atomicExch/atomicAdd; here per-Gaussian max blend weight is a scatter-max).

Differentiable end-to-end: the scan body is wrapped in jax.checkpoint so
reverse-mode autodiff recomputes chunk internals instead of storing them
(the JAX analogue of backward.cu's back-to-front recomputation).

Multi-chip: when a Mesh is supplied, the tile axis is sharded with shard_map —
each chip blends its tile rows against replicated Gaussian data; the
shard_map transpose inserts the per-Gaussian gradient psum automatically
(the "NCCL all-reduce" of the design, riding ICI). This is the parallelism
the reference doesn't have (SURVEY §2.16).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpu_splat.raster.config import (
    TILE,
    TILE_PIX,
    NEAR_N,
    FAR_N,
    ALPHA_MIN,
    ALPHA_MAX,
    T_EPS,
    FILTER_INV_SQUARE,
    RasterConfig,
    tile_grid,
)


class BlendCarry(NamedTuple):
    T: jnp.ndarray  # [T, L] transmittance
    done: jnp.ndarray  # [T, L] bool, terminated
    color: jnp.ndarray  # [T, L, 3]
    normal: jnp.ndarray  # [T, L, 3] view-space
    depth: jnp.ndarray  # [T, L] expected depth accumulator
    refl: jnp.ndarray  # [T, L]
    dist: jnp.ndarray  # [T, L] distortion accumulator
    m1: jnp.ndarray  # [T, L]
    m2: jnp.ndarray  # [T, L]
    scope: jnp.ndarray  # [T, L] env-scope mask hit
    median_depth: jnp.ndarray  # [T, L]
    n_contrib: jnp.ndarray  # [T, L] int32 (1-based last contributor)
    median_idx: jnp.ndarray  # [T, L] int32 (1-based median contributor)
    gw: jnp.ndarray  # [P] max blend weight per Gaussian


class BlendOutput(NamedTuple):
    """All image-space outputs, channels-last [H, W, C]."""

    color: jnp.ndarray  # [H,W,3] composited with background
    others: jnp.ndarray  # [H,W,8] DEPTH,ALPHA,NORMALx3,MIDDEPTH,DISTORTION,MASK
    refl_map: jnp.ndarray  # [H,W]
    final_T: jnp.ndarray  # [H,W]
    n_contrib: jnp.ndarray  # [H,W] int32
    gaussian_weights: jnp.ndarray  # [P] max blend weight (stop-gradient)


def _tiles_to_image(x: jnp.ndarray, tiles_y: int, tiles_x: int, H: int, W: int):
    """[T, 256, ...] tile-major -> [H, W, ...] image."""
    n_tiles = tiles_y * tiles_x
    x = x[:n_tiles]  # drop shard padding
    trailing = x.shape[2:]
    x = x.reshape(tiles_y, tiles_x, TILE, TILE, *trailing)
    x = jnp.swapaxes(x, 1, 2)
    x = x.reshape(tiles_y * TILE, tiles_x * TILE, *trailing)
    return x[:H, :W]


def image_to_tiles(img: jnp.ndarray, height: int, width: int, pad_tiles_to: int = 1):
    """[H, W, ...] -> [T_padded, 256, ...] tile-major (for sharded losses)."""
    tiles_y, tiles_x = tile_grid(height, width)
    Hp, Wp = tiles_y * TILE, tiles_x * TILE
    trailing = img.shape[2:]
    out = jnp.zeros((Hp, Wp) + trailing, img.dtype).at[:height, :width].set(img)
    out = out.reshape(tiles_y, TILE, tiles_x, TILE, *trailing)
    out = jnp.swapaxes(out, 1, 2).reshape(tiles_y * tiles_x, TILE_PIX, *trailing)
    n_tiles = tiles_y * tiles_x
    pad = (-n_tiles) % pad_tiles_to
    if pad:
        out = jnp.concatenate([out, jnp.zeros((pad,) + out.shape[1:], out.dtype)])
    return out


def _excl_cumprod(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    cp = jnp.cumprod(x, axis=axis)
    one = jnp.ones_like(jax.lax.slice_in_dim(cp, 0, 1, axis=axis))
    return jnp.concatenate(
        [one, jax.lax.slice_in_dim(cp, 0, x.shape[axis] - 1, axis=axis)], axis=axis
    )


def _excl_cumsum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.cumsum(x, axis=axis) - x


class GaussFeats(NamedTuple):
    """Per-Gaussian blending attributes (replicated across tile shards)."""

    hom: jnp.ndarray  # [P,3,3]
    xy: jnp.ndarray  # [P,2]
    opacity: jnp.ndarray  # [P]
    normal_view: jnp.ndarray  # [P,3]
    color: jnp.ndarray  # [P,3]
    refl: jnp.ndarray  # [P]
    scope_mask: jnp.ndarray  # [P] bool


def _blend_scan(
    tile_gid: jnp.ndarray,  # [T, K] (T possibly a shard)
    tile_mask: jnp.ndarray,  # [T, K]
    org_xy: jnp.ndarray,  # [T, 2] pixel origin of each tile
    feats: GaussFeats,
    cfg: RasterConfig,
    varying_axis: str | None = None,
) -> BlendCarry:
    n_tiles = tile_gid.shape[0]
    P_ = feats.opacity.shape[0]
    C = cfg.chunk
    S = cfg.n_chunks
    L = TILE_PIX

    lane = jnp.arange(L, dtype=jnp.int32)
    # dtype follows the inputs (f32 in production; f64 under the x64
    # reference-oracle tests where FP knife-edge flips must vanish)
    dt = feats.opacity.dtype
    pixx = (org_xy[:, 0:1] + lane[None, :] % TILE).astype(dt)[:, None, :]
    pixy = (org_xy[:, 1:2] + lane[None, :] // TILE).astype(dt)[:, None, :]

    ids_s = jnp.swapaxes(tile_gid.reshape(n_tiles, S, C), 0, 1)  # [S,T,C]
    mask_s = jnp.swapaxes(tile_mask.reshape(n_tiles, S, C), 0, 1)  # [S,T,C]
    kbase_s = jnp.arange(S, dtype=jnp.int32) * C

    def body(carry: BlendCarry, xs):
        ids, vmask, kbase = xs  # [T,C], [T,C], []
        h = feats.hom[ids]  # [T,C,3,3]
        Tu = h[..., 0, :]
        Tv = h[..., 1, :]
        Tw = h[..., 2, :]
        g_xy = feats.xy[ids]  # [T,C,2]
        opa = feats.opacity[ids]  # [T,C]
        nrm = feats.normal_view[ids]  # [T,C,3]
        col = feats.color[ids]  # [T,C,3]
        rfl = feats.refl[ids]  # [T,C]
        scp = feats.scope_mask[ids]  # [T,C]

        # Ray-splat intersection (2DGS Eqs. 8-10; forward.cu:363-394)
        def comp(v, i):
            return v[..., i : i + 1]  # [T,C,1] broadcast against [T,1,L]

        k0 = pixx * comp(Tw, 0) - comp(Tu, 0)
        k1 = pixx * comp(Tw, 1) - comp(Tu, 1)
        k2 = pixx * comp(Tw, 2) - comp(Tu, 2)
        l0 = pixy * comp(Tw, 0) - comp(Tv, 0)
        l1 = pixy * comp(Tw, 1) - comp(Tv, 1)
        l2 = pixy * comp(Tw, 2) - comp(Tv, 2)
        p0 = k1 * l2 - k2 * l1
        p1 = k2 * l0 - k0 * l2
        p2 = k0 * l1 - k1 * l0
        unstable = jnp.abs(p2) < 1e-4
        inv_p2 = 1.0 / jnp.where(unstable, 1.0, p2)
        sx = jnp.where(unstable, 0.0, p0 * inv_p2)
        sy = jnp.where(unstable, 0.0, p1 * inv_p2)
        rho3d = jnp.where(unstable, 1e8, sx * sx + sy * sy)
        dx = comp(g_xy, 0) - pixx
        dy = comp(g_xy, 1) - pixy
        rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
        rho = jnp.minimum(rho3d, rho2d)
        # depth-VALUE gradient semantics of the reference backward
        # (backward.cu:461-471): in the low-pass branch (rho2d < rho3d) the
        # intersection s is treated as CONSTANT — depth grads flow to Tw
        # only as dL_dTw += dL_dz * (s.x, s.y, 1), never through p. (A
        # deliberate freeze: sub-pixel splats have ill-conditioned s.)
        use3 = rho3d <= rho2d
        sg = jax.lax.stop_gradient
        sxd = jnp.where(use3, sx, sg(sx))
        syd = jnp.where(use3, sy, sg(sy))
        depth = sxd * comp(Tw, 0) + syd * comp(Tw, 1) + comp(Tw, 2)

        G = jnp.exp(-0.5 * rho)
        alpha = jnp.minimum(ALPHA_MAX, opa[..., None] * G)  # [T,C,L]
        accept = (
            (depth >= NEAR_N)
            & (alpha >= ALPHA_MIN)
            & vmask[..., None]
            & ~carry.done[:, None, :]
        )
        a_eff = jnp.where(accept, alpha, 0.0)

        prefix = _excl_cumprod(1.0 - a_eff, axis=1)  # [T,C,L]
        T_before = carry.T[:, None, :] * prefix
        trigger = accept & (T_before * (1.0 - alpha) < T_EPS)
        term_excl = _excl_cumsum(trigger.astype(jnp.int32), axis=1) > 0
        contrib = accept & ~term_excl & ~trigger
        w = jnp.where(contrib, alpha * T_before, 0.0)  # [T,C,L]

        a_contrib = jnp.where(contrib, alpha, 0.0)
        T_out = carry.T * jnp.prod(1.0 - a_contrib, axis=1)
        done_out = carry.done | jnp.any(trigger, axis=1)

        # Accumulators
        hp = jax.lax.Precision.HIGHEST
        color_out = carry.color + jnp.einsum("tcl,tck->tlk", w, col, precision=hp)
        normal_out = carry.normal + jnp.einsum("tcl,tck->tlk", w, nrm, precision=hp)
        depth_out = carry.depth + jnp.sum(depth * w, axis=1)
        refl_out = carry.refl + jnp.sum(rfl[..., None] * w, axis=1)
        scope_out = carry.scope | jnp.any(scp[..., None] & contrib, axis=1)

        # Depth distortion (2DGS appendix; forward.cu:419-427)
        safe_depth = jnp.maximum(depth, NEAR_N)
        m = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N / safe_depth)
        A = 1.0 - T_before
        mw = m * w
        m2w = m * m * w
        M1b = carry.m1[:, None, :] + _excl_cumsum(mw, axis=1)
        M2b = carry.m2[:, None, :] + _excl_cumsum(m2w, axis=1)
        dist_out = carry.dist + jnp.sum((m * m * A + M2b - 2.0 * m * M1b) * w, axis=1)
        m1_out = carry.m1 + jnp.sum(mw, axis=1)
        m2_out = carry.m2 + jnp.sum(m2w, axis=1)

        # Median depth: last contributor with T_before > 0.5 (forward.cu:429-433)
        gk = (kbase + jnp.arange(C, dtype=jnp.int32) + 1)[None, :, None]  # 1-based
        med_cond = contrib & (T_before > 0.5)
        med_rank = jnp.max(jnp.where(med_cond, gk, 0), axis=1)  # [T,L]
        has_med = med_rank > 0
        sel = med_cond & (gk == med_rank[:, None, :])
        med_depth_new = jnp.sum(jnp.where(sel, depth, 0.0), axis=1)
        median_depth_out = jnp.where(has_med, med_depth_new, carry.median_depth)
        median_idx_out = jnp.maximum(carry.median_idx, med_rank)

        n_contrib_out = jnp.maximum(
            carry.n_contrib, jnp.max(jnp.where(contrib, gk, 0), axis=1)
        )

        # Per-Gaussian max blend weight (replaces atomicExch, forward.cu:457-459)
        w_inst = jnp.max(jax.lax.stop_gradient(w), axis=2)  # [T,C]
        gw_out = carry.gw.at[ids.ravel()].max(w_inst.ravel())

        return (
            BlendCarry(
                T=T_out,
                done=done_out,
                color=color_out,
                normal=normal_out,
                depth=depth_out,
                refl=refl_out,
                dist=dist_out,
                m1=m1_out,
                m2=m2_out,
                scope=scope_out,
                median_depth=median_depth_out,
                n_contrib=n_contrib_out,
                median_idx=median_idx_out,
                gw=gw_out,
            ),
            None,
        )

    f32 = lambda *shape: jnp.zeros(shape, dt)
    init = BlendCarry(
        T=jnp.ones((n_tiles, L), dt),
        done=jnp.zeros((n_tiles, L), bool),
        color=f32(n_tiles, L, 3),
        normal=f32(n_tiles, L, 3),
        depth=f32(n_tiles, L),
        refl=f32(n_tiles, L),
        dist=f32(n_tiles, L),
        m1=f32(n_tiles, L),
        m2=f32(n_tiles, L),
        scope=jnp.zeros((n_tiles, L), bool),
        median_depth=f32(n_tiles, L),
        n_contrib=jnp.zeros((n_tiles, L), jnp.int32),
        median_idx=jnp.zeros((n_tiles, L), jnp.int32),
        gw=f32(P_),
    )

    if varying_axis is not None:
        # under shard_map the scan body makes every carry component vary
        # across the tile axis; the zero init must match that vma type
        init = jax.tree.map(
            lambda x: jax.lax.pcast(x, (varying_axis,), to="varying"), init
        )
    final, _ = jax.lax.scan(
        jax.checkpoint(body), init, (ids_s, mask_s, kbase_s), length=S
    )
    return final


def tile_origins(height: int, width: int, pad_tiles_to: int = 1) -> jnp.ndarray:
    """[T_padded, 2] pixel origin (x, y) of each tile, row-major."""
    tiles_y, tiles_x = tile_grid(height, width)
    t_idx = jnp.arange(tiles_y * tiles_x, dtype=jnp.int32)
    org = jnp.stack([(t_idx % tiles_x) * TILE, (t_idx // tiles_x) * TILE], axis=-1)
    pad = (-org.shape[0]) % pad_tiles_to
    if pad:
        # padded tiles point far outside the image: nothing bins there
        org = jnp.concatenate(
            [org, jnp.full((pad, 2), 1 << 22, jnp.int32)], axis=0
        )
    return org


def blend(
    tile_gid: jnp.ndarray,  # [T, K] (T padded to a multiple of mesh size)
    tile_mask: jnp.ndarray,  # [T, K]
    hom: jnp.ndarray,  # [P,3,3]
    xy: jnp.ndarray,  # [P,2]
    opacity: jnp.ndarray,  # [P]
    normal_view: jnp.ndarray,  # [P,3]
    color: jnp.ndarray,  # [P,3]
    refl: jnp.ndarray,  # [P]
    scope_mask: jnp.ndarray,  # [P] bool
    bg: jnp.ndarray,  # [3]
    height: int,
    width: int,
    cfg: RasterConfig,
    mesh=None,
    axis: str = "tiles",
) -> BlendOutput:
    tiles_y, tiles_x = tile_grid(height, width)
    n_shards = 1 if mesh is None else mesh.shape[axis]
    org = tile_origins(height, width, pad_tiles_to=n_shards)
    feats = GaussFeats(
        hom=hom, xy=xy, opacity=opacity, normal_view=normal_view,
        color=color, refl=refl, scope_mask=scope_mask,
    )

    if mesh is None:
        final = _blend_scan(tile_gid, tile_mask, org, feats, cfg)
        gw = final.gw
    else:
        def local(tg, tm, og, ft):
            out = _blend_scan(tg, tm, og, ft, cfg, varying_axis=axis)
            # gw is [P]-global: emit per-shard partials on a leading axis
            return out._replace(gw=out.gw[None])

        sharded = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P()),
            out_specs=BlendCarry(
                T=P(axis), done=P(axis), color=P(axis), normal=P(axis),
                depth=P(axis), refl=P(axis), dist=P(axis), m1=P(axis),
                m2=P(axis), scope=P(axis), median_depth=P(axis),
                n_contrib=P(axis), median_idx=P(axis), gw=P(axis),
            ),
        )
        final = sharded(tile_gid, tile_mask, org, feats)
        gw = jnp.max(final.gw, axis=0)

    img = lambda x: _tiles_to_image(x, tiles_y, tiles_x, height, width)
    out_color = img(final.color + final.T[..., None] * bg[None, None, :])
    others = jnp.concatenate(
        [
            img(final.depth)[..., None],
            img(1.0 - final.T)[..., None],
            img(final.normal),
            img(final.median_depth)[..., None],
            img(final.dist)[..., None],
            img(final.scope.astype(jnp.float32))[..., None],
        ],
        axis=-1,
    )
    return BlendOutput(
        color=out_color,
        others=others,
        refl_map=img(final.refl),
        final_T=img(final.T),
        n_contrib=img(final.n_contrib),
        gaussian_weights=jax.lax.stop_gradient(gw),
    )


def assemble_image(out_px, tiles_y, tiles_x, height, width, bg,
                   train_shape: bool):
    """[T, 16, 256] kernel output -> (color, others[8], refl, final_T,
    n_contrib) image-space maps via ONE tile->image permute.

    train_shape: the kernel statically skipped the distortion/median/M1/M2
    channels (they hold zeros/garbage and the training loss never reads
    them), so only the 10 live channels ride the permute and its backward
    cotangent (-37% of the 133 MB shuffle at 1080p); MED/DIST/NCON image
    outputs are served as zeros."""
    from tpu_splat.kernels import tile_blend as tb

    if train_shape:
        keep = jnp.concatenate(
            [
                out_px[:, tb.O_COL : tb.O_DIST],  # color 3, T, depth, refl
                out_px[:, tb.O_NRM : tb.O_NRM + 3],
                out_px[:, tb.O_SCOPE : tb.O_SCOPE + 1],
            ],
            axis=1,
        )  # [T, 10, L]
        img = _tiles_to_image(
            jnp.moveaxis(keep, 1, 2), tiles_y, tiles_x, height, width
        )  # [H, W, 10]
        Tf = img[..., 3:4]
        zero1 = jnp.zeros_like(Tf)
        color = img[..., 0:3] + Tf * bg[None, None, :]
        others = jnp.concatenate(
            [img[..., 4:5], 1.0 - Tf, img[..., 6:9], zero1, zero1,
             img[..., 9:10]],
            axis=-1,
        )
        return (
            color, others, img[..., 5], img[..., 3],
            jnp.zeros(img.shape[:2], jnp.int32),
        )
    imgall = _tiles_to_image(
        jnp.moveaxis(out_px, 1, 2), tiles_y, tiles_x, height, width
    )  # [H, W, 16]
    Tf_img = imgall[..., tb.O_T : tb.O_T + 1]
    color_img = (
        imgall[..., tb.O_COL : tb.O_COL + 3] + Tf_img * bg[None, None, :]
    )
    others = jnp.concatenate(
        [
            imgall[..., tb.O_DEPTH : tb.O_DEPTH + 1],
            1.0 - Tf_img,
            imgall[..., tb.O_NRM : tb.O_NRM + 3],
            imgall[..., tb.O_MED : tb.O_MED + 1],
            imgall[..., tb.O_DIST : tb.O_DIST + 1],
            imgall[..., tb.O_SCOPE : tb.O_SCOPE + 1],
        ],
        axis=-1,
    )
    return (
        color_img, others, imgall[..., tb.O_REFL], imgall[..., tb.O_T],
        imgall[..., tb.O_NCON].astype(jnp.int32),
    )


def blend_pallas(
    binned,
    hom: jnp.ndarray,
    xy: jnp.ndarray,
    opacity: jnp.ndarray,
    normal_view: jnp.ndarray,
    color: jnp.ndarray,
    refl: jnp.ndarray,
    scope_mask: jnp.ndarray,
    bg: jnp.ndarray,
    height: int,
    width: int,
    interpret: bool = False,
    mesh=None,
    axis: str = "tiles",
    full_grads: bool = True,
    bf16_grads: bool = False,
    bf16_feats: bool = False,
    collect_weights: bool = True,
) -> BlendOutput:
    """Forward blend via the Pallas tile kernel (tpu_splat.kernels.tile_blend).

    Differentiable: the kernel pair (forward sweep + hand-derived
    back-to-front backward) is wrapped in custom_vjp; feature packing and
    image unpacking around it are plain jnp so autodiff handles the
    per-Gaussian segment reduction (gather transpose). Requires
    bin_gaussians(..., aligned=True)."""
    from tpu_splat.kernels import tile_blend as tb

    tiles_y, tiles_x = tile_grid(height, width)
    assert binned.aligned_gid is not None, "bin with aligned=True"
    feats = tb.pack_features(
        binned.aligned_gid, binned.aligned_valid,
        hom, xy, opacity, normal_view, color, refl, scope_mask,
        group_key=binned.aligned_rank, rank_of=binned.rank_of,
        seg_start=binned.seg_start, seg_end=binned.seg_end,
        bf16_grads=bf16_grads, bf16_feats=bf16_feats,
    )
    T_pad = binned.aligned_starts.shape[0]
    org = tile_origins(height, width, pad_tiles_to=1)
    if org.shape[0] < T_pad:
        org = jnp.concatenate(
            [org, jnp.full((T_pad - org.shape[0], 2), 1 << 22, jnp.int32)]
        )
    counts_full = jnp.concatenate(
        [
            binned.tile_counts,
            jnp.zeros((T_pad - binned.tile_counts.shape[0],), jnp.int32),
        ]
    )
    if mesh is None:
        out_px, wmax = tb.blend_kernel(
            feats, binned.aligned_starts, counts_full, org[:, 0], org[:, 1],
            full_grads=full_grads, packed_feats=bf16_feats,
            collect_wmax=collect_weights,
        )
    else:
        # tile-axis sharding: each chip runs the kernel pair on its tile rows
        # against replicated instance features; the shard_map transpose
        # psums d_feats (kernels zero-alias unwritten slots so per-shard
        # partials combine exactly)
        def local(f, st, cn, ox, oy):
            out_px_l, wmax_l = tb.blend_kernel(f, st, cn, ox, oy,
                                               full_grads=full_grads,
                                               packed_feats=bf16_feats)
            return out_px_l, wmax_l[None]

        out_px, wmax_parts = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False,  # pallas out_shapes carry no vma annotation
        )(feats, binned.aligned_starts, counts_full, org[:, 0], org[:, 1])
        wmax = jnp.max(wmax_parts, axis=0)

    # ONE tile->image shuffle for the packed channels (the per-channel
    # slicing used to launch ~10 separate 8.5 MB transposes fwd + the same
    # again for their cotangents; this is one 133 MB permute, slices after
    # it are last-axis views)
    color_img, others, refl_img, T_img, ncon_img = assemble_image(
        out_px, tiles_y, tiles_x, height, width, bg,
        train_shape=not full_grads,
    )
    if collect_weights:
        # per-Gaussian max blend weight: one two-key sort by (rank, wmax)
        # puts each rank run's max at its analytic end; un-rank with a row
        # gather
        gw_by_rank = tb.segment_max_sorted(
            jnp.where(binned.aligned_valid, wmax, 0.0),
            binned.aligned_rank, binned.seg_start, binned.seg_end,
        )
        gw = gw_by_rank[binned.rank_of]
    else:
        # inference: the densify stat is never read (reference only
        # accumulates gaussian_weights for pruning, forward.cu:457-459)
        gw = jnp.zeros((hom.shape[0],), jnp.float32)
    return BlendOutput(
        color=color_img,
        others=others,
        refl_map=refl_img,
        final_T=T_img,
        n_contrib=ncon_img,
        gaussian_weights=gw,
    )
