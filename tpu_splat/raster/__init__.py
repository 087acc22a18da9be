"""Differentiable TPU surfel rasterizer: preprocess -> bin -> blend.

Top-level equivalent of the reference GaussianRasterizer
(diff_surfel_rasterization/__init__.py:184-239 + rasterize_points.cu): a pure
function of Gaussian attributes and camera, returning image-space maps and
per-Gaussian stats. Fully jit-able, static shapes, differentiable via JAX
autodiff (no hand-written backward needed; the chunked blend is rematerialized).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from tpu_splat.core.graphics import Camera
from tpu_splat.raster.config import RasterConfig, TILE, tile_grid
from tpu_splat.raster.preprocess import preprocess, Preprocessed
from tpu_splat.raster.binning import bin_gaussians, Binned
from tpu_splat.raster.blend import blend, BlendOutput

# allmap channel offsets (reference auxiliary.h:22-28)
DEPTH_CH = 0
ALPHA_CH = 1
NORMAL_CH = slice(2, 5)
MIDDEPTH_CH = 5
DISTORTION_CH = 6
MASK_CH = 7


class RasterOutput(NamedTuple):
    color: jnp.ndarray  # [H,W,3] base color composited over bg
    others: jnp.ndarray  # [H,W,8] allmap (channel offsets above)
    refl_map: jnp.ndarray  # [H,W]
    radii: jnp.ndarray  # [P] int32 screen radii (0 = culled)
    gaussian_weights: jnp.ndarray  # [P] max blend weight
    final_T: jnp.ndarray  # [H,W]
    n_contrib: jnp.ndarray  # [H,W] int32
    num_instances: jnp.ndarray  # [] overflow diagnostic
    max_area: jnp.ndarray  # [] overflow diagnostic
    tile_counts: jnp.ndarray  # [T] overflow diagnostic
    pad_overflow: jnp.ndarray  # [] pads beyond cfg.pad_per_tile budget


def rasterize(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacity: jnp.ndarray,  # [P] post-activation
    refl: jnp.ndarray,  # [P] post-activation
    camera: Camera,
    bg: jnp.ndarray,
    cfg: RasterConfig,
    sh: jnp.ndarray | None = None,
    sh_degree: int = 0,
    colors: jnp.ndarray | None = None,
    scope_mask: jnp.ndarray | None = None,
    scale_modifier: float = 1.0,
    screen_offset: jnp.ndarray | None = None,
    hom_precomp: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
    mesh=None,
    mesh_axis: str = "tiles",
    mode: str = "surfel",
    normals: jnp.ndarray | None = None,
    antialiasing: bool = False,
    collect_weights: bool = True,
) -> RasterOutput:
    """mode='surfel': 2DGS disks (scales [P,2], production path).
    mode='volumetric': classic 3DGS EWA splats (scales [P,3], per-Gaussian
    input `normals` blended — reference diff-gaussian-rasterization
    variant, SURVEY §2.5); `antialiasing` enables the Mip-Splatting
    opacity rescale."""
    H, W = camera.height, camera.width
    P = means3d.shape[0]
    if scope_mask is None:
        scope_mask = jnp.ones((P,), dtype=bool)

    if mode == "volumetric":
        from tpu_splat.raster.volumetric import preprocess_volumetric

        if normals is None:
            normals = jnp.zeros((P, 3)).at[:, 2].set(1.0)
        prep, opa_scale = preprocess_volumetric(
            means3d,
            scales,
            rotations,
            normals,
            camera.world_view,
            camera.full_proj,
            camera.camera_center,
            H,
            W,
            camera.tanfovx,
            camera.tanfovy,
            sh=sh,
            sh_degree=sh_degree,
            colors=colors,
            scale_modifier=scale_modifier,
            antialiasing=antialiasing,
        )
        opacity = opacity * opa_scale
    else:
        prep = preprocess(
            means3d,
            scales,
            rotations,
            camera.world_view,
            camera.full_proj,
            camera.camera_center,
            H,
            W,
            sh=sh,
            sh_degree=sh_degree,
            colors=colors,
            scale_modifier=scale_modifier,
            screen_offset=screen_offset,
            hom_precomp=hom_precomp,
            opacity=opacity if cfg.opacity_rect else None,
            circular_rect=cfg.circular_rect,
        )
    if alive is not None:
        valid = prep.valid & alive
        prep = prep._replace(
            valid=valid,
            radius=jnp.where(valid, prep.radius, 0),
            tiles_touched=jnp.where(valid, prep.tiles_touched, 0),
        )
    n_shards = 1 if mesh is None else mesh.shape[mesh_axis]
    use_pallas = cfg.use_pallas()
    if use_pallas and mesh is not None:
        # fully-sharded tile-slab pipeline: binning/sort/pack AND the blend
        # kernels run per-chip on 1/N of the instances (raster/sharded.py);
        # the per-Gaussian gradient psum is the only collective
        from tpu_splat.raster.sharded import rasterize_tiles_sharded

        out, num_instances, max_area, tile_counts, pad_overflow = (
            rasterize_tiles_sharded(
                prep, opacity, refl, scope_mask, bg, H, W, cfg,
                mesh=mesh, axis=mesh_axis,
            )
        )
        return RasterOutput(
            color=out.color,
            others=out.others,
            refl_map=out.refl_map,
            radii=prep.radius,
            gaussian_weights=out.gaussian_weights,
            final_T=out.final_T,
            n_contrib=out.n_contrib,
            num_instances=num_instances,
            max_area=max_area,
            tile_counts=tile_counts,
            pad_overflow=pad_overflow,
        )
    binned = bin_gaussians(
        prep, H, W, cfg, pad_tiles_to=n_shards, aligned=use_pallas
    )
    if use_pallas:
        from tpu_splat.raster.blend import blend_pallas

        out = blend_pallas(
            binned,
            prep.hom,
            prep.xy,
            opacity,
            prep.normal_view,
            prep.color,
            refl,
            scope_mask,
            bg,
            H,
            W,
            mesh=mesh,
            axis=mesh_axis,
            full_grads=cfg.grad_channels != "train",
            bf16_grads=cfg.bf16_grads,
            bf16_feats=cfg.bf16_feats,
            collect_weights=collect_weights,
        )
        return RasterOutput(
            color=out.color,
            others=out.others,
            refl_map=out.refl_map,
            radii=prep.radius,
            gaussian_weights=out.gaussian_weights,
            final_T=out.final_T,
            n_contrib=out.n_contrib,
            num_instances=binned.num_instances,
            max_area=binned.max_area,
            tile_counts=binned.tile_counts,
            pad_overflow=binned.pad_overflow,
        )
    out = blend(
        binned.tile_gid,
        binned.tile_mask,
        prep.hom,
        prep.xy,
        opacity,
        prep.normal_view,
        prep.color,
        refl,
        scope_mask,
        bg,
        H,
        W,
        cfg,
        mesh=mesh,
        axis=mesh_axis,
    )
    gw = out.gaussian_weights
    if not collect_weights:
        # API parity with the Pallas inference path: densify stats off
        gw = jnp.zeros_like(gw)
    return RasterOutput(
        color=out.color,
        others=out.others,
        refl_map=out.refl_map,
        radii=prep.radius,
        gaussian_weights=gw,
        final_T=out.final_T,
        n_contrib=out.n_contrib,
        num_instances=binned.num_instances,
        max_area=binned.max_area,
        tile_counts=binned.tile_counts,
        pad_overflow=binned.pad_overflow,
    )
