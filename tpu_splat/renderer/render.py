"""Deferred-reflection rendering (role of reference gaussian_renderer/__init__.py).

render(): rasterize base color + auxiliary maps, post-process the allmap
(world normal, expected/median depth, distortion, scope mask), derive a pseudo
surface normal from depth, then — past the initial stage — reflect camera rays
about the rendered normal, sample the learned cubemap, and composite
`(1-refl)*base + refl*env` (reference :197-199). All maps channels-last
[H, W, C] (TPU layout); eval tools convert as needed.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from tpu_splat.core.graphics import Camera, camera_rays, reflect
from tpu_splat.core.graphics import env_rays_latlong1, env_rays_latlong2
from tpu_splat.envmap.cubemap import sample_cubemap
from tpu_splat.model.state import GaussianState
from tpu_splat.raster import rasterize, RasterConfig
from tpu_splat.raster.config import tile_grid


class RenderOutput(NamedTuple):
    render: jnp.ndarray  # [H,W,3] final image
    base_color: jnp.ndarray  # [H,W,3]
    refl_color: jnp.ndarray  # [H,W,3] env sample (zeros in initial stage)
    refl_strength: jnp.ndarray  # [H,W,1]
    alpha: jnp.ndarray  # [H,W,1]
    normal: jnp.ndarray  # [H,W,3] world-space, normalized
    dist: jnp.ndarray  # [H,W,1] distortion map
    surf_depth: jnp.ndarray  # [H,W,1]
    surf_normal: jnp.ndarray  # [H,W,3] depth-derived pseudo normal
    scope_mask: jnp.ndarray  # [H,W,1]
    radii: jnp.ndarray  # [P]
    gaussian_weights: jnp.ndarray  # [P]
    visibility: jnp.ndarray  # [P] bool (radii > 0)
    num_instances: jnp.ndarray  # overflow diagnostics
    max_area: jnp.ndarray
    max_tile_count: jnp.ndarray
    pad_overflow: jnp.ndarray


def _safe_normalize(v: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Normalize with NaN-free gradients at v == 0 (empty pixels render zero
    normals; jnp.linalg.norm has NaN grad at exactly zero)."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v / (jnp.sqrt(jnp.maximum(n2, eps * eps)) + eps)


def depth_to_normal(camera: Camera, depth: jnp.ndarray) -> jnp.ndarray:
    """Pseudo surface normal from a depth map via cross products of
    image-space point derivatives (reference utils/point_utils.py:9-37).
    depth: [H,W] -> [H,W,3] world-space (zero border)."""
    H, W = camera.height, camera.width
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    pix = jnp.stack([i, j, jnp.ones_like(i)], axis=-1)
    Kinv = jnp.linalg.inv(camera.K)
    dirs_cam = jnp.einsum("hwj,kj->hwk", pix, Kinv, precision="highest")  # z=1
    R_c2w = camera.world_view[:3, :3].T
    dirs_world = jnp.einsum("hwj,kj->hwk", dirs_cam, R_c2w, precision="highest")
    points = depth[..., None] * dirs_world + camera.camera_center

    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    n = _safe_normalize(jnp.cross(dx, dy), eps=1e-12)
    return jnp.zeros_like(points).at[1:-1, 1:-1].set(n)


def get_refl_color(
    env, camera: Camera, normal_map: jnp.ndarray, mesh=None,
    mesh_axis: str = "tiles",
) -> jnp.ndarray:
    """Reflect camera rays about the rendered world normal and sample the env
    cubemap through a sigmoid (reference gaussian_renderer/__init__.py:26-35).

    With a mesh: the per-pixel env pass (reflect + 4-tap cubemap sample,
    incl. its backward tap accumulation) shards over pixel ROWS — the
    texture is replicated (a few hundred KB) and the shard_map transpose
    psums the per-chip texel-gradient partials, so the deferred-reflection
    stage scales with the tile sweep instead of replicating per chip."""
    rays = camera_rays(camera)  # [H,W,3]
    if mesh is None:
        refl_dirs = reflect(rays, normal_map)
        return jax.nn.sigmoid(sample_cubemap(env, refl_dirs))

    from jax.sharding import PartitionSpec as P

    H = normal_map.shape[0]
    n = mesh.shape[mesh_axis]
    pad = (-H) % n
    if pad:
        zrow = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]
        )
        rays, normal_map = zrow(rays), zrow(normal_map)

    def local(rays_s, nrm_s, env_r):
        dirs = reflect(rays_s, nrm_s)
        return jax.nn.sigmoid(sample_cubemap(env_r, dirs))

    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(mesh_axis), P(mesh_axis), P()),
        out_specs=P(mesh_axis),
        check_vma=False,  # pallas out_shapes carry no vma annotation
    )(rays, normal_map, env)
    return out[:H] if pad else out


def render_env_map(state: GaussianState, H: int = 512, W: int = 1024):
    """Two lat-long preview images of the env map (reference :37-40)."""
    e1 = jax.nn.sigmoid(sample_cubemap(state.env, env_rays_latlong1(H, W)))
    e2 = jax.nn.sigmoid(sample_cubemap(state.env, env_rays_latlong2(H, W)))
    return {"env_cood1": e1, "env_cood2": e2}


def render(
    state: GaussianState,
    camera: Camera,
    cfg: RasterConfig,
    bg: jnp.ndarray,
    scaling_modifier: float = 1.0,
    initial_stage: bool | jnp.ndarray = False,
    env_scope_center=None,
    env_scope_radius: float = 0.0,
    override_color: jnp.ndarray | None = None,
    screen_offset: jnp.ndarray | None = None,
    mesh=None,
    mesh_axis: str = "tiles",
) -> RenderOutput:
    """Differentiable training render (reference render(), :42-219).

    `initial_stage` may be a traced bool: the env-map branch is always
    computed and blended with lax.select semantics so the step stays a single
    compiled function across the stage switch.
    """
    H, W = camera.height, camera.width

    if env_scope_radius > 0.0:
        c = jnp.asarray(env_scope_center, jnp.float32)
        scope = jnp.sum((state.xyz - c[None]) ** 2, axis=-1) < env_scope_radius**2
    else:
        scope = jnp.ones((state.capacity,), bool)

    out = rasterize(
        state.xyz,
        state.get_scaling(),
        state.rotation,
        state.get_opacity(),
        state.get_refl(),
        camera,
        bg,
        cfg,
        sh=None if override_color is not None else state.get_features(),
        sh_degree=state.max_sh_degree,
        colors=override_color,
        scope_mask=scope,
        scale_modifier=scaling_modifier,
        screen_offset=screen_offset,
        alive=state.alive,
        mesh=mesh,
        mesh_axis=mesh_axis,
    )

    allmap = out.others
    alpha = allmap[..., 1:2]
    # view -> world normal (reference :147-148)
    normal_view = allmap[..., 2:5]
    R_v2w = camera.world_view[:3, :3].T
    normal_world = jnp.einsum("hwj,kj->hwk", normal_view, R_v2w, precision="highest")

    depth_median = jnp.nan_to_num(allmap[..., 5:6], 0, 0)
    depth_expected = allmap[..., 0:1] / jnp.clip(alpha, 1e-3)
    depth_expected = jnp.nan_to_num(depth_expected, 0, 0)
    dist_map = allmap[..., 6:7]
    scope_map = allmap[..., 7:8]

    surf_depth = (
        depth_expected * (1 - cfg.depth_ratio) + cfg.depth_ratio * depth_median
    )
    surf_normal = depth_to_normal(camera, surf_depth[..., 0])
    surf_normal = surf_normal * jax.lax.stop_gradient(alpha)

    normal_world = _safe_normalize(normal_world)

    refl_map = out.refl_map[..., None]
    if isinstance(initial_stage, bool) and initial_stage:
        # static specialization: XLA does not fold a select against a
        # broadcasted constant predicate, so the env pass (~200 ms at 1080p)
        # would be computed and thrown away every initial-stage step
        render_img = out.color
        refl_color = jnp.zeros_like(out.color)
    else:
        refl_color = get_refl_color(
            state.env, camera, normal_world, mesh=mesh, mesh_axis=mesh_axis
        )
        final = (1.0 - refl_map) * out.color + refl_map * refl_color
        initial = jnp.asarray(initial_stage)
        render_img = jnp.where(initial, out.color, final)
        refl_color = jnp.where(initial, jnp.zeros_like(refl_color), refl_color)

    return RenderOutput(
        render=render_img,
        base_color=out.color,
        refl_color=refl_color,
        refl_strength=refl_map,
        alpha=alpha,
        normal=normal_world,
        dist=dist_map,
        surf_depth=surf_depth,
        surf_normal=surf_normal,
        scope_mask=scope_map,
        radii=out.radii,
        gaussian_weights=out.gaussian_weights,
        visibility=out.radii > 0,
        num_instances=out.num_instances,
        max_area=out.max_area,
        max_tile_count=jnp.max(out.tile_counts),
        pad_overflow=out.pad_overflow,
    )


def render_fast(
    state: GaussianState,
    camera: Camera,
    cfg: RasterConfig,
    bg: jnp.ndarray,
    scaling_modifier: float = 1.0,
    initial_stage: bool = False,
    collect_weights: bool = True,
) -> RenderOutput:
    """Inference render (reference render_fast, :221-326): skips surf-depth /
    surf-normal post-processing and env scoping. collect_weights=False also
    drops the per-Gaussian max-blend-weight accumulation (a densify-only
    stat, forward.cu:457-459) — the fps/serving path; gaussian_weights
    returns zeros (scripts/visible_gaussians.py keeps the default)."""
    out = rasterize(
        state.xyz,
        state.get_scaling(),
        state.rotation,
        state.get_opacity(),
        state.get_refl(),
        camera,
        bg,
        cfg,
        sh=state.get_features(),
        sh_degree=state.max_sh_degree,
        scale_modifier=scaling_modifier,
        alive=state.alive,
        collect_weights=collect_weights,
    )
    alpha = out.others[..., 1:2]
    normal_view = out.others[..., 2:5]
    R_v2w = camera.world_view[:3, :3].T
    normal_world = jnp.einsum("hwj,kj->hwk", normal_view, R_v2w, precision="highest")
    normal_world = _safe_normalize(normal_world)
    refl_map = out.refl_map[..., None]
    if initial_stage:
        render_img = out.color
        refl_color = jnp.zeros_like(out.color)
    else:
        refl_color = get_refl_color(state.env, camera, normal_world)
        render_img = (1.0 - refl_map) * out.color + refl_map * refl_color
    z = jnp.zeros_like
    return RenderOutput(
        render=render_img,
        base_color=out.color,
        refl_color=refl_color,
        refl_strength=refl_map,
        alpha=alpha,
        normal=normal_world,
        dist=z(alpha),
        surf_depth=z(alpha),
        surf_normal=z(normal_world),
        scope_mask=z(alpha),
        radii=out.radii,
        gaussian_weights=out.gaussian_weights,
        visibility=out.radii > 0,
        num_instances=out.num_instances,
        max_area=out.max_area,
        max_tile_count=jnp.max(out.tile_counts),
        pad_overflow=out.pad_overflow,
    )
