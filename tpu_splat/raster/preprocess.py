"""Per-Gaussian preprocessing: homography, AABB, culling, SH color.

TPU-native reformulation of preprocessCUDA
(diff-surfel-rasterization/cuda_rasterizer/forward.cu:148-253): one batched
einsum builds every splat->pixel homography at once instead of one CUDA thread
per Gaussian, and culling becomes a validity mask instead of early returns
(static shapes; XLA maps this onto VPU/MXU directly).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_splat.core.transforms import quat_to_rotmat
from tpu_splat.core.sh import sh_to_color
from tpu_splat.raster.config import (
    TILE,
    NEAR_N,
    CUTOFF,
    FILTER_SIZE,
    tile_grid,
)


class Preprocessed(NamedTuple):
    """Per-Gaussian rasterization attributes (all [P, ...])."""

    hom: jnp.ndarray  # [P,3,3] homography rows (Tu, Tv, Tw): splat(u,v,1)->pixel hom.
    xy: jnp.ndarray  # [P,2] screen-space AABB center (low-pass filter mean)
    depth: jnp.ndarray  # [P] view-space z (sort key)
    normal_view: jnp.ndarray  # [P,3] camera-facing view-space splat normal
    color: jnp.ndarray  # [P,3] RGB from SH (or passthrough)
    radius: jnp.ndarray  # [P] int32 screen radius (0 => culled)
    rect_min: jnp.ndarray  # [P,2] int32 tile rect min (x,y)
    rect_max: jnp.ndarray  # [P,2] int32 tile rect max (exclusive)
    tiles_touched: jnp.ndarray  # [P] int32 rect area
    valid: jnp.ndarray  # [P] bool


def ndc2pix_matrix(height: int, width: int) -> jnp.ndarray:
    """[3,4] homogeneous NDC -> pixel map; px = ((x/w + 1) * W - 1) / 2
    (reference auxiliary.h:66-69 ndc2Pix and forward.cu:106-110)."""
    return jnp.array(
        [
            [width / 2.0, 0.0, 0.0, (width - 1) / 2.0],
            [0.0, height / 2.0, 0.0, (height - 1) / 2.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=jnp.float32,
    )


def compute_homography(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    full_proj: jnp.ndarray,
    height: int,
    width: int,
    scale_modifier: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build splat->pixel homographies and world normals for all Gaussians.

    Equivalent to compute_transmat (forward.cu:75-115): rows of the returned
    [P,3,3] `hom` are (Tu, Tv, Tw) such that hom @ (u,v,1) = (px*w, py*w, w)
    with w the view-space depth. Surfels are disks: only 2 scale axes.
    """
    R = quat_to_rotmat(rotations)  # [P,3,3]; columns are rotated axes
    s = scales * scale_modifier
    tan_u = R[..., :, 0] * s[..., 0:1]  # [P,3]
    tan_v = R[..., :, 1] * s[..., 1:2]
    normal_world = R[..., :, 2]

    # splat2world [P,4,3]: columns (tan_u,0), (tan_v,0), (mean,1)
    zeros = jnp.zeros_like(s[..., 0])
    ones = jnp.ones_like(zeros)
    s2w = jnp.stack(
        [
            jnp.concatenate([tan_u, zeros[..., None]], axis=-1),
            jnp.concatenate([tan_v, zeros[..., None]], axis=-1),
            jnp.concatenate([means3d, ones[..., None]], axis=-1),
        ],
        axis=-1,
    )  # [P,4,3]
    A = jnp.einsum(
        "ij,jk->ik",
        ndc2pix_matrix(height, width),
        full_proj,
        precision=jax.lax.Precision.HIGHEST,
    )  # [3,4]
    hom = jnp.einsum(
        "ij,pjk->pik", A, s2w, precision=jax.lax.Precision.HIGHEST
    )  # [P,3,3]
    return hom, normal_world


def compute_aabb(hom: jnp.ndarray, cutoff: float = CUTOFF, cutoff_sq=None):
    """Screen AABB center + extent of the cutoff-sigma conic from the
    homography (forward.cu:119-145). Returns (center [P,2], extent [P,2],
    ok [P], h0 [P,2]); `cutoff_sq` [P] overrides the scalar cutoff with a
    per-Gaussian rho level. h0 <= 0 marks a degenerate/unbounded conic
    AABB (the sqrt is clamped; callers needing exactness must treat those
    rows as invalid)."""
    Tu, Tv, Tw = hom[..., 0, :], hom[..., 1, :], hom[..., 2, :]
    if cutoff_sq is None:
        t = jnp.array([cutoff * cutoff, cutoff * cutoff, -1.0], dtype=hom.dtype)
        t = jnp.broadcast_to(t, hom.shape[:-2] + (3,))
    else:
        t = jnp.stack(
            [cutoff_sq, cutoff_sq, -jnp.ones_like(cutoff_sq)], axis=-1
        )
    d = jnp.sum(t * Tw * Tw, axis=-1)
    ok = d != 0.0
    f = t / jnp.where(ok, d, 1.0)[..., None]
    center = jnp.stack(
        [jnp.sum(f * Tu * Tw, axis=-1), jnp.sum(f * Tv * Tw, axis=-1)], axis=-1
    )
    h0 = center * center - jnp.stack(
        [jnp.sum(f * Tu * Tu, axis=-1), jnp.sum(f * Tv * Tv, axis=-1)], axis=-1
    )
    extent = jnp.sqrt(jnp.maximum(1e-4, h0))
    return center, extent, ok, h0


def preprocess(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    camera_world_view: jnp.ndarray,
    camera_full_proj: jnp.ndarray,
    camera_center: jnp.ndarray,
    height: int,
    width: int,
    sh: jnp.ndarray | None = None,
    sh_degree: int = 0,
    colors: jnp.ndarray | None = None,
    scale_modifier: float = 1.0,
    screen_offset: jnp.ndarray | None = None,
    hom_precomp: jnp.ndarray | None = None,
    opacity: jnp.ndarray | None = None,
    circular_rect: bool = False,
) -> Preprocessed:
    """Vectorized preprocess over all P Gaussians.

    `screen_offset` [P,2] is a zero probe tensor: it is added to the pixel
    translation entries of the homography scaled by (W/2, H/2) so that its
    gradient reproduces the reference's densification signal
    (backward.cu:656-659 overwrites dL_dmean2D with exactly
    0.5*W*dL_dTu.z, 0.5*H*dL_dTv.z).

    `opacity` [P] (post-activation), when given, enables the opacity-aware
    tile rect: the blend kernels hard-skip contributions with
    alpha = opacity*exp(-rho/2) < 1/255 (forward.cu:408-416 /
    kernels/tile_blend.py accept mask), so tiles only reachable at
    rho > rho_cut = 2*ln(255*opacity) can never contribute. Both the
    3-sigma ellipse extent and the low-pass floor scale by
    sqrt(min(CUTOFF^2, rho_cut))/CUTOFF, and Gaussians with
    opacity < 1/255 are culled outright — OUTPUT-EXACT vs the reference's
    opacity-independent 3-sigma rect (forward.cu:222), strictly fewer
    instances. The reported `radius` stays at the full 3-sigma value so
    radii>0 visibility and max_radii2D densify stats keep reference parity.
    """
    P = means3d.shape[0]
    tiles_y, tiles_x = tile_grid(height, width)

    p_view = means3d @ camera_world_view[:3, :3].T + camera_world_view[:3, 3]
    in_front = p_view[..., 2] > NEAR_N  # auxiliary.h:189-214 near culling

    if hom_precomp is not None:
        hom = hom_precomp
        normal_world = jnp.zeros_like(means3d).at[..., 2].set(1.0)
        normal_view = normal_world  # precomp path carries no normal (ref :207)
    else:
        hom, normal_world = compute_homography(
            means3d, scales, rotations, camera_full_proj, height, width, scale_modifier
        )
        normal_view = normal_world @ camera_world_view[:3, :3].T

    # DUAL_VISIABLE: flip normal toward camera (forward.cu:211-216)
    cosv = -jnp.sum(p_view * normal_view, axis=-1)
    normal_view = jnp.sign(cosv)[..., None] * normal_view
    front_ok = cosv != 0.0

    center, extent, aabb_ok, _ = compute_aabb(hom)
    radius_f = jnp.ceil(
        jnp.maximum(jnp.maximum(extent[..., 0], extent[..., 1]), CUTOFF * FILTER_SIZE)
    )
    radius = radius_f.astype(jnp.int32)

    # Tile rect from the PER-AXIS ellipse AABB (tighter than the reference's
    # circular getRect, auxiliary.h:71-81, which uses max(extent) on both
    # axes): anisotropic splats touch ~2-3x fewer tiles, shrinking the
    # instance stream through sort/pack/blend. The per-axis floor
    # CUTOFF*FILTER_SIZE covers the low-pass (rho2d) footprint, so only
    # sub-1/255-ish tail contributions beyond the 3-sigma box differ.
    if circular_rect:
        # reference-exact circular getRect (auxiliary.h:71-81): one integer
        # radius on both axes — the oracle-parity mode (PARITY.md D1)
        rx = ry = radius_f
    else:
        rx = jnp.ceil(jnp.maximum(extent[..., 0], CUTOFF * FILTER_SIZE))
        ry = jnp.ceil(jnp.maximum(extent[..., 1], CUTOFF * FILTER_SIZE))
    lo = center - jnp.stack([rx, ry], axis=-1)  # [P,2] pixel box
    hi = center + jnp.stack([rx, ry], axis=-1)
    if opacity is not None:
        # alpha = o*exp(-rho/2) >= 1/255 requires rho <= rho_cut =
        # 2*ln(255*o) — the blend accept mask skips everything beyond, so
        # tiles only reachable at rho > rho_cut never contribute. The
        # rho3d = rho_cut level set is a CONIC of the homography (its AABB
        # must be recomputed at that level: projective images of concentric
        # circles are not concentric, so scaling the 3-sigma box about its
        # own center under-covers); the rho2d low-pass region is the disk
        # of radius sqrt(rho_cut/2) = sqrt(rho_cut)*FILTER_SIZE about `xy`.
        # Rows whose cut-conic AABB is degenerate (h0 <= eps or d >= 0)
        # fall back to the reference 3-sigma box — always a superset.
        rho_cut = jnp.clip(
            2.0 * jnp.log(jnp.maximum(255.0 * opacity, 1e-12)),
            0.0,
            CUTOFF * CUTOFF,
        )
        # cull strictly-below-threshold opacities only: at o == 1/255
        # exactly, alpha == ALPHA_MIN at rho == 0 IS accepted by the blend
        # kernels (alpha >= 1/255, forward.cu:408), so such rows must keep
        # their (rho_cut == 0 -> ~1 px) box (round-4 advisor boundary note)
        opa_ok = 255.0 * opacity >= 1.0
        center_c, extent_c, _, h0_c = compute_aabb(hom, cutoff_sq=rho_cut)
        cut_good = (
            (jnp.sum(hom[..., 2, :] ** 2 * jnp.stack(
                [rho_cut, rho_cut, -jnp.ones_like(rho_cut)], axis=-1
            ), axis=-1) < 0.0)
            & (h0_c[..., 0] > 1e-4)
            & (h0_c[..., 1] > 1e-4)
        )[..., None]
        # Symmetric box about `center` covering (cut-conic AABB) union (the
        # low-pass disk), with the SAME ceil as the 3-sigma formula so that
        # rho_cut == CUTOFF^2 reproduces the reference box bit-for-bit —
        # the exactness target is equality with the (rect  intersect
        # alpha-accept) pipeline, and for o > e^{4.5}/255 the accept region
        # legitimately spills past 3 sigma where the reference rect clips it.
        lp = jnp.sqrt(rho_cut)[..., None] * FILTER_SIZE
        # +1 px guards f32 rounding of the conic-AABB arithmetic at the
        # alpha == 1/255 accept knife edge; the intersection below caps the
        # box at the reference rect, so rho_cut == CUTOFF^2 still reduces
        # to it exactly.
        half = jnp.ceil(
            jnp.maximum(jnp.abs(center_c - center) + extent_c, lp) + 1.0
        )
        lo = jnp.where(cut_good, jnp.maximum(lo, center - half), lo)
        hi = jnp.where(cut_good, jnp.minimum(hi, center + half), hi)
    else:
        opa_ok = True
    rect_min = jnp.stack(
        [
            jnp.clip(jnp.floor(lo[..., 0] / TILE), 0, tiles_x),
            jnp.clip(jnp.floor(lo[..., 1] / TILE), 0, tiles_y),
        ],
        axis=-1,
    ).astype(jnp.int32)
    rect_max = jnp.stack(
        [
            jnp.clip(jnp.floor((hi[..., 0] + TILE - 1) / TILE), 0, tiles_x),
            jnp.clip(jnp.floor((hi[..., 1] + TILE - 1) / TILE), 0, tiles_y),
        ],
        axis=-1,
    ).astype(jnp.int32)
    area = (rect_max[..., 0] - rect_min[..., 0]) * (rect_max[..., 1] - rect_min[..., 1])

    valid = in_front & front_ok & aabb_ok & (area > 0) & opa_ok
    radius = jnp.where(valid, radius, 0)
    area = jnp.where(valid, area, 0)

    if screen_offset is not None:
        # densify probe: grad(so) must equal the reference's overwritten
        # densification signal dL_dmean2D = dL_dT{u,v}.z * T[2][2] * 0.5 *
        # {W,H} (backward.cu:656-659) — with the DEPTH factor T[2][2]
        # (a forward VALUE there: stop-gradient; rounds 1-4 omitted it,
        # under-weighting far Gaussians in the densification stats). The
        # probe is added AFTER the AABB/center derivation: the reference
        # reads the RENDER backward's dL_dT (compute_transmat_aabb keeps
        # its mean2D-chain additions local), so the probe must not leak
        # into the low-pass-center (xy) chain.
        t22 = jax.lax.stop_gradient(hom[..., 2, 2])
        probe = jnp.zeros_like(hom)
        probe = probe.at[..., 0, 2].set(
            0.5 * width * t22 * screen_offset[..., 0]
        )
        probe = probe.at[..., 1, 2].set(
            0.5 * height * t22 * screen_offset[..., 1]
        )
        hom = hom + probe

    if colors is None:
        dirs = means3d - camera_center
        # sqrt(max(...)) keeps grads NaN-free if a (dead) row sits at campos
        n2 = jnp.sum(dirs * dirs, axis=-1, keepdims=True)
        dirs = dirs / jnp.sqrt(jnp.maximum(n2, 1e-16))
        color = sh_to_color(sh_degree, sh, dirs)
    else:
        color = colors

    return Preprocessed(
        hom=hom,
        xy=center,
        depth=p_view[..., 2],
        normal_view=normal_view,
        color=color,
        radius=radius,
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=area,
        valid=valid,
    )
