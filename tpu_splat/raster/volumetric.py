"""Volumetric (classic 3DGS) preprocessing — the alternative rasterization
family (reference submodules/diff-gaussian-rasterization, SURVEY §2.5).

EWA splatting: 3D covariance R diag(s^2) R^T projected through the local
perspective Jacobian to a 2D screen covariance (+0.3 px dilation, optional
Mip-Splatting antialiasing opacity rescale, forward.cu:113-224 of the
vendored diff-gaussian-rasterization).

TPU trick: instead of a second blend kernel, the EWA Gaussian is encoded as
an AFFINE homography consumed by the existing surfel kernel. With rows
  hom = z * [[A, mu], [0, 0, 1]],  A A^T = cov2D (2x2 SPD square root),
the kernel's ray-splat solve yields s = A^-1 (pix - mu), so
rho3d = |s|^2 = d^T cov2D^-1 d — exactly the EWA falloff — and the blended
depth is the view z. The low-pass branch is disabled by placing the 2D mean
sentinel far away (rho2d >> rho3d always). One kernel, two model families.

The fork's volumetric variant blends externally-supplied per-Gaussian
normals and refl strengths (forward.cu:282-292 of diff-gaussian-r.) — pass
`normals` explicitly. (Deviation: our auxiliary depth channel accumulates
sum(w*z) like the surfel path, not the fork's inverse depth.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_splat.core.transforms import quat_to_rotmat
from tpu_splat.core.sh import sh_to_color
from tpu_splat.raster.config import TILE, NEAR_N, tile_grid
from tpu_splat.raster.preprocess import Preprocessed, ndc2pix_matrix

DILATION = 0.3  # pixel dilation (forward.cu computeCov2D)


def compute_cov2d(
    means3d: jnp.ndarray,  # [P,3]
    scales3: jnp.ndarray,  # [P,3]
    rotations: jnp.ndarray,  # [P,4]
    world_view: jnp.ndarray,  # [4,4]
    focal_x: float,
    focal_y: float,
    tan_fovx: float,
    tan_fovy: float,
    scale_modifier: float = 1.0,
):
    """EWA projection of the 3D covariance -> (cov2d [P,2,2] dilated,
    det_ratio [P] for antialiasing, p_view [P,3])."""
    R = quat_to_rotmat(rotations)
    s = scales3 * scale_modifier
    M = R * s[:, None, :]  # R @ diag(s)
    cov3d = jnp.einsum("pij,pkj->pik", M, M, precision="highest")  # [P,3,3]

    Wv = world_view[:3, :3]
    p_view = means3d @ Wv.T + world_view[:3, 3]
    tz = p_view[:, 2]
    # frustum-clamped tangent coords (forward.cu:162-170 style)
    lim_x, lim_y = 1.3 * tan_fovx, 1.3 * tan_fovy
    txtz = jnp.clip(p_view[:, 0] / tz, -lim_x, lim_x)
    tytz = jnp.clip(p_view[:, 1] / tz, -lim_y, lim_y)
    tx = txtz * tz
    ty = tytz * tz

    zero = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([focal_x / tz, zero, -focal_x * tx / (tz * tz)], axis=-1),
            jnp.stack([zero, focal_y / tz, -focal_y * ty / (tz * tz)], axis=-1),
        ],
        axis=-2,
    )  # [P,2,3]
    T = jnp.einsum("pij,jk->pik", J, Wv, precision="highest")  # [P,2,3]
    cov = jnp.einsum("pij,pjk,plk->pil", T, cov3d, T, precision="highest")  # [P,2,2]

    det_raw = cov[:, 0, 0] * cov[:, 1, 1] - cov[:, 0, 1] * cov[:, 1, 0]
    cov = cov.at[:, 0, 0].add(DILATION).at[:, 1, 1].add(DILATION)
    det = cov[:, 0, 0] * cov[:, 1, 1] - cov[:, 0, 1] * cov[:, 1, 0]
    det_ratio = jnp.sqrt(jnp.maximum(0.000025, det_raw / jnp.maximum(det, 1e-12)))
    return cov, det, det_ratio, p_view


def _sqrtm_2x2_spd(cov: jnp.ndarray, det: jnp.ndarray) -> jnp.ndarray:
    """Principal square root of SPD 2x2: A = (cov + sqrt(det) I) / sqrt(tr + 2 sqrt(det))."""
    s = jnp.sqrt(jnp.maximum(det, 1e-12))
    tr = cov[:, 0, 0] + cov[:, 1, 1]
    denom = jnp.sqrt(jnp.maximum(tr + 2.0 * s, 1e-12))[:, None, None]
    eye = jnp.eye(2)[None]
    return (cov + s[:, None, None] * eye) / denom


def preprocess_volumetric(
    means3d: jnp.ndarray,
    scales3: jnp.ndarray,  # [P,3] three axes
    rotations: jnp.ndarray,
    normals: jnp.ndarray,  # [P,3] per-Gaussian input normals (world)
    camera_world_view: jnp.ndarray,
    camera_full_proj: jnp.ndarray,
    camera_center: jnp.ndarray,
    height: int,
    width: int,
    tan_fovx: float,
    tan_fovy: float,
    sh: jnp.ndarray | None = None,
    sh_degree: int = 0,
    colors: jnp.ndarray | None = None,
    scale_modifier: float = 1.0,
    antialiasing: bool = False,
) -> tuple[Preprocessed, jnp.ndarray]:
    """-> (Preprocessed with affine homographies, opacity_scale [P]).

    opacity_scale is 1, or the Mip-Splatting h_convolution_scaling when
    `antialiasing` (multiply into opacity before blending)."""
    tiles_y, tiles_x = tile_grid(height, width)
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)

    cov, det, det_ratio, p_view = compute_cov2d(
        means3d, scales3, rotations, camera_world_view,
        focal_x, focal_y, tan_fovx, tan_fovy, scale_modifier,
    )
    in_front = p_view[:, 2] > NEAR_N
    det_ok = det > 0

    # projected center in pixels (ndc2Pix convention)
    hom_p = means3d @ camera_full_proj[:3, :3].T + camera_full_proj[:3, 3]
    w_p = means3d @ camera_full_proj[3, :3].T + camera_full_proj[3, 3]
    ndc = hom_p[:, :2] / (w_p[:, None] + 1e-7)
    center = jnp.stack(
        [
            ((ndc[:, 0] + 1.0) * width - 1.0) * 0.5,
            ((ndc[:, 1] + 1.0) * height - 1.0) * 0.5,
        ],
        axis=-1,
    )

    # screen radius from eigenvalues (forward.cu:227-231)
    mid = 0.5 * (cov[:, 0, 0] + cov[:, 1, 1])
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam))
    radius = radius_f.astype(jnp.int32)

    A = _sqrtm_2x2_spd(cov, det)
    z = p_view[:, 2:3]
    hom = jnp.stack(
        [
            jnp.concatenate([A[:, 0, :], center[:, 0:1]], axis=-1),
            jnp.concatenate([A[:, 1, :], center[:, 1:2]], axis=-1),
            jnp.concatenate(
                [jnp.zeros_like(center), jnp.ones_like(z)], axis=-1
            ),
        ],
        axis=-2,
    ) * z[:, :, None]  # [P,3,3]

    rect_min = jnp.stack(
        [
            jnp.clip(jnp.floor((center[:, 0] - radius_f) / TILE), 0, tiles_x),
            jnp.clip(jnp.floor((center[:, 1] - radius_f) / TILE), 0, tiles_y),
        ],
        axis=-1,
    ).astype(jnp.int32)
    rect_max = jnp.stack(
        [
            jnp.clip(jnp.floor((center[:, 0] + radius_f + TILE - 1) / TILE), 0, tiles_x),
            jnp.clip(jnp.floor((center[:, 1] + radius_f + TILE - 1) / TILE), 0, tiles_y),
        ],
        axis=-1,
    ).astype(jnp.int32)
    area = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])

    valid = in_front & det_ok & (area > 0)
    radius = jnp.where(valid, radius, 0)
    area = jnp.where(valid, area, 0)

    if colors is None:
        dirs = means3d - camera_center
        n2 = jnp.sum(dirs * dirs, axis=-1, keepdims=True)
        dirs = dirs / jnp.sqrt(jnp.maximum(n2, 1e-16))
        color = sh_to_color(sh_degree, sh, dirs)
    else:
        color = colors

    # disable the low-pass branch: sentinel 2D mean far outside any pixel
    far_xy = jnp.full_like(center, 1e7)

    normal_view = normals @ camera_world_view[:3, :3].T

    opacity_scale = det_ratio if antialiasing else jnp.ones_like(det)
    prep = Preprocessed(
        hom=hom,
        xy=far_xy,
        depth=p_view[:, 2],
        normal_view=normal_view,
        color=color,
        radius=radius,
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=area,
        valid=valid,
    )
    return prep, opacity_scale
