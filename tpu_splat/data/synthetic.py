"""Synthetic scenes for tests/benchmarks (role of the reference StageScene,
scene/__init__.py:26-42, generalized)."""
from __future__ import annotations

import math

import numpy as np

from tpu_splat.core.graphics import Camera, focal2fov
from tpu_splat.core.sh import rgb_to_sh, num_sh_coeffs


def random_scene(
    n: int,
    seed: int = 0,
    sh_degree: int = 0,
    extent: float = 1.0,
    scale_range: tuple[float, float] = (0.05, 0.25),
):
    """Random Gaussian cloud near the origin. Returns dict of RAW (pre-
    activation) parameter arrays matching GaussianState field conventions."""
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    scales = np.log(
        rng.uniform(scale_range[0], scale_range[1], (n, 2)).astype(np.float32)
    )
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
    opacity_raw = rng.uniform(-1.0, 2.5, (n, 1)).astype(np.float32)  # logit
    rgb = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    m = num_sh_coeffs(sh_degree)
    sh = np.zeros((n, m, 3), dtype=np.float32)
    sh[:, 0, :] = rgb_to_sh(rgb)
    if m > 1:
        sh[:, 1:, :] = 0.1 * rng.normal(size=(n, m - 1, 3)).astype(np.float32)
    refl_raw = rng.uniform(-5.0, -1.0, (n, 1)).astype(np.float32)
    return dict(
        xyz=xyz,
        scaling=scales,
        rotation=rot,
        opacity=opacity_raw,
        sh=sh,
        refl=refl_raw,
    )


def orbit_camera(
    height: int,
    width: int,
    radius: float = 4.0,
    azimuth: float = 0.3,
    elevation: float = 0.25,
    fov: float = 0.8,
    target: tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> Camera:
    """Camera on a sphere looking at `target` (OpenCV convention, +z forward)."""
    t = np.asarray(target, np.float64)
    cam_pos = t + radius * np.array(
        [
            math.cos(elevation) * math.sin(azimuth),
            math.sin(elevation),
            math.cos(elevation) * math.cos(azimuth),
        ]
    )
    fwd = t - cam_pos
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])  # OpenCV y-down
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=1)  # camera-to-world rotation
    T = -R.T @ cam_pos  # world-to-view translation
    fovx = fov
    fovy = 2 * math.atan(math.tan(fov / 2) * height / width)
    return Camera.create(
        R=R.astype(np.float32),
        T=T.astype(np.float32),
        fovx=fovx,
        fovy=fovy,
        height=height,
        width=width,
    )
