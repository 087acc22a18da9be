"""Camera model and projective math (pure jnp / numpy).

Parity with reference utils/graphics_utils.py, scene/cameras.py and the
camera-ray generation in utils/general_utils.py:175-240 — but stored in the
plain column-vector convention (x' = M @ x) instead of the reference's
transposed GLM layout, so all downstream math is ordinary batched matmul.

Conventions:
- `R` is the camera-to-world rotation (3DGS convention, scene/cameras.py:26),
  `T` the world-to-view translation: x_view = R^T @ x_world + T.
- `world_view` = [[R^T, T], [0, 1]]; `camera_center` = -R @ T.
- `proj` maps view -> NDC homogeneous with z in [0,1] mapped from
  [znear, zfar] (reference getProjectionMatrix, utils/graphics_utils.py:51-91).
- Pixel x,y follow OpenCV (origin at left-top, +z forward).
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax.numpy as jnp
from flax import struct


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def world_to_view(R: np.ndarray, T: np.ndarray) -> np.ndarray:
    """4x4 world->view matrix from c2w rotation R and w2v translation T."""
    M = np.zeros((4, 4), dtype=np.float32)
    M[:3, :3] = np.asarray(R).T
    M[:3, 3] = np.asarray(T)
    M[3, 3] = 1.0
    return M


def projection_from_fov(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection (column-vector convention), z_ndc in [0, zfar/(zfar-znear)] range
    as in reference getProjectionMatrix (utils/graphics_utils.py:51-71)."""
    tan_x = math.tan(fovx / 2)
    tan_y = math.tan(fovy / 2)
    top = tan_y * znear
    right = tan_x * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def projection_from_K(znear: float, zfar: float, H: int, W: int, K: np.ndarray) -> np.ndarray:
    """Projection honoring a (possibly off-center) K matrix
    (reference getProjectionMatrixCorrect, utils/graphics_utils.py:73-91)."""
    K = np.asarray(K)
    top = K[1, 2] / K[1, 1] * znear
    bottom = -(H - K[1, 2]) / K[1, 1] * znear
    right = K[0, 2] / K[0, 0] * znear
    left = -(W - K[0, 2]) / K[0, 0] * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


@struct.dataclass
class Camera:
    """Jit-friendly camera: matrix fields are array leaves, H/W/fov static.

    Build with `Camera.create(...)`; carries everything render() needs
    (reference scene/cameras.py:17-89 Camera + MiniCam roles).
    """

    world_view: jnp.ndarray  # [4,4] x_view = world_view @ x_world
    proj: jnp.ndarray  # [4,4] view -> ndc (homogeneous)
    full_proj: jnp.ndarray  # [4,4] = proj @ world_view
    camera_center: jnp.ndarray  # [3]
    K: jnp.ndarray  # [3,3] pixel intrinsics
    height: int = struct.field(pytree_node=False)
    width: int = struct.field(pytree_node=False)
    fovx: float = struct.field(pytree_node=False)
    fovy: float = struct.field(pytree_node=False)
    znear: float = struct.field(pytree_node=False, default=0.01)
    zfar: float = struct.field(pytree_node=False, default=100.0)

    @classmethod
    def create(
        cls,
        R: np.ndarray,
        T: np.ndarray,
        fovx: float,
        fovy: float,
        height: int,
        width: int,
        K: np.ndarray | None = None,
        znear: float = 0.01,
        zfar: float = 100.0,
    ) -> "Camera":
        wv = world_to_view(R, T)
        if K is None:
            fx = fov2focal(fovx, width)
            fy = fov2focal(fovy, height)
            K = np.array(
                [[fx, 0, width / 2], [0, fy, height / 2], [0, 0, 1]], dtype=np.float32
            )
            proj = projection_from_fov(znear, zfar, fovx, fovy)
        else:
            K = np.asarray(K, dtype=np.float32)
            proj = projection_from_K(znear, zfar, height, width, K)
        cam_center = -np.asarray(R, np.float32) @ np.asarray(T, np.float32)
        return cls(
            world_view=jnp.asarray(wv),
            proj=jnp.asarray(proj),
            full_proj=jnp.asarray(proj @ wv),
            camera_center=jnp.asarray(cam_center),
            K=jnp.asarray(K),
            height=int(height),
            width=int(width),
            fovx=float(fovx),
            fovy=float(fovy),
            znear=float(znear),
            zfar=float(zfar),
        )

    @property
    def tanfovx(self) -> float:
        return math.tan(self.fovx * 0.5)

    @property
    def tanfovy(self) -> float:
        return math.tan(self.fovy * 0.5)

    def pad_to(self, height: int, width: int) -> "Camera":
        """Extend the image plane to (height, width) WITHOUT moving the
        original pixels: the projection is re-scaled so pixel (x, y) of
        the padded camera coincides exactly with pixel (x, y) of the
        original for x < old W, y < old H (the new columns/rows see scene
        content right of / below the original frame).

        Derivation: preprocess maps ndc -> px via ((xn+1)*W - 1)/2, so
        keeping px fixed under W -> W' needs xn' = a*xn + (a-1) with
        a = W/W'; in clip space that is row0' = a*row0 + (a-1)*row3.
        Enables camera-size BUCKETING for data-parallel training over
        mixed-resolution captures (pad every camera to one max shape and
        mask the loss; reference resolution policy produces per-image
        sizes, utils/camera_utils.py:26-35)."""
        if height == self.height and width == self.width:
            return self
        assert height >= self.height and width >= self.width
        a = self.width / width
        c = self.height / height
        P = self.proj
        P = P.at[0, :].set(a * P[0, :] + (a - 1.0) * P[3, :])
        P = P.at[1, :].set(c * P[1, :] + (c - 1.0) * P[3, :])
        return self.replace(
            proj=P,
            full_proj=P @ self.world_view,
            height=int(height),
            width=int(width),
            fovx=2.0 * math.atan(math.tan(self.fovx * 0.5) / a),
            fovy=2.0 * math.atan(math.tan(self.fovy * 0.5) / c),
        )


@partial(jnp.vectorize, signature="(3),(3)->(3)")
def reflect(rayd: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection of ray direction about a (not necessarily unit) normal.
    Matches reference gaussian_renderer/__init__.py:22-24 exactly (no
    normalization of `normal` — gradients flow through raw map)."""
    return rayd - 2.0 * normal * jnp.sum(rayd * normal, axis=-1, keepdims=True)


def camera_rays(camera: Camera) -> jnp.ndarray:
    """World-space unit ray directions per pixel, [H, W, 3].

    Equivalent to reference sample_camera_rays (utils/general_utils.py:177-197):
    rays_d = normalize(R_c2w @ K^-1 @ (x+0? ...)) — the reference uses integer
    pixel coordinates (i, j) with no half-pixel offset; we match that.
    """
    H, W = camera.height, camera.width
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    pix = jnp.stack([i, j, jnp.ones_like(i)], axis=-1)  # [H,W,3]
    Kinv = jnp.linalg.inv(camera.K)
    dirs_cam = jnp.einsum('hwj,kj->hwk', pix, Kinv, precision='highest')  # camera z=1 points
    R_c2w = camera.world_view[:3, :3].T
    dirs_world = jnp.einsum('hwj,kj->hwk', dirs_cam, R_c2w, precision='highest')
    return dirs_world / jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)


def env_rays_latlong1(H: int, W: int) -> jnp.ndarray:
    """Lat-long ray grid #1 for env-map visualization
    (reference utils/general_utils.py:201-217)."""
    i, j = jnp.meshgrid(
        jnp.linspace(-jnp.pi, jnp.pi, W),
        jnp.linspace(0.0, jnp.pi, H),
        indexing="xy",
    )
    z = jnp.cos(j)
    x = jnp.sin(j) * jnp.cos(i)
    y = jnp.sin(j) * jnp.sin(i)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.float32)


def env_rays_latlong2(H: int, W: int) -> jnp.ndarray:
    """Lat-long ray grid #2 (reference utils/general_utils.py:220-235)."""
    gy, gx = jnp.meshgrid(
        jnp.linspace(0.0 + 1.0 / H, 1.0 - 1.0 / H, H),
        jnp.linspace(-1.0 + 1.0 / W, 1.0 - 1.0 / W, W),
        indexing="ij",
    )
    sintheta, costheta = jnp.sin(gy * jnp.pi), jnp.cos(gy * jnp.pi)
    sinphi, cosphi = jnp.sin(gx * jnp.pi), jnp.cos(gx * jnp.pi)
    return jnp.stack(
        [sintheta * sinphi, costheta, -sintheta * cosphi], axis=-1
    ).astype(jnp.float32)
