import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_splat.core import (
    quat_to_rotmat,
    eval_sh,
    rgb_to_sh,
    sh_to_rgb,
    Camera,
    projection_from_fov,
    projection_from_K,
    fov2focal,
    camera_rays,
    reflect,
)
from tpu_splat.core.sh import sh_basis, SH_C0


def test_quat_to_rotmat_identity():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    R = quat_to_rotmat(q)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_quat_to_rotmat_orthonormal():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
    R = np.asarray(quat_to_rotmat(q))
    np.testing.assert_allclose(
        R @ np.swapaxes(R, -1, -2), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)


def test_quat_rotmat_matches_reference_formula():
    # reference build_rotation (utils/general_utils.py:78-99), w-first layout
    rng = np.random.default_rng(1)
    q = rng.normal(size=(8, 4)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    Rref = np.zeros((8, 3, 3), np.float32)
    Rref[:, 0, 0] = 1 - 2 * (y * y + z * z)
    Rref[:, 0, 1] = 2 * (x * y - r * z)
    Rref[:, 0, 2] = 2 * (x * z + r * y)
    Rref[:, 1, 0] = 2 * (x * y + r * z)
    Rref[:, 1, 1] = 1 - 2 * (x * x + z * z)
    Rref[:, 1, 2] = 2 * (y * z - r * x)
    Rref[:, 2, 0] = 2 * (x * z - r * y)
    Rref[:, 2, 1] = 2 * (y * z + r * x)
    Rref[:, 2, 2] = 1 - 2 * (x * x + y * y)
    np.testing.assert_allclose(quat_to_rotmat(jnp.asarray(q)), Rref, atol=1e-6)


def test_sh_roundtrip_dc():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    sh = rgb_to_sh(rgb)
    np.testing.assert_allclose(sh_to_rgb(sh), rgb, atol=1e-6)
    # eval at any direction with only DC: color = C0 * sh + 0.5
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    out = eval_sh(0, sh[:, None, :], dirs) + 0.5
    np.testing.assert_allclose(out, rgb, atol=1e-6)


def test_sh_basis_degrees():
    dirs = jnp.asarray(np.random.default_rng(2).normal(size=(16, 3)))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    for deg, m in [(0, 1), (1, 4), (2, 9), (3, 16)]:
        assert sh_basis(deg, dirs).shape == (16, m)
    np.testing.assert_allclose(sh_basis(0, dirs), SH_C0 * np.ones((16, 1)), atol=1e-7)


def test_projection_center_maps_to_image_center():
    cam = _look_at_origin()
    # A point straight ahead of the camera projects to the image center
    p = np.array([0.0, 0.0, 0.0, 1.0])
    clip = np.asarray(cam.full_proj) @ p
    ndc = clip[:3] / clip[3]
    assert abs(ndc[0]) < 1e-5 and abs(ndc[1]) < 1e-5
    # depth (clip w) is the view-space z
    view = np.asarray(cam.world_view) @ p
    np.testing.assert_allclose(clip[3], view[2], rtol=1e-5)


def _look_at_origin(h=64, w=64, radius=4.0):
    from tpu_splat.data import orbit_camera

    return orbit_camera(h, w, radius=radius, azimuth=0.0, elevation=0.0)


def test_projection_from_K_equals_fov_when_centered():
    h, w = 60, 80
    fovx, fovy = 0.9, 0.7
    fx, fy = fov2focal(fovx, w), fov2focal(fovy, h)
    K = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]])
    P1 = projection_from_fov(0.01, 100.0, fovx, fovy)
    P2 = projection_from_K(0.01, 100.0, h, w, K)
    np.testing.assert_allclose(P1, P2, atol=1e-5)


def test_camera_rays_through_center():
    cam = _look_at_origin()
    rays = np.asarray(camera_rays(cam))
    assert rays.shape == (64, 64, 3)
    np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-5)
    # center-ish ray points from the camera toward the origin
    center_dir = -np.asarray(cam.camera_center)
    center_dir /= np.linalg.norm(center_dir)
    assert np.dot(rays[32, 32], center_dir) > 0.999


def test_reflect():
    d = jnp.array([0.0, 0.0, 1.0])
    n = jnp.array([0.0, 0.0, -1.0])
    np.testing.assert_allclose(reflect(d, n), jnp.array([0.0, 0.0, -1.0]), atol=1e-6)
    # grazing: reflect about y
    d = jnp.array([1.0, 1.0, 0.0])
    n = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(reflect(d, n), jnp.array([1.0, -1.0, 0.0]), atol=1e-6)
