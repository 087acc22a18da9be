"""Camera-path generation for turntable/ellipse videos (role of reference
utils/render_utils.py: transform_poses_pca, generate_ellipse_path). Pure
numpy; consumed by scripts/video.py."""
from __future__ import annotations

import numpy as np

from tpu_splat.core.graphics import Camera


def poses_from_cameras(cams) -> np.ndarray:
    """[N,3,4] c2w poses from LoadedCamera list."""
    out = []
    for lc in cams:
        W = np.asarray(lc.camera.world_view)
        R_c2w = W[:3, :3].T
        c = np.asarray(lc.camera.camera_center)
        out.append(np.concatenate([R_c2w, c[:, None]], axis=1))
    return np.stack(out)


def transform_poses_pca(poses: np.ndarray):
    """Recenter/rotate poses so principal components align with axes
    (MipNeRF-360-style; reference render_utils.py:80-121)."""
    t = poses[:, :3, 3]
    t_mean = t.mean(axis=0)
    t = t - t_mean
    eigval, eigvec = np.linalg.eig(t.T @ t)
    inds = np.argsort(eigval)[::-1]
    rot = eigvec[:, inds].T
    if np.linalg.det(rot) < 0:
        rot = np.diag(np.array([1, 1, -1])) @ rot
    transform = np.concatenate([rot, rot @ -t_mean[:, None]], axis=1)
    poses_rec = transform @ np.concatenate(
        [poses, np.tile(np.eye(4)[None, 3:], (len(poses), 1, 1))], axis=1
    )
    if poses_rec.mean(axis=0)[2, 1] < 0:
        poses_rec = np.diag(np.array([1, -1, -1])) @ poses_rec
        transform = np.diag(np.array([1, -1, -1, 1]))[:3] @ np.concatenate(
            [transform, np.eye(4)[3:]], axis=0
        )
    return poses_rec, transform


def generate_ellipse_path(
    poses: np.ndarray, n_frames: int = 120, z_variation: float = 0.0,
    z_phase: float = 0.0
) -> np.ndarray:
    """Elliptical orbit fitted to the pose cloud (reference
    render_utils.py:123-174). poses: [N,3,4] recentered c2w. -> [F,3,4]."""
    center = poses[:, :3, 3].mean(axis=0) * np.array([1, 1, 0])
    offset = center + np.array([0, 0, poses[:, 2, 3].mean()])
    sc = np.percentile(np.abs(poses[:, :3, 3] - offset), 90, axis=0)
    theta = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    positions = np.stack(
        [
            offset[0] + sc[0] * np.cos(theta),
            offset[1] + sc[1] * np.sin(theta),
            offset[2]
            + z_variation * sc[2] * np.sin(theta + 2 * np.pi * z_phase),
        ],
        axis=-1,
    )
    look = center
    up = np.array([0.0, 0.0, 1.0])
    out = []
    for p in positions:
        fwd = look - p
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=1)
        out.append(np.concatenate([R, p[:, None]], axis=1))
    return np.stack(out)


def cameras_from_path(path_c2w: np.ndarray, template: Camera) -> list[Camera]:
    cams = []
    for pose in path_c2w:
        R = pose[:3, :3]
        c = pose[:3, 3]
        T = -R.T @ c
        cams.append(
            Camera.create(
                R=R, T=T, fovx=template.fovx, fovy=template.fovy,
                height=template.height, width=template.width,
                K=np.asarray(template.K),
            )
        )
    return cams
