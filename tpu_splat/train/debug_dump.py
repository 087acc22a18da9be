"""Failure snapshot dumps (role of the reference debug path:
diff_surfel_rasterization/__init__.py:91-98 deep-copies every rasterizer
input and writes snapshot_fw.dump/snapshot_bw.dump when the CUDA kernel
fails, so the crash can be reproduced offline).

TPU kernels don't segfault mid-launch; the analogous failure modes here are
a non-finite loss and instance-capacity overflow. On the first such event
the training CLI calls dump_snapshot(), which writes ONE npz with the full
rasterizer input set (Gaussian arrays, camera matrices, image-shape/config
scalars, ground truth) plus the failure reason — enough to replay
`render()` offline with the exact same inputs.
"""
from __future__ import annotations

import os

import numpy as np


def dump_snapshot(
    model_path: str,
    gaussians,
    camera,
    gt_image,
    iteration: int,
    reason: str,
    cfg=None,
    bg=None,
) -> str:
    """Write snapshot_fw.npz into the model dir (once per run: refuses to
    overwrite an existing dump so the FIRST failure is preserved). Returns
    the path, or "" if a dump already exists."""
    path = os.path.join(model_path or ".", "snapshot_fw.npz")
    if os.path.exists(path):
        return ""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = {
        "reason": np.asarray(reason),
        "iteration": np.asarray(iteration),
        # rasterizer inputs (reference snapshot saves means3D/scales/rots/
        # opacity/shs + raster settings)
        "xyz": np.asarray(gaussians.xyz),
        "scaling": np.asarray(gaussians.scaling),
        "rotation": np.asarray(gaussians.rotation),
        "opacity": np.asarray(gaussians.opacity),
        "refl": np.asarray(gaussians.refl),
        "features_dc": np.asarray(gaussians.features_dc),
        "features_rest": np.asarray(gaussians.features_rest),
        "alive": np.asarray(gaussians.alive),
        "active_sh_degree": np.asarray(gaussians.active_sh_degree),
        "env_texture": np.asarray(gaussians.env.texture),
        "env_fail_value": np.asarray(gaussians.env.fail_value),
        "cam_world_view": np.asarray(camera.world_view),
        "cam_full_proj": np.asarray(camera.full_proj),
        "cam_center": np.asarray(camera.camera_center),
        "cam_K": np.asarray(camera.K),
        "cam_hw": np.asarray([camera.height, camera.width]),
    }
    if gt_image is not None:
        data["gt_image"] = np.asarray(gt_image)
    if bg is not None:
        data["bg"] = np.asarray(bg)
    if cfg is not None:
        data["cfg_max_instances"] = np.asarray(cfg.max_instances)
        data["cfg_max_tiles_per_gaussian"] = np.asarray(cfg.max_tiles_per_gaussian)
        data["cfg_tile_depth"] = np.asarray(cfg.tile_depth)
    np.savez_compressed(path, **data)
    return path
