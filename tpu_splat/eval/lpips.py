"""LPIPS metric (role of reference lpipsPyTorch/).

The reference vendors an LPIPS implementation whose quality depends on
pretrained VGG features + linear heads downloaded at runtime
(lpipsPyTorch/modules/lpips.py). This environment has no network egress, so
pretrained weights are only usable if already cached on disk. We provide:
- lpips_fn_or_none(): returns a callable if torchvision VGG16 weights are
  locally cached (TORCH_HOME), else None — metrics report NaN for LPIPS then,
  with PSNR/SSIM always available.
- gmsd(): a WEIGHT-FREE perceptual fallback (Gradient Magnitude Similarity
  Deviation, Xue et al. 2014) reported alongside LPIPS so the quality triple
  never silently degrades to two numbers. Lower is better, like LPIPS.
"""
from __future__ import annotations

import os

import numpy as np


def gmsd(a, b) -> float:
    """Gradient Magnitude Similarity Deviation between two [H,W,3] images in
    [0,1]. Weight-free perceptual distance: Prewitt gradient magnitudes on a
    2x-downsampled luminance channel, per-pixel similarity, then its std.
    Serves as the LPIPS stand-in when no pretrained backbone exists on disk
    (this image has no torchvision and no network egress)."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    # luminance in [0,255] like the original formulation (c tuned for it)
    ya = 255.0 * (0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2])
    yb = 255.0 * (0.299 * b[..., 0] + 0.587 * b[..., 1] + 0.114 * b[..., 2])
    # 2x average-pool downsample (paper's preprocessing)
    h, w = ya.shape
    h2, w2 = h - h % 2, w - w % 2
    ya = ya[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
    yb = yb[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))

    kx = np.array([[1, 0, -1], [1, 0, -1], [1, 0, -1]], np.float32) / 3.0
    ky = kx.T

    def grad_mag(y):
        yp = np.pad(y, 1, mode="edge")
        gx = sum(
            kx[i, j] * yp[i : i + y.shape[0], j : j + y.shape[1]]
            for i in range(3)
            for j in range(3)
            if kx[i, j] != 0
        )
        gy = sum(
            ky[i, j] * yp[i : i + y.shape[0], j : j + y.shape[1]]
            for i in range(3)
            for j in range(3)
            if ky[i, j] != 0
        )
        return np.sqrt(gx * gx + gy * gy)

    ma, mb = grad_mag(ya), grad_mag(yb)
    c = 170.0
    gms = (2.0 * ma * mb + c) / (ma * ma + mb * mb + c)
    return float(np.std(gms))


def _cached_vgg_available() -> bool:
    home = os.environ.get("TORCH_HOME", os.path.expanduser("~/.cache/torch"))
    hub = os.path.join(home, "hub", "checkpoints")
    if not os.path.isdir(hub):
        return False
    return any("vgg16" in f for f in os.listdir(hub))


def lpips_fn_or_none(net: str = "vgg"):
    if not _cached_vgg_available():
        return None
    try:
        import torch
        import torchvision.models as tvm
        import numpy as np

        vgg = tvm.vgg16(weights=tvm.VGG16_Weights.IMAGENET1K_V1).features.eval()
        # feature taps after each conv block (LPIPS layout)
        taps = [3, 8, 15, 22, 29]
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

        @torch.no_grad()
        def lpips(a, b):
            x = torch.from_numpy(np.asarray(a, np.float32)).permute(2, 0, 1)[None]
            y = torch.from_numpy(np.asarray(b, np.float32)).permute(2, 0, 1)[None]
            x = (x - mean) / std
            y = (y - mean) / std
            total = 0.0
            fx, fy = x, y
            for i, layer in enumerate(vgg):
                fx, fy = layer(fx), layer(fy)
                if i in taps:
                    nx = fx / (fx.norm(dim=1, keepdim=True) + 1e-10)
                    ny = fy / (fy.norm(dim=1, keepdim=True) + 1e-10)
                    total = total + ((nx - ny) ** 2).mean()
            return float(total)

        return lpips
    except Exception:
        return None
