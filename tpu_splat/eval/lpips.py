"""LPIPS metric (role of reference lpipsPyTorch/).

The reference vendors an LPIPS implementation whose quality depends on
pretrained VGG features + linear heads downloaded at runtime
(lpipsPyTorch/modules/lpips.py). This environment has no network egress, so
pretrained weights are only usable if already cached on disk. We provide:
- lpips_fn_or_none(): returns a callable if torchvision VGG16 weights are
  locally cached (TORCH_HOME), else None — metrics report NaN for LPIPS then,
  with PSNR/SSIM always available.
"""
from __future__ import annotations

import os


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
