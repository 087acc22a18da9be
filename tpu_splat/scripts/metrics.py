"""Metrics CLI (role of reference metrics.py).

Walks <model>/test/ours_N/{renders,gt}, computes PSNR/SSIM (+LPIPS when a
pretrained backbone is available — see tpu_splat.eval.lpips), writes
results.json + per_view.json in the reference's format.
"""
from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import numpy as np


def _read_dir(d):
    from PIL import Image

    names = sorted(os.listdir(d))
    return [
        (n, np.asarray(Image.open(os.path.join(d, n)).convert("RGB")) / 255.0)
        for n in names
    ]


def evaluate(model_paths, split="test"):
    import jax.numpy as jnp

    from tpu_splat.train.losses import ssim as ssim_fn, psnr as psnr_fn
    from tpu_splat.eval.lpips import lpips_fn_or_none, gmsd

    lpips = lpips_fn_or_none()

    for model_path in model_paths:
        print(f"Scene: {model_path}")
        full, per_view = {}, {}
        split_dir = os.path.join(model_path, split)
        if not os.path.isdir(split_dir):
            print(f"  no {split} renders")
            continue
        for method in sorted(os.listdir(split_dir)):
            renders_dir = os.path.join(split_dir, method, "renders")
            gt_dir = os.path.join(split_dir, method, "gt")
            if not os.path.isdir(renders_dir):
                continue
            renders = _read_dir(renders_dir)
            gts = dict(_read_dir(gt_dir))
            ssims, psnrs, lpipss, gmsds, names = [], [], [], [], []
            for name, img in renders:
                gt = gts[name]
                a, b = jnp.asarray(img, jnp.float32), jnp.asarray(gt, jnp.float32)
                ssims.append(float(ssim_fn(a, b)))
                psnrs.append(float(psnr_fn(a, b)))
                lpipss.append(float(lpips(a, b)) if lpips else float("nan"))
                gmsds.append(gmsd(img, gt))
                names.append(name)
            full[method] = {
                "SSIM": float(np.mean(ssims)),
                "PSNR": float(np.mean(psnrs)),
                "LPIPS": float(np.mean(lpipss)),
                # which perceptual metric LPIPS actually is in this run:
                # calibrated lin-head LPIPS-vgg only when pretrained weights
                # exist locally, else NaN + the weight-free GMSD fallback
                "LPIPS_METRIC": (
                    "lpips-vgg-v0.1" if lpips is not None else "unavailable (NaN)"
                ),
                # weight-free perceptual fallback, always available (see
                # tpu_splat.eval.lpips.gmsd; lower is better like LPIPS)
                "GMSD": float(np.mean(gmsds)),
            }
            per_view[method] = {
                "SSIM": dict(zip(names, ssims)),
                "PSNR": dict(zip(names, psnrs)),
                "LPIPS": dict(zip(names, lpipss)),
                "GMSD": dict(zip(names, gmsds)),
            }
            print(
                f"  {method}: PSNR {full[method]['PSNR']:.4f} "
                f"SSIM {full[method]['SSIM']:.4f} LPIPS {full[method]['LPIPS']:.4f} "
                f"GMSD {full[method]['GMSD']:.4f}"
            )
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(full, f, indent=2)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=2)


def main(argv=None):
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    parser = ArgumentParser()
    parser.add_argument("--model_paths", "-m", nargs="+", required=True)
    parser.add_argument("--split", default="test")
    args = parser.parse_args(argv)
    evaluate(args.model_paths, args.split)


if __name__ == "__main__":
    main()
