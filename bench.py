"""Benchmark: fwd+bwd rasterization throughput on the attached device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric: pixels/s per chip for a full differentiable train-style
forward+backward (render + L1 loss + grads) at the benchmark resolution.
Baseline reference point: the upstream claim of >= 30 fps at 1080p forward
(README.md:14) ~ 62M pixels/s forward-only; we report fwd+bwd pixels/s and
normalize vs_baseline against 62.2M px/s (so 1.0 ~ "matches the reference's
headline forward rate, but with backward included").
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tpu_splat.data import orbit_camera
    from tpu_splat.model import init_from_pcd
    from tpu_splat.raster.config import RasterConfig
    from tpu_splat.renderer import render

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        H, W, n, capacity = 1088, 1920, 100_000, 1 << 17
        cfg = RasterConfig(
            max_tiles_per_gaussian=64,
            max_instances=1 << 21,
            tile_depth=1024,
            chunk=32,
            backend="pallas",
        )
        iters = 10
    else:  # CPU smoke config
        H, W, n, capacity = 128, 128, 2000, 2048
        cfg = RasterConfig(
            max_tiles_per_gaussian=16, max_instances=1 << 15, tile_depth=256, chunk=16
        )
        iters = 2

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = init_from_pcd(
        pts, cols, capacity=capacity, cubemap_resolution=64,
        init_refl_value=0.1,
    )
    cam = orbit_camera(H, W, radius=4.0, azimuth=0.4, elevation=0.3)
    bg = jnp.zeros(3)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    def loss_fn(params):
        s = state.with_params(params)
        out = render(s, cam, cfg, bg, initial_stage=False)
        return jnp.mean(jnp.abs(out.render - gt))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    params = state.param_pytree()

    # compile + warmup
    l, g = grad_fn(params)
    jax.block_until_ready(l)

    t0 = time.perf_counter()
    for _ in range(iters):
        l, g = grad_fn(params)
    jax.block_until_ready(l)
    dt = (time.perf_counter() - t0) / iters

    px_per_s = H * W / dt
    baseline = 62.2e6  # 30 fps * 1920*1080 forward-only (reference README:14)
    print(
        json.dumps(
            {
                "metric": "fwd+bwd pixels/s per chip",
                "value": round(px_per_s, 1),
                "unit": "pixels/s",
                "vs_baseline": round(px_per_s / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
