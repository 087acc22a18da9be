"""On-device Pallas-vs-XLA parity check (dev tool).

The pytest suite runs the Pallas kernels in interpret mode on CPU; this
script compares the REAL Mosaic-compiled kernels against the XLA-scan
oracle on the attached TPU — the check that guards MXU-precision changes
(e.g. the exact-01 split scans). Prints max deltas for the forward images
and all parameter gradients; exits nonzero on tolerance breach.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tpu_splat.data import random_scene, orbit_camera
    from tpu_splat.raster import rasterize
    from tpu_splat.raster.config import RasterConfig

    H = W = 256
    n = 2500
    raw = random_scene(n, seed=0, sh_degree=3)
    cam = orbit_camera(H, W, radius=4.0, azimuth=0.4, elevation=0.3)
    bg = jnp.array([0.1, 0.2, 0.3])
    act = dict(
        means3d=jnp.asarray(raw["xyz"]),
        scales=jnp.exp(jnp.asarray(raw["scaling"])),
        rotations=jnp.asarray(raw["rotation"]),
        opacity=jax.nn.sigmoid(jnp.asarray(raw["opacity"][:, 0])),
        refl=jax.nn.sigmoid(jnp.asarray(raw["refl"][:, 0])),
        sh=jnp.asarray(raw["sh"]),
    )
    tgt = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (H, W, 3)).astype(np.float32)
    )

    def run(backend):
        # capacities must be far above the real instance/tile loads: the
        # XLA path truncates per-tile at tile_depth while the Pallas path
        # has no per-tile cap, so ANY truncation shows up as backend
        # divergence that is actually a config artifact
        cfg = RasterConfig(
            max_tiles_per_gaussian=64, max_instances=1 << 18, tile_depth=4096,
            chunk=32, backend=backend,
        )

        def loss(means3d, scales, rotations, opacity, refl, sh):
            out = rasterize(
                means3d, scales, rotations, opacity, refl, cam, bg, cfg,
                sh=sh, sh_degree=3,
            )
            l = (
                jnp.mean(jnp.abs(out.color - tgt))
                + 0.1 * jnp.mean(out.others[..., 2:5] ** 2)
                + 0.1 * jnp.mean(out.refl_map)
            )
            return l, (out.color, out.others, out.refl_map)

        diag = jax.jit(
            lambda m, s, r, o, rf, sh_: rasterize(
                m, s, r, o, rf, cam, bg, cfg, sh=sh_, sh_degree=3
            )
        )(
            act["means3d"], act["scales"], act["rotations"], act["opacity"],
            act["refl"], act["sh"],
        )
        print(
            f"[{backend}] instances {int(diag.num_instances)} / "
            f"{cfg.max_instances}  max_tile {int(jnp.max(diag.tile_counts))} "
            f"/ {cfg.tile_depth}  max_area {int(diag.max_area)} / "
            f"{cfg.max_tiles_per_gaussian}",
            flush=True,
        )

        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5),
                                       has_aux=True))
        (lv, (color, others, refl_map)), grads = f(
            act["means3d"], act["scales"], act["rotations"], act["opacity"],
            act["refl"], act["sh"],
        )
        host = lambda x: np.asarray(x)
        return (
            float(lv), host(color), host(others), host(refl_map),
            [host(g) for g in grads],
        )

    lp, cp, op, rp, gp = run("pallas")
    lx, cx, ox, rx, gx = run("xla")

    ok = True

    def chk(name, a, b, atol):
        nonlocal ok
        d = float(np.max(np.abs(a - b)))
        status = "ok" if d <= atol else "FAIL"
        if d > atol:
            ok = False
        print(f"{name:16s} max|d| {d:.3e} (atol {atol:g}) {status}", flush=True)

    chk("loss", np.float64(lp), np.float64(lx), 1e-5)
    chk("color", cp, cx, 5e-5)
    # allmap channels span very different magnitudes (depth ~ scene units,
    # alpha/mask ~ 1): compare per-channel relative to each channel's scale
    o_scale = np.abs(ox).reshape(-1, ox.shape[-1]).max(axis=0) + 1e-6
    chk("others(rel)", op / o_scale, ox / o_scale, 1e-3)
    chk("refl_map", rp, rx, 5e-5)
    names = ("d_means3d", "d_scales", "d_rot", "d_opacity", "d_refl", "d_sh")
    for nm, a, b in zip(names, gp, gx):
        scale = np.abs(b).max() + 1e-12
        chk(nm, a / scale, b / scale, 2e-3)

    print("PARITY " + ("PASS" if ok else "FAIL"), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
