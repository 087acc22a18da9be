"""Real-TPU correctness check: Pallas kernels vs XLA-scan oracle (dev tool).

Compares forward outputs and parameter gradients of the two rasterizer
backends ON THE ATTACHED DEVICE (Mosaic lowering, not interpret mode).
"""
from __future__ import annotations

import numpy as np


def main():
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from tpu_splat.data import random_scene, orbit_camera
    from tpu_splat.raster import rasterize
    from tpu_splat.raster.config import RasterConfig

    print(f"device: {jax.devices()[0]}", flush=True)
    H = W = 256
    n = 5000
    base = dict(max_tiles_per_gaussian=32, max_instances=1 << 17, tile_depth=1024, chunk=32)
    XLA = RasterConfig(**base)
    PAL = RasterConfig(**base, backend="pallas")

    raw = random_scene(n, seed=0)
    cam = orbit_camera(H, W, radius=4.0, azimuth=0.4, elevation=0.3)
    params = dict(
        means3d=jnp.asarray(raw["xyz"]),
        scales=jnp.exp(jnp.asarray(raw["scaling"])),
        rotations=jnp.asarray(raw["rotation"]),
        opacity=jax.nn.sigmoid(jnp.asarray(raw["opacity"][:, 0])),
        refl=jax.nn.sigmoid(jnp.asarray(raw["refl"][:, 0])),
    )
    sh = jnp.asarray(raw["sh"])
    bg = jnp.array([0.15, 0.25, 0.35])

    rng = np.random.default_rng(1)
    ct_img = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))
    ct_oth = jnp.asarray(rng.normal(size=(H, W, 8)).astype(np.float32))
    ct_refl = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))

    def fwd(p, cfg):
        return rasterize(
            p["means3d"], p["scales"], p["rotations"], p["opacity"],
            p["refl"], cam, bg, cfg, sh=sh, sh_degree=3,
        )

    def loss(p, cfg):
        o = fwd(p, cfg)
        # exclude MIDDEPTH (ch5): median selection flips at T~0.5 boundary
        # pixels between backends, re-routing its cotangent to a different
        # Gaussian — a legitimate subgradient choice, not an error.
        oth = o.others * ct_oth.at[..., 5].set(0.0)
        return (
            jnp.sum(o.color * ct_img)
            + jnp.sum(oth)
            + jnp.sum(o.refl_map * ct_refl)
        )

    ox = jax.jit(lambda p: fwd(p, XLA))(params)
    op = jax.jit(lambda p: fwd(p, PAL))(params)
    for name in ("color", "final_T", "refl_map", "gaussian_weights"):
        a, b = np.asarray(getattr(op, name)), np.asarray(getattr(ox, name))
        err = np.max(np.abs(a - b))
        rel = err / (np.max(np.abs(b)) + 1e-12)
        print(f"fwd {name:18s} max_abs {err:.3e} rel {rel:.3e}", flush=True)
        assert rel < 1e-3, name  # log-space vs sequential (1-a) products
    # others [H,W,8]: MIDDEPTH (ch5) may legitimately flip to a different
    # contributor at pixels where fp32 rounding moves the T>0.5 crossing;
    # bound the affected pixel count instead of the value there.
    a, b = np.asarray(op.others), np.asarray(ox.others)
    for c in range(8):
        d = np.abs(a[..., c] - b[..., c])
        n_bad = int((d > 1e-3).sum())
        print(f"fwd others ch{c}: max {d.max():.3e} n>1e-3 {n_bad}", flush=True)
        if c == 5:
            assert n_bad <= max(20, a.size // 8 // 1000), "middepth flips"
        else:
            rel_c = d.max() / (np.abs(b[..., c]).max() + 1e-12)
            assert d.max() < 1e-3 or rel_c < 1e-3, f"ch{c}"
    nc_neq = int(np.sum(np.asarray(op.n_contrib) != np.asarray(ox.n_contrib)))
    print(f"fwd n_contrib mismatches: {nc_neq}", flush=True)

    gx = jax.jit(jax.grad(lambda p: loss(p, XLA)))(params)
    gp = jax.jit(jax.grad(lambda p: loss(p, PAL)))(params)
    ok = True
    for k in params:
        a, b = np.asarray(gp[k]), np.asarray(gx[k])
        err = np.max(np.abs(a - b))
        scale = np.max(np.abs(b)) + 1e-12
        print(f"grad {k:10s} max_abs {err:.3e} rel {err/scale:.3e} "
              f"(scale {scale:.3e})", flush=True)
        ok &= err / scale < 5e-4
    print("PASS" if ok else "FAIL", flush=True)


if __name__ == "__main__":
    main()
