"""8-way virtual-mesh scaling table (VERDICT r2 item 4).

Runs the REAL jitted train step (tile-sharded and camera-DP modes) over
1/2/4/8-device meshes on the CPU backend with
--xla_force_host_platform_device_count=8 and records, per mesh size:

  - per-device compiled FLOPs from XLA cost analysis — under SPMD the
    compiled module IS the per-device program, so this measures exactly how
    much of the step's work shards (the blend sweep) vs replicates
    (binning/sort/pack, per PARITY 2.16 status);
  - wall-clock per step (chained fori_loop) — NOISY on this host: the 8
    virtual devices share 2 physical cores, so wall-clock CANNOT show
    speedup here; it is recorded only to confirm nothing explodes. Real
    scaling must be measured on a pod slice (the dryrun certifies the same
    sharded program compiles + runs).

Writes SCALING.md at the repo root.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_table.py
"""
from __future__ import annotations

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# jax may be pre-imported at interpreter startup on this host; env vars alone
# don't stick then — force the config before any backend initialization
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_splat.config import OptimizationParams
    from tpu_splat.data import orbit_camera, random_scene
    from tpu_splat.dist import make_mesh
    from tpu_splat.model import init_from_pcd
    from tpu_splat.raster.config import RasterConfig
    from tpu_splat.train.step import TrainState, make_train_step, make_train_step_dp

    assert jax.device_count() >= 8, f"need 8 virtual devices, got {jax.device_count()}"

    H = W = 192
    n = 12000
    cfg = RasterConfig(
        max_tiles_per_gaussian=16, max_instances=1 << 17, tile_depth=1024,
        chunk=16, backend="pallas",
    )
    rng = np.random.default_rng(0)
    sc = random_scene(n, seed=1, sh_degree=3)
    state = init_from_pcd(
        np.asarray(sc["xyz"]), rng.uniform(0, 1, (n, 3)).astype(np.float32),
        capacity=1 << 14, cubemap_resolution=16, max_sh_degree=3,
    )
    opt_cfg = OptimizationParams()
    ts = TrainState.create(state, opt_cfg)
    bg = jnp.zeros(3)
    cams = [
        orbit_camera(H, W, radius=4.0, azimuth=0.3 * i, elevation=0.25)
        for i in range(8)
    ]
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    def chained_time(step_fn, args, iters=4):
        @jax.jit
        def run(ts_, k_args):
            def body(_, t):
                t2, _aux = step_fn(t, *k_args)
                return t2

            out = jax.lax.fori_loop(0, iters, body, ts_)
            return jax.tree.reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)) * 1e-20,
                out.gaussians.xyz, jnp.float32(0),
            )

        float(run(ts, args))  # compile + warm
        t0 = time.perf_counter()
        float(run(ts, args))
        return (time.perf_counter() - t0) / iters

    rows = []
    for mode in ("tiles", "dp"):
        for ndev in (1, 2, 4, 8):
            if mode == "tiles":
                mesh = make_mesh(ndev, axis="tiles")
                fn = make_train_step(
                    opt_cfg, cfg, spatial_lr_scale=2.0, mesh=mesh
                )
                args = (cams[0], gt, bg)
            else:
                mesh = make_mesh(ndev, axis="dp")
                fn = make_train_step_dp(
                    opt_cfg, cfg, spatial_lr_scale=2.0, mesh=mesh
                )
                cam_b = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *cams[:ndev]
                )
                args = (cam_b, jnp.stack([gt] * ndev), bg)

            lowered = jax.jit(fn).lower(ts, *args)
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            flops = float(ca.get("flops", float("nan")))
            nbytes = float(ca.get("bytes accessed", float("nan")))
            # wall-clock is meaningless on 8 virtual devices over 2 cores
            # and interpret-mode pallas takes minutes per step at this
            # scale; opt in with SCALING_WALL=1
            dt = (
                chained_time(fn, args)
                if os.environ.get("SCALING_WALL") == "1"
                else float("nan")
            )
            rows.append((mode, ndev, flops, nbytes, dt))
            print(
                f"{mode:5s} x{ndev}: per-device GFLOP {flops/1e9:8.3f}  "
                f"wall {dt*1000:8.1f} ms/step", flush=True,
            )

    base = {
        m: next((r[2], r[3]) for r in rows if r[0] == m and r[1] == 1)
        for m in ("tiles", "dp")
    }
    lines = [
        "# SCALING v2 — 8-way virtual-mesh table (CPU, "
        "`--xla_force_host_platform_device_count=8`)",
        "",
        "Per-device compiled FLOPs and bytes-accessed of the REAL jitted "
        "train step (`make_train_step(mesh=...)` / `make_train_step_dp`) as "
        "the mesh grows — under SPMD the compiled module IS the per-device "
        "program. "
        f"Scene: {n} Gaussians, {H}x{W}, instance cap {1 << 17}. "
        "Wall-clock is recorded for sanity only: the 8 virtual devices "
        "share 2 physical cores here, so wall speedup is not measurable on "
        "this host; chip-level scaling must come from a pod slice (the "
        "driver's `dryrun_multichip` certifies the same program).",
        "",
        "| mode | devices | per-device GFLOP | vs 1-dev | per-device GB | vs 1-dev | wall ms/step |",
        "|------|---------|------------------|----------|---------------|----------|--------------|",
    ]
    for mode, ndev, flops, nbytes, dt in rows:
        lines.append(
            f"| {mode} | {ndev} | {flops/1e9:.3f} | "
            f"{flops/base[mode][0]:.3f}x | {nbytes/1e9:.3f} | "
            f"{nbytes/base[mode][1]:.3f}x | {dt*1000:.1f} |"
        )
    lines += [
        "",
        "## What shards, what replicates (round 4: fully-sharded binning)",
        "",
        "Since round 4 the ENTIRE instance stream runs per-chip inside one "
        "shard_map (`raster/sharded.py`): each chip clips Gaussian rects to "
        "its slab of tile rows, expands/sorts/packs only its own instances "
        "at a per-chip capacity of max_instances/N, runs the Pallas blend "
        "kernel pair on its tiles, and regroups its own instance gradients; "
        "ONE psum of the [P, F] per-Gaussian gradient table is the only "
        "collective. The deferred-reflection env pass (reflect + cubemap "
        "sample + texel-grad accumulation) also shards, over pixel rows, "
        "with a psum of the small texel-gradient table.",
        "",
        "Replicated by design (SURVEY 2.16: Gaussians replicated): O(P) "
        "model-scale work — preprocess (~2 ms at 1M Gaussians on a v5e), "
        "the depth argsort, per-Gaussian un-rank gathers, the optimizer "
        "update, and the O(pixels) loss tail. Everything O(instances) — "
        "the dominant cost at production scale (binning ~52 ms, pack "
        "~29 ms, blend ~133 ms, regroup ~55 ms vs ~2 ms preprocess at "
        "1080p/1M/4M instances) — is 1/N per chip.",
        "",
        "METRIC CAVEAT: XLA cost analysis on this CPU backend assigns ZERO "
        "flops to the ops that dominate the sharded work on TPU (lax.sort, "
        "gathers, and Pallas custom calls), so the FLOPs column "
        "under-credits sharding; bytes-accessed is the more faithful proxy "
        "for the instance stream, and the per-chip instance CAPACITY "
        "(max_instances/N, enforced by raster/sharded.py) is exact by "
        "construction. `dp` keeps per-device work ~constant while stepping "
        "N cameras at once (N x throughput at fixed per-chip work).",
        "",
        "Generated by tools/scaling_table.py.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
