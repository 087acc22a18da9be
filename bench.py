"""Benchmark: fwd+bwd rasterization throughput on the attached device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric: pixels/s per chip for a full differentiable train-style
forward+backward (deferred-reflection render + L1 loss + grads) at 1080p on
a trained-scene-like load: 1M Gaussians with realistic screen footprints
(a few tiles each), ~3M tile instances — the regime of SURVEY config 5
(truck @1080p, ~3M Gaussians).

Baseline normalization: the reference's headline claim is >= 30 fps @1080p
forward-only rendering (README.md:14) ~ 62.2M px/s; vs_baseline = ours / that
(with backward included, so 1.0 means "fwd+bwd as fast as their fwd").
"""
from __future__ import annotations

import json
import time

import numpy as np


def build_state(n, capacity, seed=0, scale_mu=-4.8, scale_sigma=0.5, cubemap=64):
    """Random trained-scene-like Gaussian cloud (no O(N^2) knn init)."""
    import jax
    import jax.numpy as jnp
    from tpu_splat.model.state import GaussianState
    from tpu_splat.core.sh import rgb_to_sh, num_sh_coeffs
    from tpu_splat.envmap.cubemap import init_cubemap

    rng = np.random.default_rng(seed)
    m = num_sh_coeffs(3)

    def pad(a, fill=0.0):
        out = np.full((capacity,) + a.shape[1:], fill, dtype=np.float32)
        out[:n] = a
        return jnp.asarray(out)

    xyz = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    scaling = (scale_mu + scale_sigma * rng.normal(size=(n, 2))).astype(np.float32)
    # trained scenes have SURFACE-ALIGNED surfels: orientations vary smoothly
    # with position (plus jitter), so the blended normal map — and hence the
    # reflection directions feeding the env sampler — is spatially coherent.
    # i.i.d. random quaternions would make every env lookup cache-hostile, a
    # regime no converged scene exhibits.
    rot = (
        np.stack(
            [
                np.ones(n),
                0.4 * np.sin(1.3 * xyz[:, 0]),
                0.4 * np.cos(1.1 * xyz[:, 1]),
                0.4 * np.sin(0.9 * xyz[:, 2]),
            ],
            axis=1,
        )
        + 0.05 * rng.normal(size=(n, 4))
    ).astype(np.float32)
    sh = np.zeros((n, m, 3), np.float32)
    sh[:, 0] = rgb_to_sh(rng.uniform(0, 1, (n, 3)))
    alive = np.zeros(capacity, bool)
    alive[:n] = True
    return GaussianState(
        xyz=pad(xyz),
        features_dc=pad(sh[:, :1]),
        features_rest=pad(sh[:, 1:]),
        scaling=pad(scaling, fill=-10.0),
        rotation=pad(rot).at[n:, 0].set(1.0),
        opacity=pad(rng.uniform(-1, 2, (n, 1)).astype(np.float32), fill=-10.0),
        refl=pad(np.full((n, 1), -2.2, np.float32), fill=-10.0),
        env=init_cubemap(jax.random.PRNGKey(0), 3, cubemap),
        alive=jnp.asarray(alive),
        active_sh_degree=jnp.asarray(3, np.int32),
        max_sh_degree=3,
    )


def build_state_from_checkpoint(path, target_n, capacity):
    """Trained-distribution bench load: tile a trained PLY snapshot (e.g.
    the VALID_r04 scratch end state via validate_e2e --save_state) out to
    ~target_n Gaussians by replicating the scene on a jittered grid of
    rigid offsets. Screen-footprint / opacity / orientation statistics stay
    those of an ACTUAL trained model rather than a synthetic cloud."""
    import jax.numpy as jnp
    import numpy as np
    from tpu_splat.model.io import load_ply

    base = load_ply(path)
    alive = np.asarray(base.alive)
    n0 = int(alive.sum())
    reps = max(1, int(np.ceil(target_n / n0)))
    rng = np.random.default_rng(0)
    xyz0 = np.asarray(base.xyz)[alive]
    center = xyz0.mean(axis=0)
    extent = (xyz0.max(axis=0) - xyz0.min(axis=0)).max()
    side = int(np.ceil(reps ** (1 / 3)))
    cells = np.stack(
        np.meshgrid(*[np.arange(side)] * 3, indexing="ij"), -1
    ).reshape(-1, 3)[:reps]
    # overlap the copies (0.55 spacing) so per-pixel contributor depth
    # resembles one dense scene, not isolated islands
    offs = (cells - cells.mean(0)) * extent * 0.55
    offs += 0.07 * extent * rng.normal(size=offs.shape)

    def tile(a):
        return np.concatenate([np.asarray(a)[alive]] * reps)[:target_n]

    xyz = np.concatenate([xyz0 - center + o for o in offs])[:target_n]
    # rescale the whole arrangement into the bench camera's view box
    span = np.abs(xyz).max()
    scale = 2.4 / max(span, 1e-6)
    xyz = xyz * scale
    scaling = tile(base.scaling) + np.log(scale)
    n = xyz.shape[0]

    def pad(a, fill=0.0):
        out = np.full((capacity,) + a.shape[1:], fill, dtype=np.float32)
        out[:n] = a
        return jnp.asarray(out)

    alive_out = np.zeros(capacity, bool)
    alive_out[:n] = True
    return base.replace(
        xyz=pad(xyz),
        features_dc=pad(tile(base.features_dc)),
        features_rest=pad(tile(base.features_rest)),
        scaling=pad(scaling, fill=-10.0),
        rotation=pad(tile(base.rotation)).at[n:, 0].set(1.0),
        opacity=pad(tile(base.opacity), fill=-10.0),
        refl=pad(tile(base.refl), fill=-10.0),
        alive=jnp.asarray(alive_out),
    ), n


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--checkpoint", default="",
        help="trained PLY snapshot; bench on its tiled distribution "
        "instead of the synthetic cloud",
    )
    ap.add_argument(
        "--forward_only", action="store_true",
        help="benchmark the inference path (render_fast, no gradients, no "
        "densify stats) — the number directly comparable to the "
        "reference's >=30fps@1080p forward-only headline (README.md:14, "
        "eval_fps.py:47-58)",
    )
    cli = ap.parse_args()

    import tpu_splat

    tpu_splat.setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from tpu_splat.data import orbit_camera
    from tpu_splat.raster.config import production_config
    from tpu_splat.renderer import render

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        H, W, n, capacity = 1088, 1920, 1_000_000, 1 << 20
        # the SHIPPED switch set (one config story: scripts/train.py
        # defaults == this == validate_e2e's certified config); only the
        # workload capacities are bench-sized here
        cfg = production_config(
            max_tiles_per_gaussian=32,
            # the bench cloud emits 3,933,185 instances at this view — the
            # capacity covers them all (1.2% headroom; no silent truncation)
            max_instances=3_981_312,
            tile_depth=2048,
            chunk=32,
            backend="pallas",
        )
        iters = 10
    else:  # CPU smoke config
        H, W, n, capacity = 128, 128, 2000, 2048
        cfg = production_config(
            max_tiles_per_gaussian=16, max_instances=1 << 15, tile_depth=256,
            chunk=16, bf16_grads=False, bf16_feats=False,
            grad_channels="full",
        )
        iters = 2

    load = "synthetic"
    n_real = n
    if cli.checkpoint:
        state, n_real = build_state_from_checkpoint(cli.checkpoint, n, capacity)
        load = "trained"
    else:
        state = build_state(n, capacity)
    cam = orbit_camera(H, W, radius=6.0, azimuth=0.4, elevation=0.3)
    if cli.checkpoint and on_tpu:
        # the trained distribution's instance count differs from the
        # synthetic cloud's — probe it and size the capacity to cover it
        # (an undersized cap would silently truncate instances and inflate
        # the number)
        import dataclasses

        from tpu_splat.raster.binning import bin_gaussians
        from tpu_splat.raster.preprocess import preprocess

        probe_cfg = dataclasses.replace(cfg, max_instances=8_368_128)

        @jax.jit
        def probe(xyz, scales, rot, opa):
            p = preprocess(
                xyz, scales, rot, cam.world_view, cam.full_proj,
                cam.camera_center, H, W,
                colors=jnp.zeros((xyz.shape[0], 3)),
                # size the cap for the SAME rect the render will emit
                # (opacity-aware when the production config says so)
                opacity=opa if cfg.opacity_rect else None,
            )
            p = p._replace(
                valid=p.valid & state.alive,
                tiles_touched=jnp.where(
                    p.valid & state.alive, p.tiles_touched, 0
                ),
            )
            return bin_gaussians(p, H, W, probe_cfg, aligned=True).num_instances

        n_inst = int(
            probe(
                state.xyz, state.get_scaling(), state.rotation,
                state.get_opacity(),
            )
        )
        cap_i = min(((int(n_inst * 1.03) + 4095) // 4096) * 4096, 8_368_128)
        assert n_inst <= cap_i, (n_inst, cap_i)
        cfg = dataclasses.replace(cfg, max_instances=cap_i)
        print(f"# trained load: {n_inst} instances, cap {cap_i}",
              flush=True)
    bg = jnp.zeros(3)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    if cli.forward_only:
        from tpu_splat.renderer import render_fast

        def loss_fn(params):
            # inference: full deferred-reflection frame (base + env
            # composite), no gradients — the sum makes the frame live
            s = state.with_params(params)
            out = render_fast(
                s, cam, cfg, bg, initial_stage=False, collect_weights=False
            )
            return jnp.sum(out.render) * 1e-20

        def chained(k):
            @jax.jit
            def run(params):
                def body(i, acc):
                    p = jax.tree.map(
                        lambda a: a + (acc * 1e-30).astype(a.dtype)
                        if jnp.issubdtype(a.dtype, jnp.floating) else a,
                        params,
                    )
                    return acc + loss_fn(p)

                return jax.lax.fori_loop(0, k, body, jnp.float32(0))

            return run

        params = state.param_pytree()
        run1, runk = chained(1), chained(iters + 1)
        float(run1(params))
        float(runk(params))
        t0 = time.perf_counter()
        float(run1(params))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(runk(params))
        tk = time.perf_counter() - t0
        dt = max(tk - t1, 1e-9) / iters
        px_per_s = H * W / dt
        baseline = 62.2e6
        from tpu_splat.raster.config import production_switches

        print(
            json.dumps(
                {
                    "metric": "forward-only pixels/s per chip",
                    "value": round(px_per_s, 1),
                    "unit": "pixels/s",
                    "vs_baseline": round(px_per_s / baseline, 4),
                    "fps_1080p": round(px_per_s / (1920 * 1080), 2),
                    "load": load,
                    "n_gaussians": n_real,
                    "note": "render_fast deferred-reflection frame "
                    "(collect_weights=False); baseline = the reference's "
                    "30fps@1080p forward claim, so vs_baseline is "
                    "like-for-like here",
                    "config": production_switches(cfg),
                }
            )
        )
        return

    def loss_fn(params):
        s = state.with_params(params)
        out = render(s, cam, cfg, bg, initial_stage=False)
        return jnp.mean(jnp.abs(out.render - gt))

    # Device-side chaining: the axon tunnel has large per-dispatch overhead
    # and a non-blocking block_until_ready, so K steps run inside ONE jit
    # (grads fed back into params so nothing is dead code) and a single
    # host read syncs; t(K) - t(1) isolates true device time per step.
    def chained(k):
        @jax.jit
        def run(params):
            def body(_, p):
                l, g = jax.value_and_grad(loss_fn)(p)
                return jax.tree.map(lambda a, b: a - 1e-20 * b, p, g)
            out = jax.lax.fori_loop(0, k, body, params)
            return jax.tree.reduce(
                lambda acc, x: acc + jnp.sum(x) * 1e-20, out, jnp.float32(0)
            )
        return run

    params = state.param_pytree()
    run1, runk = chained(1), chained(iters + 1)
    float(run1(params))  # compile + warmup
    float(runk(params))
    t0 = time.perf_counter()
    v1 = float(run1(params))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    vk = float(runk(params))
    tk = time.perf_counter() - t0
    dt = max(tk - t1, 1e-9) / iters

    px_per_s = H * W / dt
    baseline = 62.2e6  # 30 fps * 1920*1080 forward-only (reference README:14)
    from tpu_splat.raster.config import production_switches

    print(
        json.dumps(
            {
                "metric": "fwd+bwd pixels/s per chip",
                "value": round(px_per_s, 1),
                "unit": "pixels/s",
                "vs_baseline": round(px_per_s / baseline, 4),
                # extra context keys (the driver reads the four above):
                "load": load,  # synthetic cloud vs trained-checkpoint tiling
                "n_gaussians": n_real,
                "config": production_switches(cfg),
            }
        )
    )


if __name__ == "__main__":
    main()
