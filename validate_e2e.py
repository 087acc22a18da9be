"""End-to-end convergence validation (dev tool).

Fits the full training pipeline (deferred-reflection render, jitted train
step, scheduled events incl. densify/normal-prop/color-sabotage) to views
rendered from a known ground-truth scene, then reports train-view and
held-out-view PSNR. Passing bar: held-out PSNR >= 28 dB after ~3k steps.

Scaled-down schedule of the reference defaults (arguments/__init__.py:79-124)
so the whole run fits in minutes on one chip.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

SMOKE = os.environ.get("E2E_SMOKE", "") == "1"  # tiny CPU smoke run
EXACT = os.environ.get("E2E_EXACT", "") == "1"  # A/B: f32 full-grad, rect binning
VALID_OUT = os.environ.get("VALID_OUT", "")  # write a JSON artifact here


def main():
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from tpu_splat.config import OptimizationParams
    from tpu_splat.data.synthetic import random_scene, orbit_camera
    from tpu_splat.envmap.cubemap import init_cubemap
    from tpu_splat.model import init_from_pcd
    from tpu_splat.model.state import GaussianState
    from tpu_splat.core.sh import num_sh_coeffs
    from tpu_splat.raster.config import RasterConfig
    from tpu_splat.renderer import render
    from tpu_splat.train.step import TrainState, make_train_step
    from tpu_splat.train.loop import run_scheduled_events, EventLog

    H = W = 64 if SMOKE else 256
    n_gt = 200 if SMOKE else 3000
    # non-smoke: the PRODUCTION training config (scripts/train.py defaults):
    # train-shaped grads, bf16 grad regroup, per-column tight culling — this
    # run is the quality certification for those switches
    cfg = RasterConfig(
        max_tiles_per_gaussian=16 if SMOKE else 64,
        max_instances=1 << (14 if SMOKE else 19),
        tile_depth=256 if SMOKE else 1024,
        chunk=16 if SMOKE else 32, backend="pallas",
        grad_channels="full" if EXACT else "train",
        bf16_grads=not SMOKE and not EXACT,
        bf16_feats=not SMOKE and not EXACT,
        tight_culling=not SMOKE and not EXACT,
    )

    # --- ground-truth scene: opaque cloud, some reflective, structured env
    sc = random_scene(n_gt, seed=3, sh_degree=3, extent=1.0,
                      scale_range=(0.02, 0.12))
    rng = np.random.default_rng(5)
    refl_raw = np.where(
        rng.uniform(size=(n_gt, 1)) < 0.3,
        rng.uniform(0.5, 2.0, (n_gt, 1)),   # sigmoid ~ 0.62..0.88
        rng.uniform(-6.0, -3.0, (n_gt, 1)),
    ).astype(np.float32)
    m = num_sh_coeffs(3)
    env = init_cubemap(jax.random.PRNGKey(7), 3, 32)
    # structured env: smooth low-freq pattern, pre-activation scale +-2
    tex = np.array(env.texture)  # writable copy
    L = tex.shape[-1]
    u = np.linspace(-1, 1, L)
    uu, vv = np.meshgrid(u, u, indexing="ij")
    for f in range(6):
        tex[f, 0] = 2.0 * np.sin(3 * uu + f)
        tex[f, 1] = 2.0 * np.cos(2 * vv - f)
        tex[f, 2] = 1.5 * np.sin(2 * uu * vv + 0.5 * f)
    env = env._replace(texture=jnp.asarray(tex))

    gt_state = GaussianState(
        xyz=jnp.asarray(sc["xyz"]),
        features_dc=jnp.asarray(sc["sh"][:, :1]),
        features_rest=jnp.asarray(sc["sh"][:, 1:]),
        scaling=jnp.asarray(sc["scaling"]),
        rotation=jnp.asarray(sc["rotation"]),
        opacity=jnp.asarray(np.full((n_gt, 1), 3.0, np.float32)),
        refl=jnp.asarray(refl_raw),
        env=env,
        alive=jnp.ones(n_gt, bool),
        active_sh_degree=jnp.asarray(3, np.int32),
        max_sh_degree=3,
    )

    n_views, n_test = 28, 4
    cams = [
        orbit_camera(H, W, radius=3.5, azimuth=2 * np.pi * i / (n_views + n_test),
                     elevation=0.35 * np.sin(2.2 * i) + 0.15)
        for i in range(n_views + n_test)
    ]
    bg = jnp.zeros(3)

    @jax.jit
    def gt_render(camera):
        return render(gt_state, camera, cfg, bg, initial_stage=False).render

    print("rendering GT views...", flush=True)
    gts = [np.asarray(gt_render(c)) for c in cams]
    print(f"GT mean intensity {np.mean(gts):.3f}", flush=True)

    # --- train from a perturbed pointcloud
    opt = OptimizationParams()
    opt.iterations = 40 if SMOKE else 3000
    opt.init_until_iter = 5 if SMOKE else 100
    opt.densify_from_iter = 10 if SMOKE else 300
    opt.densify_until_iter = 30 if SMOKE else 1800
    opt.densification_interval = 5 if SMOKE else opt.densification_interval
    opt.densification_interval_when_prop = (
        5 if SMOKE else opt.densification_interval_when_prop
    )
    opt.opacity_reset_interval = 25 if SMOKE else 900
    opt.normal_prop_until_iter = 30 if SMOKE else 1800
    opt.color_sabotage_until_iter = 30 if SMOKE else 1800
    opt.normal_prop_interval = 10 if SMOKE else 500
    opt.color_sabotage_interval = 10 if SMOKE else 500
    opt.feature_rest_from_iter = 15 if SMOKE else 600
    opt.position_lr_max_steps = opt.iterations

    pts = sc["xyz"] + rng.normal(0, 0.03, sc["xyz"].shape).astype(np.float32)
    cols = rng.uniform(0, 1, (n_gt, 3)).astype(np.float32)
    state = init_from_pcd(
        pts, cols, capacity=1 << (9 if SMOKE else 14), cubemap_resolution=32,
        max_sh_degree=3, init_refl_value=opt.refl_init_value,
    )
    ts = TrainState.create(state, opt)
    step_fn = jax.jit(make_train_step(opt, cfg, spatial_lr_scale=3.5))

    log = EventLog()
    t0 = time.time()
    order = rng.permutation(n_views)
    curve = []  # (iteration, train-batch psnr) samples for the artifact
    for it in range(1, opt.iterations + 1):
        if (it - 1) % n_views == 0:
            order = rng.permutation(n_views)
        vi = int(order[(it - 1) % n_views])
        ts, aux = step_fn(ts, cams[vi], jnp.asarray(gts[vi]), bg)
        ts = run_scheduled_events(ts, it, opt, cameras_extent=2.2,
                                  cameras_mean=np.zeros(3), log=log)
        if it % 250 == 0 or it == 1:
            curve.append((it, round(float(aux.psnr), 3)))
            print(
                f"it {it:5d} loss {float(aux.loss):.4f} psnr {float(aux.psnr):5.2f} "
                f"alive {int(aux.n_alive)} inst {int(aux.num_instances)} "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )
    print(f"events: densified {log.densified} pruned {log.pruned} "
          f"overflow {log.overflowed} n_events {len(log.events)}", flush=True)

    @jax.jit
    def eval_render(g, camera):
        return render(g, camera, cfg, bg, initial_stage=False).render

    def psnr(a, b):
        return -10 * np.log10(np.mean((np.asarray(a) - b) ** 2))

    tr = [psnr(eval_render(ts.gaussians, cams[i]), gts[i]) for i in range(0, n_views, 7)]
    te = [psnr(eval_render(ts.gaussians, cams[i]), gts[i])
          for i in range(n_views, n_views + n_test)]
    print(f"train-view PSNR {np.mean(tr):.2f}  held-out PSNR {np.mean(te):.2f}",
          flush=True)
    verdict = "PASS" if np.mean(te) >= 28.0 else "BELOW-BAR"
    print(verdict, flush=True)
    if VALID_OUT:
        import jax as _jax

        artifact = {
            "backend": _jax.devices()[0].platform,
            "device": str(_jax.devices()[0]),
            "raster_backend": "pallas",
            "config": {
                "H": H, "W": W, "n_gt": n_gt, "iterations": opt.iterations,
                "sh_degree": 3, "densify": True, "normal_prop": True,
                "color_sabotage": True, "max_instances": cfg.max_instances,
                "grad_channels": cfg.grad_channels,
                "bf16_grads": cfg.bf16_grads,
                "bf16_feats": cfg.bf16_feats,
                "tight_culling": cfg.tight_culling,
            },
            "psnr_curve": curve,
            "train_view_psnr": round(float(np.mean(tr)), 3),
            "held_out_psnr": round(float(np.mean(te)), 3),
            "held_out_per_view": [round(float(x), 3) for x in te],
            "bar": 28.0,
            "verdict": verdict,
            "events": {
                "densified": log.densified, "pruned": log.pruned,
                "overflowed": log.overflowed, "n_events": len(log.events),
            },
            "wall_seconds": round(time.time() - t0, 1),
            "note": (
                "Synthetic known-GT scene (no real datasets exist in this "
                "zero-egress image, so no reference-trained PLY A/B is "
                "possible); full pipeline incl. densify/normal-prop/"
                "color-sabotage on the default Pallas backend."
            ),
        }
        with open(VALID_OUT, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {VALID_OUT}", flush=True)


if __name__ == "__main__":
    main()
