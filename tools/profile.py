"""Parametrized pipeline profiler (consolidates the former root-level
profile_*.py scratch scripts into one entry point).

    python tools/profile.py [section ...]

Sections (default: stages):
  full      — whole train-style render fwd+bwd / fwd at bench scale
  stages    — per-stage device times: preprocess, binning+sort,
              pack_features, tile_blend fwd, tile_blend bwd, rasterize fwd
  binning   — binning sub-stages (argsort, emit/expand, sorts, ranges,
              aligned re-pack)
  regroup   — the backward gather-transpose (sort-regroup + segment sum)
  env       — cubemap sampling fwd / fwd+bwd on smooth + random directions
  render    — full step vs initial-stage (no env) vs env-only split

All timings use the device-chaining trick (t(K)−t(1) on a fori_loop-chained
jit) because the axon tunnel's block_until_ready does not synchronize; see
bench.py. Scales: 1080p / 1M Gaussians / bench instance capacity on TPU,
tiny shapes on CPU.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, iters=6, name=""):
    """Per-step device time via t(K)-t(1) on a chained fori_loop.

    The accumulator perturbs the FIRST float input each iteration (at 1e-30,
    numerically invisible) so the body is loop-VARIANT — without this XLA
    hoists pure stages out of the loop (LICM) and reports ~0 ms."""
    import jax
    import jax.numpy as jnp

    def chained(k):
        @jax.jit
        def run(*a):
            def perturb(x, eps):
                def f(l):
                    if jnp.issubdtype(l.dtype, jnp.floating):
                        return l + eps.astype(l.dtype)
                    if jnp.issubdtype(l.dtype, jnp.integer):
                        return l + eps.astype(l.dtype)
                    return l

                return jax.tree.map(f, x)

            def body(i, acc):
                a2 = (perturb(a[0], acc * 1e-30),) + a[1:]
                out = fn(*a2)
                leaves = jax.tree.leaves(out)
                s = sum(jnp.sum(l.astype(jnp.float32)) * 1e-20 for l in leaves)
                return acc + s

            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        return run

    run1, runk = chained(1), chained(iters + 1)
    float(run1(*args))
    float(runk(*args))
    t0 = time.perf_counter(); float(run1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(runk(*args)); tk = time.perf_counter() - t0
    dt = max(tk - t1, 1e-9) / iters
    print(f"{name:36s} {dt*1000:9.2f} ms", flush=True)
    return dt


def _bench_setup():
    import jax
    import jax.numpy as jnp
    from bench import build_state
    from tpu_splat.data import orbit_camera
    from tpu_splat.raster.config import RasterConfig

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        from tpu_splat.raster.config import production_config

        H, W, n, capacity = 1088, 1920, 1_000_000, 1 << 20
        cfg = production_config(
            max_tiles_per_gaussian=32, max_instances=3_981_312,  # = bench.py
            tile_depth=2048, chunk=32, backend="pallas",
        )
    else:
        H, W, n, capacity = 256, 256, 20000, 1 << 15
        cfg = RasterConfig(
            max_tiles_per_gaussian=16, max_instances=1 << 16,
            tile_depth=256, chunk=16, backend="pallas",
        )
    state = build_state(n, capacity)
    cam = orbit_camera(H, W, radius=6.0, azimuth=0.4, elevation=0.3)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    return H, W, cfg, state, cam, gt


def section_full():
    import jax
    import jax.numpy as jnp
    from tpu_splat.renderer import render

    H, W, cfg, state, cam, gt = _bench_setup()
    bg = jnp.zeros(3)

    def full_fwd(params):
        s = state.with_params(params)
        out = render(s, cam, cfg, bg, initial_stage=False)
        return jnp.mean(jnp.abs(out.render - gt))

    params = state.param_pytree()

    def full_fwdbwd(params):
        return jax.value_and_grad(full_fwd)(params)

    timed(full_fwdbwd, (params,), name="render fwd+bwd (full)")
    timed(full_fwd, (params,), name="render fwd (full)")


def section_stages():
    import jax
    import jax.numpy as jnp
    from tpu_splat.raster.preprocess import preprocess
    from tpu_splat.raster.binning import bin_gaussians
    from tpu_splat.raster import rasterize
    from tpu_splat.kernels.tile_blend import (
        pack_features, tile_blend_forward, tile_blend_backward,
    )
    from tpu_splat.raster.config import tile_grid, TILE

    H, W, cfg, state, cam, _gt = _bench_setup()
    bg = jnp.zeros(3)
    opacity = jax.nn.sigmoid(state.opacity[:, 0])
    refl = jax.nn.sigmoid(state.refl[:, 0])
    scales = jnp.exp(state.scaling)
    sh = jnp.concatenate([state.features_dc, state.features_rest], axis=1)
    capacity = state.capacity

    # NOTE: every stage fn takes its big arrays as ARGUMENTS — a closed-over
    # jax.Array is embedded as an MLIR constant (host fetch of the whole
    # buffer), which stalls and can kill the axon tunnel at these sizes.
    def stage_prep(xyz, scales, rot, sh):
        return preprocess(
            xyz, scales, rot, cam.world_view, cam.full_proj, cam.camera_center,
            H, W, sh=sh, sh_degree=3,
        )

    prep = jax.jit(stage_prep)(state.xyz, scales, state.rotation, sh)
    timed(stage_prep, (state.xyz, scales, state.rotation, sh), name="preprocess")

    def stage_bin(prep):
        return bin_gaussians(prep, H, W, cfg, aligned=True)

    binned = jax.jit(stage_bin)(prep)
    timed(stage_bin, (prep,), name="binning+sort")

    scope = jnp.ones((capacity,), bool)

    def stage_pack(prep, binned, opacity, refl, scope):
        return pack_features(
            binned.aligned_gid, binned.aligned_valid, prep.hom, prep.xy,
            opacity, prep.normal_view, prep.color, refl, scope,
        )

    feats = jax.jit(stage_pack)(prep, binned, opacity, refl, scope)
    timed(stage_pack, (prep, binned, opacity, refl, scope),
          name="pack_features")

    def stage_pack16(prep, binned, opacity, refl, scope):
        return pack_features(
            binned.aligned_gid, binned.aligned_valid, prep.hom, prep.xy,
            opacity, prep.normal_view, prep.color, refl, scope,
            group_key=binned.aligned_rank, rank_of=binned.rank_of,
            seg_start=binned.seg_start, seg_end=binned.seg_end,
            bf16_grads=True, bf16_feats=True,
        )

    jax.jit(stage_pack16)(prep, binned, opacity, refl, scope)
    timed(stage_pack16, (prep, binned, opacity, refl, scope),
          name="pack_features (bf16 16-row)")

    ty, tx = tile_grid(H, W)
    t_ids = jnp.arange(ty * tx, dtype=jnp.int32)
    org_x = (t_ids % tx) * TILE
    org_y = (t_ids // tx) * TILE
    al = binned.aligned_starts
    counts = binned.tile_counts

    def stage_blend(feats, al, counts):
        return tile_blend_forward(feats, al, counts, org_x, org_y)

    out_px, _ = jax.jit(stage_blend)(feats, al, counts)
    timed(stage_blend, (feats, al, counts), name="tile_blend fwd (full)")

    def stage_blend_ts(feats, al, counts):
        return tile_blend_forward(
            feats, al, counts, org_x, org_y, train_shape=True
        )

    jax.jit(stage_blend_ts)(feats, al, counts)
    timed(stage_blend_ts, (feats, al, counts),
          name="tile_blend fwd (train-shape)")

    ct = jax.tree.map(jnp.ones_like, out_px)

    def stage_bwd(feats, out_px, ct, al, counts):
        return tile_blend_backward(feats, al, counts, org_x, org_y, out_px, ct)

    jax.jit(stage_bwd)(feats, out_px, ct, al, counts)
    timed(stage_bwd, (feats, out_px, ct, al, counts),
          name="tile_blend bwd (full)")

    def stage_bwd_ts(feats, out_px, ct, al, counts):
        return tile_blend_backward(
            feats, al, counts, org_x, org_y, out_px, ct, full_grads=False
        )

    jax.jit(stage_bwd_ts)(feats, out_px, ct, al, counts)
    timed(stage_bwd_ts, (feats, out_px, ct, al, counts),
          name="tile_blend bwd (train-shape)")

    from tpu_splat.raster.blend import blend_pallas

    def stage_blend_pallas(prep, binned, opacity, refl, scope):
        return blend_pallas(
            binned, prep.hom, prep.xy, opacity, prep.normal_view, prep.color,
            refl, scope, bg, H, W, full_grads=False,
        )

    jax.jit(stage_blend_pallas)(prep, binned, opacity, refl, scope)
    timed(stage_blend_pallas, (prep, binned, opacity, refl, scope),
          name="blend_pallas whole (pack+kern+gw)")

    def stage_raster_fwd(xyz, scales, rot, sh, opacity, refl, alive):
        return rasterize(
            xyz, scales, rot, opacity, refl, cam, bg, cfg,
            sh=sh, sh_degree=3, alive=alive,
        )

    timed(
        stage_raster_fwd,
        (state.xyz, scales, state.rotation, sh, opacity, refl, state.alive),
        name="rasterize fwd (full)",
    )


def section_binning():
    import jax
    import jax.numpy as jnp
    from tpu_splat.raster.preprocess import preprocess
    from tpu_splat.raster import binning as B

    H, W, cfg, state, cam, _gt = _bench_setup()
    scales = jnp.exp(state.scaling)
    sh = jnp.concatenate([state.features_dc, state.features_rest], axis=1)
    prep = jax.jit(
        lambda xyz, s, r, sh: preprocess(
            xyz, s, r, cam.world_view, cam.full_proj, cam.camera_center,
            H, W, sh=sh, sh_degree=3,
        )
    )(state.xyz, scales, state.rotation, sh)

    from tpu_splat.raster.config import tile_grid

    tiles_y, tiles_x = tile_grid(H, W)
    n_tiles = tiles_y * tiles_x
    cap = cfg.max_instances
    P = prep.depth.shape[0]

    def stage_argsort(depth, valid):
        gkey = jnp.where(valid, depth, jnp.inf)
        return jnp.argsort(gkey, stable=True).astype(jnp.int32)

    gorder = jax.jit(stage_argsort)(prep.depth, prep.valid)
    timed(stage_argsort, (prep.depth, prep.valid), name="depth argsort (P)")

    area_o = prep.tiles_touched[gorder]

    def stage_expand(area_o, rect_min_o, rect_w_o, gorder):
        offsets = jnp.cumsum(area_o) - area_o
        mark = jnp.zeros((cap + 1,), jnp.int32).at[jnp.minimum(offsets, cap)].add(1)
        gsel = jnp.cumsum(mark[:cap]) - 1
        i = jnp.arange(cap, dtype=jnp.int32)
        start_pos = jax.lax.cummax(jnp.where(mark[:cap] > 0, i, 0))
        j = i - start_pos
        packed = rect_min_o[:, 0] | (rect_min_o[:, 1] << 10) | (rect_w_o << 20)
        rows = jnp.stack([packed, gorder], axis=1)[gsel]
        return rows, j

    rw = jnp.maximum(prep.rect_max[gorder][:, 0] - prep.rect_min[gorder][:, 0], 1)
    jax.jit(stage_expand)(area_o, prep.rect_min[gorder], rw, gorder)
    timed(stage_expand, (area_o, prep.rect_min[gorder], rw, gorder),
          name="expand (mark+cumsum+gather)")

    binned = jax.jit(lambda p: B.bin_gaussians(p, H, W, cfg, aligned=True))(prep)

    import dataclasses

    for mode in ("gather", "kernel"):
        cfg_m = dataclasses.replace(cfg, expand_mode=mode)

        def whole(prep, _c=cfg_m):
            return B.bin_gaussians(prep, H, W, _c, aligned=True)

        timed(whole, (prep,), name=f"bin_gaussians whole ({mode})")

    cfg_t = dataclasses.replace(cfg, tight_culling=True, expand_mode="kernel")

    def whole_tight(prep):
        return B.bin_gaussians(prep, H, W, cfg_t, aligned=True)

    bt = jax.jit(whole_tight)(prep)
    timed(whole_tight, (prep,), name="bin_gaussians whole (tight)")
    print(
        f"num_instances rect {int(binned.num_instances)} "
        f"tight {int(bt.num_instances)} / cap {cap}",
        flush=True,
    )


def section_regroup():
    import jax
    import jax.numpy as jnp
    from tpu_splat.kernels.segment_reduce import segment_sum_ranges
    from tpu_splat.kernels.tile_blend import F_GRAD

    import jax as _j
    on_tpu = _j.devices()[0].platform != "cpu"
    cap = 3_670_016 if on_tpu else 1 << 16
    cap_al = cap + (8160 * 128 if on_tpu else 256 * 128)
    P = (1 << 20) if on_tpu else (1 << 14)
    rng = np.random.default_rng(0)
    emit = np.full(cap_al, cap, np.int32)
    emit[:cap] = rng.permutation(cap).astype(np.int32)
    emit = jnp.asarray(emit)
    d_out = jnp.asarray(rng.normal(size=(cap_al, 24)).astype(np.float32))
    areas = rng.integers(2, 6, P)
    starts = np.minimum(np.cumsum(areas) - areas, cap).astype(np.int32)
    ends = np.minimum(starts + areas, cap).astype(np.int32)
    starts, ends = jnp.asarray(starts), jnp.asarray(ends)
    rank_of = jnp.asarray(rng.permutation(P).astype(np.int32))

    def regroup(d_out, emit):
        cols = tuple(d_out[:, i] for i in range(F_GRAD))
        srt = jax.lax.sort((emit,) + cols, num_keys=1, is_stable=False)
        rows_T = jnp.stack(srt[1:], axis=0)
        return segment_sum_ranges(rows_T, starts, ends).T[rank_of]

    jax.jit(regroup)(d_out, emit)
    timed(regroup, (d_out, emit), name="bwd sort-regroup + segsum (f32)")

    from tpu_splat.kernels.tile_blend import _pack_pair_bf16, _unpack_pair_bf16

    def regroup_bf16(d_out, emit):
        # the production (bf16_grads/bf16_feats) path: 6 geometry pairs +
        # 4 pre-packed content words ride the sort as 10 payloads
        geo = [
            _pack_pair_bf16(d_out[:, 2 * k], d_out[:, 2 * k + 1])
            for k in range(6)
        ]
        con = [d_out[:, 12 + k] for k in range(4)]
        srt = jax.lax.sort(
            (emit,) + tuple(geo) + tuple(con), num_keys=1, is_stable=False
        )
        rows = []
        for c in srt[1:7]:
            hi, lo = _unpack_pair_bf16(c)
            rows += [hi, lo]
        rows += [srt[7 + k] for k in range(4)]  # content unpack omitted: ~free
        rows_T = jnp.stack(rows[:F_GRAD], axis=0)
        return segment_sum_ranges(rows_T, starts, ends).T[rank_of]

    jax.jit(regroup_bf16)(d_out, emit)
    timed(regroup_bf16, (d_out, emit), name="bwd sort-regroup + segsum (bf16)")

    from tpu_splat.kernels.tile_blend import _REGROUP_PERM, _regroup_unpack

    def regroup_packed(d_out, emit):
        # production path since r4: packed words ride the sort AND the
        # segment-sum kernel (expanded chunk-by-chunk in VMEM)
        geo = [
            _pack_pair_bf16(d_out[:, 2 * k], d_out[:, 2 * k + 1])
            for k in range(6)
        ]
        con = [
            jax.lax.bitcast_convert_type(
                _pack_pair_bf16(d_out[:, 12 + k], d_out[:, 16 + k]), jnp.int32
            )
            for k in range(4)
        ]
        srt = jax.lax.sort(
            (emit,) + tuple(geo) + tuple(con), num_keys=1, is_stable=False
        )
        rows_T = jnp.stack(srt[1:11], axis=0)
        d_sum = segment_sum_ranges(
            rows_T, starts, ends, unpack=_regroup_unpack, f_out=19
        )
        return jnp.stack([d_sum[i] for i in _REGROUP_PERM], axis=0).T[rank_of]

    jax.jit(regroup_packed)(d_out, emit)
    timed(regroup_packed, (d_out, emit),
          name="bwd sort-regroup + segsum (packed kernel)")


def section_env():
    import jax
    import jax.numpy as jnp
    from tpu_splat.envmap import cubemap as cm
    from tpu_splat.envmap.cubemap import CubemapParams, init_cubemap, sample_cubemap

    on_tpu = jax.devices()[0].platform != "cpu"
    H, W = (1088, 1920) if on_tpu else (128, 128)
    L, C = 128, 3
    params = init_cubemap(jax.random.PRNGKey(0), channels=C, resolution=L)
    yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W), indexing="ij")
    n = np.stack(
        [np.sin(2.1 * xx + 0.3) * 0.6, np.cos(1.7 * yy - 0.2) * 0.6, np.ones_like(xx)],
        axis=-1,
    )
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = np.array([0.0, 0.0, -1.0])
    dirs_smooth = (v - 2 * (n @ v)[..., None] * n).astype(np.float32)
    rng = np.random.default_rng(0)
    dirs_rand = rng.normal(size=(H, W, 3)).astype(np.float32)
    dirs_rand /= np.linalg.norm(dirs_rand, axis=-1, keepdims=True)

    for name, dirs_np in [("smooth", dirs_smooth), ("random", dirs_rand)]:
        dirs = jnp.asarray(dirs_np)

        def fwd(tex, dirs):
            p = CubemapParams(texture=tex, fail_value=params.fail_value)
            return jnp.sum(sample_cubemap(p, dirs))

        def fwdbwd(tex, dirs):
            return jax.grad(fwd, argnums=(0, 1))(tex, dirs)

        timed(fwd, (params.texture, dirs), name=f"[{name}] env fwd")
        timed(fwdbwd, (params.texture, dirs), name=f"[{name}] env fwd+bwd")


def section_render():
    import jax
    import jax.numpy as jnp
    from tpu_splat.renderer import render

    H, W, cfg, state, cam, gt = _bench_setup()
    bg = jnp.zeros(3)
    params = state.param_pytree()

    def loss_at(initial):
        def f(params):
            s = state.with_params(params)
            out = render(s, cam, cfg, bg, initial_stage=initial)
            return jnp.mean(jnp.abs(out.render - gt))

        return f

    for label, initial in (("deferred", False), ("initial-stage", True)):
        f = loss_at(initial)

        def fb(params):
            return jax.value_and_grad(f)(params)

        timed(fb, (params,), name=f"step fwd+bwd ({label})")


def section_tail():
    """Decompose the post-kernel tail: tile->image assembly, normal
    transform + env composite, loss — fwd+bwd each."""
    import jax
    import jax.numpy as jnp
    from tpu_splat.raster.blend import assemble_image, image_to_tiles
    from tpu_splat.raster.config import tile_grid

    H, W, cfg, state, cam, gt = _bench_setup()
    bg = jnp.zeros(3)
    tiles_y, tiles_x = tile_grid(H, W)
    T = tiles_y * tiles_x
    rng = np.random.default_rng(0)
    out_px = jnp.asarray(rng.uniform(0, 1, (T, 16, 256)).astype(np.float32))

    def asm_loss(out_px):
        color, others, refl_img, T_img, _ = assemble_image(
            out_px, tiles_y, tiles_x, H, W, bg, train_shape=True
        )
        return (
            jnp.mean(jnp.abs(color - gt))
            + jnp.mean(others)
            + jnp.mean(refl_img)
        )

    def asm_fwdbwd(out_px):
        return jax.value_and_grad(asm_loss)(out_px)

    timed(asm_loss, (out_px,), name="assemble(10ch)+L1 fwd")
    timed(asm_fwdbwd, (out_px,), name="assemble(10ch)+L1 fwd+bwd")

    def asm3_loss(out_px):
        # color-only assembly (what a tile-space tail still needs in image
        # space for SSIM): 3 channels + T
        color, _, _, _, _ = assemble_image(
            out_px, tiles_y, tiles_x, H, W, bg, train_shape=True
        )
        return jnp.mean(jnp.abs(color - gt))

    timed(
        lambda o: jax.value_and_grad(asm3_loss)(o), (out_px,),
        name="assemble color-only + L1 fwd+bwd",
    )

    gt_t = image_to_tiles(gt, H, W)

    def tile_loss(out_px):
        # pure tile-space tail: composite + L1 against tile-majorized GT
        color = out_px[:, 0:3, :] + out_px[:, 3:4, :] * bg[:, None]
        return jnp.mean(jnp.abs(color - jnp.moveaxis(gt_t, 1, 2)))

    timed(
        lambda o: jax.value_and_grad(tile_loss)(o), (out_px,),
        name="tile-space composite+L1 fwd+bwd",
    )

    # post-raster tail as render() computes it: normal einsum + normalize +
    # env sample + composite + L1, taking image-space maps as inputs
    from tpu_splat.renderer.render import get_refl_color, _safe_normalize

    color_img = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    others_img = jnp.asarray(rng.uniform(0, 1, (H, W, 8)).astype(np.float32))
    refl_img = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

    def post_tail(color_img, others_img, refl_img, env):
        normal_view = others_img[..., 2:5]
        R_v2w = cam.world_view[:3, :3].T
        normal_world = jnp.einsum(
            "hwj,kj->hwk", normal_view, R_v2w,
            precision=jax.lax.Precision.HIGHEST,
        )
        normal_world = _safe_normalize(normal_world)
        refl_color = get_refl_color(env, cam, normal_world)
        rm = refl_img[..., None]
        render_img = (1.0 - rm) * color_img + rm * refl_color
        return jnp.mean(jnp.abs(render_img - gt))

    def post_fwdbwd(c, o, r, env):
        return jax.value_and_grad(post_tail, argnums=(0, 1, 2, 3))(c, o, r, env)

    timed(
        post_fwdbwd, (color_img, others_img, refl_img, state.env),
        name="post-raster tail (nrm+env+L1) f+b",
    )


SECTIONS = {
    "full": section_full,
    "stages": section_stages,
    "binning": section_binning,
    "regroup": section_regroup,
    "env": section_env,
    "render": section_render,
    "tail": section_tail,
}


def main():
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    which = sys.argv[1:] or ["stages"]
    for name in which:
        print(f"--- {name} ---", flush=True)
        SECTIONS[name]()


if __name__ == "__main__":
    main()
