"""Reference-CUDA-semantics parity: this framework vs an independent CPU
oracle transcribed from forward.cu / backward.cu (tests/ref_oracle.py).

Every other parity test in the repo compares the framework against its own
formulations (XLA scan oracle, bruteforce, finite differences); a shared
misreading of the reference math would pass all of them. This file is the
independent check: images AND every rasterizer-level gradient against a
line-by-line transcription of the reference kernels, on the reference's
own circular getRect instance set (cfg.circular_rect=True).

Measured deviations are pure FP reassociation (vectorized numpy vs XLA
scan): forward ~1e-6 abs, gradients ~1e-5 rel — recorded in PARITY.md.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref_oracle import (
    ref_preprocess,
    ref_render_forward,
    ref_render_backward,
    ref_densify_grad,
)
from tpu_splat.data import orbit_camera
from tpu_splat.raster import rasterize
from tpu_splat.raster.config import RasterConfig
from tpu_splat.raster.preprocess import preprocess
from tpu_splat.raster.binning import bin_gaussians
from tpu_splat.raster.blend import blend


H = W = 64
P = 48


def _scene(seed=3):
    """Scene with every splat's plane-horizon line (|p.z| -> 0) kept away
    from its own footprint: the reference forward uses |p.z| < 1e-4 as the
    unstable guard but its backward uses 1e-6 (forward.cu:372 vs
    backward.cu:306), so pixel-instance pairs inside that band get
    inconsistent reference gradients (PARITY.md D5). Both sides agree
    outside it; candidates whose rect contains |p.z| < 3e-3 are dropped."""
    rng = np.random.default_rng(seed)
    cam = orbit_camera(H, W, radius=3.0, azimuth=0.35, elevation=0.25)

    NC = 4 * P
    xyz = rng.uniform(-1.2, 1.2, (NC, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(-2.6, -1.4, (NC, 2))).astype(np.float32)
    rots = rng.normal(size=(NC, 4)).astype(np.float32)
    rots[:, 0] += 2.0  # bias toward identity to avoid edge-on splats

    prep_c = ref_preprocess(
        xyz, scales, rots, np.asarray(cam.world_view),
        np.asarray(cam.full_proj), W, H,
    )
    keep = []
    for g in range(NC):
        if not prep_c["valid"][g]:
            continue
        Tu, Tv, Tw = prep_c["hom"][g]
        x0, y0 = prep_c["rect_min"][g] * 16
        x1, y1 = prep_c["rect_max"][g] * 16
        py, px = np.meshgrid(
            np.arange(y0, min(y1, H), dtype=np.float32),
            np.arange(x0, min(x1, W), dtype=np.float32),
            indexing="ij",
        )
        k = px[..., None] * Tw - Tu
        l = py[..., None] * Tw - Tv
        p2 = np.cross(k, l)[..., 2]
        if np.abs(p2).min(initial=np.inf) > 3e-3:
            keep.append(g)
        if len(keep) == P:
            break
    assert len(keep) == P, f"only {len(keep)} non-grazing candidates"
    keep = np.asarray(keep)
    xyz, scales, rots = xyz[keep], scales[keep], rots[keep]

    # opacities in [0.15, 0.9]: below the 0.99 alpha clamp, whose gradient
    # the reference leaves ungated (PARITY.md D4)
    opacity = rng.uniform(0.15, 0.9, P).astype(np.float32)
    colors = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    refl = rng.uniform(0, 1, P).astype(np.float32)
    scope = rng.uniform(0, 1, P) > 0.4
    bg = np.array([0.2, 0.1, 0.3], np.float32)

    # knife-edge margin search: numpy-vs-XLA FP differences (~1e-6
    # relative) flip accept/termination/branch decisions only within these
    # margins, which would make the comparison measure decision flips
    # instead of gradient formulas — nudge opacities until every margin is
    # wide (typically 0-3 attempts)
    prep_full = ref_preprocess(
        xyz, scales, rots, np.asarray(cam.world_view),
        np.asarray(cam.full_proj), W, H,
    )
    # The alpha >= 1/255 accept contour crosses pixel centers arbitrarily
    # closely for ANY smooth Gaussian (min margin over ~10k boundary pairs
    # is ~1e-6), so alpha-accept flips cannot be designed away — they are
    # detected and excluded per-Gaussian in test_backward_vs_oracle
    # instead. The other knife edges CAN be kept wide:
    for attempt in range(24):
        fac = np.float32(1.0 + 6.1e-4 * attempt)
        fwd = ref_render_forward(
            prep_full, colors, opacity * fac, refl, scope, bg, W, H
        )
        m = fwd["margins"]
        if m["term"] > 1e-6 and m["branch"] > 1e-3 and m["median"] > 1e-5:
            opacity = (opacity * fac).astype(np.float32)
            break
    else:  # pragma: no cover - deterministic seed
        raise AssertionError(f"no margin-safe opacity scale found: {m}")
    return xyz, scales, rots, opacity, colors, refl, scope, bg, cam


def _cfg():
    return RasterConfig(
        max_tiles_per_gaussian=64,
        max_instances=1 << 12,
        tile_depth=256,
        chunk=16,
        backend="xla",
        circular_rect=True,
    )


@pytest.fixture(scope="module")
def scene():
    return _scene()


@pytest.fixture(scope="module")
def oracle(scene):
    xyz, scales, rots, opacity, colors, refl, scope, bg, cam = scene
    prep_o = ref_preprocess(
        xyz, scales, rots, np.asarray(cam.world_view), np.asarray(cam.full_proj),
        W, H,
    )
    fwd_o = ref_render_forward(prep_o, colors, opacity, refl, scope, bg, W, H)
    return prep_o, fwd_o


@pytest.fixture(scope="module")
def ours_prep(scene):
    xyz, scales, rots, opacity, colors, refl, scope, bg, cam = scene
    return jax.jit(
        lambda x, s, r: preprocess(
            x, s, r, cam.world_view, cam.full_proj, cam.camera_center, H, W,
            colors=jnp.zeros((P, 3)), circular_rect=True,
        )
    )(xyz, scales, rots)


def test_preprocess_anchor(scene, oracle, ours_prep):
    """Our preprocess output == the glm-chain transcription: homography,
    low-pass center, depth, radius, circular rects, validity, flipped
    normal."""
    prep_o, _ = oracle
    prep = ours_prep
    np.testing.assert_array_equal(np.asarray(prep.valid), prep_o["valid"])
    v = prep_o["valid"]
    np.testing.assert_allclose(
        np.asarray(prep.hom)[v], prep_o["hom"][v], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(prep.xy)[v], prep_o["xy"][v], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(prep.depth)[v], prep_o["depth"][v], rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(prep.radius)[v], prep_o["radius"][v].astype(np.int32)
    )
    np.testing.assert_array_equal(
        np.asarray(prep.rect_min)[v], prep_o["rect_min"][v]
    )
    np.testing.assert_array_equal(
        np.asarray(prep.rect_max)[v], prep_o["rect_max"][v]
    )
    np.testing.assert_allclose(
        np.asarray(prep.normal_view)[v], prep_o["normal_view"][v],
        rtol=1e-5, atol=1e-6,
    )


def _our_blend(scene, ours_prep):
    xyz, scales, rots, opacity, colors, refl, scope, bg, cam = scene
    cfg = _cfg()
    prep = ours_prep
    binned = jax.jit(
        lambda p: bin_gaussians(p, H, W, cfg, aligned=False)
    )(prep)
    assert int(binned.num_instances) <= cfg.max_instances

    def run(hom, xy, opa, nrm, col, rfl):
        return blend(
            binned.tile_gid, binned.tile_mask, hom, xy, opa, nrm, col, rfl,
            jnp.asarray(scope), jnp.asarray(bg), H, W, cfg,
        )

    return run, prep


def _flip_pixels(out, fwd_o):
    """Pixels where the alpha >= 1/255 accept decision flipped between the
    numpy oracle and XLA (FP-order difference at the contour): detected by
    any output channel moving by far more than FP noise. The reference's
    own loss is discontinuous at this threshold, so two float32
    realizations of it legitimately differ at such pixels."""
    d = np.abs(np.asarray(out.color) - fwd_o["color"]).max(-1)
    d = np.maximum(
        d, np.abs(np.asarray(out.others)[..., :5] - fwd_o["others"][..., :5]).max(-1)
    )
    d = np.maximum(d, np.abs(np.asarray(out.refl_map) - fwd_o["refl_map"]))
    return d > 1e-4


def test_forward_vs_oracle(scene, oracle, ours_prep):
    xyz, scales, rots, opacity, colors, refl, scope, bg, cam = scene
    _, fwd_o = oracle
    run, prep = _our_blend(scene, ours_prep)
    out = jax.jit(run)(
        prep.hom, prep.xy, jnp.asarray(opacity), prep.normal_view,
        jnp.asarray(colors), jnp.asarray(refl),
    )
    flip = _flip_pixels(out, fwd_o)
    # accept-contour FP flips are rare isolated pixels (reference loss is
    # discontinuous there); everything else must match tightly
    assert flip.sum() <= 8, f"{flip.sum()} flipped pixels"
    ok = ~flip

    def close(a, b, **kw):
        np.testing.assert_allclose(np.asarray(a)[ok], b[ok], **kw)

    close(out.color, fwd_o["color"], atol=2e-5, rtol=1e-4)
    close(out.refl_map, fwd_o["refl_map"], atol=2e-5, rtol=1e-4)
    close(out.final_T, fwd_o["final_T"], atol=2e-6, rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out.n_contrib)[ok], fwd_o["n_contrib"][ok]
    )
    # others: DEPTH, ALPHA, NORMAL*3, MIDDEPTH, DISTORTION, MASK
    close(out.others, fwd_o["others"], atol=5e-5, rtol=1e-4)
    # gw is a max over pixels incl. possibly-flipped ones: modest atol
    np.testing.assert_allclose(
        np.asarray(out.gaussian_weights), fwd_o["gw"], atol=5e-4, rtol=1e-4
    )


@pytest.fixture(scope="module")
def oracle64(scene):
    """Float64 oracle: at ~1e-16 rounding the accept/termination knife
    edges (where two f32 realizations of the reference's discontinuous
    loss legitimately disagree — see test_forward_vs_oracle) never flip,
    so gradient FORMULA parity can be asserted to ~1e-9."""
    import tests.ref_oracle as RO

    xyz, scales, rots, opacity, colors, refl, scope, bg, cam = scene
    to64 = lambda a: np.asarray(a, np.float64)
    RO.set_dtype(np.float64)
    try:
        prep_o = ref_preprocess(
            to64(xyz), to64(scales), to64(rots),
            to64(cam.world_view), to64(cam.full_proj), W, H,
        )
        fwd_o = ref_render_forward(
            prep_o, to64(colors), to64(opacity), to64(refl), scope,
            to64(bg), W, H,
        )
    finally:
        RO.set_dtype(np.float32)
    return prep_o, fwd_o


import contextlib


@contextlib.contextmanager
def enable_x64():
    """jax.experimental.enable_x64 was removed; toggle the config flag
    (jit caches key on it, so f32 tests in the same process are safe)."""
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


def _our_blend64(scene):
    """Our preprocess + binning + XLA blend traced in float64 (the f32
    production Pallas kernel is tied to this XLA formulation by the
    existing kernel-vs-oracle tests; this anchors the formulation itself
    to the reference)."""

    xyz, scales, rots, opacity, colors, refl, scope, bg, cam = scene
    cfg = _cfg()
    to64 = lambda a: jnp.asarray(np.asarray(a, np.float64))
    with enable_x64():
        prep = jax.jit(
            lambda x, s, r: preprocess(
                x, s, r, to64(cam.world_view), to64(cam.full_proj),
                to64(cam.camera_center), H, W,
                colors=jnp.zeros((P, 3), jnp.float64), circular_rect=True,
            )
        )(to64(xyz), to64(scales), to64(rots))
        binned = jax.jit(lambda p: bin_gaussians(p, H, W, cfg, aligned=False))(
            prep
        )

        def run(hom, xy, opa, nrm, col, rfl):
            return blend(
                binned.tile_gid, binned.tile_mask, hom, xy, opa, nrm, col,
                rfl, jnp.asarray(scope), to64(bg), H, W, cfg,
            )

        args = (
            prep.hom, prep.xy, to64(opacity), prep.normal_view,
            to64(colors), to64(refl),
        )
        return run, args


def test_backward_vs_oracle(scene, oracle64):
    """Every rasterizer-level gradient vs the hand-transcribed
    backward.cu: dL_d{transMat, mean2D(low-pass), normal, opacity, colors,
    refl}. Fixed random cotangents on (color, others, refl_map); float64
    on both sides so knife-edge flips vanish and only formulas are
    compared."""
    prep_o, fwd_o = oracle64
    xyz, scales, rots, opacity, colors, refl, scope, bg, cam = scene

    rng = np.random.default_rng(7)
    ct_c = rng.normal(size=(H, W, 3))
    # MASK (others[...,7]) is a thresholded indicator in ours (no grad) and
    # an if-set in the reference (no grad): cotangent zero. MIDDEPTH grads
    # flow through the median selection in both.
    ct_o = rng.normal(size=(H, W, 8))
    ct_o[..., 7] = 0.0
    ct_r = rng.normal(size=(H, W))

    run, args = _our_blend64(scene)
    with enable_x64():
        ctc_j, cto_j, ctr_j = map(jnp.asarray, (ct_c, ct_o, ct_r))

        def scalar(hom, xy, opa, nrm, col, rfl):
            out = run(hom, xy, opa, nrm, col, rfl)
            return (
                jnp.sum(out.color * ctc_j)
                + jnp.sum(out.others * cto_j)
                + jnp.sum(out.refl_map * ctr_j)
            )

        grads = jax.jit(jax.grad(scalar, argnums=(0, 1, 2, 3, 4, 5)))(*args)
        d_hom, d_xy, d_opa, d_nrm, d_col, d_rfl = map(np.asarray, grads)

    import tests.ref_oracle as RO

    with RO.dtype(np.float64):
        bwd_o = ref_render_backward(
            prep_o, np.float64(colors), np.float64(opacity),
            np.float64(refl), np.float64(bg), W, H, fwd_o, ct_c, ct_o, ct_r,
        )

    def close(a, b, name, rtol=1e-6, atol=1e-9):
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(
            a, b, rtol=rtol, atol=atol * scale, err_msg=name
        )

    close(d_hom, bwd_o["dT"], "dL_dtransMat")
    close(d_xy, bwd_o["dmean2d"], "dL_dmean2D (low-pass branch)")
    close(d_opa, bwd_o["dopa"], "dL_dopacity")
    close(d_nrm, bwd_o["dnormal"], "dL_dnormal")
    close(d_col, bwd_o["dcol"], "dL_dcolors")
    close(d_rfl, bwd_o["drefl"], "dL_drefl")


def test_densify_grad_overwrite(scene, oracle64):
    """The screen_offset probe's gradient == the reference's densification
    overwrite dL_dmean2D = dL_dT[{u,v}].z * T[2][2] * 0.5 * {W,H}
    (backward.cu:656-659) — including the depth (T[2][2]) factor.
    Float64 on both sides (see test_backward_vs_oracle)."""
    prep_o, fwd_o = oracle64
    xyz, scales, rots, opacity, colors, refl, scope, bg, cam = scene
    cfg = _cfg()

    rng = np.random.default_rng(9)
    ct_c = rng.normal(size=(H, W, 3))

    with enable_x64():
        to64 = lambda a: jnp.asarray(np.asarray(a, np.float64))
        cam64 = cam.replace(
            world_view=to64(cam.world_view), proj=to64(cam.proj),
            full_proj=to64(cam.full_proj),
            camera_center=to64(cam.camera_center), K=to64(cam.K),
        )
        ctc_j = jnp.asarray(ct_c)

        def scalar(so):
            out = rasterize(
                to64(xyz), to64(scales), to64(rots), to64(opacity),
                to64(refl), cam64, to64(bg), cfg, colors=to64(colors),
                scope_mask=jnp.asarray(scope), screen_offset=so,
            )
            return jnp.sum(out.color * ctc_j)

        gso = np.asarray(
            jax.jit(jax.grad(scalar))(jnp.zeros((P, 2), jnp.float64))
        )

    # oracle: backward with ONLY the color cotangent, then the overwrite
    import tests.ref_oracle as RO

    with RO.dtype(np.float64):
        bwd_o = ref_render_backward(
            prep_o, np.float64(colors), np.float64(opacity),
            np.float64(refl), np.float64(bg), W, H, fwd_o,
            ct_c, np.zeros((H, W, 8)), np.zeros((H, W)),
        )
    expected = ref_densify_grad(prep_o, bwd_o["dT"], W, H)
    scale = max(np.abs(expected).max(), 1.0)
    np.testing.assert_allclose(gso, expected, rtol=1e-6, atol=1e-9 * scale)
