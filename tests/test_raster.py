"""Rasterizer correctness: production chunked-prefix path vs brute-force oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_splat.core.graphics import Camera
from tpu_splat.data import random_scene, orbit_camera
from tpu_splat.raster import rasterize, RasterOutput
from tpu_splat.raster.config import RasterConfig
from tpu_splat.raster.preprocess import preprocess
from tpu_splat.raster.bruteforce import blend_bruteforce


H = W = 48
CFG = RasterConfig(max_tiles_per_gaussian=16, max_instances=4096, tile_depth=256, chunk=16)


def _scene(n=120, seed=0):
    raw = random_scene(n, seed=seed)
    cam = orbit_camera(H, W, radius=4.0, azimuth=0.4, elevation=0.3)
    act = dict(
        means3d=jnp.asarray(raw["xyz"]),
        scales=jnp.exp(jnp.asarray(raw["scaling"])),
        rotations=jnp.asarray(raw["rotation"]),
        opacity=jax.nn.sigmoid(jnp.asarray(raw["opacity"][:, 0])),
        refl=jax.nn.sigmoid(jnp.asarray(raw["refl"][:, 0])),
        sh=jnp.asarray(raw["sh"]),
    )
    return act, cam


def _run_production(act, cam, bg):
    return rasterize(
        act["means3d"],
        act["scales"],
        act["rotations"],
        act["opacity"],
        act["refl"],
        cam,
        bg,
        CFG,
        sh=act["sh"],
        sh_degree=0,
    )


def _run_bruteforce(act, cam, bg):
    prep = preprocess(
        act["means3d"],
        act["scales"],
        act["rotations"],
        cam.world_view,
        cam.full_proj,
        cam.camera_center,
        H,
        W,
        sh=act["sh"],
        sh_degree=0,
    )
    scope = jnp.ones((act["opacity"].shape[0],), bool)
    return blend_bruteforce(prep, act["opacity"], act["refl"], scope, bg, H, W)


def test_forward_matches_bruteforce():
    act, cam = _scene()
    bg = jnp.array([0.1, 0.2, 0.3])
    out = _run_production(act, cam, bg)
    color_bf, others_bf, refl_bf, T_bf, ncon_bf = _run_bruteforce(act, cam, bg)

    assert not np.any(np.isnan(np.asarray(out.color)))
    np.testing.assert_allclose(out.color, color_bf, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.final_T, T_bf, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.refl_map, refl_bf, atol=2e-5, rtol=1e-4)
    # allmap channels: depth, alpha, normal, median, distortion, mask
    np.testing.assert_allclose(out.others, others_bf, atol=5e-5, rtol=1e-3)
    np.testing.assert_array_equal(out.n_contrib, ncon_bf)


def test_coverage_nontrivial():
    act, cam = _scene()
    bg = jnp.zeros(3)
    out = _run_production(act, cam, bg)
    alpha = np.asarray(out.others[..., 1])
    assert alpha.max() > 0.5  # something rendered
    assert (np.asarray(out.radii) > 0).sum() > 50  # most Gaussians visible
    assert int(out.num_instances) > 100


def test_gradients_match_bruteforce():
    act, cam = _scene(n=60, seed=3)
    bg = jnp.array([0.5, 0.5, 0.5])
    target = jnp.zeros((H, W, 3))

    def loss_prod(means, scales, rots, opa, sh):
        out = rasterize(
            means, scales, rots, opa, act["refl"], cam, bg, CFG, sh=sh, sh_degree=0
        )
        return jnp.sum((out.color - target) ** 2) + jnp.sum(out.others[..., 6]) * 0.1

    def loss_bf(means, scales, rots, opa, sh):
        prep = preprocess(
            means, scales, rots, cam.world_view, cam.full_proj, cam.camera_center,
            H, W, sh=sh, sh_degree=0,
        )
        scope = jnp.ones((opa.shape[0],), bool)
        color, others, refl_m, T, _ = blend_bruteforce(
            prep, opa, act["refl"], scope, bg, H, W
        )
        return jnp.sum((color - target) ** 2) + jnp.sum(others[..., 6]) * 0.1

    args = (act["means3d"], act["scales"], act["rotations"], act["opacity"], act["sh"])
    g1 = jax.grad(loss_prod, argnums=(0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(loss_bf, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means", "scales", "rots", "opacity", "sh"]
    for n, a, b in zip(names, g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        assert not np.any(np.isnan(a)), f"NaN in production grad {n}"
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4, err_msg=n)


def test_finite_difference_opacity():
    act, cam = _scene(n=20, seed=5)
    bg = jnp.zeros(3)

    def loss(opa):
        out = rasterize(
            act["means3d"], act["scales"], act["rotations"], opa, act["refl"],
            cam, bg, CFG, sh=act["sh"], sh_degree=0,
        )
        return jnp.sum(out.color)

    opa = act["opacity"]
    g = np.asarray(jax.grad(loss)(opa))
    eps = 1e-3
    rng = np.random.default_rng(0)
    for i in rng.choice(20, size=4, replace=False):
        e = np.zeros_like(opa)
        e[i] = eps
        fd = (float(loss(opa + e)) - float(loss(opa - e))) / (2 * eps)
        assert abs(fd - g[i]) < 5e-2 * max(1.0, abs(fd)), (i, fd, g[i])


def test_screen_offset_probe_gradient():
    """The densification-signal probe must carry nonzero gradient."""
    act, cam = _scene(n=40, seed=7)
    bg = jnp.zeros(3)
    so = jnp.zeros((40, 2))

    def loss(so):
        out = rasterize(
            act["means3d"], act["scales"], act["rotations"], act["opacity"],
            act["refl"], cam, bg, CFG, sh=act["sh"], sh_degree=0, screen_offset=so,
        )
        return jnp.sum((out.color - 0.5) ** 2)

    g = np.asarray(jax.grad(loss)(so))
    assert not np.any(np.isnan(g))
    assert np.abs(g).max() > 0.0


def test_volumetric_mode():
    """3DGS EWA variant: renders, matches an analytic single-splat check."""
    import math
    from tpu_splat.data import orbit_camera

    cam = orbit_camera(H, W, radius=4.0, azimuth=0.0, elevation=0.0)
    # one isotropic gaussian at origin
    means = jnp.zeros((1, 3))
    scales3 = jnp.full((1, 3), 0.1)
    rots = jnp.array([[1.0, 0, 0, 0]])
    opa = jnp.array([0.9])
    refl = jnp.array([0.0])
    colors = jnp.array([[1.0, 0.0, 0.0]])
    out = rasterize(
        means, scales3, rots, opa, refl, cam, jnp.zeros(3), CFG,
        colors=colors, mode="volumetric",
        normals=jnp.array([[0.0, 0.0, 1.0]]),
    )
    img = np.asarray(out.color)
    assert not np.any(np.isnan(img))
    # analytic EWA gaussian: center at ((0+1)*S-1)/2 = 23.5 (half-pixel),
    # var = (focal*s/z)^2 + 0.3 dilation; single splat over black bg ->
    # red = alpha = 0.9 * exp(-0.5 * d^2/var)
    focal = W / (2 * math.tan(cam.fovx / 2))
    var = (focal * 0.1 / 4.0) ** 2 + 0.3
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    d2 = (xs - (W - 1) / 2) ** 2 + (ys - (H - 1) / 2) ** 2
    expected = 0.9 * np.exp(-0.5 * d2 / var)
    expected[expected < 1.0 / 255.0] = 0.0  # alpha skip threshold
    np.testing.assert_allclose(img[..., 0], expected, atol=5e-3)
    assert img[..., 1].max() < 1e-3
    # depth map at center equals view-space z (= 4)
    depth = np.asarray(out.others[..., 0]) / np.clip(
        np.asarray(out.others[..., 1]), 1e-6, None
    )
    assert abs(depth[H // 2, W // 2] - 4.0) < 0.05


def test_volumetric_gradients_finite():
    act, cam = _scene(n=30, seed=11)
    scales3 = jnp.concatenate([act["scales"], act["scales"][:, :1]], axis=1)

    def loss(means, sc, rots, opa):
        out = rasterize(
            means, sc, rots, opa, act["refl"], cam, jnp.zeros(3), CFG,
            sh=act["sh"], sh_degree=0, mode="volumetric", antialiasing=True,
        )
        return jnp.sum((out.color - 0.5) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(
        act["means3d"], scales3, act["rotations"], act["opacity"]
    )
    for a in g:
        assert not np.any(np.isnan(np.asarray(a)))
        assert np.abs(np.asarray(a)).max() > 0


def test_aabb_per_axis_culling_parity_bound():
    """PARITY.md D1: per-axis ellipse-AABB binning (preprocess.py:175-196) vs
    the reference's circular getRect (auxiliary.h:71-81). Adversarial load:
    strongly anisotropic (up to 20:1), near-opaque splats — the regime where
    the dropped circle-minus-AABB corner contributions are largest. Bounds
    here are the documented deviation record; tightening the binning would
    have to keep them."""
    import jax

    rng = np.random.default_rng(11)
    n = 150
    xyz = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    # log-scales: one long axis, one short axis (ratio 5..20)
    s_long = rng.uniform(-2.2, -1.2, (n, 1)).astype(np.float32)
    s_short = s_long - rng.uniform(1.6, 3.0, (n, 1)).astype(np.float32)
    scales = jnp.exp(jnp.asarray(np.concatenate([s_long, s_short], axis=1)))
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    opacity = jnp.full((n,), 0.95)
    refl = jnp.full((n,), 0.2)
    color = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    cam = orbit_camera(H, W, radius=4.0, azimuth=0.9, elevation=0.2)
    bg = jnp.array([0.3, 0.3, 0.3])

    from tpu_splat.raster.binning import bin_gaussians
    from tpu_splat.raster.blend import blend
    from tpu_splat.raster.config import TILE, tile_grid

    tiles_y, tiles_x = tile_grid(H, W)

    def run(circular, diff_args):
        means3d, rotations, opa, col = diff_args
        prep = preprocess(
            means3d, scales, rotations, cam.world_view, cam.full_proj,
            cam.camera_center, H, W, colors=col,
        )
        if circular:
            # reference getRect semantics: circle of radius max(extent) on
            # BOTH axes (auxiliary.h:71-81); radius already = ceil(max(...))
            r = prep.radius.astype(jnp.float32)
            c = prep.xy
            rect_min = jnp.stack(
                [
                    jnp.clip(jnp.floor((c[:, 0] - r) / TILE), 0, tiles_x),
                    jnp.clip(jnp.floor((c[:, 1] - r) / TILE), 0, tiles_y),
                ],
                axis=-1,
            ).astype(jnp.int32)
            rect_max = jnp.stack(
                [
                    jnp.clip(jnp.floor((c[:, 0] + r + TILE - 1) / TILE), 0, tiles_x),
                    jnp.clip(jnp.floor((c[:, 1] + r + TILE - 1) / TILE), 0, tiles_y),
                ],
                axis=-1,
            ).astype(jnp.int32)
            area = (rect_max[:, 0] - rect_min[:, 0]) * (
                rect_max[:, 1] - rect_min[:, 1]
            )
            area = jnp.where(prep.valid, area, 0)
            prep = prep._replace(
                rect_min=rect_min, rect_max=rect_max, tiles_touched=area
            )
        binned = bin_gaussians(prep, H, W, CFG)
        scope = jnp.ones((n,), bool)
        out = blend(
            binned.tile_gid, binned.tile_mask, prep.hom, prep.xy, opa,
            prep.normal_view, prep.color, refl, scope, bg, H, W, CFG,
        )
        return out

    diff_args = (jnp.asarray(xyz), jnp.asarray(rot), opacity, color)
    img_a = run(False, diff_args).color
    img_c = run(True, diff_args).color
    delta = np.abs(np.asarray(img_a) - np.asarray(img_c))
    assert delta.max() <= 0.03, f"max image delta {delta.max():.4f}"
    assert delta.mean() <= 1e-3, f"mean image delta {delta.mean():.6f}"

    # parameter gradients of an L1-style loss under both binnings
    tgt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    def loss(circular, diff_args):
        return jnp.mean(jnp.abs(run(circular, diff_args).color - tgt))

    g_a = jax.grad(lambda a: loss(False, a))(diff_args)
    g_c = jax.grad(lambda a: loss(True, a))(diff_args)
    for ga, gc, name in zip(g_a, g_c, ("xyz", "rot", "opacity", "color")):
        ga, gc = np.asarray(ga), np.asarray(gc)
        scale = np.abs(gc).max() + 1e-12
        rel = np.abs(ga - gc).max() / scale
        assert rel <= 5e-2, f"grad[{name}] max rel delta {rel:.4f}"


def test_binning_expand_modes_identical():
    """The gather, hold-last-scan, and run-decode-kernel expansion
    formulations produce identical binning (all exact; selected by
    RasterConfig.expand_mode)."""
    import dataclasses

    from tpu_splat.raster.binning import bin_gaussians

    # n=900 overflows max_instances=4096 so the capacity-truncation path is
    # compared across modes too
    act, cam = _scene(n=900, seed=3)
    prep = preprocess(
        act["means3d"], act["scales"], act["rotations"], cam.world_view,
        cam.full_proj, cam.camera_center, H, W,
        colors=jnp.zeros((900, 3)),
    )

    outs = {}
    for mode in ("gather", "scan", "kernel"):
        cfg_m = dataclasses.replace(CFG, expand_mode=mode)
        outs[mode] = jax.jit(
            lambda p, _c=cfg_m: bin_gaussians(p, H, W, _c, aligned=True)
        )(prep)

    a = outs["gather"]
    assert int(a.num_instances) > 0
    for mode in ("scan", "kernel"):
        b = outs[mode]
        np.testing.assert_array_equal(
            np.asarray(a.aligned_gid), np.asarray(b.aligned_gid)
        )
        np.testing.assert_array_equal(
            np.asarray(a.aligned_rank), np.asarray(b.aligned_rank)
        )
        np.testing.assert_array_equal(
            np.asarray(a.tile_counts), np.asarray(b.tile_counts)
        )
        np.testing.assert_array_equal(
            np.asarray(a.seg_start), np.asarray(b.seg_start)
        )
        assert int(a.num_instances) == int(b.num_instances)


def test_tight_culling_parity_bound():
    """PARITY.md D2: per-column tight binning (3-sigma conic y-extent per
    tile column) vs the per-axis AABB rect. Dropped contributions satisfy
    rho > 9 => alpha <= opacity*e^-4.5; bound the per-pixel image deltas
    on an adversarial anisotropic near-opaque load. The MEDIAN-depth
    channel is knife-edge by construction (T>0.5 crossing can flip) and is
    excluded — it is unused by training (depth_ratio=0)."""
    import dataclasses
    import jax
    from tpu_splat.raster import rasterize

    rng = np.random.default_rng(5)
    n = 220
    xyz = jnp.asarray(rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32))
    scales = jnp.asarray(
        np.exp(rng.normal(-2.2, 0.8, (n, 2))).astype(np.float32)
    ).at[:, 0].mul(6.0)
    rot = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    op = jnp.asarray(rng.uniform(0.5, 1.0, n).astype(np.float32))
    refl = jnp.zeros(n)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    cam = orbit_camera(H, W, radius=4.0)
    bg = jnp.zeros(3)

    base = RasterConfig(
        max_tiles_per_gaussian=16, max_instances=8192, tile_depth=256,
        chunk=16, backend="pallas",
    )
    cfg_t = dataclasses.replace(base, tight_culling=True)

    def run(cfg):
        return jax.jit(
            lambda: rasterize(
                xyz, scales, rot, op, refl, cam, bg, cfg, colors=colors
            )
        )()

    a, b = run(base), run(cfg_t)
    assert int(b.num_instances) < int(a.num_instances)  # it actually culls

    # gradients must flow THROUGH the render with tight binning (the
    # run-decode kernel has no AD rule; binning is stop_gradient'ed)
    def loss(xyz):
        out = rasterize(
            xyz, scales, rot, op, refl, cam, bg, cfg_t, colors=colors
        )
        return jnp.sum(out.color**2)

    g = np.asarray(jax.grad(loss)(xyz))
    assert np.isfinite(g).all() and np.abs(g).max() > 0
    assert float(jnp.abs(a.color - b.color).max()) <= 0.02
    assert float(jnp.abs(a.refl_map - b.refl_map).max()) <= 0.02
    keep = [0, 1, 2, 3, 4, 7]  # depth/alpha/normal/mask; 5=median 6=dist
    d = jnp.abs(a.others[..., keep] - b.others[..., keep])
    assert float(d.max()) <= 0.03, float(d.max())


def test_opacity_rect_footprint_superset():
    """opacity_rect (preprocess.py, RasterConfig.opacity_rect): the shrunk
    rect must still contain EVERY tile where the blend accept mask
    (alpha = min(0.99, o*exp(-rho/2)) >= 1/255, kernels/tile_blend.py:477)
    can fire inside the reference 3-sigma rect — dense per-pixel alpha
    evaluation is the ground truth. Also: o < 1/255 rows are culled, the
    rect never grows, and reported radii keep the full 3-sigma value."""
    from tpu_splat.raster.config import FILTER_INV_SQUARE, TILE

    rng = np.random.default_rng(3)
    n = 300
    xyz = jnp.asarray(rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32))
    scales = jnp.exp(jnp.asarray(rng.normal(-2.6, 0.7, (n, 2)).astype(np.float32)))
    rot = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    # full opacity range incl. sub-1/255 and the rho_cut > 9 clip regime
    op_np = np.concatenate(
        [rng.uniform(0, 1, n - 60), rng.uniform(0, 1 / 255, 60)]
    ).astype(np.float32)
    op = jnp.asarray(op_np)
    cam = orbit_camera(H, W, radius=4.0, azimuth=0.7, elevation=0.25)
    colors = jnp.zeros((n, 3))

    p0 = preprocess(
        xyz, scales, rot, cam.world_view, cam.full_proj, cam.camera_center,
        H, W, colors=colors,
    )
    p1 = preprocess(
        xyz, scales, rot, cam.world_view, cam.full_proj, cam.camera_center,
        H, W, colors=colors, opacity=op,
    )
    rad0, rad1 = np.asarray(p0.radius), np.asarray(p1.radius)
    keep = np.asarray(p1.valid)
    assert np.array_equal(rad0[keep], rad1[keep])  # full 3-sigma radii kept
    assert (rad1[~keep] == 0).all()
    r0m, r0M = np.asarray(p0.rect_min), np.asarray(p0.rect_max)
    r1m, r1M = np.asarray(p1.rect_min), np.asarray(p1.rect_max)
    v0, v1 = np.asarray(p0.valid), np.asarray(p1.valid)
    # never grows
    assert (r1m[v1] >= r0m[v1]).all() and (r1M[v1] <= r0M[v1]).all()
    # sub-1/255 opacity culled outright
    assert not v1[op_np < 1.0 / 255.0].any()

    # dense alpha field per gaussian (the exact blend formula)
    hom = np.asarray(p0.hom, np.float64)
    xy = np.asarray(p0.xy, np.float64)
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    missed = 0
    for i in range(n):
        if not v0[i] or op_np[i] < 2.0 / 255.0:  # skip knife-edge o ~ 1/255
            continue
        Tu, Tv, Tw = hom[i, 0], hom[i, 1], hom[i, 2]
        k = xx[..., None] * Tw - Tu
        l = yy[..., None] * Tw - Tv
        p = np.cross(k, l)
        unst = np.abs(p[..., 2]) < 1e-4
        s = p[..., :2] / np.where(unst, 1.0, p[..., 2])[..., None]
        rho3d = np.where(unst, 1e8, (s * s).sum(-1))
        rho2d = FILTER_INV_SQUARE * ((xx - xy[i, 0]) ** 2 + (yy - xy[i, 1]) ** 2)
        alpha = op_np[i] * np.exp(-0.5 * np.minimum(rho3d, rho2d))
        # tiles (within the reference rect) where alpha can clear the accept
        # threshold, with margin against f32-vs-f64 boundary noise
        ys, xs = np.nonzero(alpha >= 1.05 / 255.0)
        for y, x in zip(ys, xs):
            tx, ty = x // TILE, y // TILE
            if not (r0m[i, 0] <= tx < r0M[i, 0] and r0m[i, 1] <= ty < r0M[i, 1]):
                continue  # outside the reference rect: clipped either way
            if not (
                v1[i]
                and r1m[i, 0] <= tx < r1M[i, 0]
                and r1m[i, 1] <= ty < r1M[i, 1]
            ):
                missed += 1
    assert missed == 0, f"{missed} accept-capable (gaussian, tile) pairs dropped"


def test_opacity_rect_footprint_superset_adversarial():
    """Round-4 advisor ask: the +1 px f32 guard on the cut-conic AABB was
    only validated on moderate splats. Adversarial regimes here: extreme
    anisotropy (screen-filling ribbons), near-grazing camera, tiny scales,
    far/close splats, and opacities just above 1/255 where rho_cut ~ 0 and
    the guard carries the whole margin."""
    from tpu_splat.raster.config import FILTER_INV_SQUARE, TILE

    rng = np.random.default_rng(11)
    n = 240
    xyz = np.concatenate(
        [
            rng.uniform(-1.5, 1.5, (n - 80, 3)),
            rng.uniform(-0.4, 0.4, (40, 3)) + np.array([0, 0, -2.5]),  # close
            rng.uniform(-6, 6, (40, 3)),  # far/out-of-view
        ]
    ).astype(np.float32)
    # scales spanning e^-6 (sub-pixel) .. e^0 (screen-filling), with
    # extreme per-axis anisotropy
    s_iso = rng.uniform(-6.0, 0.0, (n, 1))
    s_ani = s_iso + rng.uniform(-4.0, 0.0, (n, 1)) * (rng.uniform(0, 1, (n, 1)) > 0.5)
    scales = np.exp(np.concatenate([s_iso, s_ani], axis=1)).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    # opacity clustered just above the 1/255 accept threshold + full range
    op_np = np.concatenate(
        [
            rng.uniform(1.1 / 255, 3.0 / 255, n // 2),
            rng.uniform(0, 1, n - n // 2),
        ]
    ).astype(np.float32)
    # grazing camera: elevation ~1 degree
    cam = orbit_camera(H, W, radius=3.0, azimuth=1.3, elevation=0.02)
    colors = jnp.zeros((n, 3))
    p0 = preprocess(
        xyz, jnp.asarray(scales), rot, cam.world_view, cam.full_proj,
        cam.camera_center, H, W, colors=colors,
    )
    p1 = preprocess(
        xyz, jnp.asarray(scales), rot, cam.world_view, cam.full_proj,
        cam.camera_center, H, W, colors=colors, opacity=jnp.asarray(op_np),
    )
    r0m, r0M = np.asarray(p0.rect_min), np.asarray(p0.rect_max)
    r1m, r1M = np.asarray(p1.rect_min), np.asarray(p1.rect_max)
    v0, v1 = np.asarray(p0.valid), np.asarray(p1.valid)
    assert (r1m[v1] >= r0m[v1]).all() and (r1M[v1] <= r0M[v1]).all()

    hom = np.asarray(p0.hom, np.float64)
    xy = np.asarray(p0.xy, np.float64)
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    missed = 0
    for i in range(n):
        if not v0[i] or op_np[i] < 2.0 / 255.0:  # skip knife-edge o ~ 1/255
            continue
        Tu, Tv, Tw = hom[i, 0], hom[i, 1], hom[i, 2]
        k = xx[..., None] * Tw - Tu
        l = yy[..., None] * Tw - Tv
        p = np.cross(k, l)
        unst = np.abs(p[..., 2]) < 1e-4
        s = p[..., :2] / np.where(unst, 1.0, p[..., 2])[..., None]
        rho3d = np.where(unst, 1e8, (s * s).sum(-1))
        rho2d = FILTER_INV_SQUARE * ((xx - xy[i, 0]) ** 2 + (yy - xy[i, 1]) ** 2)
        alpha = op_np[i] * np.exp(-0.5 * np.minimum(rho3d, rho2d))
        ys, xs = np.nonzero(alpha >= 1.05 / 255.0)
        for y, x in zip(ys, xs):
            tx, ty = x // TILE, y // TILE
            if not (r0m[i, 0] <= tx < r0M[i, 0] and r0m[i, 1] <= ty < r0M[i, 1]):
                continue
            if not (
                v1[i]
                and r1m[i, 0] <= tx < r1M[i, 0]
                and r1m[i, 1] <= ty < r1M[i, 1]
            ):
                missed += 1
    assert missed == 0, f"{missed} accept-capable (gaussian, tile) pairs dropped"


def test_opacity_rect_render_parity():
    """Away from the T<1e-4 termination knife edge (low opacities, sparse
    cloud) the opacity_rect render matches the reference rect bit-for-bit up
    to reduction-order noise: the accepted contribution set is IDENTICAL
    (only sub-1/255 instances are dropped), so images agree to ~1e-5."""
    import dataclasses

    rng = np.random.default_rng(5)
    # shallow cloud: with alpha <= 0.1 and 60 splats, T >= 0.9^60 ~ 1.8e-3
    # > T_EPS, so the termination knife edge cannot fire anywhere
    n = 60
    xyz = jnp.asarray(rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32))
    scales = jnp.exp(jnp.asarray(rng.normal(-2.8, 0.6, (n, 2)).astype(np.float32)))
    rot = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    op = jnp.asarray(rng.uniform(0.01, 0.1, n).astype(np.float32))
    refl = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    cam = orbit_camera(H, W, radius=4.0, azimuth=0.7, elevation=0.25)
    bg = jnp.asarray([0.2, 0.3, 0.4], jnp.float32)

    cfg1 = dataclasses.replace(CFG, opacity_rect=True)
    o0 = rasterize(xyz, scales, rot, op, refl, cam, bg, CFG, colors=colors)
    o1 = rasterize(xyz, scales, rot, op, refl, cam, bg, cfg1, colors=colors)
    assert int(o1.num_instances) <= int(o0.num_instances)
    np.testing.assert_allclose(
        np.asarray(o0.color), np.asarray(o1.color), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(o0.refl_map), np.asarray(o1.refl_map), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(o0.others[..., 2:5]), np.asarray(o1.others[..., 2:5]),
        atol=1e-5,
    )
    # gradients through the identical accepted set agree too
    def loss(cfg):
        def f(xyz_, op_):
            o = rasterize(xyz_, scales, rot, op_, refl, cam, bg, cfg,
                          colors=colors)
            return jnp.sum(o.color) + jnp.sum(o.refl_map)
        return f

    g0 = jax.grad(loss(CFG), argnums=(0, 1))(xyz, op)
    g1 = jax.grad(loss(cfg1), argnums=(0, 1))(xyz, op)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
