"""Independent CPU oracle transcribed line-by-line from the reference CUDA
rasterizer (NOT from this repo's JAX code) — the first parity check whose
"expected" side does not share a formulation with the implementation under
test.

Sources (transcribed, with the exact guard constants and branch structure):
- preprocess: forward.cu:75-253 (compute_transmat, compute_aabb,
  preprocessCUDA) via literal glm column-major semantics,
  quat_to_rotmat/scale_to_mat (auxiliary.h:217-296), in_frustum
  (auxiliary.h:189-214), circular getRect (auxiliary.h:71-81).
- forward render: forward.cu:258-489 (renderCUDA), per-pixel sequential
  over-compositing with the CUDA skip/termination order, RENDER_AXUTILITY
  channels, DUAL_VISIABLE flip, atomicExch max gaussian_weights.
- backward render: backward.cu:143-470 (renderCUDA), back-to-front
  transmittance division, accum_rec recurrences, DETACH_WEIGHT=0
  distortion dL_dweight, the rho3d<=rho2d branch split, and backward's own
  |p.z| < 1e-6 guard (the forward uses 1e-4 — reference quirk, see
  PARITY.md).
- densification-grad overwrite: backward.cu:656-659
  (dL_dmean2D = dL_dT[2].z * T[2][2] * 0.5 * {W,H}).

Everything is float32 numpy; loops are per-instance (vectorized over one
tile's 256 pixels), preserving the reference's per-pixel sequential
semantics exactly. Scenes are kept tiny (<= 64 Gaussians, <= 64^2 px).
"""
from __future__ import annotations

import contextlib

import numpy as np

f32 = np.float32


def set_dtype(dt):
    """Switch the oracle's working dtype (float32 default). float64 mode is
    used by the gradient-parity tests: with ~1e-16 rounding, the accept /
    termination knife edges (where two float32 realizations of the
    reference's discontinuous loss legitimately disagree) never flip, so
    formula parity can be asserted to ~1e-9 instead of flip-polluted 1e-1."""
    global f32
    f32 = dt


@contextlib.contextmanager
def dtype(dt):
    """Context manager form of set_dtype (restores float32 on exit)."""
    prev = f32
    set_dtype(dt)
    try:
        yield
    finally:
        set_dtype(prev)


BLOCK = 16
NEAR_N = f32(0.2)
FAR_N = f32(100.0)
FILTER_SIZE = f32(0.707106)
FILTER_INV_SQUARE = f32(2.0)


# ---------------------------------------------------------------------------
# glm column-major helpers: a "glm mat C x R" is a numpy array [C, R] whose
# rows are glm COLUMNS; glm_mul(A, B) composes as linear maps (A after B),
# matching glm operator* semantics.


def glm_mul(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """A: [Ca, R] (Ca columns of R-vectors), B: [Cb, Ca] -> [Cb, R]:
    column j of result = A applied to column j of B."""
    return (B @ A).astype(f32)


def glm_transpose(A: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(A.T).astype(f32)


def quat_to_rotmat_ref(quat: np.ndarray) -> np.ndarray:
    """auxiliary.h:217-240; quat stored (w, x, y, z). Returns glm mat3
    [3 cols, 3 rows] per Gaussian: [P, 3, 3]."""
    q = quat.astype(f32)
    s = (1.0 / np.sqrt((q * q).sum(-1))).astype(f32)
    w, x, y, z = (q[:, i] * s for i in range(4))
    # glm column-major constructor order (auxiliary.h:228-238)
    cols = np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y + w * z), 2 * (x * z - w * y)], -1),
            np.stack([2 * (x * y - w * z), 1 - 2 * (x * x + z * z), 2 * (y * z + w * x)], -1),
            np.stack([2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=1,
    )  # [P, 3 cols, 3 rows]
    return cols.astype(f32)


def ref_preprocess(
    xyz, scales, rots, world_view, full_proj, W, H, scale_modifier=1.0
):
    """preprocessCUDA geometry (forward.cu:148-253) for all P Gaussians.

    world_view/full_proj are MATH matrices (p_view = Wv[:3,:3] @ p +
    Wv[:3,3]; ndc_h = FP @ (p, 1)) — the reference receives them as
    column-major flats (scene/cameras.py transposes before the kernel);
    the glm chain below reproduces the same arithmetic.

    Returns dict with hom rows (Tu, Tv, Tw) [P,3,3], normal_view (flipped),
    xy, depth, radius, rect_min/max (circular getRect), valid.
    """
    P = xyz.shape[0]
    Wv = np.asarray(world_view, f32)
    FP = np.asarray(full_proj, f32)
    p_view = xyz @ Wv[:3, :3].T + Wv[:3, 3]
    in_front = p_view[:, 2] > NEAR_N  # in_frustum, auxiliary.h:204

    R = quat_to_rotmat_ref(rots)  # [P, 3c, 3r]
    # L = R * S (scale_to_mat: diag(sx, sy, 0) * mod); glm L column k =
    # R applied to S column k = s_k * R column k
    s = (scales * f32(scale_modifier)).astype(f32)
    L0 = R[:, 0] * s[:, 0:1]
    L1 = R[:, 1] * s[:, 1:2]
    L2 = R[:, 2]  # scale 0 axis: normal direction

    # splat2world: glm mat3x4, columns (L0,0), (L1,0), (p,1)  [forward.cu:93-97]
    s2w = np.zeros((P, 3, 4), f32)
    s2w[:, 0, :3] = L0
    s2w[:, 1, :3] = L1
    s2w[:, 2, :3] = xyz
    s2w[:, 2, 3] = 1.0
    # world2ndc: glm mat4 columns = rows of the math FP  [forward.cu:99-104]
    world2ndc = np.ascontiguousarray(FP).astype(f32)  # [4 cols, 4 rows] = FP rows as cols
    # ndc2pix: glm mat3x4 columns  [forward.cu:106-110]
    ndc2pix = np.array(
        [
            [W / 2.0, 0.0, 0.0, (W - 1) / 2.0],
            [0.0, H / 2.0, 0.0, (H - 1) / 2.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=f32,
    )  # [3 cols, 4 rows]
    # T = transpose(splat2world) * world2ndc * ndc2pix  [forward.cu:112]
    hom = np.zeros((P, 3, 3), f32)
    for i in range(P):
        Tm = glm_mul(glm_mul(glm_transpose(s2w[i]), world2ndc), ndc2pix)
        # glm columns of T are the homography rows Tu, Tv, Tw (stored as
        # T_ptr[idx*3+k] = {T[k][0], T[k][1], T[k][2]}, forward.cu:196-199)
        hom[i] = Tm
    Tu, Tv, Tw = hom[:, 0], hom[:, 1], hom[:, 2]

    # normal = transformVec4x3(L[2], viewmatrix) = Wv[:3,:3] @ L2
    normal = L2 @ Wv[:3, :3].T
    # DUAL_VISIABLE flip (forward.cu:211-216)
    cosv = -(p_view * normal).sum(-1)
    front_ok = cosv != 0.0
    normal = np.where(cosv[:, None] > 0, normal, -normal).astype(f32)

    # compute_aabb (forward.cu:119-145), cutoff = 3
    cut = f32(9.0)
    d = cut * Tw[:, 0] ** 2 + cut * Tw[:, 1] ** 2 - Tw[:, 2] ** 2
    aabb_ok = d != 0.0
    dd = np.where(aabb_ok, d, f32(1.0))
    f = np.stack([cut / dd, cut / dd, -1.0 / dd], -1).astype(f32)
    px = (f * Tu * Tw).sum(-1)
    py = (f * Tv * Tw).sum(-1)
    h0x = px * px - (f * Tu * Tu).sum(-1)
    h0y = py * py - (f * Tv * Tv).sum(-1)
    ex = np.sqrt(np.maximum(f32(1e-4), h0x))
    ey = np.sqrt(np.maximum(f32(1e-4), h0y))
    radius = np.ceil(np.maximum(np.maximum(ex, ey), f32(3.0) * FILTER_SIZE))

    # circular getRect (auxiliary.h:71-81): integer truncation + grid clamp
    gx, gy = (W + BLOCK - 1) // BLOCK, (H + BLOCK - 1) // BLOCK
    r = radius.astype(np.int32)
    rect_min = np.stack(
        [
            np.minimum(gx, np.maximum(0, ((px - r) / BLOCK).astype(np.int32))),
            np.minimum(gy, np.maximum(0, ((py - r) / BLOCK).astype(np.int32))),
        ],
        -1,
    )
    rect_max = np.stack(
        [
            np.minimum(gx, np.maximum(0, ((px + r + BLOCK - 1) / BLOCK).astype(np.int32))),
            np.minimum(gy, np.maximum(0, ((py + r + BLOCK - 1) / BLOCK).astype(np.int32))),
        ],
        -1,
    )
    area = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])
    valid = in_front & front_ok & aabb_ok & (area > 0)
    return dict(
        hom=hom,
        normal_view=normal.astype(f32),
        xy=np.stack([px, py], -1).astype(f32),
        depth=p_view[:, 2].astype(f32),
        radius=np.where(valid, radius, 0).astype(f32),
        rect_min=rect_min,
        rect_max=rect_max,
        valid=valid,
    )


def tile_point_lists(prep, W, H):
    """Reference duplicateWithKeys + 64-bit radix sort + identifyTileRanges
    (rasterizer_impl.cu:70-138): per tile, gaussian indices sorted by
    (depth, emission order). Emission is original-index order, the radix
    sort is stable, and positive-float depth bits sort like floats."""
    gx = (W + BLOCK - 1) // BLOCK
    gy = (H + BLOCK - 1) // BLOCK
    lists = [[] for _ in range(gx * gy)]
    order = np.argsort(prep["depth"], kind="stable")
    for g in order:
        if not prep["valid"][g]:
            continue
        x0, y0 = prep["rect_min"][g]
        x1, y1 = prep["rect_max"][g]
        for ty in range(y0, y1):
            for tx in range(x0, x1):
                lists[ty * gx + tx].append(int(g))
    return lists, gx, gy


def ref_render_forward(prep, colors, opacity, refl, scope_mask, bg, W, H):
    """renderCUDA forward (forward.cu:258-489), RENDER_AXUTILITY on.

    Returns per-pixel maps: color [H,W,3] (bg composited), others [H,W,8]
    (DEPTH, ALPHA, NORMAL*3, MIDDEPTH, DISTORTION, MASK), refl_map, final_T,
    n_contrib, median_contrib (1-based, 0 none), M1, M2, gw [P], and
    `margins`: the minimum distances to the accept/termination/branch
    knife edges over all (pixel, instance) pairs — FP-order differences
    between this numpy oracle and the XLA implementation flip decisions
    only inside these margins, so test scenes require them to be wide."""
    lists, gx, gy = tile_point_lists(prep, W, H)
    P = opacity.shape[0]
    out_color = np.zeros((H, W, 3), f32)
    others = np.zeros((H, W, 8), f32)
    refl_map = np.zeros((H, W), f32)
    final_T = np.ones((H, W), f32)
    n_contrib = np.zeros((H, W), np.int32)
    med_contrib = np.zeros((H, W), np.int32)
    M1map = np.zeros((H, W), f32)
    M2map = np.zeros((H, W), f32)
    gw = np.zeros((P,), f32)
    margins = dict(alpha=np.inf, term=np.inf, branch=np.inf, median=np.inf)

    for ty in range(gy):
        for tx in range(gx):
            ids = lists[ty * gx + tx]
            y0, x0 = ty * BLOCK, tx * BLOCK
            h = min(BLOCK, H - y0)
            w = min(BLOCK, W - x0)
            pixy, pixx = np.meshgrid(
                np.arange(y0, y0 + h, dtype=f32),
                np.arange(x0, x0 + w, dtype=f32),
                indexing="ij",
            )
            T = np.ones((h, w), f32)
            done = np.zeros((h, w), bool)
            C = np.zeros((h, w, 3), f32)
            N = np.zeros((h, w, 3), f32)
            D = np.zeros((h, w), f32)
            M1 = np.zeros((h, w), f32)
            M2 = np.zeros((h, w), f32)
            dist = np.zeros((h, w), f32)
            med_d = np.zeros((h, w), f32)
            med_c = np.zeros((h, w), np.int32)
            rfl = np.zeros((h, w), f32)
            mask = np.zeros((h, w), f32)
            last = np.zeros((h, w), np.int32)
            for rank, g in enumerate(ids, start=1):  # contributor counter
                Tu, Tv, Tw = prep["hom"][g]
                xy = prep["xy"][g]
                # k = pix.x*Tw - Tu ; l = pix.y*Tw - Tv ; p = cross(k, l)
                k = pixx[..., None] * Tw - Tu
                l = pixy[..., None] * Tw - Tv
                p = np.cross(k, l).astype(f32)
                unstable = np.abs(p[..., 2]) < f32(1e-4)
                inv_pz = (1.0 / np.where(unstable, f32(1.0), p[..., 2])).astype(f32)
                sx = np.where(unstable, f32(0.0), p[..., 0] * inv_pz)
                sy = np.where(unstable, f32(0.0), p[..., 1] * inv_pz)
                rho3d = np.where(unstable, f32(1e8), sx * sx + sy * sy)
                dx = xy[0] - pixx
                dy = xy[1] - pixy
                rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
                rho = np.minimum(rho3d, rho2d)
                depth = sx * Tw[0] + sy * Tw[1] + Tw[2]
                power = f32(-0.5) * rho
                G = np.exp(power).astype(f32)
                alpha = np.minimum(f32(0.99), opacity[g] * G)
                ok = (
                    (depth >= NEAR_N)
                    & (power <= 0.0)
                    & (alpha >= f32(1.0 / 255.0))
                    & ~done
                )
                test_T = T * (1 - alpha)
                trigger = ok & (test_T < f32(1e-4))
                # knife-edge margins (where a ~1e-6-relative FP difference
                # could flip a decision); "relevant" pairs only: the alpha
                # accept matters where the ray is near the splat at all
                near = ~done & (depth >= NEAR_N) & (alpha > f32(1.0 / 1024.0))
                if near.any():
                    margins["alpha"] = min(
                        margins["alpha"],
                        float(np.abs(alpha - f32(1.0 / 255.0))[near].min()),
                    )
                if ok.any():
                    margins["term"] = min(
                        margins["term"],
                        float(np.abs(test_T - f32(1e-4))[ok].min()),
                    )
                contrib_pre = ok & ~trigger
                if contrib_pre.any():
                    rel = np.abs(rho3d - rho2d) / np.maximum(rho2d, f32(1e-3))
                    margins["branch"] = min(
                        margins["branch"], float(rel[contrib_pre].min())
                    )
                    margins["median"] = min(
                        margins["median"],
                        float(np.abs(T - f32(0.5))[contrib_pre].min()),
                    )
                done = done | trigger
                contrib = ok & ~trigger
                wgt = np.where(contrib, alpha * T, f32(0.0))
                # RENDER_AXUTILITY block (order matters: uses pre-update T/M1/M2)
                A = 1 - T
                m = FAR_N / (FAR_N - NEAR_N) * (1 - NEAR_N / np.maximum(depth, f32(1e-20)))
                dist += np.where(contrib, (m * m * A + M2 - 2 * m * M1) * wgt, f32(0.0))
                D += np.where(contrib, depth * wgt, 0.0)
                M1 += np.where(contrib, m * wgt, 0.0)
                M2 += np.where(contrib, m * m * wgt, 0.0)
                med_sel = contrib & (T > f32(0.5))
                med_d = np.where(med_sel, depth, med_d)
                med_c = np.where(med_sel, rank, med_c)
                N += np.where(contrib[..., None], prep["normal_view"][g] * wgt[..., None], 0.0)
                C += np.where(contrib[..., None], colors[g] * wgt[..., None], 0.0)
                rfl += np.where(contrib, refl[g] * wgt, 0.0)
                if scope_mask[g]:
                    mask = np.where(contrib, f32(1.0), mask)
                T = np.where(contrib, test_T, T)
                last = np.where(contrib, rank, last)
                wmax = wgt.max(initial=0.0)
                if wmax > gw[g]:
                    gw[g] = wmax
            ys, xs = slice(y0, y0 + h), slice(x0, x0 + w)
            final_T[ys, xs] = T
            n_contrib[ys, xs] = last
            med_contrib[ys, xs] = med_c
            M1map[ys, xs] = M1
            M2map[ys, xs] = M2
            out_color[ys, xs] = C + T[..., None] * np.asarray(bg, f32)
            refl_map[ys, xs] = rfl
            others[ys, xs, 0] = D
            others[ys, xs, 1] = 1 - T
            others[ys, xs, 2:5] = N
            others[ys, xs, 5] = med_d
            others[ys, xs, 6] = dist
            others[ys, xs, 7] = mask
    return dict(
        color=out_color, others=others, refl_map=refl_map, final_T=final_T,
        n_contrib=n_contrib, median_contrib=med_contrib, M1=M1map, M2=M2map,
        gw=gw, margins=margins,
    )


def ref_render_backward(
    prep, colors, opacity, refl, bg, W, H, fwd,
    dL_dpixels, dL_dothers, dL_drefl_map,
):
    """renderCUDA backward (backward.cu:143-470), transcribed with the
    reference's own guards: |p.z| < 1e-6 (not the forward's 1e-4),
    DETACH_WEIGHT=0, the ungated min(0.99, alpha) opacity path, and the
    bg term added after the *= T.

    Returns dL_dtransMat [P,3,3], dL_dmean2D [P,2] (the rho2d-branch
    accumulation, pre-overwrite), dL_dnormal [P,3], dL_dopacity [P],
    dL_dcolors [P,3], dL_drefl [P]."""
    lists, gx, gy = tile_point_lists(prep, W, H)
    P = opacity.shape[0]
    dT = np.zeros((P, 3, 3), f32)
    dmean2d = np.zeros((P, 2), f32)
    dnormal = np.zeros((P, 3), f32)
    dopa = np.zeros((P,), f32)
    dcol = np.zeros((P, 3), f32)
    drefl = np.zeros((P,), f32)
    bg = np.asarray(bg, f32)

    for ty in range(gy):
        for tx in range(gx):
            ids = lists[ty * gx + tx]
            if not ids:
                continue
            y0, x0 = ty * BLOCK, tx * BLOCK
            h = min(BLOCK, H - y0)
            w = min(BLOCK, W - x0)
            ys, xs = slice(y0, y0 + h), slice(x0, x0 + w)
            pixy, pixx = np.meshgrid(
                np.arange(y0, y0 + h, dtype=f32),
                np.arange(x0, x0 + w, dtype=f32),
                indexing="ij",
            )
            T_final = fwd["final_T"][ys, xs]
            T = T_final.copy()
            last_contributor = fwd["n_contrib"][ys, xs]
            median_contributor = fwd["median_contrib"][ys, xs]
            final_D = fwd["M1"][ys, xs]
            final_D2 = fwd["M2"][ys, xs]
            final_A = 1 - T_final

            dL_dpixel = dL_dpixels[ys, xs]  # [h,w,3]
            dL_ddepth = dL_dothers[ys, xs, 0]
            dL_daccum = dL_dothers[ys, xs, 1]
            dL_dnormal2D = dL_dothers[ys, xs, 2:5]
            dL_dmedian_depth = dL_dothers[ys, xs, 5]
            dL_dreg = dL_dothers[ys, xs, 6]
            dL_drefl_s = dL_drefl_map[ys, xs]

            accum_rec = np.zeros((h, w, 3), f32)
            accum_refl_rec = np.zeros((h, w), f32)
            accum_depth_rec = np.zeros((h, w), f32)
            accum_alpha_rec = np.zeros((h, w), f32)
            accum_normal_rec = np.zeros((h, w, 3), f32)
            last_alpha = np.zeros((h, w), f32)
            last_color = np.zeros((h, w, 3), f32)
            last_refl = np.zeros((h, w), f32)
            last_depth = np.zeros((h, w), f32)
            last_normal = np.zeros((h, w, 3), f32)
            last_dL_dT = np.zeros((h, w), f32)
            bg_dot_dpixel = (bg * dL_dpixel).sum(-1)

            for rank in range(len(ids), 0, -1):  # back-to-front, 1-based
                g = ids[rank - 1]
                # contributor (0-based) = rank-1; skip if >= last_contributor
                active = (rank - 1) < last_contributor
                Tu, Tv, Tw = prep["hom"][g]
                xy = prep["xy"][g]
                k = pixx[..., None] * Tw - Tu
                l = pixy[..., None] * Tw - Tv
                p = np.cross(k, l).astype(f32)
                unstable = np.abs(p[..., 2]) < f32(1e-6)  # backward.cu:306
                inv_pz = (1.0 / np.where(unstable, f32(1.0), p[..., 2])).astype(f32)
                sx = np.where(unstable, f32(0.0), p[..., 0] * inv_pz)
                sy = np.where(unstable, f32(0.0), p[..., 1] * inv_pz)
                rho3d = np.where(unstable, f32(1e8), sx * sx + sy * sy)
                dxx = xy[0] - pixx
                dyy = xy[1] - pixy
                rho2d = FILTER_INV_SQUARE * (dxx * dxx + dyy * dyy)
                rho = np.minimum(rho3d, rho2d)
                c_d = sx * Tw[0] + sy * Tw[1] + Tw[2]
                power = f32(-0.5) * rho
                G = np.exp(power).astype(f32)
                alpha = np.minimum(f32(0.99), opacity[g] * G)
                active = (
                    active & (c_d >= NEAR_N) & (power <= 0.0)
                    & (alpha >= f32(1.0 / 255.0))
                )
                if not active.any():
                    continue
                T = np.where(active, T / (1 - alpha), T)
                wgt = alpha * T

                dL_dalpha = np.zeros((h, w), f32)
                # colors
                for ch in range(3):
                    accum_rec[..., ch] = np.where(
                        active,
                        last_alpha * last_color[..., ch]
                        + (1 - last_alpha) * accum_rec[..., ch],
                        accum_rec[..., ch],
                    )
                    last_color[..., ch] = np.where(
                        active, colors[g, ch], last_color[..., ch]
                    )
                    dL_dalpha += (colors[g, ch] - accum_rec[..., ch]) * dL_dpixel[..., ch]
                    dcol[g, ch] += np.where(active, wgt * dL_dpixel[..., ch], 0.0).sum()
                # refl strength
                accum_refl_rec = np.where(
                    active,
                    last_alpha * last_refl + (1 - last_alpha) * accum_refl_rec,
                    accum_refl_rec,
                )
                last_refl = np.where(active, refl[g], last_refl)
                dL_dalpha += (refl[g] - accum_refl_rec) * dL_drefl_s
                drefl[g] += np.where(active, wgt * dL_drefl_s, 0.0).sum()

                dL_dz = np.zeros((h, w), f32)
                # RENDER_AXUTILITY
                m_d = FAR_N / (FAR_N - NEAR_N) * (1 - NEAR_N / np.maximum(c_d, f32(1e-20)))
                dmd_dd = (FAR_N * NEAR_N) / ((FAR_N - NEAR_N) * c_d * c_d)
                is_med = (rank - 1) == (median_contributor - 1)
                dL_dz += np.where(is_med, dL_dmedian_depth, 0.0)
                dL_dweight = (
                    final_D2 + m_d * m_d * final_A - 2 * m_d * final_D
                ) * dL_dreg  # DETACH_WEIGHT == 0
                dL_dalpha += dL_dweight - last_dL_dT
                last_dL_dT = np.where(
                    active, dL_dweight * alpha + (1 - alpha) * last_dL_dT,
                    last_dL_dT,
                )
                dL_dmd = 2.0 * (T * alpha) * (m_d * final_A - final_D) * dL_dreg
                dL_dz += dL_dmd * dmd_dd
                # depth / alpha-accum / normal recurrences
                accum_depth_rec = np.where(
                    active,
                    last_alpha * last_depth + (1 - last_alpha) * accum_depth_rec,
                    accum_depth_rec,
                )
                last_depth = np.where(active, c_d, last_depth)
                dL_dalpha += (c_d - accum_depth_rec) * dL_ddepth
                accum_alpha_rec = np.where(
                    active,
                    last_alpha * 1.0 + (1 - last_alpha) * accum_alpha_rec,
                    accum_alpha_rec,
                )
                dL_dalpha += (1 - accum_alpha_rec) * dL_daccum
                for ch in range(3):
                    accum_normal_rec[..., ch] = np.where(
                        active,
                        last_alpha * last_normal[..., ch]
                        + (1 - last_alpha) * accum_normal_rec[..., ch],
                        accum_normal_rec[..., ch],
                    )
                    last_normal[..., ch] = np.where(
                        active, prep["normal_view"][g, ch], last_normal[..., ch]
                    )
                    dL_dalpha += (
                        prep["normal_view"][g, ch] - accum_normal_rec[..., ch]
                    ) * dL_dnormal2D[..., ch]
                    dnormal[g, ch] += np.where(
                        active, alpha * T * dL_dnormal2D[..., ch], 0.0
                    ).sum()

                dL_dalpha = dL_dalpha * T
                last_alpha = np.where(active, alpha, last_alpha)
                # bg term: added AFTER the *= T (backward.cu:419-424)
                dL_dalpha += (-T_final / (1 - alpha)) * bg_dot_dpixel
                dL_dalpha = np.where(active, dL_dalpha, 0.0)

                dL_dG = opacity[g] * dL_dalpha
                dL_dz += alpha * T * dL_ddepth
                dL_dz = np.where(active, dL_dz, 0.0)

                use3 = active & (rho3d <= rho2d)
                # rho3d branch (backward.cu:430-460)
                dL_dsx = dL_dG * -G * sx + dL_dz * Tw[0]
                dL_dsy = dL_dG * -G * sy + dL_dz * Tw[1]
                dsx_pz = dL_dsx * inv_pz
                dsy_pz = dL_dsy * inv_pz
                dL_dp = np.stack(
                    [dsx_pz, dsy_pz, -(dsx_pz * sx + dsy_pz * sy)], -1
                )
                dL_dk = np.cross(l, dL_dp).astype(f32)
                dL_dl = np.cross(dL_dp, k).astype(f32)
                m3 = use3[..., None]
                dT[g, 0] += np.where(m3, -dL_dk, 0.0).sum((0, 1))
                dT[g, 1] += np.where(m3, -dL_dl, 0.0).sum((0, 1))
                dT[g, 2] += np.where(
                    m3,
                    pixx[..., None] * dL_dk
                    + pixy[..., None] * dL_dl
                    + dL_dz[..., None] * np.stack([sx, sy, np.ones_like(sx)], -1),
                    0.0,
                ).sum((0, 1))
                # rho2d branch (backward.cu:461-471)
                use2 = active & ~(rho3d <= rho2d)
                dG_ddelx = -G * FILTER_INV_SQUARE * dxx
                dG_ddely = -G * FILTER_INV_SQUARE * dyy
                dmean2d[g, 0] += np.where(use2, dL_dG * dG_ddelx, 0.0).sum()
                dmean2d[g, 1] += np.where(use2, dL_dG * dG_ddely, 0.0).sum()
                dT[g, 2, 0] += np.where(use2, sx * dL_dz, 0.0).sum()
                dT[g, 2, 1] += np.where(use2, sy * dL_dz, 0.0).sum()
                dT[g, 2, 2] += np.where(use2, dL_dz, 0.0).sum()

                dopa[g] += np.where(active, G * dL_dalpha, 0.0).sum()
    return dict(
        dT=dT, dmean2d=dmean2d, dnormal=dnormal, dopa=dopa, dcol=dcol,
        drefl=drefl,
    )


def ref_densify_grad(prep, dT, W, H):
    """The densification-grad overwrite (backward.cu:656-659):
    dL_dmean2D.x = dL_dtransMat[2].x(z-entry) * T[2][2] * 0.5 * W."""
    depth = prep["hom"][:, 2, 2]
    return np.stack(
        [
            dT[:, 0, 2] * depth * f32(0.5) * f32(W),
            dT[:, 1, 2] * depth * f32(0.5) * f32(H),
        ],
        -1,
    ).astype(dT.dtype)
