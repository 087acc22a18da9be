"""Learned cubemap environment encoder, pure-JAX (gather-based; no atomics).

Capability parity with the reference CUDA module
(submodules/cubemapencoder/src/cubemapencoder.cu + cubemap_encoder.py):
- dominant-axis face selection with the exact sign/flip table (:147-187),
- seamless bilinear filtering: off-face taps remapped to the adjacent face via
  the LEFT_TOP_AS_ORIGIN EdgeTable (:66-145), corner case averaging 3 texels
  (:235-240,326-331),
- zero-direction inputs return a learned fail value with gradient (:311-316),
- direction gradients (grad_inputs) flow via autodiff of the UV math — the
  piecewise-smooth derivative matches Compute_Cubemap_UV_Backward (:265-292).

The backward is pure JAX autodiff: texel grads become deterministic
scatter-adds (the CUDA version needs atomicAdd), direction/fail grads come for
free. Texture layout [6, C, L, L] (face, channel, y, x), matching the
reference checkpoint format so .map files interop.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class CubemapParams(NamedTuple):
    texture: jnp.ndarray  # [6, C, L, L]
    fail_value: jnp.ndarray  # [C]

    @property
    def resolution(self) -> int:
        return self.texture.shape[-1]

    @property
    def channels(self) -> int:
        return self.texture.shape[1]


def init_cubemap(key, channels: int = 3, resolution: int = 128) -> CubemapParams:
    """U(-0.5, 0.5) texture init, zero fail value (cubemap_encoder.py:93-96)."""
    tex = jax.random.uniform(
        key, (6, channels, resolution, resolution), minval=-0.5, maxval=0.5
    )
    return CubemapParams(texture=tex, fail_value=jnp.zeros((channels,)))


# ---------------------------------------------------------------------------
# EdgeTable (LEFT_TOP_AS_ORIGIN, cubemapencoder.cu:66-106) encoded as affine
# maps: out = ax*x + ay*y + c*(L-1), per (face, flag in {1,2,4,8}).
# flag: 1 = u < 0.5 (left), 2 = u >= L-0.5 (right), 4 = v < 0.5, 8 = v >= L-0.5
_EDGE_FACE = np.array(
    [
        [4, 5, 3, 2],
        [5, 4, 3, 2],
        [1, 0, 4, 5],
        [1, 0, 4, 5],
        [1, 0, 3, 2],
        [0, 1, 3, 2],
    ],
    dtype=np.int32,
)
# (ax, ay, c) for output x
_EDGE_X = np.array(
    [
        [(0, 0, 1), (0, 0, 0), (0, 0, 1), (0, 0, 1)],
        [(0, 0, 1), (0, 0, 0), (0, 0, 0), (0, 0, 0)],
        [(0, -1, 1), (0, 1, 0), (1, 0, 0), (-1, 0, 1)],
        [(0, -1, 1), (0, 1, 0), (1, 0, 0), (-1, 0, 1)],
        [(0, 0, 1), (0, 0, 0), (1, 0, 0), (1, 0, 0)],
        [(0, 0, 1), (0, 0, 0), (-1, 0, 1), (-1, 0, 1)],
    ],
    dtype=np.int32,
)
# (ax, ay, c) for output y
_EDGE_Y = np.array(
    [
        [(0, 1, 0), (0, 1, 0), (1, 0, 0), (1, 0, 0)],
        [(0, 1, 0), (0, 1, 0), (-1, 0, 1), (-1, 0, 1)],
        [(0, 0, 1), (0, 0, 1), (0, 0, 1), (0, 0, 1)],
        [(0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0)],
        [(0, 1, 0), (0, 1, 0), (0, 0, 0), (0, 0, 0)],
        [(0, 1, 0), (0, 1, 0), (0, 0, 1), (0, 0, 1)],
    ],
    dtype=np.int32,
)


def _edge_remap(face, x, y, flag_idx, L):
    """Vectorized EdgeTable: (face,x,y)[B] + flag index [B] -> remapped."""
    f = jnp.asarray(_EDGE_FACE)[face, flag_idx]
    cx = jnp.asarray(_EDGE_X)[face, flag_idx]  # [B,3]
    cy = jnp.asarray(_EDGE_Y)[face, flag_idx]
    nx = cx[..., 0] * x + cx[..., 1] * y + cx[..., 2] * (L - 1)
    ny = cy[..., 0] * x + cy[..., 1] * y + cy[..., 2] * (L - 1)
    return f, nx, ny


def _face_uv(dirs: jnp.ndarray):
    """Dominant-axis face selection + per-face UV (cubemapencoder.cu:147-187).
    dirs: [B,3] -> (face [B] int32, u [B], v [B]) with u,v in [-1,1]."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax_, ay_, az_ = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    dim1 = jnp.where(ay_ > ax_, 1, 0)
    maxv1 = jnp.maximum(ax_, ay_)
    dim = jnp.where(az_ > maxv1, 2, dim1)

    face = jnp.where(
        dim == 0,
        jnp.where(x >= 0, 0, 1),
        jnp.where(dim == 1, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)

    # Single division by the dominant component (grad-safe: no inf from the
    # non-dominant branches). Per-face numerators fold in the sign flips:
    #   f0: u=-z/x v=-y/x | f1: u=-z/x v= y/x | f2: u= x/y v= z/y
    #   f3: u=-x/y v=-z/y | f4: u= x/z v=-y/z | f5: u= x/z v= y/z
    denom = jnp.where(dim == 0, x, jnp.where(dim == 1, y, z))
    denom = jnp.where(denom == 0.0, 1.0, denom)  # only the fail path hits 0
    u_num = jnp.where(
        dim == 0, -z, jnp.where(face == 3, -x, x)
    )
    v_num = jnp.where(
        face == 0,
        -y,
        jnp.where(
            face == 1,
            y,
            jnp.where(
                face == 2, z, jnp.where(face == 3, -z, jnp.where(face == 4, -y, y))
            ),
        ),
    )
    u = u_num / denom
    v = v_num / denom
    return face, u, v


@jax.custom_vjp
def _flat_gather(tex_flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """tex_flat [M,C], idx [...] -> [...,C], with a sort+segmented-scan
    transpose instead of XLA's scatter-add (TPU scatters at millions of rows
    are ~10x slower than sort+scan; cf. kernels.tile_blend.segment_sum_sorted)."""
    return tex_flat[idx]


def _flat_gather_fwd(tex_flat, idx):
    return tex_flat[idx], (idx, tex_flat.shape[0])


def _flat_gather_bwd(res, d_out):
    from tpu_splat.kernels.segment_reduce import segment_sum_ranges

    idx, M = res
    flat_idx = idx.reshape(-1).astype(jnp.int32)
    rows = d_out.reshape(-1, d_out.shape[-1])
    n = flat_idx.shape[0]
    idx_sorted, perm = jax.lax.sort(
        (flat_idx, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    rows_T = rows[perm].T  # [C, n] grouped by texel
    # binary-search bounds: M (texel count) queries are few relative to n,
    # so the log2(n) gather rounds beat method="sort"'s two (n+M) sorts
    texel_ids = jnp.arange(M, dtype=jnp.int32)
    start = jnp.searchsorted(idx_sorted, texel_ids, side="left").astype(jnp.int32)
    end = jnp.searchsorted(idx_sorted, texel_ids, side="right").astype(jnp.int32)
    d_tex = segment_sum_ranges(rows_T, start, end).T
    return d_tex, None


_flat_gather.defvjp(_flat_gather_fwd, _flat_gather_bwd)


def _index_add_sort(idx_flat: jnp.ndarray, rows: jnp.ndarray, M: int) -> jnp.ndarray:
    """Deterministic index-add fallback: sort taps by texel + segment-sum.
    idx_flat [N] i32, rows [N, C] -> [M, C]."""
    from tpu_splat.kernels.segment_reduce import segment_sum_ranges

    n = idx_flat.shape[0]
    idx_sorted, perm = jax.lax.sort(
        (idx_flat, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    rows_T = rows[perm].T
    texel_ids = jnp.arange(M, dtype=jnp.int32)
    start = jnp.searchsorted(idx_sorted, texel_ids, side="left").astype(jnp.int32)
    end = jnp.searchsorted(idx_sorted, texel_ids, side="right").astype(jnp.int32)
    return segment_sum_ranges(rows_T, start, end).T


# ---------------------------------------------------------------------------
# Unified 4-tap sample: every bilinear/seamless lookup (interior, edge, and
# 3-texel corner average) is out = sum_t w_t(kx, ky) * tex_flat[idx_t]. The
# custom VJP routes BOTH directions through MXU one-hot matmul kernels
# (kernels/cubemap_accum.py): the forward emits the sample plus the
# tap-weight derivative blends gx/gy (-> kx/ky -> direction gradients, the
# path that drives normals in deferred reflection), and the texel gradient
# accumulates via the tap-accumulation kernel — no TPU row gathers, no
# sorts, deterministic.


def _w4_terms(kx, ky, vert):
    """Tap weights and their kx/ky derivatives, with the corner ("vertex")
    case's 3-texel average folded in (cubemapencoder.cu:235-240)."""
    a, b = 1.0 - kx, 1.0 - ky
    t = vert / 3.0
    w4 = jnp.stack([
        b * a + t * (ky * kx),
        b * kx + t * (ky * kx),
        ky * a + t * (ky * kx),
        (1.0 - vert) * ky * kx,
    ])
    wx4 = jnp.stack([
        -b + t * ky,
        b + t * ky,
        -ky + t * ky,
        (1.0 - vert) * ky,
    ])
    wy4 = jnp.stack([
        -a + t * kx,
        -kx + t * kx,
        a + t * kx,
        (1.0 - vert) * kx,
    ])
    return w4, wx4, wy4


def _kernel_ok(M: int, C: int) -> bool:
    from tpu_splat.kernels.cubemap_accum import supported_resolution

    L = int(round((M / 6) ** 0.5))
    return 6 * L * L == M and supported_resolution(L, C)


# Forward sampling stays on XLA row gathers: measured on a v5e they beat a
# one-hot row-mix matmul kernel in both direction regimes (23 ms on smooth
# reflection maps where texel indices are spatially local, 114 ms on
# adversarially random dirs, vs ~193 ms for the kernel) — the MXU
# tap-accumulation kernel keeps only the BACKWARD (texel-gradient) side.


def _sample4_impl(tex_flat, kx, ky, vert, idx4, sep_i, sep_m, quad=False):
    w4, wx4, wy4 = _w4_terms(kx, ky, vert)
    if quad:
        # QUAD-TEXTURE forward: the 4 bilinear taps are always the 2x2
        # block at (x0, y0) on the padded face (xp1 = xp0+1, yp1 = yp0+1 by
        # construction in the seamless path), so gather them as ONE
        # [B]-row gather of 4C-wide rows from an overlapping-2x2 re-layout
        # of the texture — XLA row gathers are per-row-latency bound, and
        # this takes 1/4 the rows of the [4, B] tap gather (~15 ms -> ~6 ms
        # env fwd at 1080p on v5e). Exact: same taps, same weights.
        M, C = tex_flat.shape
        L2 = int(round((M / 6) ** 0.5))
        assert 6 * L2 * L2 == M
        tex2 = tex_flat.reshape(6, L2, L2, C)
        quad_t = jnp.concatenate(
            [
                tex2[:, :-1, :-1],
                tex2[:, :-1, 1:],
                tex2[:, 1:, :-1],
                tex2[:, 1:, 1:],
            ],
            axis=-1,
        ).reshape(6 * (L2 - 1) * (L2 - 1), 4 * C)
        r0, xp0 = sep_i[0], sep_i[2]
        f = r0 // L2
        y0 = r0 - f * L2
        v4 = quad_t[(f * (L2 - 1) + y0) * (L2 - 1) + xp0]  # [..., 4C]
        taps = [v4[..., t * C : (t + 1) * C] for t in range(4)]
        out = sum(w4[t][..., None] * taps[t] for t in range(4))
        gx = sum(wx4[t][..., None] * taps[t] for t in range(4))
        gy = sum(wy4[t][..., None] * taps[t] for t in range(4))
        return out, gx, gy
    vals = tex_flat[idx4]  # [4, ..., C]
    out = jnp.sum(w4[..., None] * vals, axis=0)
    gx = jnp.sum(wx4[..., None] * vals, axis=0)
    gy = jnp.sum(wy4[..., None] * vals, axis=0)
    return out, gx, gy


@jax.custom_vjp
def _sample4(tex_flat, kx, ky, vert, idx4, sep_i, sep_m):
    out, _gx, _gy = _sample4_impl(tex_flat, kx, ky, vert, idx4, sep_i, sep_m)
    return out


def _sample4_fwd(tex_flat, kx, ky, vert, idx4, sep_i, sep_m):
    out, gx, gy = _sample4_impl(tex_flat, kx, ky, vert, idx4, sep_i, sep_m)
    return out, (gx, gy, kx, ky, vert, idx4, sep_i, sep_m, tex_flat.shape[0])


def _tileorder(shape):
    """Flattener: [H, W] image order -> 16x32 tile-major order, so that
    face-edge pixels (which lie on smooth curves in reflection maps) cluster
    into few kernel blocks instead of touching every row-major strip. The
    tap accumulation is order-independent, so no inverse is needed.
    Pure reshapes/transposes — no gathers."""
    if len(shape) == 2 and shape[0] % 16 == 0 and shape[1] % 32 == 0:
        H, W = shape
        ty, tx = H // 16, W // 32

        def flat(a):  # [..., H, W] -> [..., H*W] tile-major
            a = a.reshape(a.shape[:-2] + (ty, 16, tx, 32))
            a = jnp.swapaxes(a, -3, -2)
            return a.reshape(a.shape[:-4] + (H * W,))

        return flat
    n = 1
    for d in shape:
        n *= d

    def flat1(a):
        return a.reshape(a.shape[: a.ndim - len(shape)] + (n,))

    return flat1


def _sample4_bwd(res, g):
    from tpu_splat.kernels.cubemap_accum import cubemap_tap_accumulate

    gx, gy, kx, ky, vert, idx4, sep_i, sep_m, M = res
    C = g.shape[-1]
    d_kx = jnp.sum(gx * g, axis=-1)
    d_ky = jnp.sum(gy * g, axis=-1)

    w4, _, _ = _w4_terms(kx, ky, vert)
    if _kernel_ok(M, C):
        L = int(round((M / 6) ** 0.5))
        flat = _tileorder(kx.shape)
        gN = jnp.moveaxis(flat(jnp.moveaxis(g, -1, 0)), 0, -1)
        idxN = flat(idx4)
        w4N = flat(w4)
        sm = flat(sep_m)
        d_tex = cubemap_tap_accumulate(
            gN,
            (idxN // L).astype(jnp.int32),
            (idxN % L).astype(jnp.int32),
            w4N * (1.0 - sm)[None],
            flat(sep_i[0]), flat(sep_i[1]),
            flat(sep_i[2]), flat(sep_i[3]),
            flat(ky), flat(kx), sm,
            L=L, C=C,
        )
    else:
        gN = g.reshape(-1, C)
        N = gN.shape[0]
        idxN = idx4.reshape(4, N)
        w4N = w4.reshape(4, N)
        rows = (w4N[..., None] * gN[None]).reshape(4 * N, C)
        d_tex = _index_add_sort(idxN.reshape(4 * N), rows, M)
    return d_tex, d_kx, d_ky, jnp.zeros_like(vert), None, None, jnp.zeros_like(sep_m)


_sample4.defvjp(_sample4_fwd, _sample4_bwd)


@jax.custom_vjp
def _sample4_quad(tex_flat, kx, ky, vert, idx4, sep_i, sep_m):
    """_sample4 with the quad-texture forward gather (see _sample4_impl
    quad=True); backward (tap accumulation + direction grads) is shared."""
    out, _gx, _gy = _sample4_impl(
        tex_flat, kx, ky, vert, idx4, sep_i, sep_m, quad=True
    )
    return out


def _sample4_quad_fwd(tex_flat, kx, ky, vert, idx4, sep_i, sep_m):
    out, gx, gy = _sample4_impl(
        tex_flat, kx, ky, vert, idx4, sep_i, sep_m, quad=True
    )
    return out, (gx, gy, kx, ky, vert, idx4, sep_i, sep_m, tex_flat.shape[0])


_sample4_quad.defvjp(_sample4_quad_fwd, _sample4_bwd)


def _pad_faces(texture: jnp.ndarray) -> jnp.ndarray:
    """[6, C, L, L] -> [6, C, L+2, L+2] with each 1-texel border filled from
    the adjacent face via the EdgeTable, and corner pads set to the MEAN of
    their 3 valid neighbors.

    This bakes the whole seamless-filter special-casing into data: plain
    bilinear on the padded face with x0p = floor(su-0.5)+1 is EXACTLY the
    reference seamless filter —
    - at a low edge the reference flips kx to 0.5-su and routes weight b*kx
      to the EdgeTable neighbor (cubemapencoder.cu:221-233); standard
      bilinear on the padded window [-1, 0] gives the pad texel weight
      (1 - (su+0.5)) = 0.5-su, the same number;
    - at a corner the reference averages the 3 valid texels for the missing
      4th tap (:235-240); with the corner pad := mean of those 3, standard
      2x2 weights reproduce the identical expansion.
    Differentiable end-to-end: pads are gathers/means of source texels, so
    texel gradients fold back through this op's transpose automatically.
    """
    L = texture.shape[-1]
    y_idx = np.arange(L, dtype=np.int32)
    strips = {}
    # per face: (flag column in _EDGE_*: 0=left(u<0.5), 1=right, 2=top(v<0.5), 3=bottom)
    # boundary texel coordinates the EdgeTable is keyed on
    specs = {
        0: (np.zeros(L, np.int32), y_idx),  # left   edge -> x=0 column
        1: (np.full(L, L - 1, np.int32), y_idx),  # right  -> x=L-1 column
        2: (y_idx, np.zeros(L, np.int32)),  # top    -> y=0 row (x varies)
        3: (y_idx, np.full(L, L - 1, np.int32)),  # bottom -> y=L-1 row
    }
    pads = []
    for f in range(6):
        face_pads = {}
        for flag, (xs, ys) in specs.items():
            nf, nx, ny = _edge_remap(
                np.full(L, f, np.int32), xs, ys, np.full(L, flag, np.int32), L
            )
            face_pads[flag] = texture[nf, :, ny, nx]  # [L, C]
        pads.append(face_pads)

    Lp = L + 2
    P = jnp.zeros(texture.shape[:2] + (Lp, Lp), texture.dtype)
    P = P.at[:, :, 1:-1, 1:-1].set(texture)
    for f in range(6):
        P = P.at[f, :, 1:-1, 0].set(pads[f][0].T)  # left column
        P = P.at[f, :, 1:-1, Lp - 1].set(pads[f][1].T)
        P = P.at[f, :, 0, 1:-1].set(pads[f][2].T)  # top row
        P = P.at[f, :, Lp - 1, 1:-1].set(pads[f][3].T)
        # corners: mean of the 3 valid neighbors (in-face corner + its two
        # edge pads), matching the reference vertex average
        for (cy, cx), (iy, ix), (e1, i1), (e2, i2) in (
            ((0, 0), (0, 0), (0, 0), (2, 0)),
            ((0, Lp - 1), (0, L - 1), (1, 0), (2, L - 1)),
            ((Lp - 1, 0), (L - 1, 0), (0, L - 1), (3, 0)),
            ((Lp - 1, Lp - 1), (L - 1, L - 1), (1, L - 1), (3, L - 1)),
        ):
            corner = (
                texture[f, :, iy, ix]
                + pads[f][e1][i1]
                + pads[f][e2][i2]
            ) / 3.0
            P = P.at[f, :, cy, cx].set(corner)
    return P


def _tex_gather(texture: jnp.ndarray, face, x, y):
    """texture [6,C,L,L]; (face,x,y) [B] -> [B,C]."""
    L = texture.shape[-1]
    tex_flat = texture.transpose(0, 2, 3, 1).reshape(-1, texture.shape[1])
    out = _flat_gather(tex_flat, (face * L + y) * L + x)
    return out


def _tex_gather4(texture: jnp.ndarray, taps):
    """Gather all 4 bilinear taps with ONE _flat_gather call so the texel
    gradient pays ONE sort over 4B indices instead of 4 sorts over B
    (~3x cheaper env backward at 1080p). taps: 4 of (face, x, y) [...].
    -> 4 of [..., C], stacked on a LEADING axis internally (a trailing
    stack would tile-pad 4 -> 128 on TPU)."""
    L = texture.shape[-1]
    tex_flat = texture.transpose(0, 2, 3, 1).reshape(-1, texture.shape[1])
    idx = jnp.stack([(f * L + y) * L + x for f, x, y in taps], axis=0)
    out = _flat_gather(tex_flat, idx)  # [4, ..., C]
    return out[0], out[1], out[2], out[3]


def sample_cubemap(
    params: CubemapParams, dirs: jnp.ndarray, interp: str = "seamless"
) -> jnp.ndarray:
    """dirs [..., 3] -> colors [..., C]. Differentiable in texture, fail value
    AND direction (the path that drives normals in deferred reflection).

    Shape-polymorphic: leading dims are preserved through every op (do NOT
    flatten an [H,W,3] map to [B,3] — [B,1] column temporaries tile-pad 128x
    on TPU and cost gigabytes at 1080p)."""
    L = params.resolution

    fail = jnp.all(dirs == 0.0, axis=-1)  # [...]
    face, u, v = _face_uv(dirs)
    v = -v  # LEFT_TOP_AS_ORIGIN (cubemapencoder.cu:202-204)
    su = (u * 0.5 + 0.5) * L
    sv = (v * 0.5 + 0.5) * L

    if interp == "nearest":
        ix = jnp.clip(sv.astype(jnp.int32), 0, L - 1)
        # note: reference casts with int() toward zero; su>=0 here after clamp
        ux = jnp.clip(su.astype(jnp.int32), 0, L - 1)
        out = _tex_gather(params.texture, face, ux, ix)
    else:
        x0f = jnp.floor(su - 0.5)
        y0f = jnp.floor(sv - 0.5)
        kx = su - x0f - 0.5
        ky = sv - y0f - 0.5
        x0 = jnp.clip(x0f.astype(jnp.int32), 0, L - 1)
        x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, L - 1)
        y0 = jnp.clip(y0f.astype(jnp.int32), 0, L - 1)
        y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, L - 1)

        if interp == "bilinear":
            t00 = (face, x0, y0)
            t01 = (face, x1, y0)
            t10 = (face, x0, y1)
            t11 = (face, x1, y1)
            is_vertex = jnp.zeros(su.shape, bool)
            sep_m = jnp.ones(su.shape, jnp.float32)
            flat = lambda t: (t[0] * L + t[2]) * L + t[1]
            idx4 = jnp.stack([flat(t00), flat(t01), flat(t10), flat(t11)])
            sep_i = jnp.stack(
                [face * L + y0, face * L + y1, x0, x1]
            ).astype(jnp.int32)
            tex_flat = params.texture.transpose(0, 2, 3, 1).reshape(
                -1, params.texture.shape[1]
            )
            out = _sample4(
                tex_flat, kx, ky, is_vertex.astype(jnp.float32), idx4, sep_i,
                jax.lax.stop_gradient(sep_m),
            )
        elif interp == "seamless":
            # Seamless filtering as DATA, not control flow: plain bilinear on
            # the EdgeTable-padded faces is exactly the reference's seamless
            # filter incl. the low-edge weight flips and 3-texel corner
            # average (see _pad_faces). Every pixel takes the separable fast
            # path — no per-pixel seam cases, no EdgeTable gathers at
            # sample time.
            Lp = L + 2
            padded = _pad_faces(params.texture)
            xp0 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, Lp - 2)
            yp0 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, Lp - 2)
            xp1 = xp0 + 1
            yp1 = yp0 + 1
            r0 = face * Lp + yp0
            r1 = face * Lp + yp1
            idx4 = jnp.stack(
                [r0 * Lp + xp0, r0 * Lp + xp1, r1 * Lp + xp0, r1 * Lp + xp1]
            )
            sep_i = jnp.stack([r0, r1, xp0, xp1]).astype(jnp.int32)
            sep_m = jnp.ones(su.shape, jnp.float32)
            tex_flat = padded.transpose(0, 2, 3, 1).reshape(
                -1, padded.shape[1]
            )
            out = _sample4_quad(
                tex_flat, kx, ky, jnp.zeros(su.shape, jnp.float32), idx4,
                sep_i, jax.lax.stop_gradient(sep_m),
            )
        else:
            raise ValueError(f"unknown interp {interp!r}")

    out = jnp.where(fail[..., None], params.fail_value, out)
    return out


def resize_cubemap(params: CubemapParams, new_resolution: int) -> CubemapParams:
    """Bicubic resize (reference resize(), cubemap_encoder.py:102-105;
    used by double_env_map, scene/gaussian_model.py:375-393)."""
    tex = jax.image.resize(
        params.texture,
        (6, params.channels, new_resolution, new_resolution),
        method="cubic",
    )
    return CubemapParams(texture=tex, fail_value=params.fail_value)


def sharpen_cubemap(
    params: CubemapParams, activation=jax.nn.sigmoid, inverse_activation=None, factor: float = 2.0
) -> CubemapParams:
    """Sharpen in activated space (reference filter(), cubemap_encoder.py:107-113:
    torchvision adjust_sharpness with border pixels preserved, then clamp to
    [1e-3, 1-1e-3] before inverting the activation)."""
    if inverse_activation is None:
        inverse_activation = lambda x: jnp.log(x / (1.0 - x))
    img = activation(params.texture)  # [6,C,L,L]
    kernel = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    k4 = kernel[None, None]  # [1,1,3,3]
    f, c, l, _ = img.shape
    flat = img.reshape(f * c, 1, l, l)
    blurred = jax.lax.conv_general_dilated(
        flat, k4, window_strides=(1, 1), padding="SAME"
    ).reshape(f, c, l, l)
    sharp = jnp.clip(factor * img + (1 - factor) * blurred, 0.0, 1.0)
    # torchvision keeps the 1px border unchanged
    out = img.at[..., 1:-1, 1:-1].set(sharp[..., 1:-1, 1:-1])
    out = jnp.clip(out, 1e-3, 1 - 1e-3)
    return CubemapParams(texture=inverse_activation(out), fail_value=params.fail_value)
