"""Mesh extraction: TSDF fusion of rendered depth maps + isosurface meshing
(role of reference utils/mesh_utils.py GaussianExtractor + utils/mcube_utils.py
marching_cubes_with_contraction).

The reference's TSDF export path was stripped by the fork (mesh_utils.py keeps
only render/normal export; mcube_utils is a 2DGS leftover) — this module
restores the full 2DGS capability TPU-side:

- GaussianExtractor: render all views with render(), collect rgb / alpha /
  surf_depth / normals, export image sheets (mesh_utils.py:49-101).
- tsdf_fusion: fuse depth maps into a voxel TSDF + color grid (numpy,
  camera-projective, truncation + weight averaging) in z-chunks
  (mcube_utils.py's chunked evaluation role).
- marching_tetrahedra: isosurface triangulation of an SDF grid. Uses the
  6-tetrahedra cube decomposition — equivalent output to marching cubes but
  with tables small enough to derive from first principles (no transcribed
  256-entry tables), fully vectorized numpy.
- save_mesh_ply: binary-little-endian PLY triangle mesh writer.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

# 6-tetra decomposition of a unit cube: corner ids are bit-packed (x|y<<1|z<<2)
# Every tet shares the main diagonal 0-7, guaranteeing a crack-free mesh.
_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ],
    np.int64,
)
_CORNER_OFFSETS = np.array(
    [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], np.int64
)
# tet edge list (pairs of local tet-vertex ids 0..3)
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int64
)
# For each of the 16 inside-masks of a tet's 4 vertices: triangles as triples
# of tet-edge ids (-1 = unused). Derived from the 3 canonical cases:
# one vertex inside (1 tri), two inside (2 tris / quad), complements mirrored.
_TET_TRIS = -np.ones((16, 2, 3), np.int64)


def _init_tet_table():
    # single-vertex cases: vertex v inside -> tri over its 3 incident edges
    incident = {
        0: [0, 1, 2],  # edges touching vertex 0
        1: [0, 3, 4],
        2: [1, 3, 5],
        3: [2, 4, 5],
    }
    # consistent winding chosen per case; orientation is fixed afterwards by
    # pointing normals along the SDF gradient (see marching_tetrahedra).
    for v, (a, b, c) in incident.items():
        _TET_TRIS[1 << v, 0] = (a, b, c)
        _TET_TRIS[0b1111 ^ (1 << v), 0] = (a, c, b)
    # two-vertex cases: quad between the 4 edges crossing the cut
    quads = {
        0b0011: (1, 2, 4, 3),  # verts {0,1} in: edges 0-2,0-3,1-3,1-2
        0b0101: (0, 2, 5, 3),  # verts {0,2}
        0b1001: (0, 1, 5, 4),  # verts {0,3}
        0b0110: (0, 4, 5, 1),  # verts {1,2}
        0b1010: (0, 3, 5, 2),  # verts {1,3}
        0b1100: (1, 3, 4, 2),  # verts {2,3}
    }
    for mask, (a, b, c, d) in quads.items():
        _TET_TRIS[mask, 0] = (a, b, c)
        _TET_TRIS[mask, 1] = (a, c, d)


_init_tet_table()


class Mesh(NamedTuple):
    vertices: np.ndarray  # [V,3] f32
    faces: np.ndarray  # [F,3] i32
    colors: np.ndarray | None = None  # [V,3] u8


def _sweep_tets(corner_idx, vals, verts_out, faces_out, v_count):
    """Emit triangles for every tet of every (sign-changing) cell.
    corner_idx [C,8,3] grid coords, vals [C,8] SDF values."""
    for tet in _TETS:
        tv = vals[:, tet]  # [C,4]
        mask = (
            (tv[:, 0] < 0).astype(np.int64)
            | ((tv[:, 1] < 0) << 1)
            | ((tv[:, 2] < 0) << 2)
            | ((tv[:, 3] < 0) << 3)
        )
        active = (mask != 0) & (mask != 0b1111)
        if not active.any():
            continue
        cells = np.nonzero(active)[0]
        m = mask[cells]
        tris = _TET_TRIS[m]  # [A,2,3] tet-edge ids
        tvc = tv[cells]  # [A,4]
        pos = corner_idx[cells][:, tet]  # [A,4,3] grid coords of tet verts

        # interpolated crossing point on each of the 6 tet edges [A,6,3]
        e0, e1 = _TET_EDGES[:, 0], _TET_EDGES[:, 1]
        va, vb = tvc[:, e0], tvc[:, e1]  # [A,6]
        denom = vb - va
        t = np.where(
            np.abs(denom) > 1e-12, -va / np.where(denom == 0, 1, denom), 0.5
        )
        t = np.clip(t, 0.0, 1.0)
        pa, pb = pos[:, e0].astype(np.float64), pos[:, e1].astype(np.float64)
        cross = pa + t[..., None] * (pb - pa)  # [A,6,3]

        for k in range(2):
            tk = tris[:, k]  # [A,3]
            have = tk[:, 0] >= 0
            if not have.any():
                continue
            idx = np.nonzero(have)[0]
            tri_edges = tk[idx]  # [B,3]
            tri_pts = cross[idx[:, None], tri_edges]  # [B,3,3]
            B = len(idx)
            verts_out.append(tri_pts.reshape(-1, 3))
            faces_out.append(
                np.arange(v_count, v_count + 3 * B, dtype=np.int64).reshape(B, 3)
            )
            v_count += 3 * B
    return v_count


def marching_tetrahedra(
    sdf: np.ndarray,
    level: float = 0.0,
    origin=(0.0, 0.0, 0.0),
    spacing: float = 1.0,
) -> Mesh:
    """Triangulate the `level` isosurface of sdf [Nx,Ny,Nz] (inside = sdf <
    level). Returns world-space vertices origin + spacing*grid_coord, with
    triangles wound so normals point toward increasing SDF (outside)."""
    nx, ny, nz = sdf.shape
    f = sdf - level
    cx, cy, cz = nx - 1, ny - 1, nz - 1

    verts_out, faces_out = [], []
    v_count = 0
    # sweep cells in x-slabs to bound the [C,8,3] corner tensor's memory
    x_chunk = max(1, (1 << 22) // max(cy * cz, 1))
    for x0 in range(0, cx, x_chunk):
        x1 = min(x0 + x_chunk, cx)
        base = np.stack(
            np.meshgrid(
                np.arange(x0, x1), np.arange(cy), np.arange(cz), indexing="ij"
            ),
            axis=-1,
        ).reshape(-1, 3)  # [C,3]
        corner_idx = base[:, None, :] + _CORNER_OFFSETS[None]  # [C,8,3]
        vals = f[corner_idx[..., 0], corner_idx[..., 1], corner_idx[..., 2]]
        # only cells whose corner signs differ can emit geometry
        neg = vals < 0
        active_cells = neg.any(axis=1) & ~neg.all(axis=1)
        if not active_cells.any():
            continue
        corner_idx = corner_idx[active_cells]
        vals = vals[active_cells]
        v_count = _sweep_tets(corner_idx, vals, verts_out, faces_out, v_count)
    if not verts_out:
        return Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))

    verts = np.concatenate(verts_out)
    faces = np.concatenate(faces_out)

    # weld duplicate vertices (crossings shared between tets/cells)
    key = np.round(verts * 1e6).astype(np.int64)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    welded = np.zeros((len(uniq), 3), np.float64)
    welded[inv] = verts
    faces = inv[faces]
    # drop degenerate faces
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[ok]

    # orient faces along the SDF gradient (outward normals)
    gx, gy, gz = np.gradient(f)
    vi = np.clip(np.round(welded).astype(np.int64), 0, [nx - 1, ny - 1, nz - 1])
    grad = np.stack(
        [g[vi[:, 0], vi[:, 1], vi[:, 2]] for g in (gx, gy, gz)], axis=-1
    )
    tri_grad = grad[faces].mean(axis=1)
    e1v = welded[faces[:, 1]] - welded[faces[:, 0]]
    e2v = welded[faces[:, 2]] - welded[faces[:, 0]]
    n = np.cross(e1v, e2v)
    flip = np.einsum("ij,ij->i", n, tri_grad) < 0
    faces[flip] = faces[flip][:, [0, 2, 1]]

    world = np.asarray(origin)[None] + welded * spacing
    return Mesh(world.astype(np.float32), faces.astype(np.int32))


def tsdf_fusion(
    depths: list[np.ndarray],  # [H,W] metric depth per view
    colors: list[np.ndarray],  # [H,W,3] float in [0,1]
    alphas: list[np.ndarray],  # [H,W] coverage
    Ks: list[np.ndarray],  # [3,3] intrinsics
    w2cs: list[np.ndarray],  # [4,4] world->camera
    bounds_min: np.ndarray,
    bounds_max: np.ndarray,
    resolution: int = 128,
    trunc: float | None = None,
    alpha_thres: float = 0.5,
    depth_trunc: float | None = None,
    z_chunk: int = 16,
):
    """Projective TSDF fusion (classic KinectFusion update), z-chunked to
    bound memory (mcube_utils.py's chunked-grid role). Returns (tsdf, color,
    weight, origin, spacing)."""
    bounds_min = np.asarray(bounds_min, np.float64)
    bounds_max = np.asarray(bounds_max, np.float64)
    spacing = float((bounds_max - bounds_min).max()) / (resolution - 1)
    dims = np.maximum(
        np.ceil((bounds_max - bounds_min) / spacing).astype(int) + 1, 2
    )
    if trunc is None:
        trunc = 4.0 * spacing

    tsdf = np.ones(dims, np.float32)
    weight = np.zeros(dims, np.float32)
    color = np.zeros((*dims, 3), np.float32)

    xs = bounds_min[0] + spacing * np.arange(dims[0])
    ys = bounds_min[1] + spacing * np.arange(dims[1])
    zs = bounds_min[2] + spacing * np.arange(dims[2])

    for z0 in range(0, dims[2], z_chunk):
        z1 = min(z0 + z_chunk, dims[2])
        gx, gy, gz = np.meshgrid(xs, ys, zs[z0:z1], indexing="ij")
        pts = np.stack([gx, gy, gz, np.ones_like(gx)], axis=-1)  # [X,Y,Zc,4]
        flat = pts.reshape(-1, 4)

        for depth, col, alpha, K, w2c in zip(depths, colors, alphas, Ks, w2cs):
            H, W = depth.shape
            cam = flat @ w2c.T  # [N,4]
            z = cam[:, 2]
            front = z > 1e-6
            uvw = cam[:, :3] @ K.T
            u = uvw[:, 0] / np.maximum(uvw[:, 2], 1e-12)
            v = uvw[:, 1] / np.maximum(uvw[:, 2], 1e-12)
            ui = np.round(u).astype(int)
            vi = np.round(v).astype(int)
            inside = front & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
            if not inside.any():
                continue
            uif, vif = ui[inside], vi[inside]
            d = depth[vif, uif]
            a = alpha[vif, uif]
            valid = (a > alpha_thres) & (d > 0)
            if depth_trunc is not None:
                valid &= d < depth_trunc
            sdf = d - z[inside]
            upd = valid & (sdf > -trunc)
            tv = np.minimum(1.0, sdf / trunc)

            sel = np.nonzero(inside)[0][upd]
            tsdf_flat = tsdf.reshape(-1)
            w_flat = weight.reshape(-1)
            c_flat = color.reshape(-1, 3)
            # adjust flat index into the chunked grid
            zc = z1 - z0
            # flat index within chunk -> global voxel index
            xi = sel // (dims[1] * zc)
            rem = sel % (dims[1] * zc)
            yi = rem // zc
            zi = rem % zc + z0
            gidx = (xi * dims[1] + yi) * dims[2] + zi

            w_old = w_flat[gidx]
            w_new = w_old + 1.0
            tsdf_flat[gidx] = (tsdf_flat[gidx] * w_old + tv[upd]) / w_new
            c_flat[gidx] = (
                c_flat[gidx] * w_old[:, None] + col[vif, uif][upd]
            ) / w_new[:, None]
            w_flat[gidx] = w_new

    return tsdf, color, weight, bounds_min, spacing


def extract_mesh_tsdf(
    depths, colors, alphas, Ks, w2cs, bounds_min, bounds_max,
    resolution: int = 128, **kw,
) -> Mesh:
    tsdf, color, weight, origin, spacing = tsdf_fusion(
        depths, colors, alphas, Ks, w2cs, bounds_min, bounds_max,
        resolution=resolution, **kw,
    )
    # unseen voxels stay at +1 (outside) so the surface closes at the
    # observation boundary
    mesh = marching_tetrahedra(tsdf, 0.0, origin=origin, spacing=spacing)
    if mesh.vertices.shape[0]:
        vi = np.clip(
            np.round((mesh.vertices - origin) / spacing).astype(int),
            0,
            np.array(tsdf.shape) - 1,
        )
        vc = (
            np.clip(color[vi[:, 0], vi[:, 1], vi[:, 2]], 0, 1) * 255
        ).astype(np.uint8)
        mesh = mesh._replace(colors=vc)
    return mesh


def save_mesh_ply(mesh: Mesh, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    V, F = len(mesh.vertices), len(mesh.faces)
    has_color = mesh.colors is not None
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {V}"]
    header += [f"property float {a}" for a in "xyz"]
    if has_color:
        header += [f"property uchar {c}" for c in ("red", "green", "blue")]
    header += [
        f"element face {F}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if has_color:
            vdt = np.dtype(
                [("xyz", "<f4", 3), ("rgb", "u1", 3)]
            )
            rec = np.empty(V, vdt)
            rec["xyz"] = mesh.vertices
            rec["rgb"] = mesh.colors
        else:
            vdt = np.dtype([("xyz", "<f4", 3)])
            rec = np.empty(V, vdt)
            rec["xyz"] = mesh.vertices
        f.write(rec.tobytes())
        fdt = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
        frec = np.empty(F, fdt)
        frec["n"] = 3
        frec["idx"] = mesh.faces
        f.write(frec.tobytes())


class GaussianExtractor:
    """Render-all-views collector (reference mesh_utils.py:23-101)."""

    def __init__(self, state, cfg, bg=None):
        import jax.numpy as jnp

        self.state = state
        self.cfg = cfg
        self.bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
        self.clean()

    def clean(self):
        self.rgbmaps, self.depthmaps, self.alphamaps = [], [], []
        self.normals, self.cameras = [], []

    def reconstruction(self, cameras):
        from tpu_splat.renderer import render

        self.clean()
        for cam in cameras:
            out = render(self.state, cam, self.cfg, self.bg, initial_stage=False)
            self.rgbmaps.append(np.asarray(out.render))
            self.depthmaps.append(np.asarray(out.surf_depth)[..., 0])
            self.alphamaps.append(np.asarray(out.alpha)[..., 0])
            self.normals.append(np.asarray(out.normal))
            self.cameras.append(cam)

    def export_image(self, path, normal_rot_quat=None):
        from tpu_splat.eval.image_utils import save_image_u8

        for idx, rgb in enumerate(self.rgbmaps):
            save_image_u8(os.path.join(path, "renders", f"{idx:05d}.png"), rgb)
            n = self.normals[idx]
            if normal_rot_quat is not None:
                from tpu_splat.core.transforms import quat_to_rotmat

                R = np.asarray(quat_to_rotmat(np.asarray(normal_rot_quat)[None]))[0]
                n = n @ R.T
                n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
            save_image_u8(
                os.path.join(path, "vis", f"normal_{idx:05d}.png"), n * 0.5 + 0.5
            )

    def export_mesh(self, bounds_min, bounds_max, resolution=128, **kw) -> Mesh:
        Ks = [np.asarray(c.K) for c in self.cameras]
        w2cs = [np.asarray(c.world_view) for c in self.cameras]
        return extract_mesh_tsdf(
            self.depthmaps, self.rgbmaps, self.alphamaps, Ks, w2cs,
            bounds_min, bounds_max, resolution=resolution, **kw,
        )
