"""Model I/O: PLY snapshots (+ env-map sidecar) and training checkpoints.

Parity with reference save_ply/load_ply (scene/gaussian_model.py:240-262,
296-373): same binary-little-endian PLY attribute layout — x,y,z, nx,ny,nz
(zeros), f_dc_*, f_rest_* (channel-major like the reference's transpose),
opacity, refl, scale_0..1, rot_0..3 — so snapshots interop with the
reference's viewers/tools. The cubemap rides in a sidecar next to the PLY;
the reference uses a torch state dict (.map), we write .map.npz with keys
matching the reference state-dict names for convertibility.

Training checkpoints (capture/restore, gaussian_model.py:80-116 +
train.py:311-320) are .npz bundles of the full TrainState.

No external PLY library (plyfile is not in the image) — the format is simple
enough to emit/parse directly with numpy.
"""
from __future__ import annotations

import io
import os
import re

import numpy as np
import jax
import jax.numpy as jnp

from tpu_splat.envmap.cubemap import CubemapParams
from tpu_splat.model.state import GaussianState


def _attribute_names(n_rest: int) -> list[str]:
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(n_rest * 3)]
    names += ["opacity", "refl", "scale_0", "scale_1"]
    names += [f"rot_{i}" for i in range(4)]
    return names


def save_ply(state: GaussianState, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    alive = np.asarray(state.alive)
    xyz = np.asarray(state.xyz)[alive]
    n = xyz.shape[0]
    # channel-major flatten (reference transpose(1,2).flatten, :245-246)
    f_dc = np.asarray(state.features_dc)[alive].transpose(0, 2, 1).reshape(n, -1)
    f_rest = np.asarray(state.features_rest)[alive].transpose(0, 2, 1).reshape(n, -1)
    opacity = np.asarray(state.opacity)[alive]
    refl = np.asarray(state.refl)[alive]
    scale = np.asarray(state.scaling)[alive]
    rot = np.asarray(state.rotation)[alive]

    attrs = np.concatenate(
        [xyz, np.zeros_like(xyz), f_dc, f_rest, opacity, refl, scale, rot], axis=1
    ).astype("<f4")
    names = _attribute_names(state.features_rest.shape[1])
    assert attrs.shape[1] == len(names)

    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {a}" for a in names]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(attrs.tobytes())

    save_envmap(state.env, path.replace(".ply", ".map.npz"))
    # reference-format torch sidecar as well: a reference install (or any
    # 3DGS-DR-style viewer) opens models we trained —
    # torch.load(<model>.map) == gaussian_model.py:331-333's read path
    save_envmap_torch(state.env, path.replace(".ply", ".map"))


def save_envmap(env: CubemapParams, path: str):
    np.savez(
        path,
        **{
            # reference torch state-dict key names (cubemap_encoder.py:93-96)
            "params.Cubemap_texture": np.asarray(env.texture),
            "params.Cubemap_failv": np.asarray(env.fail_value),
        },
    )


def save_envmap_torch(env: CubemapParams, path: str):
    """Write the cubemap as a torch.save-compatible state dict — the EXACT
    sidecar format the reference persists next to its PLY
    (scene/gaussian_model.py:261-262) and loads at :331-333. Stdlib zip +
    hand-emitted pickle (model/torch_pickle.py), no torch import."""
    from tpu_splat.model.torch_pickle import save_torch_state_dict

    save_torch_state_dict(
        path,
        {
            "params.Cubemap_texture": np.asarray(env.texture, np.float32),
            "params.Cubemap_failv": np.asarray(env.fail_value, np.float32),
        },
    )


def load_envmap(path: str) -> CubemapParams:
    """Read a cubemap sidecar: our `.map.npz`, or a reference-trained torch
    `.map` state dict (scene/gaussian_model.py:261-262,331-336) via the
    stdlib torch-pickle reader — reference checkpoints load directly."""
    if path.endswith(".npz"):
        z = np.load(path)
    else:
        from tpu_splat.model.torch_pickle import load_torch_state_dict

        z = load_torch_state_dict(path)
        z = {k: np.asarray(v, np.float32) for k, v in z.items()}
    return CubemapParams(
        texture=jnp.asarray(z["params.Cubemap_texture"]),
        fail_value=jnp.asarray(z["params.Cubemap_failv"]),
    )


def _read_ply(path: str):
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii").splitlines()
    n = None
    names = []
    fmt = None
    for line in header:
        if line.startswith("format"):
            fmt = line.split()[1]
        elif line.startswith("element vertex"):
            n = int(line.split()[-1])
        elif line.startswith("property"):
            _, typ, name = line.split()
            assert typ in ("float", "float32"), f"unsupported property type {typ}"
            names.append(name)
    assert fmt == "binary_little_endian", f"unsupported ply format {fmt}"
    arr = np.frombuffer(data[end:], dtype="<f4", count=n * len(names)).reshape(
        n, len(names)
    )
    return {name: arr[:, i] for i, name in enumerate(names)}, n


def load_ply(
    path: str,
    capacity: int | None = None,
    max_sh_degree: int = 3,
) -> GaussianState:
    """Load a snapshot (reference load_ply :296-373). The env map is read
    from the sidecar if present, else initialized fresh; f_rest count infers
    the SH degree like the reference's assert."""
    cols, n = _read_ply(path)
    cap = capacity or n

    xyz = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
    f_dc = np.stack([cols[f"f_dc_{i}"] for i in range(3)], axis=1).reshape(n, 3, 1)
    rest_names = sorted(
        (k for k in cols if k.startswith("f_rest_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    n_rest_total = len(rest_names)
    n_rest = n_rest_total // 3
    sh_deg = int(round((n_rest + 1) ** 0.5)) - 1
    f_rest = np.stack([cols[k] for k in rest_names], axis=1).reshape(n, 3, n_rest)
    opacity = cols["opacity"][:, None]
    refl = cols["refl"][:, None] if "refl" in cols else np.full((n, 1), -4.6)
    scale = np.stack([cols["scale_0"], cols["scale_1"]], axis=1)
    rot = np.stack([cols[f"rot_{i}"] for i in range(4)], axis=1)

    def pad(a, fill=0.0):
        out = np.full((cap,) + a.shape[1:], fill, dtype=np.float32)
        out[:n] = a
        return jnp.asarray(out)

    alive = np.zeros(cap, bool)
    alive[:n] = True

    map_path = path.replace(".ply", ".map.npz")
    if not os.path.exists(map_path):
        map_path = path.replace(".ply", ".map")  # reference torch sidecar
    if os.path.exists(map_path):
        env = load_envmap(map_path)
    else:
        from tpu_splat.envmap.cubemap import init_cubemap

        env = init_cubemap(jax.random.PRNGKey(0), 3, 128)

    return GaussianState(
        xyz=pad(xyz),
        features_dc=pad(f_dc.transpose(0, 2, 1)),
        features_rest=pad(f_rest.transpose(0, 2, 1)),
        scaling=pad(scale, fill=-10.0),
        rotation=pad(rot).at[n:, 0].set(1.0),
        opacity=pad(opacity, fill=-10.0),
        refl=pad(refl, fill=-10.0),
        env=env,
        alive=jnp.asarray(alive),
        active_sh_degree=jnp.asarray(sh_deg, jnp.int32),
        max_sh_degree=max(sh_deg, max_sh_degree),
    )


# ---------------------------------------------------------------------------
# Training checkpoints


_GAUSSIAN_FIELDS = (
    "xyz", "features_dc", "features_rest", "scaling", "rotation",
    "opacity", "refl", "alive", "active_sh_degree",
)


def save_checkpoint(path: str, train_state, iteration: int):
    """Flatten the full TrainState into one npz (role of chkpntN.pth,
    train.py:311-320). Besides the positional leaves (restored against a
    template TrainState), the GaussianState's arrays are also saved by field
    name so render/view can restore a model WITHOUT reconstructing the
    training pytree (reference render.py --start_checkpoint path)."""
    leaves, treedef = jax.tree.flatten(train_state)
    g = train_state.gaussians
    named = {f"g.{f}": np.asarray(getattr(g, f)) for f in _GAUSSIAN_FIELDS}
    named["g.env.texture"] = np.asarray(g.env.texture)
    named["g.env.fail_value"] = np.asarray(g.env.fail_value)
    named["g.max_sh_degree"] = np.asarray(g.max_sh_degree)
    isp = getattr(train_state, "isp", None)
    if isp is not None:
        # named ISP leaves so render/eval can restore the trained ISP
        # without the TrainState template (reference render.py:89-90
        # restores PPISP state from the checkpoint dict)
        for f in isp._fields:
            named[f"isp.{f}"] = np.asarray(getattr(isp, f))
    np.savez(
        path,
        __iteration=np.asarray(iteration),
        __n_leaves=np.asarray(len(leaves)),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
        **named,
    )


def load_checkpoint(path: str, template_state):
    z = np.load(path)
    n = int(z["__n_leaves"])
    leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    treedef = jax.tree.structure(template_state)
    return jax.tree.unflatten(treedef, leaves), int(z["__iteration"])


def load_checkpoint_gaussians(path: str) -> tuple[GaussianState, int]:
    """Restore just the model from a training checkpoint (no optimizer /
    TrainState template needed) — the render.py/view.py restore path."""
    z = np.load(path)
    env = CubemapParams(
        texture=jnp.asarray(z["g.env.texture"]),
        fail_value=jnp.asarray(z["g.env.fail_value"]),
    )
    state = GaussianState(
        env=env,
        max_sh_degree=int(z["g.max_sh_degree"]),
        **{
            f: jnp.asarray(z[f"g.{f}"])
            for f in _GAUSSIAN_FIELDS
        },
    )
    return state, int(z["__iteration"])


def load_checkpoint_isp(path: str):
    """Restore the trained ISP from a checkpoint, or None when the run was
    post_process=False (reference render.py:89-90 loads PPISP state the same
    way; older tpu_splat checkpoints without named ISP leaves return None)."""
    from tpu_splat.isp.ppisp import ISPParams

    z = np.load(path)
    if "isp.gain" not in z.files:
        return None
    return ISPParams(**{f: jnp.asarray(z[f"isp.{f}"]) for f in ISPParams._fields})
