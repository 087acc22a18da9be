"""Minimal reader for torch-saved state dicts (reference `.map` sidecars).

The reference persists its cubemap as `torch.save(env_map.state_dict(),
"*.map")` (scene/gaussian_model.py:261-262) — a zipfile containing a pickle
(`data.pkl`) plus raw tensor storages (`data/<key>`). This reads that format
with the standard library only (zipfile + a pickle.Unpickler subclass that
shims the few torch callables a state dict references), so reference-trained
models import without importing torch (~40 s on this host). If an exotic
checkpoint defeats the shim, callers may fall back to torch.load.
"""
from __future__ import annotations

import io
import pickle
import zipfile

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("bool"),
    "UntypedStorage": np.dtype("u1"),
}


class _Storage:
    def __init__(self, dtype: np.dtype, key: str, numel: int):
        self.dtype = dtype
        self.key = key
        self.numel = numel


def _rebuild_tensor(storage: _Storage, offset, size, stride, data: dict):
    raw = data[storage.key]
    arr = np.frombuffer(raw, dtype=storage.dtype)
    if offset:
        arr = arr[offset:]
    if not size:
        return arr[:1].reshape(()).copy()
    # torch strides are in elements
    strides_bytes = tuple(s * arr.dtype.itemsize for s in stride)
    out = np.lib.stride_tricks.as_strided(arr, shape=tuple(size),
                                          strides=strides_bytes)
    return out.copy()


class _TensorStub:
    """Deferred tensor: materialized to numpy once storages are read."""

    def __init__(self, storage, offset, size, stride):
        self.args = (storage, offset, size, stride)

    def materialize(self, data: dict) -> np.ndarray:
        return _rebuild_tensor(*self.args, data)


def _shim_rebuild_tensor_v2(storage, offset, size, stride,
                            requires_grad=False, backward_hooks=None,
                            metadata=None):
    return _TensorStub(storage, offset, size, stride)


def _shim_rebuild_parameter(tensor, requires_grad=False, backward_hooks=None):
    return tensor


class _Unpickler(pickle.Unpickler):
    def __init__(self, f):
        super().__init__(f)

    def find_class(self, module, name):
        if name in _STORAGE_DTYPES:
            return ("storage_cls", name)
        if module.startswith("torch"):
            shims = {
                "_rebuild_tensor_v2": _shim_rebuild_tensor_v2,
                "_rebuild_tensor": lambda st, off, sz: _TensorStub(
                    st, off, sz, _contig_strides(sz)
                ),
                "_rebuild_parameter": _shim_rebuild_parameter,
                "HalfStorageType": ("storage_cls", "HalfStorage"),
            }
            if name in shims:
                return shims[name]
            # dtypes and other torch attrs occasionally appear; return a
            # harmless marker (state dicts of plain tensors don't call them)
            return lambda *a, **k: None
        return super().find_class(module, name)

    def persistent_load(self, pid):
        assert pid[0] == "storage", pid
        storage_cls, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        if isinstance(storage_cls, tuple) and storage_cls[0] == "storage_cls":
            dtype = _STORAGE_DTYPES[storage_cls[1]]
        else:  # UntypedStorage object or unknown: bytes
            dtype = np.dtype("u1")
        return _Storage(dtype, str(key), int(numel))


def _contig_strides(size):
    strides, acc = [], 1
    for s in reversed(size):
        strides.append(acc)
        acc *= s
    return tuple(reversed(strides))


_DTYPE_STORAGE = {
    np.dtype("<f4"): "FloatStorage",
    np.dtype("<f8"): "DoubleStorage",
    np.dtype("<f2"): "HalfStorage",
    np.dtype("<i8"): "LongStorage",
    np.dtype("<i4"): "IntStorage",
    np.dtype("<i2"): "ShortStorage",
    np.dtype("i1"): "CharStorage",
    np.dtype("u1"): "ByteStorage",
    np.dtype("bool"): "BoolStorage",
}


class _PickleWriter:
    """Hand-emitted pickle (protocol 2) for flat {str: ndarray} state dicts
    in torch's tensor encoding — GLOBALs for torch._utils._rebuild_tensor_v2
    and torch.<Type>Storage are written by NAME, so no torch import is
    needed (pickle.Pickler would try to import them for verification)."""

    def __init__(self):
        self.out = io.BytesIO()
        self.w = self.out.write

    def global_(self, module: str, name: str):
        self.w(b"c" + module.encode() + b"\n" + name.encode() + b"\n")

    def int_(self, v: int):
        if 0 <= v < 256:
            self.w(b"K" + bytes([v]))  # BININT1
        elif 0 <= v < 65536:
            self.w(b"M" + v.to_bytes(2, "little"))  # BININT2
        else:
            self.w(b"J" + v.to_bytes(4, "little", signed=True))  # BININT

    def str_(self, s: str):
        b = s.encode("utf-8")
        self.w(b"X" + len(b).to_bytes(4, "little") + b)  # BINUNICODE

    def bool_(self, v: bool):
        self.w(b"\x88" if v else b"\x89")  # NEWTRUE / NEWFALSE

    def tuple_(self, emit_items):
        n = len(emit_items)
        if n <= 3:
            for e in emit_items:
                e()
            self.w({0: b")", 1: b"\x85", 2: b"\x86", 3: b"\x87"}[n])
        else:
            self.w(b"(")
            for e in emit_items:
                e()
            self.w(b"t")

    def persid_storage(self, storage_name: str, key: str, numel: int):
        # torch persistent id: ('storage', <StorageClass>, key, 'cpu', numel)
        self.tuple_([
            lambda: self.str_("storage"),
            lambda: self.global_("torch", storage_name),
            lambda: self.str_(key),
            lambda: self.str_("cpu"),
            lambda: self.int_(numel),
        ])
        self.w(b"Q")  # BINPERSID

    def tensor(self, arr: np.ndarray, key: str):
        dt = arr.dtype.newbyteorder("<")
        storage_name = _DTYPE_STORAGE[np.dtype(dt)]
        self.global_("torch._utils", "_rebuild_tensor_v2")
        size = arr.shape
        stride = _contig_strides(size)
        self.tuple_([
            lambda: self.persid_storage(storage_name, key, arr.size),
            lambda: self.int_(0),  # storage offset
            lambda: self.tuple_([(lambda v=v: self.int_(v)) for v in size]),
            lambda: self.tuple_([(lambda v=v: self.int_(v)) for v in stride]),
            lambda: self.bool_(False),  # requires_grad
            lambda: (  # empty backward-hooks OrderedDict
                self.global_("collections", "OrderedDict"),
                self.w(b")"),
                self.w(b"R"),
            ),
        ])
        self.w(b"R")  # REDUCE

    def state_dict(self, d: dict, keys: list[str]):
        self.w(b"\x80\x02")  # PROTO 2
        self.w(b"}")  # EMPTY_DICT
        self.w(b"(")  # MARK
        for k, storage_key in zip(d, keys):
            self.str_(k)
            self.tensor(np.ascontiguousarray(d[k]), storage_key)
        self.w(b"u")  # SETITEMS
        self.w(b".")  # STOP
        return self.out.getvalue()


def save_torch_state_dict(path: str, state: dict):
    """Write {name: ndarray} as a torch.save-compatible zip (the format the
    reference emits for its `.map` cubemap sidecar,
    scene/gaussian_model.py:261-262) using only the stdlib — torch.load and
    load_torch_state_dict both read it back. Round-trip tested against this
    module's reader and (in tests, where torch is already imported for the
    LPIPS fixture) against real torch.load."""
    state = {
        k: np.ascontiguousarray(np.asarray(v)) for k, v in state.items()
    }
    keys = [str(i) for i in range(len(state))]
    pkl = _PickleWriter().state_dict(state, keys)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", pkl)
        for key, arr in zip(keys, state.values()):
            a = arr.astype(arr.dtype.newbyteorder("<"), copy=False)
            zf.writestr(f"archive/data/{key}", a.tobytes())
        zf.writestr("archive/version", "3\n")
        zf.writestr("archive/byteorder", "little")


def load_torch_state_dict(path: str) -> dict:
    """Read a torch.save'd (zip format, torch >= 1.6) object into plain
    numpy arrays. Returns the unpickled structure with tensors materialized
    (state dicts -> {name: ndarray})."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        root = pkl_name[: -len("data.pkl")]
        data = {}
        for n in names:
            if n.startswith(root + "data/"):
                data[n[len(root + "data/"):]] = zf.read(n)
        obj = _Unpickler(io.BytesIO(zf.read(pkl_name))).load()

    def mat(x):
        if isinstance(x, _TensorStub):
            return x.materialize(data)
        if isinstance(x, dict):
            return {k: mat(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(mat(v) for v in x)
        return x

    return mat(obj)
