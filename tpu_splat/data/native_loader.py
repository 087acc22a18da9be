"""ctypes bindings + on-demand build for the native IO library
(tpu_splat/native/io_loader.cc): threaded ordered image prefetch + PNG decode.

Role: the reference's data layer decodes images synchronously with PIL on the
train thread (utils/camera_utils.py loadCam); on TPU VMs host decode time is
dead time, so the C++ loader decodes ahead on a thread pool. Falls back to
PIL transparently when no compiler is available or a file isn't a supported
PNG (JPEG datasets use the PIL path).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "io_loader.cc")
_SO = os.path.join(_NATIVE_DIR, "libtpusplat_io.so")
_lock = threading.Lock()
_lib = None
_tried = False


def build_native(force: bool = False) -> str | None:
    """Compile the .so if missing (g++ -O2 -shared). Returns path or None."""
    if os.path.exists(_SO) and not force:
        return _SO
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = build_native()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.tsio_decode_png.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(u8p),
        ]
        lib.tsio_decode_png.restype = ctypes.c_int
        lib.tsio_free.argtypes = [u8p]
        lib.tsio_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.tsio_open.restype = ctypes.c_void_p
        lib.tsio_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(u8p),
        ]
        lib.tsio_next.restype = ctypes.c_int
        lib.tsio_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def _take(lib, data_ptr, w, h, c) -> np.ndarray:
    buf = np.ctypeslib.as_array(data_ptr, shape=(h * w * c,))
    arr = buf.reshape(h, w, c).copy()
    lib.tsio_free(data_ptr)
    return arr


def decode_png(path: str, divisor: int = 1) -> np.ndarray | None:
    """One-shot native decode -> [H,W,C] uint8, or None (unsupported)."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    data = ctypes.POINTER(ctypes.c_uint8)()
    rc = lib.tsio_decode_png(
        path.encode(), divisor, ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(c), ctypes.byref(data),
    )
    if rc != 0:
        return None
    return _take(lib, data, w.value, h.value, c.value)


class PrefetchingImageLoader:
    """Iterate (index, [H,W,C] uint8) over `paths` in order; decodes run
    ahead on a C++ thread pool. Non-PNG / unsupported files fall back to PIL
    per item (returned in order all the same)."""

    def __init__(self, paths: list[str], divisor: int = 1, threads: int = 4):
        self.paths = list(paths)
        self.divisor = divisor
        self.lib = get_lib()
        self.handle = None
        if self.lib is not None and self.paths:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self.handle = self.lib.tsio_open(
                arr, len(self.paths), divisor, threads
            )

    def _pil_load(self, path: str) -> np.ndarray:
        from PIL import Image

        img = Image.open(path)
        if self.divisor > 1:
            img = img.resize(
                (img.width // self.divisor, img.height // self.divisor),
                Image.LANCZOS,
            )
        return np.asarray(img)

    def __iter__(self):
        if self.handle is None:
            for i, p in enumerate(self.paths):
                yield i, self._pil_load(p)
            return
        lib = self.lib
        try:
            while True:
                idx = ctypes.c_int()
                w = ctypes.c_int()
                h = ctypes.c_int()
                c = ctypes.c_int()
                data = ctypes.POINTER(ctypes.c_uint8)()
                rc = lib.tsio_next(
                    self.handle, ctypes.byref(idx), ctypes.byref(w),
                    ctypes.byref(h), ctypes.byref(c), ctypes.byref(data),
                )
                if rc == 1:
                    return
                if rc != 0:  # unsupported file: PIL fallback, order kept
                    yield idx.value, self._pil_load(self.paths[idx.value])
                    continue
                yield idx.value, _take(lib, data, w.value, h.value, c.value)
        finally:
            self.close()

    def close(self):
        if self.handle is not None:
            self.lib.tsio_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
