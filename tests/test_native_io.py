"""Native C++ IO loader: PNG decode parity vs PIL, downscale, prefetch order,
PIL fallback."""
import os

import numpy as np
import pytest

from tpu_splat.data.native_loader import (
    PrefetchingImageLoader,
    decode_png,
    get_lib,
)

needs_native = pytest.mark.skipif(
    get_lib() is None, reason="native io lib unavailable (no g++?)"
)


def _write_pngs(tmp_path, n=6, size=32, mode="RGB"):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        ch = {"RGB": 3, "RGBA": 4, "L": 1}[mode]
        arr = rng.integers(0, 255, (size, size, ch), dtype=np.uint8)
        if mode == "L":
            arr = arr[..., 0]
        p = str(tmp_path / f"img_{i}.png")
        Image.fromarray(arr, mode=mode).save(p)
        paths.append(p)
    return paths


@needs_native
@pytest.mark.parametrize("mode", ["RGB", "RGBA", "L"])
def test_decode_matches_pil(tmp_path, mode):
    from PIL import Image

    (path,) = _write_pngs(tmp_path, n=1, mode=mode)
    got = decode_png(path)
    assert got is not None
    ref = np.asarray(Image.open(path))
    if ref.ndim == 2:
        ref = ref[..., None]
    np.testing.assert_array_equal(got, ref)


@needs_native
def test_decode_downscale(tmp_path):
    from PIL import Image

    arr = np.zeros((8, 8, 3), np.uint8)
    arr[:4, :4] = 100
    arr[4:, 4:] = 200
    p = str(tmp_path / "d.png")
    Image.fromarray(arr).save(p)
    got = decode_png(p, divisor=4)
    assert got.shape == (2, 2, 3)
    assert got[0, 0, 0] == 100 and got[1, 1, 0] == 200
    assert got[0, 1, 0] == 0


@needs_native
def test_prefetch_ordered(tmp_path):
    from PIL import Image

    paths = _write_pngs(tmp_path, n=8)
    loader = PrefetchingImageLoader(paths, threads=3)
    seen = []
    for idx, img in loader:
        seen.append(idx)
        ref = np.asarray(Image.open(paths[idx]))
        np.testing.assert_array_equal(img, ref)
    assert seen == list(range(8))


@needs_native
def test_prefetch_fallback_for_non_png(tmp_path):
    from PIL import Image

    paths = _write_pngs(tmp_path, n=2)
    jpg = str(tmp_path / "x.jpg")
    Image.fromarray(np.full((16, 16, 3), 128, np.uint8)).save(jpg)
    loader = PrefetchingImageLoader([paths[0], jpg, paths[1]], threads=2)
    out = list(loader)
    assert [i for i, _ in out] == [0, 1, 2]
    assert out[1][1].shape == (16, 16, 3)  # decoded via PIL fallback


def test_loader_works_without_native(tmp_path, monkeypatch):
    import tpu_splat.data.native_loader as nl

    paths = _write_pngs(tmp_path, n=3)
    monkeypatch.setattr(nl, "get_lib", lambda: None)
    loader = nl.PrefetchingImageLoader(paths)
    assert [i for i, _ in loader] == [0, 1, 2]
