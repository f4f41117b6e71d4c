"""Native batch-prep engine (C++ + ctypes, numpy fallback) and the
prefetching loader — the in-process replacement for the reference's
DataLoader worker processes (train.py:278)."""

import numpy as np
import pytest

from quantized_vit_tpu.utils import (
    ArrayDataset,
    DataLoader,
    PrefetchLoader,
    gather_rows,
    native_prep_available,
    normalize_u8_batch,
)

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def test_normalize_matches_formula():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (4, 16, 16, 3)).astype(np.uint8)
    got = normalize_u8_batch(u8, MEAN, STD)
    inv = (1.0 / STD).astype(np.float32)
    want = (u8.astype(np.float32) * np.float32(1 / 255.0) - MEAN) * inv
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-7)
    assert got.dtype == np.float32


def test_normalize_covers_all_u8_values():
    """Every uint8 state maps through the LUT correctly."""
    u8 = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1).repeat(3, -1)
    got = normalize_u8_batch(u8, MEAN, STD)
    inv = (1.0 / STD).astype(np.float32)
    want = (u8.astype(np.float32) * np.float32(1 / 255.0) - MEAN) * inv
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-7)


def test_gather_rows_equals_fancy_indexing():
    rng = np.random.default_rng(1)
    src = rng.standard_normal((50, 8, 8, 3)).astype(np.float32)
    idx = rng.integers(0, 50, 12)
    np.testing.assert_array_equal(gather_rows(src, idx), src[idx])


def test_prefetch_loader_yields_same_batches():
    rng = np.random.default_rng(2)
    ds = ArrayDataset(rng.standard_normal((40, 8, 8, 3)).astype(np.float32),
                      np.arange(40) % 5)
    plain = list(DataLoader(ds, 8, shuffle=True, seed=3))
    fetched = list(PrefetchLoader(DataLoader(ds, 8, shuffle=True, seed=3),
                                  depth=2))
    assert len(plain) == len(fetched) == 5
    for (x1, y1, m1), (x2, y2, m2) in zip(plain, fetched):
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)


def test_prefetch_loader_propagates_errors():
    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = iter(PrefetchLoader(boom(), depth=1))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_image_folder_native_normalize(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from quantized_vit_tpu.utils import ImageFolderDataset

    rng = np.random.default_rng(4)
    paths = []
    for i in range(3):
        arr = rng.integers(0, 256, (20, 24, 3)).astype(np.uint8)
        p = tmp_path / f"img{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))

    ds = ImageFolderDataset(paths, [0, 1, 2], img_size=16,
                            normalize=(MEAN, STD))
    xs, ys = ds.get(np.array([0, 2]))
    assert xs.shape == (2, 16, 16, 3) and xs.dtype == np.float32
    # matches the [0,1]-float path + normalize_image within 1 ulp-ish
    ds_f = ImageFolderDataset(paths, [0, 1, 2], img_size=16)
    xf, _ = ds_f.get(np.array([0, 2]))
    want = (xf - MEAN) / STD
    # mul-by-reciprocal vs division: a couple of ulps at |x| ~ 2.6
    np.testing.assert_allclose(xs, want, rtol=0, atol=1e-6)


def test_normalize_accepts_scalar_stats():
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    got = normalize_u8_batch(u8, 0.5, 0.5)
    want = (u8.astype(np.float32) * np.float32(1 / 255.0) - 0.5) * 2.0
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-7)


def test_gather_rows_bounds_and_negatives():
    src = np.arange(12, dtype=np.float32).reshape(4, 3)
    np.testing.assert_array_equal(gather_rows(src, np.array([-1, 0])),
                                  src[[-1, 0]])
    with pytest.raises(IndexError):
        gather_rows(src, np.array([4]))
    with pytest.raises(IndexError):
        gather_rows(src, np.array([-5]))


def test_prefetch_loader_abandonment_does_not_wedge_producer():
    """Breaking out of the consumer loop must release the producer thread
    (regression: q.put blocked forever on the bounded queue)."""
    import threading
    import time

    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield i

    before = threading.active_count()
    it = iter(PrefetchLoader(gen(), depth=1))
    assert next(it) == 0
    it.close()  # abandon
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    assert len(produced) < 100  # producer stopped early
