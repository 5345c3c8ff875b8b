"""Native C++ batch-assembly fast path: parity vs numpy fallback."""

import numpy as np
import pytest

from sihl_tpu.data.native import (
    batch_resize_normalize,
    native_available,
    native_pad_labels,
)


def test_native_compiles():
    assert native_available(), "g++ toolchain should be present in this env"


def test_resize_normalize_parity():
    rng = np.random.RandomState(0)
    images = [
        rng.randint(0, 256, (37, 53, 3), np.uint8),
        rng.randint(0, 256, (64, 64, 3), np.uint8),
    ]
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    native = batch_resize_normalize(images, 32, mean, std)
    numpy_ = batch_resize_normalize(images, 32, mean, std, force_numpy=True)
    assert native.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(native, numpy_, atol=2e-3)


def test_resize_identity():
    rng = np.random.RandomState(1)
    im = rng.randint(0, 256, (16, 16, 3), np.uint8)
    out = batch_resize_normalize([im], 16)
    np.testing.assert_allclose(out[0], im.astype(np.float32) / 255.0, atol=1e-3)


def test_pad_labels_parity():
    rows = [np.array([1, 2, 3], np.int32), np.array([], np.int32), np.array([7] * 10, np.int32)]
    native = native_pad_labels(rows, 5)
    numpy_ = native_pad_labels(rows, 5, force_numpy=True)
    np.testing.assert_array_equal(native, numpy_)
    assert native[0].tolist() == [1, 2, 3, -1, -1]
    assert native[2].tolist() == [7] * 5


def test_native_faster_than_numpy():
    import time

    rng = np.random.RandomState(2)
    images = [rng.randint(0, 256, (480, 640, 3), np.uint8) for _ in range(16)]
    batch_resize_normalize(images, 224)  # warm (compile)
    t0 = time.perf_counter()
    batch_resize_normalize(images, 224)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    batch_resize_normalize(images, 224, force_numpy=True)
    t_numpy = time.perf_counter() - t0
    # threaded C++ should beat single-threaded numpy comfortably
    assert t_native < t_numpy, (t_native, t_numpy)
