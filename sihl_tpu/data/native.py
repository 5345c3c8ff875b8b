"""ctypes bindings for the native (C++) batch-assembly fast path.

Compiles ``native/batch_ops.cpp`` with g++ on first use (cached beside the
source); falls back to numpy transparently if no toolchain is available.
"""

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "batch_ops.cpp")
_LIB = os.path.join(_HERE, "native", "libbatch_ops.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _LIB, _SRC, "-lpthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.batch_resize_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.pad_labels.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def batch_resize_normalize(
    images: Sequence[np.ndarray],
    size,
    mean=(0.0, 0.0, 0.0),
    std=(1.0, 1.0, 1.0),
    num_threads: int = 0,
    force_numpy: bool = False,
) -> np.ndarray:
    """uint8 HWC images (mixed sizes) -> normalized float32 NHWC batch."""
    dh, dw = (size, size) if isinstance(size, int) else size
    c = images[0].shape[2]
    batch = len(images)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    lib = None if force_numpy else _load()
    if lib is not None:
        images = [np.ascontiguousarray(im, np.uint8) for im in images]
        out = np.empty((batch, dh, dw, c), np.float32)
        ptrs = (ctypes.c_void_p * batch)(
            *[im.ctypes.data_as(ctypes.c_void_p) for im in images]
        )
        heights = (ctypes.c_int * batch)(*[im.shape[0] for im in images])
        widths = (ctypes.c_int * batch)(*[im.shape[1] for im in images])
        lib.batch_resize_normalize(
            ptrs, heights, widths, batch, c,
            out.ctypes.data_as(ctypes.c_void_p), dh, dw,
            mean.ctypes.data_as(ctypes.c_void_p),
            std.ctypes.data_as(ctypes.c_void_p),
            num_threads or (os.cpu_count() or 1),
        )
        return out
    # numpy fallback (half-pixel-center bilinear, same semantics)
    out = np.empty((batch, dh, dw, c), np.float32)
    for i, im in enumerate(images):
        out[i] = _np_resize_bilinear(im.astype(np.float32) / 255.0, dh, dw)
    return (out - mean) / std


def _np_resize_bilinear(im: np.ndarray, dh: int, dw: int) -> np.ndarray:
    sh, sw = im.shape[:2]
    sy = np.clip((np.arange(dh) + 0.5) * sh / dh - 0.5, 0, sh - 1)
    sx = np.clip((np.arange(dw) + 0.5) * sw / dw - 0.5, 0, sw - 1)
    y0 = sy.astype(int)
    x0 = sx.astype(int)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    fy = (sy - y0)[:, None, None]
    fx = (sx - x0)[None, :, None]
    top = im[y0][:, x0] * (1 - fx) + im[y0][:, x1] * fx
    bot = im[y1][:, x0] * (1 - fx) + im[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


def native_pad_labels(
    rows: Sequence[np.ndarray], max_targets: int, force_numpy: bool = False
) -> np.ndarray:
    lib = None if force_numpy else _load()
    batch = len(rows)
    if lib is not None:
        rows = [np.ascontiguousarray(r, np.int32) for r in rows]
        out = np.empty((batch, max_targets), np.int32)
        ptrs = (ctypes.c_void_p * batch)(
            *[r.ctypes.data_as(ctypes.c_void_p) for r in rows]
        )
        lengths = (ctypes.c_int * batch)(*[len(r) for r in rows])
        lib.pad_labels(ptrs, lengths, batch, max_targets,
                       out.ctypes.data_as(ctypes.c_void_p))
        return out
    out = np.full((batch, max_targets), -1, np.int32)
    for b, r in enumerate(rows):
        n = min(len(r), max_targets)
        out[b, :n] = np.asarray(r[:n], np.int32)
    return out
