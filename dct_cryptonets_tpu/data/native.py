"""ctypes binding for the native C++ host codec (native/dctcodec.cpp).

Replaces the reference's libjpeg-turbo / jpeg2dct / OpenCV worker-process
codec (reference data/cvfunctional.py:21-74) for CPU-side preprocessing.
The on-device JAX codec (data/codec.py) remains the default; this path is
for hosts that want to overlap preprocessing with device compute.

Builds lazily with ``make -C native`` if the shared library is missing and
a toolchain is available; otherwise raises ImportError on first use.
"""
import ctypes
import os
import subprocess

import numpy as np

from .codec import CodecConfig

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdctcodec.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dct_ingest_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.blockwise_dct_plane.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def dct_ingest_native(images: np.ndarray, cfg: CodecConfig,
                      num_threads: int | None = None) -> np.ndarray:
    """uint8 RGB (B, P, P, 3) center-cropped batch -> float32 (B, S, S, C).

    Same semantics as codec.dct_from_pixels, computed host-side in C++.
    """
    lib = _load()
    B, P, P2, _ = images.shape
    assert P == P2 == cfg.pixel_size, (images.shape, cfg.pixel_size)
    y_idx, cb_idx, cr_idx = cfg.subset()
    mean, std = cfg.stats()
    C = len(y_idx) + len(cb_idx) + len(cr_idx)
    S = cfg.image_size_dct

    images = np.ascontiguousarray(images, np.uint8)
    iy = np.ascontiguousarray(y_idx, np.int32)
    icb = np.ascontiguousarray(cb_idx, np.int32)
    icr = np.ascontiguousarray(cr_idx, np.int32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((B, S, S, C), np.float32)
    nt = num_threads or min(os.cpu_count() or 1, 8)

    lib.dct_ingest_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), B,
        cfg.filter_size, S,
        _iptr(iy), len(y_idx), _iptr(icb), len(cb_idx),
        _iptr(icr), len(cr_idx), _fptr(mean), _fptr(std), _fptr(out), nt)
    return out


def blockwise_dct_native(plane: np.ndarray, fs: int,
                         round_int: bool = False) -> np.ndarray:
    """(h, w) float (already level-shift-free: raw 0..255 pixels) ->
    (h/fs, w/fs, fs*fs) coefficients.  Level shift -128 applied inside."""
    lib = _load()
    h, w = plane.shape
    plane = np.ascontiguousarray(plane, np.float32)
    out = np.empty((h // fs, w // fs, fs * fs), np.float32)
    lib.blockwise_dct_plane(_fptr(plane), h, w, fs, int(round_int), _fptr(out))
    return out
