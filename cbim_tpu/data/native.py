"""ctypes bindings for the native host runtime (native/cbim_host.cpp).

Builds the shared library on first use (g++ is in the image) and exposes
``assemble_batch`` — the threaded window-crop + zero-pad batch assembler the
TrainPipeline uses.  Falls back cleanly to the numpy path when the toolchain
or library is unavailable (``pool() is None``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcbim_host.so")

_lib = None
_pool = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception as e:  # no toolchain / build failure -> numpy fallback
        logging.debug("native build failed: %s", e)
        return False


def _load():
    global _lib, _pool
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        _lib = False
        return False
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.cbim_pool_create.restype = ctypes.c_void_p
        lib.cbim_pool_create.argtypes = [ctypes.c_int]
        lib.cbim_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.cbim_assemble_batch.restype = ctypes.c_int
        lib.cbim_assemble_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        _pool = lib.cbim_pool_create(0)
        return lib
    except OSError as e:
        logging.debug("native load failed: %s", e)
        _lib = False
        return False


def available() -> bool:
    return bool(_load())


def assemble_batch(images, labels, windows, buffer_shape):
    """Parallel native batch assembly.

    images/labels: lists of (D,H,W) float32 / int8 C-contiguous arrays.
    windows: (B, 9) int64 [z0,y0,x0, wz,wy,wx, oz,oy,ox] per sample.
    Returns (img (B,*buffer_shape) f32, lab (B,*buffer_shape) i32).
    """
    lib = _load()
    if not lib:
        raise RuntimeError("native host library unavailable")
    B = len(images)
    bd, bh, bw = buffer_shape
    dst_img = np.empty((B, bd, bh, bw), np.float32)
    dst_lab = np.empty((B, bd, bh, bw), np.int32)

    src_img = (ctypes.c_void_p * B)(
        *[img.ctypes.data_as(ctypes.c_void_p).value for img in images])
    src_lab = (ctypes.c_void_p * B)(
        *[lab.ctypes.data_as(ctypes.c_void_p).value for lab in labels])
    dims = np.ascontiguousarray(
        np.array([im.shape for im in images], np.int64))
    win = np.ascontiguousarray(windows.astype(np.int64))

    rc = lib.cbim_assemble_batch(
        ctypes.c_void_p(_pool), B, src_img, src_lab,
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        win.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bd, bh, bw,
        dst_img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst_lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise RuntimeError(f"cbim_assemble_batch failed rc={rc}")
    return dst_img, dst_lab
