"""ctypes bindings for the native patch-pipeline library.

Loads ``libpatchio.so`` (built from ``patchio.cpp`` via the Makefile); if the
library is missing, attempts a one-shot ``make`` and otherwise reports
unavailability so callers fall back to the numpy implementations in
``training/data.py`` (identical semantics, slower).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libpatchio.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_DIR)], check=True, capture_output=True
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.patch_count.restype = ctypes.c_int64
    lib.patch_count.argtypes = [ctypes.c_int64] * 4
    fp = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.extract_patches.argtypes = [fp, ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int64, fp]
    lib.augment_patches.argtypes = [fp, fp, ctypes.c_int64, ctypes.c_int64, u8p]
    lib.assemble_noisy_batch.argtypes = [
        fp, ctypes.c_int64, i64p, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_uint64, fp, fp,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def extract_patches(img: np.ndarray, patch: int, stride: int) -> np.ndarray:
    """Native stride-grid patch extraction; img (h, w) float32 C-contiguous."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape
    n = lib.patch_count(h, w, patch, stride)
    out = np.empty((n, patch, patch), np.float32)
    lib.extract_patches(_fptr(img), h, w, patch, stride, _fptr(out))
    return out


def augment_patches(patches: np.ndarray, modes: np.ndarray) -> np.ndarray:
    """Native 8-mode augmentation; patches (n, p, p), modes (n,) uint8."""
    lib = _load()
    patches = np.ascontiguousarray(patches, np.float32)
    modes = np.ascontiguousarray(modes, np.uint8)
    out = np.empty_like(patches)
    lib.augment_patches(
        _fptr(patches), _fptr(out), patches.shape[0], patches.shape[1],
        modes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def assemble_noisy_batch(
    patches: np.ndarray,
    indices: np.ndarray,
    sigma_lo: float,
    sigma_hi: float,
    seed: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Native gather + AWGN batch assembly -> (noisy, noise) as
    (b, p, p, 1) NHWC float32."""
    lib = _load()
    patches = np.ascontiguousarray(patches, np.float32)
    indices = np.ascontiguousarray(indices, np.int64)
    p = patches.shape[1]
    b = len(indices)
    noisy = np.empty((b, p, p), np.float32)
    noise = np.empty((b, p, p), np.float32)
    lib.assemble_noisy_batch(
        _fptr(patches), p,
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), b,
        float(sigma_lo), float(sigma_hi), int(seed) & (2**64 - 1),
        _fptr(noisy), _fptr(noise),
    )
    return noisy[..., None], noise[..., None]
