"""ctypes bindings for the native host library (host_ops.cpp).

Compiled lazily with g++ on first use (cached next to the source, keyed by a
source hash); every entry point has a pure-Python fallback so the framework
works without a toolchain. See host_ops.cpp for what lives natively and why.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "host_ops.cpp")
_LIB = None
_TRIED = False

# style codes understood by corrupt_batch (host_ops.cpp)
NATIVE_STYLES = {"identity": 0, "stripe": 1, "brightness": 2, "inverse": 3,
                 "quantize": 4, "contrast": 5, "scale": 6}


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:12]
    sopath = os.path.join(_DIR, f"libclearvae_host_{tag}.so")
    if os.path.exists(sopath):
        return sopath
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", sopath]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return sopath
    except Exception as e:  # no toolchain / compile error → fallbacks
        print(f"# native build unavailable: {e}", file=sys.stderr)
        return None


def _lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        sopath = _build()
        if sopath:
            lib = ctypes.CDLL(sopath)
            lib.ksg_mi_cd.restype = ctypes.c_int
            lib.ksg_mi_cd.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double)]
            lib.corrupt_batch.restype = ctypes.c_int
            lib.corrupt_batch.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32]
            _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def ksg_mi_cd_native(x: np.ndarray, y: np.ndarray,
                     n_neighbors: int = 3) -> np.ndarray:
    """Per-feature KSG MI on preprocessed columns; raises if unavailable."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float64)
    y = np.ascontiguousarray(y, np.int64).ravel()
    n, f = x.shape
    out = np.empty(f, np.float64)
    rc = lib.ksg_mi_cd(x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                       y.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                       n, f, n_neighbors,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise RuntimeError(f"ksg_mi_cd failed rc={rc}")
    return out


def mutual_info_classif_native(x: np.ndarray, y: np.ndarray, *,
                               n_neighbors: int = 3,
                               seed: int = 0) -> np.ndarray:
    """sklearn-_estimate_mi preprocessing (std scale + tiny dither) + native
    core; numpy fallback when the toolchain is absent."""
    x = np.asarray(x, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    std = x.std(axis=0)
    x = x / np.where(std > 0, std, 1.0)
    rng = np.random.RandomState(seed)
    means = np.maximum(1, np.mean(np.abs(x), axis=0))
    x = x + 1e-10 * means * rng.standard_normal(size=x.shape)
    if available():
        return ksg_mi_cd_native(x, np.asarray(y), n_neighbors)
    from clearvae_tpu.ops.metrics import _mi_cd_numpy

    y = np.asarray(y).ravel()
    return np.array([_mi_cd_numpy(x[:, j], y, n_neighbors)
                     for j in range(x.shape[1])])


def corrupt_batch_native(images: np.ndarray, style_names: list[str],
                         style_idx: np.ndarray,
                         severity: int = 5) -> np.ndarray:
    """Apply deterministic styles in-place-free on the host
    ([B, 28, 28] float32 0..255). ``style_idx`` indexes ``style_names``;
    each name must be in NATIVE_STYLES."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    codes = np.asarray([NATIVE_STYLES[style_names[i]] for i in style_idx],
                       np.int32)
    out = np.ascontiguousarray(images, np.float32).copy()
    b, h, w = out.shape
    rc = lib.corrupt_batch(out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                           b, h, w, severity)
    if rc != 0:
        raise RuntimeError(f"corrupt_batch failed rc={rc}")
    return out
