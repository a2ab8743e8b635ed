"""ctypes bindings for the native host module (native/cellseg_native.cpp).

Builds the shared library on demand with g++ (no pybind11 required) and
falls back gracefully: `available()` is False when no compiler exists, and
callers keep their scipy/numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.normpath(os.path.join(_HERE, "..", "..", "native",
                                     "cellseg_native.cpp"))
_SO = os.path.join(_HERE, "_cellseg_native.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        if not os.path.exists(_SRC) or not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.cs_label_components.restype = ctypes.c_int32
    lib.cs_label_components.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_void_p,
    ]
    lib.cs_label_overlap.restype = None
    lib.cs_label_overlap.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.cs_remove_small.restype = None
    lib.cs_remove_small.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
    ]
    lib.cs_relabel_sequential.restype = ctypes.c_int32
    lib.cs_relabel_sequential.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def label_components(mask: np.ndarray, connectivity: int = 2) -> np.ndarray:
    lib = _load()
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    out = np.empty(mask.shape, np.int32)
    lib.cs_label_components(
        mask.ctypes.data, mask.shape[0], mask.shape[1], connectivity,
        out.ctypes.data,
    )
    return out


def label_overlap(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x.astype(np.int32)).ravel()
    y = np.ascontiguousarray(y.astype(np.int32)).ravel()
    nx = int(x.max()) + 1 if x.size else 1
    ny = int(y.max()) + 1 if y.size else 1
    out = np.zeros((nx, ny), np.int64)
    lib.cs_label_overlap(x.ctypes.data, y.ctypes.data, x.size, ny,
                         out.ctypes.data)
    return out


def remove_small(labels: np.ndarray, n_labels: int, min_size: int) -> np.ndarray:
    lib = _load()
    labels = np.ascontiguousarray(labels.astype(np.int32))
    lib.cs_remove_small(labels.ctypes.data, labels.size, n_labels, min_size)
    return labels


def relabel_sequential(labels: np.ndarray) -> np.ndarray:
    lib = _load()
    labels = np.ascontiguousarray(labels.astype(np.int32)).copy()
    mx = int(labels.max()) if labels.size else 0
    lib.cs_relabel_sequential(labels.ctypes.data, labels.size, mx)
    return labels
