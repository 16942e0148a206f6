"""Euclidean distance transform with a native C++ fast path.

The reference computes the EDT with scipy.ndimage (laser_models.py:40-53) —
a heavy one-time precompute per map. Here the default path is a native C++
implementation of Felzenszwalb & Huttenlocher's exact O(n) algorithm
(f1tenth_gym_tpu/native/edt.cpp) loaded via ctypes; scipy is the fallback
when the shared library hasn't been built. Both produce distances in cell
units; callers scale by map resolution.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    native_dir = os.path.join(here, "..", "native")
    so_path = os.path.join(native_dir, "libf1tenth_native.so")
    if not os.path.exists(so_path):
        # build on first use; quiet failure falls back to scipy
        import subprocess

        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so_path,
                 os.path.join(native_dir, "edt.cpp")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            pass
    candidates = [so_path]
    for path in candidates:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.edt_2d.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.c_int64,
                    ctypes.c_int64,
                ]
                lib.edt_2d.restype = None
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def euclidean_distance_transform(free_mask: np.ndarray) -> np.ndarray:
    """Exact EDT of a boolean mask: distance (in cells) from each True cell
    to the nearest False cell; 0 on False cells.

    Matches scipy.ndimage.distance_transform_edt semantics.
    """
    free_mask = np.ascontiguousarray(free_mask.astype(np.uint8))
    lib = _load_native()
    if lib is not None:
        h, w = free_mask.shape
        out = np.empty((h, w), dtype=np.float64)
        lib.edt_2d(
            free_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(h),
            ctypes.c_int64(w),
        )
        return out
    from scipy.ndimage import distance_transform_edt

    return distance_transform_edt(free_mask)
