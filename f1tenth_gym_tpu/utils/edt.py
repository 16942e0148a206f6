"""Euclidean distance transform with a native C++ fast path.

The reference computes the EDT with scipy.ndimage (laser_models.py:40-53) —
a heavy one-time precompute per map. Here the default path is a native C++
implementation of Felzenszwalb & Huttenlocher's exact O(n) algorithm
(f1tenth_gym_tpu/native/edt.cpp) loaded via utils.native; scipy is the
fallback when the shared library can't be built. Both produce distances in
cell units; callers scale by map resolution.
"""

from __future__ import annotations

import ctypes

import numpy as np

from f1tenth_gym_tpu.utils.native import load as _load_native


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
