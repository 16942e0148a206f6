"""Loader for the native C++ preprocessing library.

The reference's lineage had a full C++ engine (base_classes.py:26-27,
f110_env_backup.py); here the native tier covers the host-side hot
precomputes — exact Felzenszwalb EDT and wall-contour extraction — built
from f1tenth_gym_tpu/native/*.cpp into one shared library, loaded via
ctypes. Every native function has a pure-Python/scipy/cv2 fallback.
"""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
from typing import Optional

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libf1tenth_native.so")


def _build() -> bool:
    srcs = sorted(glob.glob(os.path.join(_NATIVE_DIR, "*.cpp")))
    if not srcs:
        return False
    for flags in (["-fopenmp"], []):  # openmp when available, else serial
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", *flags, "-o", _SO_PATH,
                 *srcs],
                check=True, capture_output=True, timeout=180,
            )
            return True
        except Exception:
            continue
    return False


def _needs_rebuild() -> bool:
    if not os.path.exists(_SO_PATH):
        return True
    so_mtime = os.path.getmtime(_SO_PATH)
    return any(os.path.getmtime(p) > so_mtime
               for p in glob.glob(os.path.join(_NATIVE_DIR, "*.cpp")))


def load() -> Optional[ctypes.CDLL]:
    """The shared library, building it on first use; None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if _needs_rebuild() and not _build():
        if not os.path.exists(_SO_PATH):
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    lib.edt_2d.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.edt_2d.restype = None
    try:
        lib.extract_wall_segments.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        lib.extract_wall_segments.restype = ctypes.c_int
    except AttributeError:
        pass
    _LIB = lib
    return _LIB
