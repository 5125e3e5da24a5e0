"""ctypes bindings for the native host-side mesh kernels (native/meshkit.cpp).

The library auto-builds with g++ on first use and caches the .so; every
entry point has a pure-Python fallback, so the framework works without a
compiler.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from omfs4d.core.logging import get_logger

log = get_logger("native")

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "meshkit.cpp"
_LIB_PATH = _SRC.parent / "libmeshkit.so"
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(_SRC)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.laplacian_smooth.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_float,
        ]
        lib.qem_decimate.restype = ctypes.c_int64
        lib.qem_decimate.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except Exception as e:  # noqa: BLE001
        log.warning(f"native meshkit unavailable ({e}); using Python fallbacks")
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def laplacian_smooth_native(verts: np.ndarray, nbr: np.ndarray,
                            mask: np.ndarray, n_iter: int,
                            relax: float) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, dtype=np.float32).copy()
    nbr = np.ascontiguousarray(nbr, dtype=np.int64)
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    lib.laplacian_smooth(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nbr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        v.shape[0], nbr.shape[1], int(n_iter), float(relax),
    )
    return v


def qem_decimate_native(verts: np.ndarray, faces: np.ndarray,
                        target_faces: int):
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, dtype=np.float32)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    out_v = np.zeros_like(v)
    out_f = np.zeros_like(f)
    out_nv = ctypes.c_int64(0)
    nf = lib.qem_decimate(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.shape[0],
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), f.shape[0],
        int(target_faces),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(out_nv),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out_v[: out_nv.value].copy(), out_f[:nf].copy()
