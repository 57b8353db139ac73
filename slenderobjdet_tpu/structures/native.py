"""ctypes loader for the native border-map renderer (csrc/border_render.c).

Same auto-build protocol as evaluation/native.py: compiled with the system
C compiler on first use, cached next to the source, silent numpy fallback
when no compiler is available (callers check `available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "csrc")
_SRC = os.path.join(_DIR, "border_render.c")
_SO = os.path.join(_DIR, "_border_render.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    for cc in ("cc", "gcc", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                capture_output=True, text=True, timeout=120,
            )
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                if not _build():
                    return None
            lib = ctypes.CDLL(_SO)
            lib.render_instance_maps.restype = ctypes.c_int
            lib.render_instance_maps.argtypes = (
                [ctypes.c_int] * 6
                + [ctypes.c_void_p, ctypes.c_double, ctypes.c_double,
                   ctypes.c_double]
                + [ctypes.c_void_p] * 3
            )
            lib.render_center_score.restype = ctypes.c_int
            lib.render_center_score.argtypes = (
                [ctypes.c_int] * 6
                + [ctypes.c_void_p, ctypes.c_double, ctypes.c_double,
                   ctypes.c_int, ctypes.c_double, ctypes.c_void_p]
            )
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray) -> ctypes.c_void_p:
    return ctypes.c_void_p(a.ctypes.data)


def render_instance_maps(hull: np.ndarray, o, dilate_dist: float,
                         window, border: np.ndarray, center: np.ndarray,
                         sizes: np.ndarray) -> bool:
    """Render one instance into the full-image float32 maps in place.
    window = (x0, y0, x1, y1), pre-clipped. Returns False if the kernel
    declined (hull too large) — caller falls back to numpy."""
    lib = _load()
    if lib is None:
        return False
    hull = np.ascontiguousarray(hull, np.float64)
    x0, y0, x1, y1 = window
    ok = lib.render_instance_maps(
        hull.shape[0], x0, y0, x1, y1, border.shape[1],
        _ptr(hull), float(o[0]), float(o[1]), float(dilate_dist),
        _ptr(border), _ptr(center), _ptr(sizes))
    return bool(ok)


def render_center_score(hull: np.ndarray, o, standard: str, sigma: float,
                        window, out: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    hull = np.ascontiguousarray(hull, np.float64)
    x0, y0, x1, y1 = window
    ok = lib.render_center_score(
        hull.shape[0], x0, y0, x1, y1, out.shape[1],
        _ptr(hull), float(o[0]), float(o[1]),
        0 if standard == "linear" else 1, float(sigma), _ptr(out))
    return bool(ok)
