"""Native (C++) host-side loader core: build, load, and ctypes bindings.

The TPU compute path is XLA/Pallas; this package is the *host* runtime's
native half — the analogue of the reference's C++ torch-DataLoader workers +
PIL/torchvision native resample loops (Shanghai.py:31-49). The C++ source
(`km_loader.cc`) is compiled on first use with the in-image g++ and loaded
via ctypes; every entry point here degrades to ``None`` so callers can fall
back to the numpy formulation when no toolchain is available.

Calls release the GIL (plain ctypes), so the Python-side DataLoader worker
threads overlap on multi-core hosts.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "km_loader.cc")
_SO = os.path.join(_DIR, "_km_loader.so")

_lib = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)  # atomic: concurrent builders race harmlessly
        return _SO
    except (subprocess.SubprocessError, OSError):
        if os.path.exists(tmp):
            os.unlink(tmp)
        return None


def load() -> Optional[ctypes.CDLL]:
    """The loader library, building it on first call; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    common = [f32p, i32p, ctypes.c_long, ctypes.c_long,
              f32p, i32p, ctypes.c_long, ctypes.c_long, f32p, f32p]
    lib.km_resize_u8.restype = None
    lib.km_resize_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long, ctypes.c_long, ctypes.c_long] + common
    lib.km_resize_f32.restype = None
    lib.km_resize_f32.argtypes = [
        f32p, ctypes.c_long, ctypes.c_long, ctypes.c_long] + common
    _lib = lib
    return _lib


def to_banded(W: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Dense (out, in) filter matrix -> (vals (out, max_taps), starts (out,)).

    The triangle-filter rows have contiguous support; starts are left-shifted
    so every ``max_taps`` window fits inside the input (the C++ inner loops
    never bounds-check), with weights zero-padded into position.
    """
    out_size, in_size = W.shape
    nz = W != 0
    max_t = max(int(nz.sum(axis=1).max()), 1)
    max_t = min(max_t, in_size)
    vals = np.zeros((out_size, max_t), np.float32)
    starts = np.zeros(out_size, np.int32)
    for i in range(out_size):
        idx = np.flatnonzero(nz[i])
        if len(idx) == 0:
            continue
        s = min(int(idx[0]), in_size - max_t)
        vals[i, idx - s] = W[i, idx]
        starts[i] = s
    return vals, starts


def banded_resize(src: np.ndarray,
                  wh: np.ndarray, hstart: np.ndarray,
                  ww: np.ndarray, wstart: np.ndarray,
                  tmp: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
    """Separable banded resize of (..., H, W) uint8/float32 frames.

    Returns (..., Ho, Wo) float32, or None when the native library is
    unavailable (caller falls back to the dense numpy path).
    """
    lib = load()
    if lib is None:
        return None
    lead = src.shape[:-2]
    H, W = src.shape[-2:]
    wh = np.ascontiguousarray(wh, np.float32)
    ww = np.ascontiguousarray(ww, np.float32)
    hstart = np.ascontiguousarray(hstart, np.int32)
    wstart = np.ascontiguousarray(wstart, np.int32)
    # The C++ inner loops don't bounds-check (the banded starts are built so
    # start + max_taps fits the INTENDED input); a mismatched src would read
    # out of bounds. Reject it here — the numpy fallback raises cleanly.
    if (H < int(hstart.max()) + wh.shape[1] or W < int(wstart.max()) + ww.shape[1]
            or hstart.min() < 0 or wstart.min() < 0):
        return None
    Ho, max_th = wh.shape
    Wo, max_tw = ww.shape
    x = np.ascontiguousarray(src.reshape(-1, H, W))
    n = x.shape[0]
    out = np.empty((n, Ho, Wo), np.float32)
    if tmp is None:
        tmp = np.empty((Ho, W), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    args = (
        ctypes.c_long(n), ctypes.c_long(H), ctypes.c_long(W),
        wh.ctypes.data_as(f32p), hstart.ctypes.data_as(i32p),
        ctypes.c_long(max_th), ctypes.c_long(Ho),
        ww.ctypes.data_as(f32p), wstart.ctypes.data_as(i32p),
        ctypes.c_long(max_tw), ctypes.c_long(Wo),
        out.ctypes.data_as(f32p), tmp.ctypes.data_as(f32p),
    )
    if x.dtype == np.uint8:
        lib.km_resize_u8(x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), *args)
    elif x.dtype == np.float32:
        lib.km_resize_f32(x.ctypes.data_as(f32p), *args)
    else:
        return None
    return out.reshape(*lead, Ho, Wo)
