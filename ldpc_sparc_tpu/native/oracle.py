"""ctypes loader for the native BP oracle (bp_ref.cpp).

Builds the shared library on first use (g++ -O2, cached next to the source)
and loads it exactly once per process — fixing the reference's per-call
CDLL load of a hardcoded Windows path (ldpc_jossy/py/ldpc.py:467).
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess
import threading
from pathlib import Path
from typing import Tuple

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "bp_ref.cpp"
_LIB = _HERE / "build" / "libbp_ref.so"
_lock = threading.Lock()
_lib = None


def _build() -> Path:
    _LIB.parent.mkdir(exist_ok=True)
    if (not _LIB.exists()) or _SRC.stat().st_mtime > _LIB.stat().st_mtime:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True)
    return _LIB


def _load():
    global _lib
    with _lock:
        if _lib is None:
            lib = ct.CDLL(str(_build()))
            for name in ("ref_sumprod", "ref_sumprod2"):
                fn = getattr(lib, name)
                fn.restype = ct.c_int
                fn.argtypes = [ct.POINTER(ct.c_double), ct.POINTER(ct.c_int64),
                               ct.POINTER(ct.c_int64), ct.POINTER(ct.c_int64),
                               ct.c_int64, ct.c_int64, ct.c_int64,
                               ct.POINTER(ct.c_double), ct.c_int]
            lib.ref_minsum.restype = ct.c_int
            lib.ref_minsum.argtypes = [
                ct.POINTER(ct.c_double), ct.POINTER(ct.c_int64),
                ct.POINTER(ct.c_int64), ct.POINTER(ct.c_int64),
                ct.c_int64, ct.c_int64, ct.c_int64,
                ct.POINTER(ct.c_double), ct.c_double, ct.c_int]
            lib.ref_lxor.restype = ct.c_double
            lib.ref_lxor.argtypes = [ct.c_double, ct.c_double, ct.c_int]
            lib.ref_lxfb.restype = ct.c_double
            lib.ref_lxfb.argtypes = [ct.POINTER(ct.c_double), ct.c_int64,
                                     ct.c_int]
            _lib = lib
    return _lib


def decode(ch: np.ndarray, vdeg: np.ndarray, cdeg: np.ndarray,
           intrlv: np.ndarray, max_itcount: int = 200,
           dectype: str = "sumprod2",
           corr_factor: float = 0.7) -> Tuple[np.ndarray, int]:
    """Decode one codeword's LLRs. Returns (app, iterations)."""
    lib = _load()
    ch = np.ascontiguousarray(ch, dtype=np.float64)
    vdeg = np.ascontiguousarray(vdeg, dtype=np.int64)
    cdeg = np.ascontiguousarray(cdeg, dtype=np.int64)
    intrlv = np.ascontiguousarray(intrlv, dtype=np.int64)
    nv, nc, nmsg = vdeg.size, cdeg.size, intrlv.size
    assert ch.size == nv, "channel LLRs inconsistent with variable degrees"
    app = np.zeros(nv, dtype=np.float64)

    pd = ct.POINTER(ct.c_double)
    pl = ct.POINTER(ct.c_int64)
    args = (ch.ctypes.data_as(pd), vdeg.ctypes.data_as(pl),
            cdeg.ctypes.data_as(pl), intrlv.ctypes.data_as(pl),
            nv, nc, nmsg, app.ctypes.data_as(pd))
    if dectype == "sumprod":
        it = lib.ref_sumprod(*args, max_itcount)
    elif dectype == "sumprod2":
        it = lib.ref_sumprod2(*args, max_itcount)
    elif dectype == "minsum":
        it = lib.ref_minsum(*args, ct.c_double(corr_factor), max_itcount)
    else:
        raise ValueError(f"unknown decoder type {dectype!r}")
    return app, it


def lxor(a: float, b: float, correct: int = 1) -> float:
    return _load().ref_lxor(a, b, correct)


def lxfb(L: np.ndarray, correct: int = 1) -> Tuple[float, np.ndarray]:
    L = np.ascontiguousarray(L, dtype=np.float64).copy()
    total = _load().ref_lxfb(L.ctypes.data_as(ct.POINTER(ct.c_double)),
                             L.size, correct)
    return total, L
