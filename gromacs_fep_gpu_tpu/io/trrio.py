"""TRR trajectory I/O via the native XDR codec (native/trrio.cc).

Python side: builds the shared library on first use (g++ available per
the environment), then calls through ctypes with zero-copy numpy buffers.
The format interoperates with GROMACS `gmx dump -f`, `gmx check` etc.
(reference wire format: src/gromacs/fileio/trrio.cpp)."""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB = None


def _build_lib() -> str:
    """Compile trrio.cc into a per-source-hash cache path.

    The binary is never committed; keying the output on the source content
    hash guarantees a stale or divergent .so is never loaded."""
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "..", "native", "trrio.cc")
    with open(src, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    cache = os.environ.get("TPUMD_NATIVE_CACHE",
                           os.path.join(os.path.expanduser("~"),
                                        ".cache", "tpumd"))
    os.makedirs(cache, exist_ok=True)
    out = os.path.join(cache, f"_trrio_{digest}.so")
    if not os.path.exists(out):
        tmp = out + f".tmp{os.getpid()}"
        subprocess.check_call(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp])
        os.replace(tmp, out)
    return out


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build_lib())
            fp = ctypes.POINTER(ctypes.c_float)
            ip = ctypes.POINTER(ctypes.c_int)
            lib.trr_write_frame.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
                ctypes.c_float, fp, fp, fp, fp]
            lib.trr_write_frame.restype = ctypes.c_int
            lib.trr_scan.argtypes = [ctypes.c_char_p, ip, ip]
            lib.trr_scan.restype = ctypes.c_int
            lib.trr_read_frame.argtypes = [
                ctypes.c_char_p, ctypes.c_int, fp, fp, fp, fp, ip,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ip, ip, ip]
            lib.trr_read_frame.restype = ctypes.c_int
            _LIB = lib
    return _LIB


def _fptr(a: Optional[np.ndarray]):
    if a is None:
        return None
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def write_trr_frame(path: str, x: np.ndarray, box: np.ndarray,
                    v: Optional[np.ndarray] = None,
                    f: Optional[np.ndarray] = None,
                    step: int = 0, time: float = 0.0, lam: float = 0.0):
    """Append one frame (x in nm, (N,3) float32)."""
    lib = _lib()
    x = np.ascontiguousarray(x, np.float32)
    box9 = np.ascontiguousarray(box, np.float32).reshape(9)
    v = None if v is None else np.ascontiguousarray(v, np.float32)
    f = None if f is None else np.ascontiguousarray(f, np.float32)
    rc = lib.trr_write_frame(path.encode(), x.shape[0], step, time, lam,
                             _fptr(box9), _fptr(x), _fptr(v), _fptr(f))
    if rc != 0:
        raise IOError(f"trr write failed ({rc}) for {path}")


def scan_trr(path: str) -> Tuple[int, int]:
    """(natoms, nframes)."""
    lib = _lib()
    na, nf = ctypes.c_int(), ctypes.c_int()
    rc = lib.trr_scan(path.encode(), ctypes.byref(na), ctypes.byref(nf))
    if rc != 0:
        raise IOError(f"trr scan failed ({rc}) for {path}")
    return na.value, nf.value


def read_trr_frame(path: str, index: int, natoms: int):
    """Returns dict with x/v/f (or None), box, step, time, lam."""
    lib = _lib()
    x = np.zeros((natoms, 3), np.float32)
    v = np.zeros((natoms, 3), np.float32)
    f = np.zeros((natoms, 3), np.float32)
    box9 = np.zeros(9, np.float32)
    step = ctypes.c_int()
    t = ctypes.c_float()
    lam = ctypes.c_float()
    hx, hv, hf = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    rc = lib.trr_read_frame(path.encode(), index, _fptr(box9), _fptr(x),
                            _fptr(v), _fptr(f), ctypes.byref(step),
                            ctypes.byref(t), ctypes.byref(lam),
                            ctypes.byref(hx), ctypes.byref(hv),
                            ctypes.byref(hf))
    if rc != 0:
        raise IOError(f"trr read failed ({rc}) for {path} frame {index}")
    return {
        "x": x if hx.value else None,
        "v": v if hv.value else None,
        "f": f if hf.value else None,
        "box": box9.reshape(3, 3),
        "step": step.value,
        "time": t.value,
        "lam": lam.value,
    }
