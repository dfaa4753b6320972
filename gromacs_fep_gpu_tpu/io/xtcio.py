"""XTC compressed-trajectory I/O via the native codec (native/xtcio.cc).

Same build-on-first-use ctypes pattern as io/trrio.py.  The wire format
interoperates with GROMACS tools (`gmx check -f traj.xtc` etc.;
reference: src/gromacs/fileio/xtcio.cpp + libxdrf.cpp 3dfcoord)."""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB = None


def _build_lib() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "..", "native", "xtcio.cc")
    with open(src, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    cache = os.environ.get("TPUMD_NATIVE_CACHE",
                           os.path.join(os.path.expanduser("~"),
                                        ".cache", "tpumd"))
    os.makedirs(cache, exist_ok=True)
    out = os.path.join(cache, f"_xtcio_{digest}.so")
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
            lib.xtc_write_frame.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
                fp, fp, ctypes.c_float]
            lib.xtc_write_frame.restype = ctypes.c_int
            lib.xtc_scan.argtypes = [ctypes.c_char_p, ip, ip]
            lib.xtc_scan.restype = ctypes.c_int
            lib.xtc_read_frame.argtypes = [
                ctypes.c_char_p, ctypes.c_int, fp, fp, ip,
                ctypes.POINTER(ctypes.c_float), ip,
                ctypes.POINTER(ctypes.c_float)]
            lib.xtc_read_frame.restype = ctypes.c_int
            _LIB = lib
    return _LIB


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def write_xtc_frame(path: str, x: np.ndarray, box: np.ndarray,
                    step: int = 0, time: float = 0.0,
                    precision: float = 1000.0):
    """Append one compressed frame (x in nm, (N,3); precision in 1/nm —
    1000 keeps 3 decimals, the GROMACS default)."""
    lib = _lib()
    x = np.ascontiguousarray(x, np.float32)
    box9 = np.ascontiguousarray(box, np.float32).reshape(9)
    rc = lib.xtc_write_frame(path.encode(), x.shape[0], step, time,
                             _fptr(box9), _fptr(x), precision)
    if rc != 0:
        raise IOError(f"xtc write failed ({rc}) for {path}")


def scan_xtc(path: str) -> Tuple[int, int]:
    """(natoms, nframes)."""
    lib = _lib()
    nf, na = ctypes.c_int(), ctypes.c_int()
    rc = lib.xtc_scan(path.encode(), ctypes.byref(nf), ctypes.byref(na))
    if rc != 0:
        raise IOError(f"xtc scan failed ({rc}) for {path}")
    return na.value, nf.value


def read_xtc_frame(path: str, index: int, natoms: int):
    """Returns dict with x, box, step, time, precision."""
    lib = _lib()
    x = np.zeros((natoms, 3), np.float32)
    box9 = np.zeros(9, np.float32)
    na = ctypes.c_int()
    t = ctypes.c_float()
    step = ctypes.c_int()
    prec = ctypes.c_float()
    rc = lib.xtc_read_frame(path.encode(), index, _fptr(box9), _fptr(x),
                            ctypes.byref(na), ctypes.byref(t),
                            ctypes.byref(step), ctypes.byref(prec))
    if rc != 0:
        raise IOError(f"xtc read failed ({rc}) for {path} frame {index}")
    assert na.value == natoms, (na.value, natoms)
    return {"x": x, "box": box9.reshape(3, 3), "step": step.value,
            "time": t.value, "precision": prec.value}
