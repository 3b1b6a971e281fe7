"""On-demand build + ctypes loading of the native I/O library.

Plays the role of the reference's runtime extension build
(``cuda_native/_generator.py:242-264``, ``setup.py install`` + importlib),
reduced to what a TPU framework still needs native code for: the I/O path.
The compiled .so is cached next to the source keyed by a source hash, so
rebuilds happen only when the C++ changes. Failure to build degrades to the
pure-numpy path — never fatal (mirroring the reference's fallback).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sysconfig
from typing import Optional

_CACHE: dict = {}

_SRC = os.path.join(os.path.dirname(__file__), "vtkio.cpp")


def _build(so_path: str) -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", so_path, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_native_lib() -> Optional[ctypes.CDLL]:
    """Return the loaded native library, building it if necessary, or None
    when no C++ toolchain is available."""
    if "lib" in _CACHE:
        return _CACHE["lib"]
    lib = None
    try:
        with open(_SRC, "rb") as fh:
            digest = hashlib.sha256(fh.read()).hexdigest()[:16]
        so_path = os.path.join(os.path.dirname(_SRC),
                               f"_vtkio_{digest}.so")
        if not os.path.exists(so_path):
            if not _build(so_path):
                _CACHE["lib"] = None
                return None
        lib = ctypes.CDLL(so_path)
        lib.lt_write_be_f32.restype = ctypes.c_int
        lib.lt_write_be_f32.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                        ctypes.c_int64]
        lib.lt_write_be_f64.restype = ctypes.c_int
        lib.lt_write_be_f64.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                        ctypes.c_int64]
        lib.lt_write_be_f32_fortran.restype = ctypes.c_int
        lib.lt_write_be_f32_fortran.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    except Exception:
        lib = None
    _CACHE["lib"] = lib
    return lib


def native_available() -> bool:
    return get_native_lib() is not None
