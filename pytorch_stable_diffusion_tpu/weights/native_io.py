"""ctypes bridge to the native safetensors reader (csrc/safetensors_reader.cc).

Builds the shared library on first use (g++; no pybind11 in this toolchain)
and memory-maps checkpoints with zero-copy numpy views.  ``available()``
gates use; weights/convert.load_state_dict falls back to the pure-Python
safetensors package when the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "safetensors_reader.cc")
_LIB_DIR = os.path.expanduser("~/.cache/sdt_native")
_LIB = os.path.join(_LIB_DIR, "libsdt_safetensors.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "BF16": np.dtype("bfloat16") if hasattr(np, "bfloat16") else None,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}


def _ml_dtypes_bf16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def _build() -> Optional[str]:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"build failed: {e}"
    if r.returncode != 0:
        return f"g++ failed: {r.stderr[:500]}"
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            _build_error = _build()
            if _build_error:
                return None
        lib = ctypes.CDLL(_LIB)
        lib.st_open.restype = ctypes.c_void_p
        lib.st_open.argtypes = [ctypes.c_char_p]
        lib.st_error.restype = ctypes.c_char_p
        lib.st_error.argtypes = [ctypes.c_void_p]
        lib.st_num_tensors.restype = ctypes.c_int64
        lib.st_num_tensors.argtypes = [ctypes.c_void_p]
        lib.st_name.restype = ctypes.c_char_p
        lib.st_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.st_dtype.restype = ctypes.c_char_p
        lib.st_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.st_ndim.restype = ctypes.c_int64
        lib.st_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.st_shape.restype = None
        lib.st_shape.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.POINTER(ctypes.c_int64)]
        lib.st_data.restype = ctypes.c_void_p
        lib.st_data.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_uint64)]
        lib.st_close.restype = None
        lib.st_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def load_safetensors(path: str, copy: bool = True) -> Dict[str, np.ndarray]:
    """Read all tensors from ``path`` via the native reader.

    copy=True (default) detaches arrays from the mmap so the handle can be
    closed; copy=False returns zero-copy views (caller must keep the process
    alive and not mutate them — the mapping stays open for process lifetime).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native reader unavailable: {_build_error}")
    h = lib.st_open(path.encode())
    err = lib.st_error(h)
    if err:
        msg = err.decode()
        lib.st_close(h)
        raise ValueError(f"safetensors parse error in {path}: {msg}")
    out: Dict[str, np.ndarray] = {}
    try:
        n = lib.st_num_tensors(h)
        for i in range(n):
            name = lib.st_name(h, i).decode()
            dt_s = lib.st_dtype(h, i).decode()
            if dt_s == "BF16":
                dt = _ml_dtypes_bf16()
            else:
                dt = _DTYPES.get(dt_s)
                if dt is None:
                    raise ValueError(f"unsupported dtype {dt_s} for {name}")
            ndim = lib.st_ndim(h, i)
            shape = (ctypes.c_int64 * max(ndim, 1))()
            lib.st_shape(h, i, shape)
            shp = tuple(shape[j] for j in range(ndim))
            nbytes = ctypes.c_uint64()
            ptr = lib.st_data(h, i, ctypes.byref(nbytes))
            expect = int(np.prod(shp, dtype=np.int64)) * np.dtype(dt).itemsize
            if expect != nbytes.value:
                raise ValueError(
                    f"{name}: byte length {nbytes.value} != shape {shp} x {dt}")
            buf = (ctypes.c_char * nbytes.value).from_address(ptr)
            arr = np.frombuffer(buf, dtype=dt).reshape(shp)
            out[name] = arr.copy() if copy else arr
    finally:
        if copy:
            lib.st_close(h)
        # copy=False: leak the handle deliberately — views point into the map
    return out
