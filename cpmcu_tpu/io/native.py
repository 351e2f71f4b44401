"""ctypes bindings for the native loader library (csrc/stloader.cc).

Builds on demand with g++ (no pybind11 in this image; plain C ABI). All
entry points degrade gracefully: when the toolchain or build is missing,
callers fall back to the pure-python paths in hf_loader / ops.quant.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "stloader.cc")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_stloader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_DTYPES = {
    "F32": np.float32, "F16": np.float16, "I32": np.int32, "I64": np.int64,
    "I16": np.int16, "I8": np.int8, "U8": np.uint8, "BOOL": np.bool_,
    "F64": np.float64,
}


def build(force: bool = False) -> Optional[str]:
    """Compile csrc/stloader.cc -> io/_stloader.so. Returns path or None."""
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    if os.path.exists(_LIB_PATH) and not force:
        if os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
            return _LIB_PATH
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        src, "-o", _LIB_PATH, "-ldl",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.st_open.restype = ctypes.c_void_p
        lib.st_open.argtypes = [ctypes.c_char_p]
        lib.st_close.argtypes = [ctypes.c_void_p]
        lib.st_num_tensors.restype = ctypes.c_int64
        lib.st_num_tensors.argtypes = [ctypes.c_void_p]
        lib.st_name.restype = ctypes.c_char_p
        lib.st_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.st_dtype.restype = ctypes.c_char_p
        lib.st_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.st_ndim.restype = ctypes.c_int64
        lib.st_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.st_shape.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)
        ]
        lib.st_nbytes.restype = ctypes.c_int64
        lib.st_nbytes.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.st_data.restype = ctypes.c_void_p
        lib.st_data.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.repack_gptq_to_tpu.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64
        ]
        lib.install_crash_tracer.argtypes = []
        _lib = lib
        return _lib


def install_crash_tracer() -> bool:
    """Install the native SIGSEGV/ABRT/FPE/ILL/BUS backtrace handler
    (src/signal_handler.cu analog)."""
    lib = get_lib()
    if lib is None:
        return False
    lib.install_crash_tracer()
    return True


class NativeSafetensors:
    """Zero-copy mmap reader for one .safetensors file."""

    def __init__(self, path: str):
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("native loader unavailable")
        self.h = self.lib.st_open(path.encode())
        if not self.h:
            raise OSError(f"cannot open safetensors file {path}")
        self._index: Dict[str, int] = {
            self.lib.st_name(self.h, i).decode(): i
            for i in range(self.lib.st_num_tensors(self.h))
        }

    def keys(self):
        return list(self._index.keys())

    def validate_dtypes(self):
        """Raise ValueError if any tensor's dtype is outside _DTYPES/BF16.

        Called BEFORE any tensor is yielded so an unsupported dtype (e.g.
        F8_E4M3, U16) routes the WHOLE file to the safe_open fallback —
        a mid-iteration KeyError would otherwise abort loading after some
        tensors were already consumed (ADVICE.md round-1)."""
        for name, i in self._index.items():
            dt = self.lib.st_dtype(self.h, i).decode()
            if dt != "BF16" and dt not in _DTYPES:
                raise ValueError(f"unsupported safetensors dtype {dt} ({name})")

    def get(self, name: str) -> np.ndarray:
        """Zero-copy view (read-only) into the mapping."""
        i = self._index[name]
        nd = self.lib.st_ndim(self.h, i)
        shape = (ctypes.c_int64 * max(nd, 1))()
        self.lib.st_shape(self.h, i, shape)
        dt_name = self.lib.st_dtype(self.h, i).decode()
        nbytes = self.lib.st_nbytes(self.h, i)
        ptr = self.lib.st_data(self.h, i)
        buf = (ctypes.c_char * nbytes).from_address(ptr)
        if dt_name == "BF16":
            import ml_dtypes

            dt = np.dtype(ml_dtypes.bfloat16)
        else:
            dt = np.dtype(_DTYPES[dt_name])
        arr = np.frombuffer(buf, dtype=dt)
        return arr.reshape(tuple(shape[d] for d in range(nd)))

    def close(self):
        if self.h:
            self.lib.st_close(self.h)
            self.h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def repack_gptq_native(qweight: np.ndarray) -> Optional[np.ndarray]:
    """Multi-threaded GPTQ->TPU int4 nibble repack; None if unavailable.
    Equivalent of ops.quant unpack_rows+pack_rows composed."""
    lib = get_lib()
    if lib is None:
        return None
    k8, n = qweight.shape
    if (k8 * 8) % 1024 != 0:
        return None
    src = np.ascontiguousarray(qweight, dtype=np.int32)
    dst = np.empty_like(src)
    lib.repack_gptq_to_tpu(
        src.ctypes.data_as(ctypes.c_void_p),
        dst.ctypes.data_as(ctypes.c_void_p),
        k8, n,
    )
    return dst
