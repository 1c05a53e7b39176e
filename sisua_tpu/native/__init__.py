"""Native (C++) host-side kernels with lazy compilation + numpy fallback.

The reference framework is 100% Python (SURVEY.md §2.9); the only native work
in the original stack lived inside the TF runtime. Our TPU-native pipeline
adds one genuine host-side hot spot — gathering shuffled CSR rows into dense
device-feed buffers — implemented in C++ (csr_gather.cpp) and bound via
ctypes (no pybind11 in this image). Falls back to scipy/numpy if a compiler
is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["get_lib", "csr_gather", "dense_gather", "native_available"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "csr_gather.cpp")
_SO = os.path.join(_DIR, "_native.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _compile() -> bool:
  cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO]
  try:
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    return True
  except Exception:
    return False


def get_lib() -> Optional[ctypes.CDLL]:
  global _LIB, _TRIED
  with _LOCK:
    if _LIB is not None or _TRIED:
      return _LIB
    _TRIED = True
    if not os.path.isfile(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
      if not _compile():
        return None
    try:
      lib = ctypes.CDLL(_SO)
    except OSError:
      return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    for fn in ("csr_gather_f32", "csr_gather_log1p_f32"):
      getattr(lib, fn).argtypes = [f32p, i64p, i64p, i64p,
                                   ctypes.c_int64, ctypes.c_int64, f32p]
      getattr(lib, fn).restype = None
    lib.dense_gather_f32.argtypes = [f32p, i64p, ctypes.c_int64,
                                     ctypes.c_int64, f32p]
    lib.dense_gather_f32.restype = None
    _LIB = lib
    return _LIB


def _ptr(a: np.ndarray, ctype):
  return a.ctypes.data_as(ctypes.POINTER(ctype))


def _as1d(a: np.ndarray, dtype) -> np.ndarray:
  """Coerce to a C-contiguous 1-D array of the kernel's expected dtype —
  the ctypes call reinterprets raw memory, so a scipy-default int32
  indices buffer read as int64 would produce wild out-of-bounds writes."""
  return np.ascontiguousarray(a, dtype=dtype)


def csr_gather(data: np.ndarray, indices: np.ndarray, indptr: np.ndarray,
               rows: np.ndarray, n_cols: int,
               out: Optional[np.ndarray] = None,
               log1p: bool = False) -> np.ndarray:
  """Gather CSR rows into a dense (len(rows), n_cols) float32 buffer.

  Accepts any integer/float dtypes (scipy defaults to int32 indices and
  float64 data) — inputs are coerced to the kernel's int64/float32 ABI."""
  lib = get_lib()
  n_rows = len(rows)
  if out is None:
    out = np.empty((n_rows, n_cols), np.float32)
  assert out.dtype == np.float32 and out.flags.c_contiguous \
      and out.shape == (n_rows, n_cols), "out must be C-contiguous f32"
  data = _as1d(data, np.float32)
  indices = _as1d(indices, np.int64)
  indptr = _as1d(indptr, np.int64)
  rows = _as1d(rows, np.int64)
  if lib is None:  # numpy fallback
    out[:] = 0.0
    for r, row in enumerate(rows):
      lo, hi = indptr[row], indptr[row + 1]
      vals = data[lo:hi]
      out[r, indices[lo:hi]] = np.log1p(vals) if log1p else vals
    return out
  fn = lib.csr_gather_log1p_f32 if log1p else lib.csr_gather_f32
  fn(_ptr(data, ctypes.c_float), _ptr(indices, ctypes.c_int64),
     _ptr(indptr, ctypes.c_int64), _ptr(rows, ctypes.c_int64),
     n_rows, n_cols, _ptr(out, ctypes.c_float))
  return out


def dense_gather(src: np.ndarray, rows: np.ndarray,
                 out: Optional[np.ndarray] = None) -> np.ndarray:
  lib = get_lib()
  n_rows, n_cols = len(rows), src.shape[1]
  if out is None:
    out = np.empty((n_rows, n_cols), np.float32)
  # same guard as csr_gather: the C kernel memcpys through the raw pointer,
  # so a wrong-dtype/short/non-contiguous out is silent memory corruption
  assert out.dtype == np.float32 and out.flags.c_contiguous \
      and out.shape == (n_rows, n_cols), "out must be C-contiguous f32"
  if (lib is None or not src.flags.c_contiguous
      or src.dtype != np.float32):
    np.take(src.astype(np.float32, copy=False), rows, axis=0, out=out)
    return out
  rows = _as1d(rows, np.int64)
  lib.dense_gather_f32(_ptr(src, ctypes.c_float),
                       _ptr(rows, ctypes.c_int64),
                       n_rows, n_cols, _ptr(out, ctypes.c_float))
  return out


def native_available() -> bool:
  return get_lib() is not None
