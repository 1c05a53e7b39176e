"""Sparse host→device transport: CSR triplets over the wire, one
scatter-add densify on device.

scRNA-seq count matrices are ~90% zeros; the transfer-bound paths (remote-
attached chips, out-of-core streaming) ship padded (vals, cols, rowlen)
triplets — 4-8 bytes/nonzero instead of 2-4 bytes/cell dense — and
reconstruct the dense block in HBM with a single flattened scatter-add.
Used by the out-of-core trainer chunks and the device-cached serving
batches. The reference streams dense tf.data batches
(/root/reference/sisua/data/_single_cell_base.py:539-602); sparse transport
has no equivalent there.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["col_dtype_for", "worthwhile", "csr_row_triplets",
           "make_densify", "int16_exact"]


def int16_exact(values) -> bool:
  """True when EVERY value is an integer with |v| < 32767 — the exactness
  precondition for int16 transport/storage. Full chunked scan, never a
  sampled prefix (one out-of-range value anywhere would silently wrap),
  and |·| so large NEGATIVE integers are rejected too."""
  flat = np.asarray(values).reshape(-1)
  for lo in range(0, flat.size, 16_777_216):
    chunk = flat[lo:lo + 16_777_216]
    # two-sided compare, NOT np.abs: abs(INT_MIN) overflows back to
    # INT_MIN (< 32767) and would sneak the most-negative value through
    if chunk.max() >= 32767 or chunk.min() <= -32767 \
        or np.any(chunk != np.round(chunk)):
      return False
  return True


def col_dtype_for(n_cols: int):
  """Narrowest unsigned dtype that can index every column."""
  return np.uint16 if n_cols <= 65535 else np.int32


def worthwhile(nnz: int, n_rows: int, n_cols: int, val_bytes: int,
               dense_itemsize: int, threshold: float = 0.7) -> bool:
  """Whether triplet upload beats dense upload by a clear margin."""
  col_bytes = 2 if n_cols <= 65535 else 4
  return nnz * (val_bytes + col_bytes) < threshold * (
      n_rows * n_cols * dense_itemsize)


def csr_row_triplets(indptr: np.ndarray, indices: np.ndarray,
                     data: np.ndarray, rows: Optional[np.ndarray],
                     cap: int, n_rows: int, val_dtype,
                     col_dtype) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
  """Gather CSR rows into padded (vals[cap], cols[cap], rowlen[n_rows])
  triplets. ``rows=None`` takes every row in order (no gather — a straight
  pad), padding ``rowlen`` with zero-length rows beyond the matrix.
  Padding entries carry value 0 so the device scatter-add ignores them."""
  if rows is None:
    total = int(indptr[-1])
    vals = np.zeros(cap, val_dtype)
    cols = np.zeros(cap, col_dtype)
    vals[:total] = data
    cols[:total] = indices
    rowlen = np.zeros(n_rows, np.int32)
    nr = len(indptr) - 1
    rowlen[:nr] = np.diff(indptr)
    return vals, cols, rowlen
  starts = indptr[rows]
  lens = indptr[rows + 1] - starts
  total = int(lens.sum())
  base = np.repeat(starts, lens)
  cum = np.cumsum(lens)
  within = np.arange(total, dtype=np.int64) - np.repeat(cum - lens, lens)
  si = base + within
  vals = np.zeros(cap, val_dtype)
  cols = np.zeros(cap, col_dtype)
  vals[:total] = data[si]
  cols[:total] = indices[si]
  rowlen = np.zeros(n_rows, np.int32)
  rowlen[:len(lens)] = lens
  return vals, cols, rowlen


def make_densify(n_rows: int, n_cols: int, cap: int, out_dtype):
  """Jitted CSR→dense for one (n_rows, n_cols) block: one scatter-add over
  flattened positions. ``jnp.repeat(..., total_repeat_length=cap)`` pads
  past sum(rowlen) with the last row id; padded triplets carry value 0, so
  those adds are no-ops. Cached per shape/dtype so repeated serving calls
  don't retrace."""
  return _make_densify_cached(int(n_rows), int(n_cols), int(cap),
                              np.dtype(out_dtype))


@lru_cache(maxsize=64)
def _make_densify_cached(n_rows: int, n_cols: int, cap: int, out_dtype):
  @jax.jit
  def densify(vals, cols, rowlen):
    row_ids = jnp.repeat(jnp.arange(n_rows, dtype=jnp.int32), rowlen,
                         total_repeat_length=cap)
    if n_rows * n_cols < 2 ** 31:
      flat = row_ids * np.int32(n_cols) + cols.astype(jnp.int32)
      dense = jnp.zeros((n_rows * n_cols,), out_dtype).at[flat].add(
          vals.astype(out_dtype))
    else:
      # flattened positions would overflow int32 past 2^31 elements
      # (reachable within a 0.35×HBM budget on ≥24 GB devices) and XLA
      # silently drops the wrapped adds under jit — scatter per-dimension
      # instead, where each index stays well inside int32
      dense = jnp.zeros((n_rows, n_cols), out_dtype).at[
          row_ids, cols.astype(jnp.int32)].add(vals.astype(out_dtype))
      return dense
    return dense.reshape(n_rows, n_cols)
  return densify
