"""DataFeeder — host-side CSR→dense streaming batches for TPU training.

Replaces the reference's tf.data pipeline
(``/root/reference/sisua/data/_single_cell_base.py:539-602``) with a
TPU-idiomatic design:

  * counts stay CSR on host; each step gathers a shuffled row-batch into a
    reused dense float32 buffer via the native C++ kernel
    (``sisua_tpu/native``) — the "CSR → dense HBM batches" path;
  * static shapes: ``drop_remainder=True`` by default so every batch jits to
    one executable (the final partial batch would trigger recompilation);
  * semi-supervised masking: per-example Bernoulli(labels_percent) mask
    drawn ONCE per run — the reference caches its masking map (map→cache,
    :577-597), so the labeled subset is fixed across epochs; validation
    passes ``labels_percent=1.0``;
  * emits ``{'inputs': [x_0…x_k], 'library': (B,2), 'mask': (B,)}`` numpy
    dicts; the trainer's ``_prefetch_iter`` overlaps the host gathers
    with compute.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
from scipy import sparse

from ..native import csr_gather, dense_gather

__all__ = ["DataFeeder"]


class _CSRSource:
  def __init__(self, m: sparse.spmatrix):
    m = m.tocsr()
    self.data = np.ascontiguousarray(m.data, np.float32)
    self.indices = np.ascontiguousarray(m.indices, np.int64)
    self.indptr = np.ascontiguousarray(m.indptr, np.int64)
    self.shape = m.shape

  def gather(self, rows: np.ndarray, out: np.ndarray) -> np.ndarray:
    return csr_gather(self.data, self.indices, self.indptr, rows,
                      self.shape[1], out=out)


class _DenseSource:
  def __init__(self, m: np.ndarray):
    self.m = np.ascontiguousarray(m, np.float32)
    self.shape = m.shape

  def gather(self, rows: np.ndarray, out: np.ndarray) -> np.ndarray:
    return dense_gather(self.m, rows, out=out)


class DataFeeder:
  """Iterable over epoch batches with deterministic seeded shuffling."""

  def __init__(self,
               matrices: Sequence,
               library: Optional[np.ndarray] = None,
               labels_percent: float = 0.0,
               batch_size: int = 64,
               drop_remainder: bool = True,
               shuffle: int = 1000,
               seed: int = 1):
    assert len(matrices) >= 1
    self.sources = [
        _CSRSource(m) if sparse.issparse(m) else _DenseSource(np.asarray(m))
        for m in matrices]
    n = self.sources[0].shape[0]
    for s in self.sources:
      assert s.shape[0] == n, "all omics must share the cell axis"
    self.n_obs = n
    self.library = (np.ascontiguousarray(library, np.float32)
                    if library is not None else None)
    self.labels_percent = float(labels_percent)
    self.batch_size = int(batch_size)
    self.drop_remainder = bool(drop_remainder)
    self.shuffle = bool(shuffle)
    self.seed = int(seed)
    self._epoch = 0
    self.transfer_dtype = None  # see set_transfer_dtype

  def set_transfer_dtype(self, dtype) -> "DataFeeder":
    """Compress host→device batch transfers: ``'int16'`` ships the gathered
    count matrices as int16 (exact for integral counts < 32768 — validated
    here), halving the upload bytes on transfer-bound links; ``'auto'``
    enables it when the data qualifies; ``None`` disables. The training
    step widens back to float32 in-executable."""
    if dtype in (None, "float32"):
      self.transfer_dtype = None
      return self
    assert dtype in ("auto", "int16"), dtype
    from ..ops.sparse import int16_exact
    ok = all(int16_exact(src.data if hasattr(src, "indptr") else src.m)
             for src in self.sources)
    if not ok:
      if dtype == "int16":
        raise ValueError("transfer_dtype='int16' requires integral counts "
                         "< 32768 in every source")
      self.transfer_dtype = None
    else:
      self.transfer_dtype = np.int16
    return self

  def _cast(self, xs):
    if self.transfer_dtype is None:
      return xs
    return [x.astype(self.transfer_dtype) for x in xs]

  # ------------------------------------------------------------------ sizing
  @property
  def n_inputs(self) -> int:
    return len(self.sources)

  @property
  def input_dims(self) -> List[int]:
    return [s.shape[1] for s in self.sources]

  def __len__(self) -> int:
    if self.drop_remainder:
      return self.n_obs // self.batch_size
    return int(np.ceil(self.n_obs / self.batch_size))

  # --------------------------------------------------------------- iteration
  def set_epoch(self, epoch: int) -> "DataFeeder":
    self._epoch = int(epoch)
    return self

  def _run_mask(self) -> np.ndarray:
    """Per-example semi-supervised mask, drawn ONCE per feeder — the
    reference pipeline caches its masking map (`_single_cell_base.py:
    577-597`: map→cache), so the labeled subset is FIXED for the whole
    run, not resampled per epoch. At low labels_percent resampling would
    turn 'k% labeled cells' into 'all cells weakly labeled', a different
    (and easier) protocol."""
    if getattr(self, "_mask_all", None) is None:
      rng = np.random.RandomState((self.seed * 2654435761 + 0x5EED)
                                  % (2**31 - 1))
      self._mask_all = (rng.uniform(size=self.n_obs) <
                        self.labels_percent).astype(np.float32)
    return self._mask_all

  def __iter__(self) -> Iterator[Dict[str, object]]:
    rng = np.random.RandomState(self.seed + self._epoch)
    order = (rng.permutation(self.n_obs) if self.shuffle
             else np.arange(self.n_obs)).astype(np.int64)
    mask_all = self._run_mask()
    n_batches = len(self)
    for b in range(n_batches):
      rows = order[b * self.batch_size:(b + 1) * self.batch_size]
      # IMPORTANT: a fresh output buffer per batch. JAX's CPU backend may
      # alias host numpy buffers zero-copy and dispatch asynchronously —
      # reusing gather buffers here races with still-queued steps and
      # produces corrupted batches (observed as intermittent NaN losses).
      xs = self._cast(
          [src.gather(rows, out=np.empty((len(rows), src.shape[1]),
                                         np.float32))
           for src in self.sources])
      batch: Dict[str, object] = {"inputs": xs, "mask": mask_all[rows]}
      if self.library is not None:
        batch["library"] = self.library[rows]
      yield batch
    self._epoch += 1

  def iter_chunks(self, k: int) -> Iterator[Dict[str, object]]:
    """Epoch iterator over k-step chunks: arrays stacked to (k, B, D).

    One host→device transfer then ``lax.scan`` over k train steps inside a
    single executable — the multi-step pipeline that amortizes per-step
    dispatch/transfer latency (essential over remote-device links)."""
    rng = np.random.RandomState(self.seed + self._epoch)
    order = (rng.permutation(self.n_obs) if self.shuffle
             else np.arange(self.n_obs)).astype(np.int64)
    mask_all = self._run_mask()
    bs = self.batch_size
    n_chunks = self.n_obs // (k * bs)
    for c in range(n_chunks):
      rows = order[c * k * bs:(c + 1) * k * bs]
      xs = self._cast(
          [src.gather(rows, out=np.empty((len(rows), src.shape[1]),
                                         np.float32)).reshape(
                                             k, bs, src.shape[1])
           for src in self.sources])
      batch: Dict[str, object] = {"inputs": xs,
                                  "mask": mask_all[rows].reshape(k, bs)}
      if self.library is not None:
        batch["library"] = self.library[rows].reshape(k, bs, -1)
      yield batch
    self._epoch += 1

  def n_chunks(self, k: int) -> int:
    return self.n_obs // (k * self.batch_size)

  def full_batches(self, batch_size: Optional[int] = None
                   ) -> Iterator[Dict[str, object]]:
    """Sequential, un-shuffled, no-mask iteration (for predict/eval)."""
    bs = batch_size or self.batch_size
    for b in range(int(np.ceil(self.n_obs / bs))):
      rows = np.arange(b * bs, min((b + 1) * bs, self.n_obs), dtype=np.int64)
      xs = [src.gather(rows, out=np.empty((len(rows), src.shape[1]),
                                          np.float32))
            for src in self.sources]
      batch = {"inputs": xs,
               "mask": np.ones((len(rows),), np.float32)}
      if self.library is not None:
        batch["library"] = self.library[rows]
      yield batch
