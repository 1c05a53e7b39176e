"""Device-mesh utilities: data-parallel (+ optional tensor-parallel) layout.

The reference is single-GPU only (SURVEY.md §2.8); the TPU-native equivalent
scales by sharding the *cell* (batch) axis over a 1-D 'data' mesh with XLA
inserting the gradient all-reduce over ICI. A second 'model' axis is
supported for sharding wide gene-dimension heads (tensor parallelism) on
models whose output layers dominate memory (e.g. 33k-gene ZINB heads:
3 × 33k × hidden params).

Everything uses ``jax.sharding.NamedSharding`` + ``jit``: annotate shardings,
let XLA place collectives (the scaling-book recipe). No explicit collectives
in model code.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "shard_params", "device_memory_limit",
           "DATA_AXIS", "MODEL_AXIS"]


def device_memory_limit(default: int = 16 * 1024 ** 3) -> int:
  """Per-device memory limit in bytes; `default` when the runtime doesn't
  report one (CPU backends). Shared by the trainer's residency budget and
  the serving chunker."""
  try:
    stats = jax.devices()[0].memory_stats() or {}
    return int(stats.get("bytes_limit", default))
  except Exception:
    return default

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(n_data: Optional[int] = None,
                n_model: int = 1,
                devices=None) -> Mesh:
  """(n_data × n_model) mesh over available devices; defaults to all-data."""
  devices = list(devices if devices is not None else jax.devices())
  n_dev = len(devices)
  if n_data is None:
    n_data = n_dev // n_model
  assert n_data * n_model == n_dev, \
      f"{n_data}×{n_model} mesh cannot cover {n_dev} devices"
  arr = np.asarray(devices).reshape(n_data, n_model)
  return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
  """Shard the leading (cell) axis across the data axis."""
  return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
  """Place a {'inputs': [...], 'library', 'mask'} batch dict on the mesh with
  the cell axis sharded over 'data'."""
  sh = batch_sharding(mesh)
  return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def _param_spec(path, leaf, mesh: Mesh) -> P:
  """Default parameter layout: replicate everything; when the mesh has a
  nontrivial model axis, shard the widest matmul axis of large kernels."""
  if mesh.shape.get(MODEL_AXIS, 1) > 1 and getattr(leaf, "ndim", 0) == 2:
    out_dim = leaf.shape[1]
    if out_dim % mesh.shape[MODEL_AXIS] == 0 and out_dim >= 1024:
      return P(None, MODEL_AXIS)  # column-parallel wide heads
  return P()


def shard_params(params, mesh: Mesh):
  """Place a parameter pytree on the mesh (replicated, or column-sharded
  wide kernels when a model axis exists)."""
  def place(path, leaf):
    return jax.device_put(leaf, NamedSharding(mesh, _param_spec(path, leaf,
                                                                mesh)))
  return jax.tree_util.tree_map_with_path(place, params)
