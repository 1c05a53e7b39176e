"""Checkpointing: pytree weights + sidecar metamodel manifest.

Reference behavior (``/root/reference/sisua/models/single_cell_model.py:
283-306`` + ``models/__init__.py:30-38``): ``save_weights`` writes TF weights
plus a pickled ``.metamodel`` of ``[class_name, dataset, metadata, kwargs]``;
``load_model`` reconstructs the class then loads weights. The TPU equivalent
serializes the param/batch-stats pytrees with flax msgpack and a JSON
metamodel (no pickle: portable, inspectable, safe).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ..nn import NetConf
from ..rv import RVmeta

__all__ = ["save_weights", "load_weights", "save_metamodel", "load_metamodel",
           "encode_spec", "decode_spec"]


def encode_spec(obj):
  """JSON-encode RVmeta / NetConf / Interpolation / plain values."""
  if isinstance(obj, RVmeta):
    return {"__rvmeta__": {"dim": obj.dim, "posterior": obj.posterior,
                           "projection": obj.projection, "name": obj.name,
                           "kwargs": list(map(list, obj.kwargs))}}
  if isinstance(obj, NetConf):
    d = dataclasses.asdict(obj)
    d["units"] = list(d["units"])
    return {"__netconf__": d}
  if isinstance(obj, (tuple, list)):
    return [encode_spec(o) for o in obj]
  if isinstance(obj, dict):
    return {k: encode_spec(v) for k, v in obj.items()}
  if isinstance(obj, (np.floating, np.integer)):
    return obj.item()
  return obj


def decode_spec(obj):
  if isinstance(obj, dict):
    if "__rvmeta__" in obj:
      d = obj["__rvmeta__"]
      return RVmeta(d["dim"], d["posterior"], d["projection"], d["name"],
                    tuple(tuple(kv) for kv in d.get("kwargs", [])))
    if "__netconf__" in obj:
      d = dict(obj["__netconf__"])
      d["units"] = tuple(d["units"])
      return NetConf(**d)
    return {k: decode_spec(v) for k, v in obj.items()}
  if isinstance(obj, list):
    return [decode_spec(o) for o in obj]
  return obj


def save_weights(path: str, params, batch_stats=None,
                 aux_params=None, backend: str = "msgpack") -> str:
  """Write <path>/params.msgpack (+ batch_stats / aux_params).

  ``backend='orbax'`` writes an orbax PyTree checkpoint instead
  (<path>/orbax/): sharded-array aware and the right choice for large
  multi-chip states; msgpack stays the default (single-file, dependency-
  light, byte-stable)."""
  if backend == "orbax":
    return _save_weights_orbax(path, params, batch_stats, aux_params)
  os.makedirs(path, exist_ok=True)
  with open(os.path.join(path, "params.msgpack"), "wb") as f:
    f.write(serialization.to_bytes(jax.device_get(params)))
  if batch_stats is not None:
    with open(os.path.join(path, "batch_stats.msgpack"), "wb") as f:
      f.write(serialization.to_bytes(jax.device_get(batch_stats)))
  if aux_params is not None:
    with open(os.path.join(path, "aux_params.msgpack"), "wb") as f:
      f.write(serialization.to_bytes(jax.device_get(aux_params)))
  return path


def load_weights(path: str, params_template, batch_stats_template=None,
                 aux_params_template=None) -> Tuple[Any, Any, Any]:
  """Load weights; auto-detects the backend (msgpack file vs orbax dir)."""
  if (not os.path.isfile(os.path.join(path, "params.msgpack"))
      and os.path.isdir(os.path.join(path, "orbax"))):
    return _load_weights_orbax(path, params_template, batch_stats_template,
                               aux_params_template)
  with open(os.path.join(path, "params.msgpack"), "rb") as f:
    params = serialization.from_bytes(params_template, f.read())
  batch_stats = batch_stats_template
  bs_path = os.path.join(path, "batch_stats.msgpack")
  if batch_stats_template is not None and os.path.isfile(bs_path):
    with open(bs_path, "rb") as f:
      batch_stats = serialization.from_bytes(batch_stats_template, f.read())
  aux = aux_params_template
  aux_path = os.path.join(path, "aux_params.msgpack")
  if aux_params_template is not None and os.path.isfile(aux_path):
    with open(aux_path, "rb") as f:
      aux = serialization.from_bytes(aux_params_template, f.read())
  return params, batch_stats, aux


def _orbax_tree(params, batch_stats, aux_params):
  tree = {"params": params}
  if batch_stats is not None:
    tree["batch_stats"] = batch_stats
  if aux_params is not None:
    tree["aux_params"] = aux_params
  return tree


def _save_weights_orbax(path: str, params, batch_stats, aux_params) -> str:
  import orbax.checkpoint as ocp
  os.makedirs(path, exist_ok=True)
  target = os.path.abspath(os.path.join(path, "orbax"))
  with ocp.StandardCheckpointer() as ckptr:
    ckptr.save(target, _orbax_tree(params, batch_stats, aux_params),
               force=True)
  return path


def _load_weights_orbax(path: str, params_template, batch_stats_template,
                        aux_params_template) -> Tuple[Any, Any, Any]:
  import orbax.checkpoint as ocp
  target = os.path.abspath(os.path.join(path, "orbax"))
  template = _orbax_tree(params_template, batch_stats_template,
                         aux_params_template)
  with ocp.StandardCheckpointer() as ckptr:
    tree = ckptr.restore(target, template)
  return (tree["params"], tree.get("batch_stats", batch_stats_template),
          tree.get("aux_params", aux_params_template))


def save_metamodel(path: str, class_name: str, dataset: Optional[str],
                   metadata: Dict, init_kwargs: Dict) -> str:
  os.makedirs(path, exist_ok=True)
  manifest = {
      "class_name": class_name,
      "dataset": dataset,
      "metadata": encode_spec(metadata),
      "init_kwargs": encode_spec(init_kwargs),
      "format_version": 1,
  }
  with open(os.path.join(path, "metamodel.json"), "w") as f:
    json.dump(manifest, f, indent=2)
  return path


def load_metamodel(path: str):
  with open(os.path.join(path, "metamodel.json")) as f:
    m = json.load(f)
  return (m["class_name"], m.get("dataset"), decode_spec(m.get("metadata")),
          decode_spec(m.get("init_kwargs")))
