"""sisua_tpu.models — the model zoo + registry.

API parity with ``/root/reference/sisua/models/__init__.py:11-38``:
``get_all_models()`` scans this namespace for SingleCellModel subclasses,
``get_model(name)`` resolves by class name or capital-letter id, and
``load_model(path)`` reconstructs a saved model from its metamodel manifest
then loads the weights. Re-exports NetConf / RVmeta / interpolation like the
reference package.
"""

from __future__ import annotations

import inspect
from typing import List, Type

from .. import interpolation
from ..interpolation import Interpolation
from ..nn import NetConf
from ..rv import RVmeta
from .autozi import AUTOZI, AUTOZIModule
from .base import SingleCellModel
from .cellassign import CellAssign
from .dca import DeepCountAutoencoder
from .fvae import FVAE, SemiFVAE
from .ldvae import LDVAE
from .module import SCVIModule, VAEModule, VAEOutput
from .multivi import MULTIVI, MULTIVIModule
from .objective import compute_loss, elbo_terms
from .peakvi import PEAKVI, PEAKVIModule
from .scale import SCALAR, SCALE
from .scanvi import SCANVI, SCANVIModule
from .scscope import SCScope, SCScopeModule
from .scvi import SCVI
from .solo import SOLO
from .totalvi import TotalVI, TotalVIModule
from .vae import MISA, SISUA, VAE

__all__ = [
    "SingleCellModel", "VAE", "SISUA", "MISA", "DeepCountAutoencoder",
    "SCVI", "LDVAE", "AUTOZI", "AUTOZIModule",
    "SCANVI", "SCANVIModule", "PEAKVI", "PEAKVIModule",
    "TotalVI", "TotalVIModule", "MULTIVI", "MULTIVIModule",
    "SCALE", "SCALAR", "FVAE", "SemiFVAE",
    "SCScope", "SCScopeModule", "SOLO", "CellAssign",
    "get_model", "get_all_models", "load_model",
    "NetConf", "RVmeta", "Interpolation", "interpolation",
    "VAEModule", "SCVIModule", "VAEOutput", "compute_loss", "elbo_terms",
]


def get_all_models() -> List[Type[SingleCellModel]]:
  """All concrete SingleCellModel subclasses in this namespace."""
  out = []
  for obj in globals().values():
    if (inspect.isclass(obj) and issubclass(obj, SingleCellModel)
        and obj is not SingleCellModel):
      out.append(obj)
  return out


def get_model(name) -> Type[SingleCellModel]:
  """Resolve a model class by class name or id ('dca', 'scvi', …)."""
  if inspect.isclass(name) and issubclass(name, SingleCellModel):
    return name
  key = str(name).strip().lower()
  for cls in get_all_models():
    cls_id = "".join(c for c in cls.__name__ if c.isupper()).lower()
    if key in (cls.__name__.lower(), cls_id):
      return cls
  raise ValueError(
      f"Cannot find model '{name}'; available: "
      f"{sorted(c.__name__ for c in get_all_models())}")


def load_model(path: str) -> SingleCellModel:
  """Reconstruct a model from <path>/metamodel.json + weights
  (reference models/__init__.py:30-38)."""
  from ..train.checkpoint import load_metamodel
  class_name, dataset, metadata, init_kwargs = load_metamodel(path)
  cls = get_model(class_name)
  kwargs = dict(init_kwargs)
  outputs = kwargs.pop("outputs")
  model = cls(outputs, dataset=dataset, metadata=metadata, **kwargs)
  model.load_weights(path, raise_notfound=True)
  return model
