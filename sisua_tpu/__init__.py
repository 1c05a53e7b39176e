"""sisua_tpu — TPU-native (JAX/XLA/Pallas) framework for semi-supervised
single-cell deep generative modeling, with the capabilities of
trungnt13/sisua re-designed TPU-first."""

__version__ = "0.1.0"

_SUBMODULES = ("data", "models", "analysis", "train", "dist", "nn", "rv",
               "parallel", "ops", "utils", "interpolation",
               "label_threshold", "baselines", "cross_analyze", "native",
               "cli")


def __getattr__(name):
  """Lazy top-level re-exports: `sisua_tpu.VAE`, `sisua_tpu.get_dataset`, …
  (kept lazy so importing the package does not pull jax/flax eagerly).
  Submodule names resolve directly first — required so intra-package
  `from . import dist`-style imports do not recurse through this hook."""
  import importlib
  if name in _SUBMODULES:
    return importlib.import_module(f".{name}", __name__)
  if name.startswith("__"):
    raise AttributeError(name)
  for module in ("models", "data", "analysis", "train"):
    mod = importlib.import_module(f".{module}", __name__)
    if hasattr(mod, name):
      return getattr(mod, name)
  raise AttributeError(f"module 'sisua_tpu' has no attribute {name!r}")
