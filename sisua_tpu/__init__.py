"""sisua_tpu — TPU-native (JAX/XLA/Pallas) framework for semi-supervised
single-cell deep generative modeling, with the capabilities of
trungnt13/sisua re-designed TPU-first."""

__version__ = "0.1.0"


def _honor_jax_platforms_env():
  """Restore JAX_PLATFORMS env-var semantics.

  Ambient site customizations (e.g. the axon TPU plugin's sitecustomize)
  may call ``jax.config.update("jax_platforms", ...)`` at interpreter
  start, which silently overrides the user's ``JAX_PLATFORMS`` env var.
  If the env var is set and the backend is not yet initialized, write it
  back so ``JAX_PLATFORMS=cpu python -m sisua_tpu.cli.train ...`` works as
  documented."""
  import os
  env = os.environ.get("JAX_PLATFORMS")
  if not env:
    return
  try:
    import jax
    # Only undo the known sitecustomize override ("axon,cpu") — never a
    # value the user set programmatically in this process.
    if jax.config.jax_platforms == "axon,cpu" and env != "axon,cpu":
      jax.config.update("jax_platforms", env)
  except Exception:
    pass  # jax missing or backend already initialized — leave as-is


_honor_jax_platforms_env()

_SUBMODULES = ("data", "models", "analysis", "train", "dist", "nn", "rv",
               "parallel", "ops", "utils", "interpolation",
               "label_threshold", "baselines", "cross_analyze", "native",
               "cli")


def __getattr__(name):
  """Lazy top-level re-exports: `sisua_tpu.VAE`, `sisua_tpu.get_dataset`, …
  (kept lazy so importing the package does not pull jax/flax eagerly —
  except when JAX_PLATFORMS is set, where jax config must be written early).
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


# the reference's top-level vocabulary (sisua/__init__.py:1-9) plus the
# most-used additions — a static list so dir()/tab-completion stays lazy
# (importing models/data here would pull jax/flax as an introspection
# side effect, defeating __getattr__'s whole point)
_TOP_LEVEL_NAMES = (
    "Posterior", "ResultsSheet", "Criticizer",
    "MARKER_ADT_GENE", "MARKER_ADTS", "MARKER_ATAC", "MARKER_GENES",
    "OMIC", "PROTEIN_PAIR_NEGATIVE", "PROTEIN_PAIR_POSITIVE",
    "get_dataset", "get_dataset_meta", "get_dataset_availability",
    "SingleCellOMIC", "standardize_protein_name",
    "MISA", "SCALE", "SCALAR", "SCVI", "SISUA", "VAE", "TotalVI",
    "DeepCountAutoencoder", "SCScope", "FVAE", "SemiFVAE",
    "AUTOZI", "SOLO", "CellAssign",
    "NetConf", "RVmeta", "SingleCellModel", "get_model", "load_model",
    "SisuaExperimenter", "Trainer", "VmapEnsemble",
)


def __dir__():
  """Advertise the lazy surface without importing it (reference
  ``sisua/__init__.py`` parity: `dir(sisua_tpu)` lists models, data entry
  points, Posterior, …)."""
  return sorted(set(_SUBMODULES) | set(_TOP_LEVEL_NAMES) |
                {"__version__"})
