"""Top-level API parity: every name the reference exports from `sisua`
(reference sisua/__init__.py:1-9) resolves from `sisua_tpu`, and dir()
advertises the lazy surface."""

import sisua_tpu

REFERENCE_TOP_LEVEL = [
    "Posterior",
    "MARKER_ADT_GENE", "MARKER_ADTS", "MARKER_ATAC", "MARKER_GENES",
    "OMIC", "PROTEIN_PAIR_NEGATIVE", "PROTEIN_PAIR_POSITIVE",
    "get_dataset", "get_dataset_meta",
    "SingleCellOMIC", "standardize_protein_name",
    "MISA", "SCALE", "SCVI", "SISUA", "VAE", "DeepCountAutoencoder",
    "NetConf", "RVmeta", "SingleCellModel",
    "SisuaExperimenter",
]


def test_reference_top_level_names_resolve():
  missing = [n for n in REFERENCE_TOP_LEVEL if not hasattr(sisua_tpu, n)]
  assert not missing, missing


def test_dir_advertises_lazy_surface():
  d = dir(sisua_tpu)
  for n in ("SISUA", "get_dataset", "Posterior", "models", "data"):
    assert n in d, n


def test_every_advertised_name_resolves():
  """dir() is a static list (kept lazy); it must not advertise dead
  names."""
  from sisua_tpu import _TOP_LEVEL_NAMES
  dead = [n for n in _TOP_LEVEL_NAMES if not hasattr(sisua_tpu, n)]
  assert not dead, dead
