"""sisua_tpu.data — multi-omic container, loaders, registry, feeder.

Public API parity with ``/root/reference/sisua/data/__init__.py``:
``get_dataset(name)`` resolves ~70 registry aliases to loader calls;
``get_dataset_meta()`` exposes the name → loader map. The '…all' suffix on an
alias loads the unfiltered-genes variant (reference ``__init__.py:45-219``).

Offline note: this build environment has no network egress; the always-
available names are the synthetic family ('synthetic', 'synthetic1k', …,
'synthetic1m' — scalability-protocol sizes). Real loaders work when their
raw files or caches are pre-placed under $SISUA_DATA.
"""

from __future__ import annotations

import inspect
from functools import partial
from typing import Callable, Dict

from .const import (MARKER_ADT_GENE, MARKER_ADTS, MARKER_ATAC, MARKER_GENES,
                    OMIC, PROTEIN_PAIR_NEGATIVE, PROTEIN_PAIR_POSITIVE,
                    TSNE_DIM, UNIVERSAL_RANDOM_SEED)
from .core import get_all_omics
from .dataset import SingleCellOMIC
from .feeder import DataFeeder
from .h5ad import read_h5ad, write_h5ad
from .loaders.tenx import read_10x_h5, read_10x_mtx
from .path import CONFIG_PATH, DATA_DIR, DOWNLOAD_DIR, EXP_DIR
from .synthetic import (generate_citeseq, generate_multiome,
                        generate_synthetic, read_synthetic)
from .utils import (apply_artificial_corruption, get_library_size,
                    standardize_protein_name)

__all__ = [
    "SingleCellOMIC", "DataFeeder", "OMIC", "get_dataset", "get_dataset_meta",
    "get_dataset_availability", "get_dataset_summary", "AVAILABILITY",
    "generate_synthetic", "generate_citeseq", "generate_multiome",
    "read_h5ad", "write_h5ad",
    "read_10x_mtx", "read_10x_h5",
    "apply_artificial_corruption", "get_library_size",
    "standardize_protein_name", "get_all_omics",
    "MARKER_ADT_GENE", "MARKER_ADTS", "MARKER_ATAC", "MARKER_GENES",
    "PROTEIN_PAIR_NEGATIVE", "PROTEIN_PAIR_POSITIVE",
    "UNIVERSAL_RANDOM_SEED", "TSNE_DIM",
    "DATA_DIR", "DOWNLOAD_DIR", "EXP_DIR", "CONFIG_PATH",
]


# availability of each registry name in a fresh environment:
#   'always'          — generated in memory, no IO
#   'public-download' — full native download+preprocess pipeline
#   'optional-dep'    — needs an optional python package (scvi-tools)
#   'R-required'      — upstream ships .rds; convert with tools/convert_rds.R
AVAILABILITY = ("always", "public-download", "optional-dep", "R-required")


def _registry() -> Dict[str, Callable]:
  from . import loaders as L
  meta: Dict[str, Callable] = {}
  avail = _AVAILABILITY_CACHE
  avail.clear()

  # --- synthetic family (always available; scalability protocol sizes) ----
  meta["synthetic"] = read_synthetic
  for k in ("200", "500", "1k", "2k", "5k", "10k", "40k", "100k", "1m"):
    meta[f"synthetic{k}"] = partial(read_synthetic, k)
  from .synthetic import generate_citeseq
  meta["citeseqsim"] = generate_citeseq  # benchmark-grade CITE-seq simulator
  avail.update({k: "always" for k in meta})

  # --- scVI benchmark sets -------------------------------------------------
  meta["cortex"] = L.read_Cortex
  meta["pbmcscvi"] = L.read_PBMC
  meta["retina"] = L.read_Retina
  meta["hemato"] = L.read_Hemato
  avail.update(cortex="public-download", pbmcscvi="optional-dep",
               retina="optional-dep", hemato="optional-dep")

  # --- PBMC 8k / ECC subsets (suffix '' = full panel) ----------------------
  for subset, suffix in (("ly", "ly"), ("my", "my"), ("full", "")):
    meta[f"8k{suffix}"] = partial(L.read_PBMC8k, subset)
    meta[f"ecc{suffix}"] = partial(L.read_PBMCeec, subset)
    meta[f"8k{suffix}all"] = partial(L.read_PBMC8k, subset,
                                     filtered_genes=False)
    meta[f"ecc{suffix}all"] = partial(L.read_PBMCeec, subset,
                                      filtered_genes=False)

  # --- CITE-seq -------------------------------------------------------------
  meta["pbmcciteseq"] = L.read_CITEseq_PBMC
  meta["cbmcciteseq"] = L.read_CITEseq_CBMC
  meta["pbmcciteseqall"] = partial(L.read_CITEseq_PBMC, filtered_genes=False)
  meta["cbmcciteseqall"] = partial(L.read_CITEseq_CBMC, filtered_genes=False)

  # --- FACS -------------------------------------------------------------
  for k in (2, 5, 7):
    meta[f"facs{k}"] = partial(L.read_FACS, k)
  meta["facs"] = L.read_full_FACS

  # --- leukemia ------------------------------------------------------------
  meta["mpal"] = partial(L.read_leukemia_MixedPhenotypes, omic="rna")
  meta["mpalatac"] = partial(L.read_leukemia_MixedPhenotypes, omic="atac")
  meta["mpalall"] = partial(L.read_leukemia_MixedPhenotypes, omic="rna",
                            filtered_genes=False)
  meta["call"] = L.read_leukemia_BMMC
  meta["callall"] = partial(L.read_leukemia_BMMC, filtered_genes=False)

  # --- misc -------------------------------------------------------------
  meta["embryos"] = L.read_human_embryos
  meta["embryosall"] = partial(L.read_human_embryos, filtered_genes=False)
  meta["centenarian"] = L.read_centenarian
  meta["melanomaatac"] = L.read_melanoma_cisTopicData
  meta["mouseatlas"] = L.read_mouse_ATLAS
  for scale_name in ("forebrain", "splenocyte", "leukemia", "insilico"):
    meta[f"scale{scale_name}"] = partial(L.read_scale_dataset, scale_name)

  # --- 10x catalog ----------------------------------------------------------
  from .loaders.tenx import TENX_CATALOG
  for cat in TENX_CATALOG:
    meta[cat] = partial(L.read_dataset10x, cat)
    meta[f"{cat}all"] = partial(L.read_dataset10x, cat, filtered_genes=False)
  meta["4k"] = partial(L.read_dataset10x, "pbmc4k")
  meta["5k"] = partial(L.read_dataset10x, "5k_pbmc_protein_v3")
  meta["10k"] = partial(L.read_dataset10x, "pbmc_10k_protein_v3")
  meta["18k"] = partial(L.read_dataset10x, "18k")
  meta["neuron10k"] = partial(L.read_dataset10x, "neuron_10k_v3")
  meta["heart10k"] = partial(L.read_dataset10x, "heart_10k_v3")
  for i in (1, 2, 3, 4):
    meta[f"vdj{i}"] = partial(L.read_dataset10x,
                              f"vdj_v1_hs_aggregated_donor{i}")

  # --- cross-dataset ---------------------------------------------------------
  for c in ("8k", "ecc", "vdj1", "vdj4", "mpal", "call", "pbmc", "cbmc"):
    meta[f"{c}x"] = partial(L.read_PBMC_crossdataset, c)
  meta["8kxnoprot"] = partial(L.read_PBMC_crossdataset_remove_protein, "8k")

  # everything not tagged above has a full native download+preprocess path;
  # the R-gated names are the ones whose upstream ships .rds objects
  for name in meta:
    avail.setdefault(name, "public-download")
  for name in ("mpal", "mpalatac", "mpalall", "melanomaatac", "mpalx"):
    avail[name] = "R-required"
  return meta


_META_CACHE: Dict[str, Callable] = {}
_AVAILABILITY_CACHE: Dict[str, str] = {}


def get_dataset_meta() -> Dict[str, Callable]:
  """Name → loader function map (reference data/__init__.py:25-226)."""
  global _META_CACHE
  if not _META_CACHE:
    _META_CACHE = _registry()
  return _META_CACHE


def get_dataset_availability(name: str = None):
  """Availability tag for one registry name, or the full name → tag map.

  Tags: 'always' (in-memory synthetic), 'public-download' (native
  download+preprocess pipeline), 'optional-dep' (needs scvi-tools),
  'R-required' (upstream .rds — convert with ``tools/convert_rds.R``)."""
  get_dataset_meta()
  if name is None:
    return dict(_AVAILABILITY_CACHE)
  key = str(name).lower().strip()
  if key not in _AVAILABILITY_CACHE:
    raise KeyError(f"Unknown dataset '{name}'")
  return _AVAILABILITY_CACHE[key]


def get_dataset_summary(return_html: bool = False, names=None,
                        availability=("always",)):
  """Table of dataset shapes/labels (reference data/__init__.py:228-246).

  The reference loads every registry entry; with zero-egress environments in
  mind this summarizes only names whose availability is in ``availability``
  (default: the in-memory synthetic family) plus anything already cached —
  pass ``names=[...]`` or ``availability=None`` to widen."""
  import pandas as pd
  meta = get_dataset_meta()
  if names is None:
    names = [n for n, tag in get_dataset_availability().items()
             if availability is None or tag in availability]
  rows = []
  for name in sorted(str(n).lower().strip() for n in names):
    if name not in meta:
      continue
    try:
      ds = get_dataset(name)
    except Exception as e:  # uncached download-gated name: record the gap
      rows.append({"Keyword": name, "Error": type(e).__name__})
      continue
    has_y = "proteomic" in ds.omics or "celltype" in ds.omics
    y_omic = "proteomic" if "proteomic" in ds.omics else (
        "celltype" if "celltype" in ds.omics else None)
    rows.append({
        "Keyword": name,
        "#Cells": ds.shape[0],  # shape only — never densify for a summary
        "#Genes": ds.shape[1],
        "#Labels": ds.get_dim(y_omic) if has_y else 0,
        "Binary": bool(ds.is_binary(y_omic)) if has_y else False,
        "Labels": ", ".join(standardize_protein_name(str(i))
                            for i in ds.get_var_names(y_omic)[:24])
                  if has_y else "",
    })
  df = pd.DataFrame(rows)
  return df.to_html() if return_html else df


def get_dataset(name: str, override: bool = False, verbose: bool = False,
                **kwargs) -> SingleCellOMIC:
  """Load a dataset by registry alias → SingleCellOMIC
  (reference data/__init__.py:249-301). User-local data loads directly:
  a ``.h5ad`` path via the native AnnData reader, a CellRanger ``.h5``
  via :func:`read_10x_h5`, and a matrix directory (``matrix.mtx[.gz]``)
  via :func:`read_10x_mtx`."""
  import os as _os
  if str(name).endswith(".h5ad") and _os.path.isfile(str(name)):
    return read_h5ad(str(name))
  if str(name).endswith((".h5", ".hdf5")) and _os.path.isfile(str(name)):
    from .loaders.tenx import read_10x_h5
    return read_10x_h5(str(name))
  if _os.path.isdir(str(name)) and any(
      _os.path.isfile(_os.path.join(str(name), m))
      for m in ("matrix.mtx", "matrix.mtx.gz")):
    from .loaders.tenx import read_10x_mtx
    return read_10x_mtx(str(name))
  name = str(name).lower().strip()
  meta = get_dataset_meta()
  if name not in meta:
    import difflib
    close = difflib.get_close_matches(name, meta.keys(), n=5)
    raise KeyError(f"Unknown dataset '{name}'. Did you mean {close}? "
                   f"({len(meta)} datasets registered)")
  fn = meta[name]
  sig_params = inspect.signature(
      fn.func if isinstance(fn, partial) else fn).parameters
  if "override" in sig_params:
    kwargs["override"] = override
  if "verbose" in sig_params:
    kwargs["verbose"] = verbose
  sco = fn(**kwargs)
  return sco
