"""Bridge: export SingleCellOMIC datasets to scvi-tools / AnnData.

Capability parity with ``/root/reference/sisua/data/sisua_to_scvi.py``
(:9-50): wrap our datasets in the format the scVI ecosystem consumes so
users can benchmark against the original PyTorch implementation. Both scvi
and anndata are optional (absent in this image); the functions raise
actionable errors when the target library is missing.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["sisua_to_anndata", "sisua_to_scvi", "FacsDataset",
           "PbmcCiteseqDataset"]


def sisua_to_anndata(sco, omic=None):
  """SingleCellOMIC → anndata.AnnData (main omic as X, labels in obs,
  protein counts in obsm['protein_expression'])."""
  try:
    import anndata
  except ImportError as e:
    raise RuntimeError(
        "anndata is not installed in this environment; install it to export "
        "(the sisua_tpu container itself never needs it)") from e
  import pandas as pd
  from .const import OMIC
  omic = sco.current_omic if omic is None else OMIC.parse(omic)
  adata = anndata.AnnData(
      X=sco.get_omic(omic),
      obs=sco.obs.copy(),
      var=pd.DataFrame(index=sco.get_var_names(omic)))
  for cand in ("celltype", "disease", "progenitor"):
    if cand in sco.omics:
      names = sco.get_var_names(cand)
      adata.obs[cand] = np.asarray(names)[np.argmax(sco.numpy(cand), 1)]
  if "proteomic" in sco.omics:
    adata.obsm["protein_expression"] = sco.numpy("proteomic")
    adata.uns["protein_names"] = list(sco.get_var_names("proteomic"))
  return adata


def sisua_to_scvi(sco, omic=None):
  """SingleCellOMIC → scvi-tools-registered AnnData (run setup_anndata)."""
  try:
    import scvi
  except ImportError as e:
    raise RuntimeError("scvi-tools is not installed; pip install scvi-tools "
                       "to export for cross-library benchmarking") from e
  adata = sisua_to_anndata(sco, omic)
  kw = {}
  if "celltype" in adata.obs:
    kw["labels_key"] = "celltype"
  scvi.model.SCVI.setup_anndata(adata, **kw)
  return adata


def FacsDataset(n_protein: int = 5):
  """scVI-format FACS dataset (reference :9-50 export class)."""
  from .loaders.facs import read_FACS
  return sisua_to_scvi(read_FACS(n_protein))


def PbmcCiteseqDataset():
  from .loaders.citeseq import read_CITEseq_PBMC
  return sisua_to_scvi(read_CITEseq_PBMC())
