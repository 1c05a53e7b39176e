"""Minimal native ``.h5ad`` (AnnData on-disk) reader/writer.

Users of the reference live in the scanpy/AnnData ecosystem (the
reference's container IS an AnnData subclass,
``/root/reference/sisua/data/_single_cell_base.py``). anndata is not a
dependency here; this module speaks the AnnData HDF5 spec directly via
h5py, covering the parts single-cell workflows use:

  * ``X``: dense array or csr/csc group (``data``/``indices``/``indptr``
    with ``encoding-type``/``shape`` attrs);
  * ``obs``/``var``: ``_index`` plus plain, string, and categorical
    columns;
  * ``obsm``: per-cell arrays (protein counts, embeddings, one-hots);
  * ``uns``: scalars/arrays (best-effort).

``read_h5ad`` maps onto ``SingleCellOMIC``: ``X`` becomes the main omic;
well-known obsm keys (``protein_expression`` — the scvi-tools CITE-seq
convention — and any key named after an OMIC) become additional omics.
``write_h5ad`` round-trips a container for scanpy users.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from scipy import sparse

from .const import OMIC

__all__ = ["read_h5ad", "write_h5ad"]


# --------------------------------------------------------------------- read
def _read_matrix(node):
  import h5py
  if isinstance(node, h5py.Dataset):
    return np.asarray(node)
  enc = node.attrs.get("encoding-type", "csr_matrix")
  if isinstance(enc, bytes):
    enc = enc.decode()
  shape = tuple(node.attrs["shape"]) if "shape" in node.attrs else tuple(
      node.attrs["h5sparse_shape"])
  data = np.asarray(node["data"])
  indices = np.asarray(node["indices"])
  indptr = np.asarray(node["indptr"])
  cls = sparse.csr_matrix if "csr" in enc else sparse.csc_matrix
  return cls((data, indices, indptr), shape=shape)


def _decode(a):
  a = np.asarray(a)
  if a.dtype.kind in ("S", "O"):
    return np.asarray([x.decode() if isinstance(x, bytes) else str(x)
                       for x in a.ravel()]).reshape(a.shape)
  return a


def _read_dataframe(group) -> Dict[str, np.ndarray]:
  """AnnData obs/var group → {column: array}, index under '_index'."""
  import h5py
  idx_key = group.attrs.get("_index", "_index")
  if isinstance(idx_key, bytes):
    idx_key = idx_key.decode()
  out: Dict[str, np.ndarray] = {}
  for key in group:
    node = group[key]
    if isinstance(node, h5py.Group):  # categorical: categories + codes
      if "categories" in node and "codes" in node:
        cats = _decode(node["categories"])
        codes = np.asarray(node["codes"])
        vals = np.where(codes >= 0, cats[np.clip(codes, 0, None)], "nan")
        out[key] = vals
      continue
    out[key] = _decode(node)
  if idx_key in out:
    out["_index"] = out.pop(idx_key)
  return out


def read_h5ad(path: str, name: Optional[str] = None,
              omic: str = "transcriptomic"):
  """Load an ``.h5ad`` file as a :class:`SingleCellOMIC`."""
  import h5py

  from .dataset import SingleCellOMIC

  with h5py.File(path, "r") as f:
    X = _read_matrix(f["X"])
    obs = _read_dataframe(f["obs"]) if "obs" in f else {}
    var = _read_dataframe(f["var"]) if "var" in f else {}
    cell_id = obs.pop("_index", None)
    gene_id = var.pop("_index", None)
    obsm = {}
    if "obsm" in f:
      for key in f["obsm"]:
        try:
          obsm[key] = _read_matrix(f["obsm"][key])
        except Exception:
          pass
    uns = {}
    if "uns" in f:
      for key in f["uns"]:
        node = f["uns"][key]
        if isinstance(node, h5py.Dataset):
          try:
            uns[key] = _decode(node)
          except Exception:
            pass

  sco = SingleCellOMIC(X, cell_id=cell_id, gene_id=gene_id, omic=omic,
                       name=name or path.split("/")[-1].replace(
                           ".h5ad", ""))
  for col, vals in obs.items():
    # never clobber container-managed columns (row provenance / omic stats):
    # an external file's 'indices' column would break split()/slicing tracing
    if col in sco.obs.columns:
      col = f"file_{col}"
    sco.obs[col] = vals
  # well-known obsm conventions → omics; files written by write_h5ad carry
  # the original omic ORDER in uns (hdf5 group iteration is alphabetical,
  # which would otherwise reorder omics and change positional consumers)
  order = [str(x) for x in np.ravel(uns.get("omics_order", []))]
  if order:
    obsm = {k: obsm[k] for k in
            [k for k in order if k in obsm]
            + [k for k in obsm if k not in order]}
  for key, m in obsm.items():
    target = None
    if key in ("protein_expression", "protein_counts"):
      target = OMIC.proteomic
    else:
      try:
        target = OMIC.parse(key)
      except Exception:
        target = None
    if target is not None and target.name not in sco.omics:
      var_names = None
      for uns_key in (f"{key}_var", key):
        if uns_key in uns and len(np.ravel(uns[uns_key])) == m.shape[1]:
          var_names = [str(x) for x in np.ravel(uns[uns_key])]
          break
      sco.add_omic(target, np.asarray(
          m.todense() if sparse.issparse(m) else m, np.float32), var_names)
    else:
      sco.obsm[key] = m
  sco.uns.update(uns)
  sco._record("read_h5ad", dict(path=path))
  return sco


# -------------------------------------------------------------------- write
def _write_matrix(group, key, m):
  if sparse.issparse(m):
    m = m.tocsr()
    g = group.create_group(key)
    g.attrs["encoding-type"] = "csr_matrix"
    g.attrs["encoding-version"] = "0.1.0"
    g.attrs["shape"] = np.asarray(m.shape, np.int64)
    g.create_dataset("data", data=m.data)
    g.create_dataset("indices", data=m.indices)
    g.create_dataset("indptr", data=m.indptr)
  else:
    group.create_dataset(key, data=np.asarray(m))


def _write_dataframe(f, key, index, columns: Dict[str, np.ndarray]):
  g = f.create_group(key)
  g.attrs["encoding-type"] = "dataframe"
  g.attrs["encoding-version"] = "0.2.0"
  g.attrs["_index"] = "_index"
  g.attrs["column-order"] = np.asarray(list(columns), dtype="S")
  g.create_dataset("_index", data=np.asarray(index, dtype="S"))
  for col, vals in columns.items():
    vals = np.asarray(vals)
    if vals.dtype.kind in ("U", "O"):
      vals = vals.astype("S")
    g.create_dataset(col, data=vals)


def write_h5ad(sco, path: str) -> str:
  """Write a :class:`SingleCellOMIC` as ``.h5ad`` (main omic → X, other
  omics → obsm, per-omic var names → uns)."""
  import h5py

  with h5py.File(path, "w") as f:
    f.attrs["encoding-type"] = "anndata"
    f.attrs["encoding-version"] = "0.1.0"
    _write_matrix(f, "X", sco.X)
    cols = {c: sco.obs[c].to_numpy() for c in sco.obs.columns}
    _write_dataframe(f, "obs", sco.obs.index.to_numpy(), cols)
    _write_dataframe(f, "var", sco.var_names, {})
    obsm = f.create_group("obsm")
    uns = f.create_group("uns")
    main = sco.current_omic.name
    uns.create_dataset("omics_order",
                       data=np.asarray(list(sco.omics), dtype="S"))
    for omic_name in sco.omics:
      if omic_name == main:
        continue
      _write_matrix(obsm, omic_name, sco.numpy(omic_name))
      uns.create_dataset(f"{omic_name}_var",
                         data=np.asarray(sco.get_var_names(omic_name),
                                         dtype="S"))
    for key, m in sco.obsm.items():
      if key not in obsm:
        _write_matrix(obsm, key, m)
  return path
