"""IO helpers: CSV / feather export of omics for downstream R analysis.

Capability parity with ``/root/reference/sisua/utils/io_utils.py``
(``save_data_to_csv`` / ``save_data_to_R`` :14-68).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd

__all__ = ["save_data", "save_data_to_csv", "save_data_to_R",
           "load_data_from_csv"]


def save_data(sco, outpath: str, omic=None) -> str:
  """Feather when pyarrow is importable, CSV otherwise (reference
  io_utils.py:14-24's format dispatch)."""
  try:
    import pyarrow  # noqa: F401
    return save_data_to_R(sco, outpath, omic=omic)
  except ImportError:
    return save_data_to_csv(sco, outpath + ".csv.gz", omic=omic)


def _to_frame(sco, omic=None) -> pd.DataFrame:
  x = sco.numpy(omic)
  return pd.DataFrame(x, index=sco.obs_names,
                      columns=sco.get_var_names(omic))


def save_data_to_csv(sco, outpath: str, omic=None,
                     compression: Optional[str] = "gzip") -> str:
  os.makedirs(os.path.dirname(outpath) or ".", exist_ok=True)
  df = _to_frame(sco, omic)
  df.to_csv(outpath, compression=compression)
  return outpath


def save_data_to_R(sco, outpath: str, omic=None) -> str:
  """Feather export (readable from R via `arrow::read_feather`)."""
  os.makedirs(os.path.dirname(outpath) or ".", exist_ok=True)
  df = _to_frame(sco, omic).reset_index()
  try:
    df.to_feather(outpath)
  except (ImportError, ValueError) as e:
    # pyarrow absent → fall back to CSV with a clear note
    alt = outpath + ".csv.gz"
    df.to_csv(alt, index=False, compression="gzip")
    print(f"[io] feather unavailable ({e}); wrote {alt}")
    return alt
  return outpath


def load_data_from_csv(path: str) -> pd.DataFrame:
  return pd.read_csv(path, index_col=0)
