"""sisua-predict — batch scoring with a trained model checkpoint.

A production-serving entry point the reference lacks: load any saved model
(``save_weights`` dir: msgpack or orbax backend) and score a dataset or a
raw count file, writing imputed posterior means, latent embeddings, and
(optionally) denoised proteins for TotalVI. Uses ``predict_mean`` — all MC
averaging happens on device, only (n, d) arrays come back.

Inputs: a registry dataset name, an ``.h5ad`` (AnnData — native reader),
an ``.npz`` (array under 'X' or the first key), or a ``.csv`` (cells ×
genes, header + index column tolerated).
"""

from __future__ import annotations

import argparse
import json
import os


def _load_counts(path: str):
  import numpy as np
  if path.endswith(".h5ad"):
    from ..data import read_h5ad
    return read_h5ad(path)
  if path.endswith(".npz"):
    f = np.load(path)
    keys = set(f.keys())
    if "format" in keys:
      # scipy.sparse.save_npz layout — 'format' is the discriminator for
      # EVERY sparse layout (csr/csc carry indices/indptr, but coo/bsr/dia
      # carry row/col/offsets and load_npz handles them all)
      from scipy import sparse
      return sparse.load_npz(path).tocsr()
    if "X" in keys:
      return np.asarray(f["X"], np.float32)
    if len(keys) == 1:
      return np.asarray(f[next(iter(keys))], np.float32)
    raise ValueError(
        f"{path} carries arrays {sorted(keys)}; expected an 'X' array, a "
        "single array, or a scipy.sparse.save_npz file")
  if path.endswith(".csv") or path.endswith(".csv.gz"):
    from ..utils.io_utils import load_data_from_csv
    return load_data_from_csv(path).to_numpy(np.float32)
  raise ValueError(f"unsupported input file: {path}")


def main(argv=None):
  p = argparse.ArgumentParser("sisua-predict")
  p.add_argument("model", help="checkpoint dir written by save_weights")
  p.add_argument("input", help="dataset name, .npz, or .csv of counts")
  p.add_argument("-o", "--outpath", default="/tmp/sisua_predict")
  p.add_argument("--batch", type=int, default=256)
  p.add_argument("--sample-shape", type=int, default=10,
                 help="MC samples averaged on device")
  p.add_argument("--fetch-dtype", default="float32",
                 choices=("float32", "bfloat16"),
                 help="bfloat16 halves the device→host fetch (~0.4%% "
                      "relative error) — ~2x faster on remote chips")
  p.add_argument("--mesh", default=None,
                 help="shard scoring data-parallel over a device mesh: "
                      "'all' (every visible chip) or an int (first N chips)")
  args = p.parse_args(argv)

  import numpy as np

  from ..data import get_dataset_meta
  from ..models import load_model

  model = load_model(args.model)
  if args.input in get_dataset_meta():
    from ..data import get_dataset
    data = get_dataset(args.input)
    n = data.n_obs
  else:
    data = _load_counts(args.input)
    n = data.n_obs if hasattr(data, "n_obs") else data.shape[0]
  mesh = None
  if args.mesh is not None:
    import jax

    from ..parallel import create_mesh
    devs = jax.devices()
    if args.mesh != "all":
      devs = devs[:int(args.mesh)]
    mesh = create_mesh(n_data=len(devs), devices=devs)
  x_means, z_means = model.predict_mean(
      data, sample_shape=(args.sample_shape,), batch_size=args.batch,
      fetch_dtype=args.fetch_dtype, mesh=mesh)

  os.makedirs(args.outpath, exist_ok=True)
  np.savez_compressed(os.path.join(args.outpath, "imputed.npz"),
                      **{f"output{i}": m for i, m in enumerate(x_means)})
  np.savez_compressed(os.path.join(args.outpath, "latents.npz"),
                      **{f"latent{i}": m for i, m in enumerate(z_means)})
  extra = {}
  if hasattr(model, "denoised_proteins") and hasattr(data, "numpy"):
    try:
      fg = model.denoised_proteins(data, batch_size=args.batch)
      np.savez_compressed(os.path.join(args.outpath,
                                       "denoised_proteins.npz"), fg=fg)
      extra["denoised_proteins"] = "denoised_proteins.npz"
    except Exception as e:  # optional output — report, don't abort scoring
      import sys
      print(f"[sisua-predict] denoised-protein export failed: {e!r}",
            file=sys.stderr)
  manifest = {
      "model": type(model).__name__,
      "n_cells": int(n),
      "outputs": [list(m.shape) for m in x_means],
      "latents": [list(m.shape) for m in z_means],
      "files": {"imputed": "imputed.npz", "latents": "latents.npz", **extra},
  }
  with open(os.path.join(args.outpath, "manifest.json"), "w") as f:
    json.dump(manifest, f, indent=2)
  print(f"scored {n} cells → {args.outpath}")
  return manifest


if __name__ == "__main__":
  main()
