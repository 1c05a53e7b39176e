"""Real-data drill: run the full pipeline against YOUR data — a
pre-populated download cache or a plain ``.h5ad`` file — with one command
per stage. (This environment has no network; real datasets always arrive
one of these two ways.)

Option A — pre-placed raw downloads (the registry path)
-------------------------------------------------------
Put the raw files a loader would have downloaded under the download dir
(``$SISUA_DATA``'s sibling; see ``sisua_tpu/data/path.py``), then every
registry name works exactly as if the download had happened::

    # e.g. a 10x archive for the '4k' alias
    cp pbmc4k_filtered_feature_bc_matrix.tar.gz $SISUA_DOWNLOAD/
    sisua-tpu-train model.name=sisua dataset.name=4k train.epochs=200

The first call parses + preprocesses into the npz/MD5-manifest cache under
``$SISUA_DATA/<name>_preprocessed``; every later call is a pure cache hit
(``tests/test_cache_drill.py`` pins this for the 10x / cortex / CITE-seq
families with downloads hard-disabled). R-gated sets (.rds) convert via::

    Rscript tools/convert_rds.R counts.rds /tmp/mpal [labels.rds]
    python -m sisua_tpu.data.loaders.finalize_cache /tmp/mpal \
        $SISUA_DATA/mpal_rna_preprocessed

Option B — a user-provided .h5ad file (one-command drill)
---------------------------------------------------------
Any ``dataset.name`` ending in ``.h5ad`` loads directly (multi-omic: X =
RNA; ``obsm['protein_expression'|'proteomic']`` → proteins; any
OMIC-named obsm key → that omic)::

    sisua-tpu-train model.name=sisua dataset.name=/data/my_cite_seq.h5ad \
        train.epochs=200
    sisua-tpu-evaluate -model sisua -ds /data/my_cite_seq.h5ad \
        -path /tmp/figs

The evaluate step writes the scoreboard tables, the ResultsSheet scores
(``/tmp/figs/scores.*``), and the full per-factor figure grid.

This script demonstrates option B end-to-end on a synthetic file so it
runs anywhere; swap ``H5AD`` for your real file.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

WORK = tempfile.mkdtemp(prefix="sisua_drill_")
H5AD = os.path.join(WORK, "my_cite_seq.h5ad")
EXP = os.path.join(WORK, "exp")
FIGS = os.path.join(WORK, "figs")
# must be set before the first sisua_tpu import (EXP_DIR binds at import)
os.environ["SISUA_EXP"] = EXP


def make_user_file():
  """Stand-in for YOUR data: write a CITE-seq-style .h5ad."""
  from sisua_tpu.data import generate_citeseq
  from sisua_tpu.data.h5ad import write_h5ad
  sco = generate_citeseq(n_cells=2000, n_genes=300, n_proteins=8, seed=1)
  write_h5ad(sco, H5AD)
  print("user file:", H5AD)


def train():
  """== sisua-tpu-train model.name=sisua dataset.name=<file>.h5ad =="""
  from sisua_tpu.cli.train import main
  main([f"dataset.name={H5AD}", "model.name=sisua", "train.epochs=10",
        "dataset.batch_size=128"])


def evaluate():
  """== sisua-tpu-evaluate -model sisua -ds <file>.h5ad =="""
  from sisua_tpu.cli.evaluate import main
  posteriors = main(["-model", "sisua", "-ds", H5AD, "-path", FIGS,
                     "--summary-plots"])
  print(f"{len(posteriors)} model(s) evaluated → {FIGS}")
  print("scores files:", [f for f in os.listdir(FIGS)
                          if f.startswith("scores")])


if __name__ == "__main__":
  make_user_file()
  train()
  evaluate()
