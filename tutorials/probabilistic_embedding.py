"""Probabilistic embedding tutorial (reference
``tutorials/probabilistic_embedding.py``).

Protein (ADT) counts are continuous and noisy; downstream classification
metrics want binary "does this cell express marker X" labels. The
``ProbabilisticEmbedding`` fits a 2-component GMM per protein column and
binarizes at the positive component's CI threshold (the `sisua-embed` CLI
wraps exactly this class).

  JAX_PLATFORMS=cpu python tutorials/probabilistic_embedding.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sisua_tpu.data import OMIC, get_dataset
from sisua_tpu.label_threshold import ProbabilisticEmbedding

SAVE = "/tmp/tutorial_pemb"
os.makedirs(SAVE, exist_ok=True)

# --- 1. protein counts --------------------------------------------------------
sco = get_dataset("synthetic")
y = sco.numpy(OMIC.proteomic)
names = sco.get_var_names(OMIC.proteomic)
print("proteins:", list(names), "| counts shape:", y.shape)

# --- 2. fit per-column GMMs ----------------------------------------------------
pe = ProbabilisticEmbedding().fit(y)
y_bin = pe.predict(y)           # {0,1} per (cell, protein)
y_prob = pe.predict_proba(y)    # positive-component responsibility
print("positive rate per protein:", np.round(y_bin.mean(0), 3))
assert y_prob.min() >= 0 and y_prob.max() <= 1

# --- 3. diagnostics -------------------------------------------------------------
pe.plot_distribution(y, path=os.path.join(SAVE, "distributions.png"))
print("figures in", SAVE)

# --- 4. the same thing as a dataset method -------------------------------------
# (used by Posterior/latent benchmarks to binarize factor omics)
_, y_prob2, y_bin2 = sco.probabilistic_embedding(OMIC.proteomic)
print("container call agrees:", np.allclose(y_bin, y_bin2))
