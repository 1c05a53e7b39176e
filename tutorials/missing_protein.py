"""Missing-protein ablation tutorial (reference
``tutorials/missing_protein.py``, ``experimental_data/removed_protein.py``).

Train the semi-supervised model WITHOUT some protein channels, then ask
whether the latent space still predicts them — measuring how much of the
protein signal the model recovers from transcriptome alone.

  JAX_PLATFORMS=cpu python tutorials/missing_protein.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sisua_tpu.analysis.latent import streamline_classifier
from sisua_tpu.data import OMIC, get_dataset
from sisua_tpu.label_threshold import ProbabilisticEmbedding
from sisua_tpu.models import SISUA, RVmeta

REMOVED = [0, 1]  # drop the first two proteins from training labels

# --- 1. dataset with an ablated protein panel -----------------------------------
sco = get_dataset("synthetic")
full_y = sco.numpy(OMIC.proteomic)
names = np.asarray(sco.get_var_names(OMIC.proteomic))
keep = np.setdiff1d(np.arange(len(names)), REMOVED)
ablated = sco.copy()
ablated.add_omic(OMIC.proteomic, full_y[:, keep], list(names[keep]))
print("training panel:", list(names[keep]))
print("held-out proteins:", list(names[REMOVED]))

# --- 2. train on the ablated panel ----------------------------------------------
train, test = ablated.split(0.8)           # deterministic, seed-shared
model = SISUA(outputs=[RVmeta(sco.n_vars, "zinb", name="rna"),
                       RVmeta(len(keep), "nb", name="adt")],
              latents=RVmeta(10, "diag", name="latents"))
model.fit(train, valid=test, epochs=10, batch_size=64, labels_percent=0.5,
          verbose=True)

# --- 3. do the latents still encode the REMOVED proteins? ------------------------
def latents_of(data):
  _, qZ = model.predict(data, batch_size=128)
  q = qZ[0] if isinstance(qZ, (list, tuple)) else qZ
  return np.asarray(q.mean())

# same deterministic split on the FULL dataset recovers held-out labels.
# Binarize ONCE on the full matrix — ProbabilisticEmbedding's log-norm
# rescales by the column sums of whatever array it is given, so per-subset
# predict() calls would threshold train and test at different effective
# scales — then slice the binary labels by each split half's row names.
train_full, test_full = sco.split(0.8)
pe = ProbabilisticEmbedding().fit(full_y[:, REMOVED])
y_full = pe.predict(full_y[:, REMOVED])
pos = {n: i for i, n in enumerate(sco.obs_names)}
y_train = y_full[[pos[n] for n in train_full.obs_names]]
y_test = y_full[[pos[n] for n in test_full.obs_names]]

_, test_scores = streamline_classifier(
    latents_of(train), y_train, latents_of(test), y_test,
    labels_name=list(names[REMOVED]))
print("F1 on held-out proteins (never seen in training):")
for k, v in test_scores.items():
  print(f"  {k}: {v:.3f}")
