"""Hyper-parameter search tutorial (reference ``tutorials/bayes_search.py``
and ``tutorials/grid_search.py``'s hyperopt sibling).

Two searchers:

* ``fit_hyper`` — the reference's search surface (random / discrete-TPE
  over nlayers × hdim × zdim), one trial at a time or process-parallel.
* ``fit_hyper_vmap`` — TPU-native: every lr × seed trial of a fixed
  architecture trains SIMULTANEOUSLY inside one vmapped executable. N
  trials for roughly the wall-clock of one — a capability the reference's
  one-subprocess-per-trial search cannot express.

  JAX_PLATFORMS=cpu python tutorials/bayes_search.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sisua_tpu.data import get_dataset
from sisua_tpu.models import VAE, RVmeta
from sisua_tpu.models.hyper_params import fit_hyper, fit_hyper_vmap

sco = get_dataset("synthetic")
train, _ = sco.split(0.8)

# --- 1. discrete-TPE over architecture (reference surface) ---------------------
result = fit_hyper(
    model="vae",
    dataset="synthetic",
    space={"nlayers": [1, 2], "hdim": [32, 64], "zdim": [6, 10]},
    algorithm="tpe",
    max_evals=6,
    epochs=3,
    verbose=True,
)
print("best architecture:", result["best"], "| loss:", round(result["loss"], 2))

# --- 2. on-chip vmapped search over lr × seed -----------------------------------
def make(seed: int) -> VAE:
  return VAE(RVmeta(sco.n_vars, "zinb", name="rna"),
             latents=RVmeta(10, "diag", name="latents"), seed=seed)

result = fit_hyper_vmap(
    make, train,
    learning_rates=(3e-4, 1e-3, 3e-3),
    seeds_per_rate=2,        # 6 trials, ONE executable
    epochs=5,
    verbose=True,
)
print("best lr/seed:", result["best"], "| loss:", round(result["loss"], 2))
best_i = min(range(len(result["trials"])),
             key=lambda i: result["trials"][i]["loss"])
best_model = result["ensemble"].extract(best_i)
print("extracted standalone model:", type(best_model).__name__)
