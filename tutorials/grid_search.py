"""Grid-search tutorial (reference ``tutorials/grid_search.py``).

The experimenter fans a dot-override grid out into one experiment per
combination (`-m` = multirun; `--ncpu` adds process parallelism, the
reference's "training multiple systems in parallel"). Every run lands in a
config-hashed directory with weights + scores, and all scores aggregate in
one sqlite scoreboard.

  JAX_PLATFORMS=cpu python tutorials/grid_search.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sisua_tpu.train.experimenter import SisuaExperimenter

EXP = "/tmp/tutorial_grid"

exp = SisuaExperimenter(save_path=EXP)

# --- 1. the grid: 3 models × 2 betas = 6 runs ---------------------------------
exp.run([
    "model.name=vae,dca,sisua",
    "model.beta=0.5,1.0",
    "dataset.name=synthetic",
    "train.epochs=3",
    "train.valid_freq=0",
    "-m",          # multirun over the grid
])

# --- 2. the scoreboard aggregates every run ------------------------------------
df = exp.scoreboard.read_scores("scores_synthetic")
cols = [c for c in df.columns if c.startswith(("llk", "imputation_med"))]
print(df[cols].round(3))

# --- 3. reload any trained model by query --------------------------------------
for cfg, model in exp.get_models("model.name=dca", load_models=True):
  print("reloaded:", type(model).__name__, "beta =", cfg["model"]["beta"])
