"""Save / load tutorial (reference ``tutorials/save_and_load_models.py``).

Every model checkpoints to a directory of weights (msgpack, or orbax when
available) plus a JSON "metamodel" describing the architecture — so
``load_model(path)`` reconstructs the class without any Python pickle.

  JAX_PLATFORMS=cpu python tutorials/save_and_load_models.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sisua_tpu.data import get_dataset
from sisua_tpu.models import SCVI, NetConf, RVmeta, load_model

PATH = "/tmp/tutorial_save_load/model"

# --- 1. train ---------------------------------------------------------------
sco = get_dataset("synthetic")
train, test = sco.split(train_percent=0.8)
scvi = SCVI(outputs=RVmeta(sco.n_vars, "zinbd", name="rna"),
            latents=RVmeta(10, "diag", name="latents"),
            encoder=NetConf((64, 64), batchnorm=True))
scvi.fit(train, valid=test, epochs=10, batch_size=64, verbose=True,
         checkpoint_path=PATH)  # also checkpoints on every best val_loss

# --- 2. save: weights + metamodel (+ training history) -----------------------
scvi.save_weights(PATH)
print("saved:", sorted(os.listdir(PATH)))

# --- 3. load: reconstruct the class from the metamodel ------------------------
loaded = load_model(PATH)
print("loaded:", type(loaded).__name__, "| history epochs:",
      len(loaded.history.get("loss", [])))

# --- 4. bit-exact posterior stats --------------------------------------------
def first(d):
  return d[0] if isinstance(d, (list, tuple)) else d

# decode paths draw a reparameterized z — pin both models' RNG streams so
# the stochastic forward matches draw-for-draw
import jax
scvi._rng = jax.random.PRNGKey(0)
loaded._rng = jax.random.PRNGKey(0)
pX1, qZ1 = scvi.predict(test, sample_shape=(), batch_size=128)
pX2, qZ2 = loaded.predict(test, sample_shape=(), batch_size=128)
np.testing.assert_allclose(np.asarray(first(qZ1).mean()),
                           np.asarray(first(qZ2).mean()), rtol=1e-6)
np.testing.assert_allclose(np.asarray(first(pX1).mean()),
                           np.asarray(first(pX2).mean()), rtol=1e-6)
print("saved and loaded models agree (latent + output means allclose)")
