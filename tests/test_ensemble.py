"""Vmapped ensemble training: N seeds in one executable."""

import numpy as np

from sisua_tpu.models import VAE, NetConf, RVmeta
from sisua_tpu.train import VmapEnsemble


def test_vmap_ensemble(sco):
  ens = VmapEnsemble(
      lambda seed: VAE(RVmeta(sco.n_vars, "zinb", name="rna"), seed=seed,
                       encoder=NetConf((16,)), decoder=NetConf((16,))),
      n_models=3)
  ens.fit(sco, epochs=3, batch_size=64)
  loss = ens.history["loss"]
  assert loss.shape == (3, 3)
  assert (loss[-1] < loss[0]).all()
  # members diverge (different init seeds) and extract as real models
  assert len(np.unique(np.round(loss[-1], 4))) > 1
  best = ens.best()
  _, qZ = best.predict(sco[np.arange(50)])
  assert qZ.batch_shape == (50,)


def test_vmap_ensemble_independent_batches(sco):
  ens = VmapEnsemble(
      lambda seed: VAE(RVmeta(sco.n_vars, "zinb", name="rna"), seed=seed,
                       encoder=NetConf((16,)), decoder=NetConf((16,))),
      n_models=2)
  ens.fit(sco, epochs=2, batch_size=64, shared_batches=False)
  assert np.isfinite(ens.history["loss"]).all()
