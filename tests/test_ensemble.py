"""Vmapped ensemble training: N seeds in one executable."""

import pytest
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


def test_vmapped_hyper_search(sco):
  """All lr×seed trials train simultaneously in one vmapped executable;
  per-member learning rates ride in the stacked optimizer state via
  optax.inject_hyperparams."""
  from sisua_tpu.models.hyper_params import fit_hyper_vmap
  res = fit_hyper_vmap(
      lambda seed: VAE(RVmeta(sco.n_vars, "zinb", name="rna"), seed=seed,
                       encoder=NetConf((16,)), decoder=NetConf((16,))),
      sco, learning_rates=(1e-4, 3e-3), seeds_per_rate=2,
      epochs=5, batch_size=64)
  assert len(res["trials"]) == 4
  losses = {t["config"]["learning_rate"]: [] for t in res["trials"]}
  for t in res["trials"]:
    assert np.isfinite(t["loss"])
    losses[t["config"]["learning_rate"]].append(t["loss"])
  # the larger lr must clearly win within 5 epochs
  assert np.mean(losses[3e-3]) < np.mean(losses[1e-4])
  assert res["best"]["learning_rate"] == 3e-3
  # any trial extracts as a standalone trained model
  m = res["ensemble"].extract(0)
  _, qZ = m.predict(sco[np.arange(20)])
  assert qZ.batch_shape == (20,)


def test_vmap_ensemble_sharded_over_mesh(sco):
  """mesh= shards the member axis over every device: one chip per member
  here (8 members, 8 devices), zero collectives, and the losses match the
  unsharded run (members are independent — partitioning must not change
  the math)."""
  import jax
  from sisua_tpu.parallel import create_mesh

  def make(seed):
    return VAE(RVmeta(sco.n_vars, "zinb", name="rna"), seed=seed,
               encoder=NetConf((16,)), decoder=NetConf((16,)))

  ens_ref = VmapEnsemble(make, n_models=8)
  ens_ref.fit(sco, epochs=3, batch_size=64)
  ens_mesh = VmapEnsemble(make, n_models=8)
  mesh = create_mesh()  # all 8 CPU mesh devices
  ens_mesh.fit(sco, epochs=3, batch_size=64, mesh=mesh)
  # the member axis really shards: every stacked leaf lives on all 8 devices
  leaf = jax.tree_util.tree_leaves(ens_mesh._stacked.params)[0]
  assert len(leaf.sharding.device_set) == 8, leaf.sharding
  assert leaf.sharding.shard_shape(leaf.shape)[0] == 1  # 1 member/device
  np.testing.assert_allclose(ens_mesh.history["loss"],
                             ens_ref.history["loss"], rtol=1e-5)
  # extraction still yields standalone trained members
  _, qZ = ens_mesh.best().predict(sco[np.arange(20)])
  assert qZ.batch_shape == (20,)


def test_hyper_vmap_on_mesh(sco):
  """fit_hyper_vmap(mesh=...) fans lr×seed trials out over the mesh."""
  from sisua_tpu.models.hyper_params import fit_hyper_vmap
  from sisua_tpu.parallel import create_mesh
  res = fit_hyper_vmap(
      lambda seed: VAE(RVmeta(sco.n_vars, "zinb", name="rna"), seed=seed,
                       encoder=NetConf((16,)), decoder=NetConf((16,))),
      sco, learning_rates=(1e-4, 3e-3), seeds_per_rate=4,
      epochs=3, batch_size=64, mesh=create_mesh())
  assert len(res["trials"]) == 8
  assert all(np.isfinite(t["loss"]) for t in res["trials"])


@pytest.mark.slow
def test_vmap_ensemble_window_executables(sco):
  """metrics_interval compiles K epochs into one executable; per-epoch
  per-member losses still come back (scan outputs, one fetch/window)."""
  ens = VmapEnsemble(
      lambda seed: VAE(RVmeta(sco.n_vars, "zinb", name="rna"), seed=seed,
                       encoder=NetConf((16,)), decoder=NetConf((16,))),
      n_models=2)
  ens.fit(sco, epochs=5, batch_size=64, metrics_interval=2)
  loss = ens.history["loss"]
  assert loss.shape == (5, 2)
  assert np.isfinite(loss).all()
  assert (loss[-1] < loss[0]).all()
