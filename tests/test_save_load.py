"""Save/load fidelity — mirrors reference ``tests/test_save_load_model.py``:
reload must reproduce latent mean/scale allclose and the metamodel manifest
must reconstruct the exact model class/specs."""

import os

import numpy as np
import pytest

from sisua_tpu.data import OMIC
from sisua_tpu.models import (MISA, SCVI, SISUA, VAE, DeepCountAutoencoder,
                              NetConf, RVmeta, load_model)


def _roundtrip(model, train, test, tmp_path, epochs=2, **fit_kw):
  model.fit(train, epochs=epochs, batch_size=64, **fit_kw)
  path = str(tmp_path / model.id)
  model.save_weights(path)
  loaded = load_model(path)
  assert type(loaded) is type(model)
  _, zA = model.predict(test[np.arange(50)])
  _, zB = loaded.predict(test[np.arange(50)])
  zA = zA[0] if isinstance(zA, (tuple, list)) else zA
  zB = zB[0] if isinstance(zB, (tuple, list)) else zB
  np.testing.assert_allclose(np.asarray(zA.mean()), np.asarray(zB.mean()),
                             atol=1e-5)
  return loaded


def test_vae_roundtrip(splits, small_nets, tmp_path):
  train, test = splits
  vae = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
  loaded = _roundtrip(vae, train, test, tmp_path)
  assert loaded.outputs == vae.outputs
  assert loaded.encoder == vae.encoder


def test_sisua_roundtrip(splits, small_nets, tmp_path):
  train, test = splits
  m = SISUA([RVmeta(train.n_vars, "zinb", name="rna"),
             RVmeta(train.get_dim(OMIC.proteomic), "nb", name="adt")],
            **small_nets)
  loaded = _roundtrip(m, train, test, tmp_path, labels_percent=0.5)
  assert loaded.is_semi_supervised


def test_scvi_roundtrip(splits, tmp_path):
  train, test = splits
  m = SCVI(RVmeta(train.n_vars, "zinbd", name="rna"))
  loaded = _roundtrip(m, train, test, tmp_path)
  assert loaded.uses_library
  assert loaded.latents[1].name == "library"


@pytest.mark.slow
def test_scscope_roundtrip(splits, small_nets, tmp_path):
  from sisua_tpu.models import SCScope
  train, test = splits
  m = SCScope(RVmeta(train.n_vars, "nzmse", name="rna"), latent_dim=6,
              t_steps=2, **small_nets)
  loaded = _roundtrip(m, train, test, tmp_path)
  assert loaded.t_steps == 2
  assert loaded.outputs[0].posterior == "nzmse"


@pytest.mark.slow
def test_misa_roundtrip(splits, small_nets, tmp_path):
  train, test = splits
  m = MISA([RVmeta(train.n_vars, "zinb", name="rna"),
            RVmeta(train.get_dim(OMIC.proteomic), "nbd", name="adt")],
           **small_nets)
  loaded = _roundtrip(m, train, test, tmp_path, labels_percent=0.5)
  assert loaded.outputs[1].posterior == "mixnb"


def test_load_missing_raises(tmp_path):
  m = VAE(RVmeta(10, "zinb"))
  with pytest.raises(FileNotFoundError):
    m.load_weights(str(tmp_path / "nope"), raise_notfound=True)


@pytest.mark.slow
def test_resume_training(splits, small_nets, tmp_path):
  """Reference Experimenter resumes weights automatically — the load path
  must allow continued fit."""
  train, test = splits
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
  m.fit(train, epochs=2, batch_size=64)
  path = str(tmp_path / "resume")
  m.save_weights(path)
  m2 = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
  m2.load_weights(path)
  m2.fit(train, epochs=2, batch_size=64)
  assert np.isfinite(m2.history["loss"]).all()


def test_history_persisted(splits, small_nets, tmp_path):
  train, test = splits
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
  m.fit(train, epochs=3, batch_size=64)
  path = str(tmp_path / "hist")
  m.save_weights(path)
  loaded = load_model(path)
  assert loaded.history["loss"] == [float(x) for x in m.history["loss"]]


@pytest.mark.slow
def test_orbax_backend_roundtrip(splits, small_nets, tmp_path):
  """backend='orbax' writes a sharded-array-aware orbax checkpoint that
  load_model auto-detects (no backend flag needed on load)."""
  train, _ = splits
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
  m.fit(train, epochs=2, batch_size=64)
  path = str(tmp_path / "orbax_ckpt")
  m.save_weights(path, backend="orbax")
  assert os.path.isdir(os.path.join(path, "orbax"))
  assert not os.path.isfile(os.path.join(path, "params.msgpack"))
  loaded = load_model(path)
  x = train.numpy()[:16]
  np.testing.assert_allclose(np.asarray(m.encode(x).mean()),
                             np.asarray(loaded.encode(x).mean()), atol=1e-6)


def test_fit_records_metadata_and_persists(splits, small_nets, tmp_path):
  """fit() on a SingleCellOMIC auto-records the dataset name + per-omic
  var_names (reference single_cell_model.py:103-109, :221-226); the record
  survives save/load via the JSON metamodel."""
  train, test = splits
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
  assert m.dataset is None and m.metadata == {}
  m.fit(train, epochs=1, batch_size=64)
  assert m.dataset == train.name
  assert set(train.omics) <= set(m.metadata)
  rna_omic = train.omics[0]
  assert m.metadata[rna_omic] == list(map(str, train.get_var_names(rna_omic)))
  # explicit call (reference API) works too
  assert m.set_metadata(test) is m and m.dataset == test.name
  path = str(tmp_path / "meta_ckpt")
  m.save_weights(path)
  loaded = load_model(path)
  assert loaded.dataset == m.dataset
  assert loaded.metadata[rna_omic] == m.metadata[rna_omic]


def test_beta_schedule_roundtrips(splits, small_nets, tmp_path):
  """A KL warm-up schedule must survive save/load whole — collapsing it to
  vmax would silently drop annealing on resume (review finding)."""
  from sisua_tpu import interpolation as I
  from sisua_tpu.models import VAE, RVmeta, load_model
  train, _ = splits
  sched = I.linear(vmin=0.0, vmax=1.0, norm=500, delay_in=50)
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), beta=sched, **small_nets)
  m.fit(train, epochs=1, batch_size=128, valid_freq=0, patience=0)
  p = str(tmp_path / "sched")
  m.save_weights(p)
  m2 = load_model(p)
  assert m2.beta == sched, (m2.beta, sched)
  # constants still round-trip as plain floats
  m3 = VAE(RVmeta(train.n_vars, "zinb", name="rna"), beta=0.5, **small_nets)
  assert m3._init_kwargs_for_save["beta"] == 0.5


def test_scvi_decode_single_latent_raises_clearly(splits):
  from sisua_tpu.models import SCVI, RVmeta
  import jax.numpy as jnp
  import pytest as _pt
  train, _ = splits
  m = SCVI(RVmeta(train.n_vars, "zinbd", name="rna"))
  with _pt.raises(ValueError, match="library"):
    m.decode(jnp.zeros((4, 10)))
