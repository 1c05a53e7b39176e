"""bf16 compute path + multi-epoch window training + sparse predict.

The bf16 path runs MLP trunks and distribution-head matmuls in bfloat16
(MXU-friendly) while keeping parameters, batch statistics, and all log-prob
math in float32 — so checkpoints, optimizers, and the ELBO contract are
unchanged. Window training compiles `metrics_interval` whole epochs into one
executable (epoch scan around the step scan): identical SGD math, one
dispatch + one metric fetch per window.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sisua_tpu.models import SCVI, VAE, RVmeta


@pytest.fixture(scope="module")
def tiny():
  from sisua_tpu.data import generate_synthetic
  return generate_synthetic(n_cells=512, n_genes=40, n_proteins=4, seed=3)


@pytest.mark.parametrize("cls", [VAE, SCVI])
@pytest.mark.slow
def test_bfloat16_compute_path_trains(cls, tiny):
  m = cls(RVmeta(40, "zinbd", name="rna"),
          latents=RVmeta(8, "diag", name="latents"),
          compute_dtype="bfloat16")
  m.fit(tiny, epochs=6, batch_size=64, device_cache=True,
        metrics_interval=3, valid_freq=0, patience=0)
  losses = m.history["loss"]
  assert np.isfinite(losses).all()
  assert losses[-1] < losses[0]
  # params stay float32 (mixed precision, not half-precision weights)
  for leaf in jax.tree_util.tree_leaves(m.params):
    assert leaf.dtype == jnp.float32
  # forward returns float32 distribution params
  pX, _ = m.predict(tiny.numpy()[:64])
  assert np.asarray(pX.mean()).dtype == np.float32


@pytest.mark.slow
def test_bfloat16_roundtrips_through_checkpoint(tmp_path, tiny):
  from sisua_tpu.models import load_model
  m = VAE(RVmeta(40, "zinb", name="rna"), compute_dtype="bfloat16")
  m.fit(tiny, epochs=2, batch_size=64, valid_freq=0, patience=0)
  path = str(tmp_path / "ckpt")
  m.save_weights(path)
  m2 = load_model(path)
  assert m2.compute_dtype == "bfloat16"
  x = tiny.numpy()[:32]
  z1 = np.asarray(m.encode(x).mean())
  z2 = np.asarray(m2.encode(x).mean())
  np.testing.assert_allclose(z1, z2, atol=1e-6)


@pytest.mark.slow
def test_window_training_matches_per_epoch_semantics(tiny):
  """Window-scanned epochs must produce the same kind of history (one entry
  per window; trailing remainder as single epochs) with decreasing loss."""
  m = VAE(RVmeta(40, "zinb", name="rna"))
  m.fit(tiny, epochs=11, batch_size=64, device_cache=True,
        metrics_interval=4, valid_freq=0, patience=0)
  # windows of 4, 4, then 1+1+1 remainder — but history stays per-EPOCH
  # (each window's executable emits per-epoch metric sums as scan outputs)
  assert len(m.history["loss"]) == 11
  assert np.isfinite(m.history["loss"]).all()
  assert m.history["loss"][-1] < m.history["loss"][0]
  # loss decreases within windows too, not just across them
  assert m.history["loss"][3] < m.history["loss"][0]
  # the model saw all 11 epochs' worth of steps
  steps = int(m.state.step)
  assert steps == 11 * (512 // 64)


def test_predict_accepts_scipy_sparse(tiny):
  m = VAE(RVmeta(40, "zinb", name="rna"))
  m.fit(tiny, epochs=1, batch_size=64, valid_freq=0, patience=0)
  pX, qZ = m.predict(tiny.X[:48])  # CSR straight in
  assert np.asarray(pX.mean()).shape == (48, 40)


def test_kl_warmup_progresses_inside_window_executables(tiny):
  """beta is derived from state.step inside the compiled window, so the KL
  warm-up schedule advances across (and within) multi-epoch executables."""
  from sisua_tpu.interpolation import linear
  m = VAE(RVmeta(40, "zinb", name="rna"),
          beta=linear(vmin=0.0, vmax=1.0, norm=30))
  m.fit(tiny, epochs=8, batch_size=64, device_cache=True,
        metrics_interval=4, valid_freq=0, patience=0)
  betas = m.history["beta"]  # window-averaged
  assert betas[0] < betas[-1] <= 1.0


def test_device_cache_falls_back_when_dataset_exceeds_hbm(tiny, monkeypatch):
  """Oversized datasets must stream instead of OOMing the device."""
  from sisua_tpu.train.trainer import Trainer
  monkeypatch.setattr(Trainer, "_fits_device",
                      lambda self, feeder, budget_fraction=0.5: False)
  m = VAE(RVmeta(40, "zinb", name="rna"))
  m.fit(tiny, epochs=2, batch_size=64, device_cache=True,
        valid_freq=0, patience=0)
  assert np.isfinite(m.history["loss"]).all()
