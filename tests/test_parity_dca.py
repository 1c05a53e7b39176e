"""Cross-framework parity anchor for DeepCountAutoencoder — completes the
reference's cross-library validation pair
(`/root/reference/tests/test_dca_integration.py:1-177` validated DCA
against the original `dca` package; `test_scvi_integration.py` did scVI).

Same method as test_model_parity.py / test_parity_sisua_totalvi.py: an
independent ~40-line PyTorch DCA (deterministic linear latent, ZINB
reconstruction, no KL — Eraslan et al. 2019) trains on identical synthetic
data with the same protocol; held-out ZINB NLL through shared scipy code
must agree within a few percent.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sisua_tpu.data import generate_synthetic
from sisua_tpu.models import DeepCountAutoencoder, NetConf, RVmeta

from test_parity_sisua_totalvi import (_baseline_nb_nll, _clamp_exp,
                                       _torch_nb_llk, _zinb_nll)

N_CELLS, N_GENES = 2500, 200
LATENT, HID = 10, 128
EPOCHS, BATCH, LR = 30, 128, 1e-3


class TorchDCA(torch.nn.Module):
  def __init__(self, n_genes, latent=LATENT, hid=HID):
    super().__init__()
    self.enc = torch.nn.Sequential(torch.nn.Linear(n_genes, hid),
                                   torch.nn.ReLU())
    self.to_z = torch.nn.Linear(hid, latent)
    self.dec = torch.nn.Sequential(torch.nn.Linear(latent, hid),
                                   torch.nn.ReLU())
    self.px_loc = torch.nn.Linear(hid, n_genes)
    self.px_disp = torch.nn.Linear(hid, n_genes)
    self.px_gate = torch.nn.Linear(hid, n_genes)

  def forward(self, x):
    z = self.to_z(self.enc(torch.log1p(x)))
    d = self.dec(z)
    return (_clamp_exp(self.px_loc(d)), _clamp_exp(self.px_disp(d)),
            self.px_gate(d))

  def loss(self, x):
    mu, theta, gate = self(x)
    nb = _torch_nb_llk(x, mu, theta)
    log_g, log_1mg = F.logsigmoid(gate), F.logsigmoid(-gate)
    llk = torch.where(x < 0.5, torch.logaddexp(log_g, log_1mg + nb),
                      log_1mg + nb).sum(-1)
    return -llk.mean()


def _train_torch_dca(train, test):
  torch.manual_seed(0)
  gen = torch.Generator().manual_seed(1)
  x = torch.as_tensor(np.asarray(train.X.todense(), np.float32))
  model = TorchDCA(train.n_vars)
  opt = torch.optim.Adam(model.parameters(), lr=LR)
  n = len(x)
  for _ in range(EPOCHS):
    perm = torch.randperm(n, generator=gen)
    for lo in range(0, n - BATCH + 1, BATCH):
      opt.zero_grad()
      model.loss(x[perm[lo:lo + BATCH]]).backward()
      opt.step()
  model.eval()
  with torch.no_grad():
    xt = torch.as_tensor(np.asarray(test.X.todense(), np.float32))
    mu, theta, gate = model(xt)
  return _zinb_nll(np.asarray(xt), mu.numpy(), theta.numpy(), gate.numpy())


def _train_jax_dca(train, test):
  model = DeepCountAutoencoder(
      RVmeta(train.n_vars, "zinbd", name="rna"), latent_dim=LATENT,
      encoder=NetConf((HID,), batchnorm=False, dropout=0.0),
      decoder=NetConf((HID,), batchnorm=False, dropout=0.0), seed=0)
  model.fit(train, epochs=EPOCHS, batch_size=BATCH, learning_rate=LR,
            valid_freq=0, patience=0, device_cache=True, verbose=False)
  x = np.asarray(test.X.todense(), np.float32)
  qz = model.encode(x)
  pX = model.decode(np.asarray(qz.mean()))
  zi = pX.base
  mu = np.broadcast_to(np.asarray(zi.count_distribution.loc), x.shape)
  theta = np.broadcast_to(np.asarray(zi.count_distribution.disp), x.shape)
  gate = np.broadcast_to(np.asarray(zi.gate_logits), x.shape)
  return _zinb_nll(x, mu, theta, gate)


@pytest.mark.slow
def test_dca_matches_torch_reference():
  sco = generate_synthetic(n_cells=N_CELLS, n_genes=N_GENES, n_proteins=4,
                           seed=5218, zero_inflation=0.3)
  train, test = sco.split(0.8, seed=1)
  nll_torch = _train_torch_dca(train, test)
  nll_jax = _train_jax_dca(train, test)
  nll_base = _baseline_nb_nll(np.asarray(train.X.todense()),
                              np.asarray(test.X.todense()))
  print(f"\nDCA held-out ZINB NLL: torch={nll_torch:.1f} jax={nll_jax:.1f} "
        f"baseline={nll_base:.1f}")
  assert nll_jax < nll_base and nll_torch < nll_base
  rel = abs(nll_jax - nll_torch) / abs(nll_torch)
  assert rel < 0.05, (nll_jax, nll_torch, rel)
