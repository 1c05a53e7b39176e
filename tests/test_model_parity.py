"""Cross-framework model-level parity: sisua_tpu.SCVI vs an independent
PyTorch scVI (VERDICT r1 #2).

The distribution layer is pinned against torch/scipy element-wise
(test_torch_parity.py); this pins the *trained model*: a ~130-line reference
scVI (Lopez et al. 2018 — z + library encoders, softmax scale decoder,
NB mean/dispersion likelihood, analytic KLs) implemented in PyTorch, trained
on identical synthetic data with the same architecture/optimizer protocol,
must reach the same held-out NLL within a few percent.

Held-out NLL is computed identically for both frameworks: posterior-mean
latents → decoder → (μ, θ) → scipy nbinom logpmf. Both models must also
beat the per-gene moment-matched NB baseline (sanity that they learned
anything at all).

Reference semantics matched: /root/reference/sisua/models/scvi.py:19-175.
"""

import numpy as np
import pytest
import torch
from scipy import stats as sp_stats

from sisua_tpu.data import generate_synthetic, get_library_size
from sisua_tpu.models import SCVI, NetConf, RVmeta

N_CELLS, N_GENES = 2500, 200
LATENT, HID = 10, 128
EPOCHS, BATCH, LR = 30, 128, 1e-3


def _nll(x: np.ndarray, mu: np.ndarray, theta: np.ndarray) -> float:
  """Mean per-cell NB negative log-likelihood, shared across frameworks."""
  theta = np.broadcast_to(theta, mu.shape)
  p = theta / (theta + mu)
  lp = sp_stats.nbinom.logpmf(x.astype(np.int64), theta, p)
  return float(-np.mean(lp.sum(-1)))


@pytest.fixture(scope="module")
def data():
  sco = generate_synthetic(n_cells=N_CELLS, n_genes=N_GENES, n_proteins=4,
                           seed=5218, zero_inflation=0.0)
  train, test = sco.split(0.8, seed=1)
  return train, test


class TorchSCVI(torch.nn.Module):
  """Minimal faithful scVI: matches the sisua_tpu.SCVI architecture used in
  the test (single-hidden-layer encoders/decoder, no BN/dropout)."""

  def __init__(self, n_genes, latent=LATENT, hid=HID):
    super().__init__()
    self.enc = torch.nn.Sequential(torch.nn.Linear(n_genes, hid),
                                   torch.nn.ReLU())
    self.qz_mu = torch.nn.Linear(hid, latent)
    self.qz_logvar = torch.nn.Linear(hid, latent)
    self.enc_l = torch.nn.Sequential(torch.nn.Linear(n_genes, 64),
                                     torch.nn.ReLU())
    self.ql_mu = torch.nn.Linear(64, 1)
    self.ql_logvar = torch.nn.Linear(64, 1)
    self.dec = torch.nn.Sequential(torch.nn.Linear(latent, hid),
                                   torch.nn.ReLU())
    self.px_scale = torch.nn.Linear(hid, n_genes)
    self.px_r = torch.nn.Linear(hid, n_genes)

  def posteriors(self, x):
    h = self.enc(torch.log1p(x))
    hl = self.enc_l(torch.log1p(x))
    return (self.qz_mu(h), self.qz_logvar(h),
            self.ql_mu(hl), self.ql_logvar(hl))

  def decode(self, z, l):
    l = torch.clamp(l, 0.0, 1e3)
    d = self.dec(z)
    scale = torch.clamp(torch.softmax(self.px_scale(d), -1), 1e-7, 1 - 1e-7)
    mu = torch.exp(l) * scale
    theta = torch.exp(self.px_r(d))
    return mu, theta

  def loss(self, x, lib_mean, lib_var, gen):
    qz_mu, qz_logvar, ql_mu, ql_logvar = self.posteriors(x)
    z = qz_mu + torch.exp(0.5 * qz_logvar) * torch.randn(
        qz_mu.shape, generator=gen)
    l = ql_mu + torch.exp(0.5 * ql_logvar) * torch.randn(
        ql_mu.shape, generator=gen)
    mu, theta = self.decode(z, l)
    eps = 1e-8
    llk = (-theta * torch.log1p((mu + eps) / (theta + eps))
           + x * (torch.log(mu + eps) - torch.log(theta + mu + eps))
           + torch.lgamma(x + theta) - torch.lgamma(theta)
           - torch.lgamma(x + 1.0)).sum(-1)
    kl_z = 0.5 * (qz_mu.square() + qz_logvar.exp() - qz_logvar - 1.0
                  ).sum(-1)
    prior_var = torch.as_tensor(lib_var)
    kl_l = 0.5 * ((ql_mu - lib_mean).square() / prior_var
                  + ql_logvar.exp() / prior_var
                  + torch.log(prior_var) - ql_logvar - 1.0).sum(-1)
    return (-llk + kl_z + kl_l).mean()


def _train_torch(train, test):
  torch.manual_seed(0)
  gen = torch.Generator().manual_seed(1)
  x = torch.as_tensor(np.asarray(train.X.todense(), np.float32))
  lib_mean, lib_var = get_library_size(train.X)
  lib_mean = float(lib_mean[0, 0])
  lib_var = float(lib_var[0, 0])
  model = TorchSCVI(train.n_vars)
  opt = torch.optim.Adam(model.parameters(), lr=LR)
  n = len(x)
  for _ in range(EPOCHS):
    perm = torch.randperm(n, generator=gen)
    for lo in range(0, n - BATCH + 1, BATCH):
      xb = x[perm[lo:lo + BATCH]]
      opt.zero_grad()
      loss = model.loss(xb, lib_mean, lib_var, gen)
      loss.backward()
      opt.step()
  model.eval()
  with torch.no_grad():
    xt = torch.as_tensor(np.asarray(test.X.todense(), np.float32))
    qz_mu, _, ql_mu, _ = model.posteriors(xt)
    mu, theta = model.decode(qz_mu, ql_mu)
  return _nll(np.asarray(xt), mu.numpy(), theta.numpy())


def _train_jax(train, test):
  model = SCVI(RVmeta(train.n_vars, "nbd", name="rna"),
               latents=RVmeta(LATENT, "diag", name="latents"),
               encoder=NetConf((HID,), batchnorm=False, dropout=0.0),
               encoder_l=NetConf((64,), batchnorm=False, dropout=0.0),
               decoder=NetConf((HID,), batchnorm=False, dropout=0.0),
               seed=0)
  model.fit(train, epochs=EPOCHS, batch_size=BATCH, learning_rate=LR,
            valid_freq=0, patience=0, device_cache=True, verbose=False)
  x = np.asarray(test.X.todense(), np.float32)
  qz, ql = model.encode(x)
  pX = model.decode((np.asarray(qz.mean()), np.asarray(ql.mean())))
  base = pX.base  # Independent → NegativeBinomialDisp
  mu = np.broadcast_to(np.asarray(base.loc), x.shape)
  theta = np.broadcast_to(np.asarray(base.disp), x.shape)
  return _nll(x, mu, theta)


def _baseline_nll(train, test):
  """Per-gene moment-matched NB: the no-model anchor both must beat."""
  xtr = np.asarray(train.X.todense(), np.float64)
  xte = np.asarray(test.X.todense(), np.float64)
  mu = xtr.mean(0) + 1e-6
  var = xtr.var(0) + 1e-6
  theta = np.where(var > mu, mu**2 / np.maximum(var - mu, 1e-6), 1e6)
  theta = np.clip(theta, 1e-3, 1e6)
  return _nll(xte, np.broadcast_to(mu, xte.shape),
              np.broadcast_to(theta, xte.shape))


@pytest.mark.slow
def test_scvi_matches_torch_reference(data):
  train, test = data
  nll_torch = _train_torch(train, test)
  nll_jax = _train_jax(train, test)
  nll_base = _baseline_nll(train, test)
  print(f"\nheld-out NLL/cell: torch={nll_torch:.1f} jax={nll_jax:.1f} "
        f"baseline={nll_base:.1f}")
  # both frameworks learned substantially beyond the no-model anchor
  assert nll_jax < nll_base
  assert nll_torch < nll_base
  # cross-framework parity within a few percent
  rel = abs(nll_jax - nll_torch) / abs(nll_torch)
  assert rel < 0.05, (nll_jax, nll_torch, rel)
