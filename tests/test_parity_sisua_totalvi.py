"""Cross-framework parity anchors for the two differentiating model
families: SISUA (masked multitask semi-supervised VAE) and TotalVI
(NB-mixture protein likelihood) — VERDICT r2 #1.

Matches the intent of the reference's cross-library validations
(`/root/reference/tests/test_scvi_integration.py:1-206`,
`/root/reference/tests/test_dca_integration.py:1-177`) the way
``test_model_parity.py`` does for SCVI: a compact, *independent* PyTorch
reimplementation of each model's semantics is trained on identical
synthetic data with the same architecture/optimizer protocol, and the two
frameworks must agree on held-out quality within a few percent.

Held-out metrics are computed identically for both frameworks, from
posterior-mean latents → decoder → distribution parameters → shared
NumPy/SciPy likelihood code:

  * SISUA — RNA ZINB NLL (the reconstruction objective) and mean
    per-protein Spearman between the predicted protein mean and the true
    held-out counts (the label-prediction claim, reference
    ``README.rst:11-20``, ``vae.py:19-44``).
  * TotalVI — RNA NB NLL and protein NB-mixture NLL (background/foreground
    mixture, Gayoso et al. 2021), plus the protein Spearman.

Both implementations must also beat the per-gene moment-matched
no-model baseline.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from scipy import stats as sp_stats

from sisua_tpu.data import generate_synthetic, get_library_size
from sisua_tpu.models import SISUA, TotalVI, NetConf, RVmeta

N_CELLS, N_GENES, N_PROT = 2500, 200, 8
LATENT, HID = 10, 128
EPOCHS, BATCH, LR = 30, 128, 1e-3
ALPHA = 10.0          # label-llk weight, both frameworks
LABELS_PERCENT = 0.5  # per-example Bernoulli mask rate, both frameworks


# ----------------------------------------------------------------- shared
# likelihood code: ALL held-out numbers for BOTH frameworks go through these.

def _nb_logpmf(x, mu, theta):
  theta = np.broadcast_to(theta, mu.shape)
  p = theta / (theta + mu)
  return sp_stats.nbinom.logpmf(x.astype(np.int64), theta, p)


def _nb_nll(x, mu, theta):
  return float(-np.mean(_nb_logpmf(x, mu, theta).sum(-1)))


def _zinb_nll(x, mu, theta, gate_logits):
  """gate_logits = log-odds of the structural zero."""
  nb = _nb_logpmf(x, mu, theta)
  log_g = -np.log1p(np.exp(-gate_logits))
  log_1mg = -np.log1p(np.exp(gate_logits))
  lp = np.where(x < 0.5, np.logaddexp(log_g, log_1mg + nb), log_1mg + nb)
  return float(-np.mean(lp.sum(-1)))


def _nb_mixture_nll(x, mu_back, mu_fore, theta, mixing_logits):
  """Two-component NB mixture; sigmoid(mixing_logits) weights *background*
  (the convention pinned by test_totalvi.py::test_nb_mixture_logpmf)."""
  lp_back = _nb_logpmf(x, mu_back, theta)
  lp_fore = _nb_logpmf(x, mu_fore, theta)
  log_pi = -np.log1p(np.exp(-mixing_logits))
  log_1mpi = -np.log1p(np.exp(mixing_logits))
  lp = np.logaddexp(log_pi + lp_back, log_1mpi + lp_fore)
  return float(-np.mean(lp.sum(-1)))


def _protein_spearman(y_true, y_pred):
  rho = [sp_stats.spearmanr(y_true[:, j], y_pred[:, j]).statistic
         for j in range(y_true.shape[1])]
  return float(np.mean(rho))


def _baseline_nb_nll(train_x, test_x):
  """Per-gene moment-matched NB: the no-model anchor both must beat."""
  xtr = np.asarray(train_x, np.float64)
  mu = xtr.mean(0) + 1e-6
  var = xtr.var(0) + 1e-6
  theta = np.where(var > mu, mu**2 / np.maximum(var - mu, 1e-6), 1e6)
  theta = np.clip(theta, 1e-3, 1e6)
  xte = np.asarray(test_x, np.float64)
  return _nb_nll(xte, np.broadcast_to(mu, xte.shape), theta)


def _clamp_exp(raw):
  # the sisua_tpu positive-parameter transform (rv.py: exp(clip(·, ±15)))
  return torch.exp(torch.clamp(raw, -15.0, 15.0))


def _torch_nb_llk(x, mu, theta, eps=1e-8):
  return (-theta * torch.log1p((mu + eps) / (theta + eps))
          + x * (torch.log(mu + eps) - torch.log(theta + mu + eps))
          + torch.lgamma(x + theta) - torch.lgamma(theta)
          - torch.lgamma(x + 1.0))


# ======================================================================
# SISUA: masked multitask semi-supervised VAE
# (reference /root/reference/sisua/models/vae.py:19-44)
# ======================================================================

class TorchSISUA(torch.nn.Module):
  """Independent PyTorch SISUA: shared encoder over log1p(RNA), one diag
  Normal latent, ZINB RNA head + NB protein head; protein log-likelihood
  weighted by alpha and masked per-example."""

  def __init__(self, n_genes, n_prot, latent=LATENT, hid=HID):
    super().__init__()
    self.enc = torch.nn.Sequential(torch.nn.Linear(n_genes, hid),
                                   torch.nn.ReLU())
    self.qz_mu = torch.nn.Linear(hid, latent)
    self.qz_logvar = torch.nn.Linear(hid, latent)
    self.dec = torch.nn.Sequential(torch.nn.Linear(latent, hid),
                                   torch.nn.ReLU())
    self.px_loc = torch.nn.Linear(hid, n_genes)
    self.px_disp = torch.nn.Linear(hid, n_genes)
    self.px_gate = torch.nn.Linear(hid, n_genes)
    self.py_loc = torch.nn.Linear(hid, n_prot)
    self.py_disp = torch.nn.Linear(hid, n_prot)

  def posterior(self, x):
    h = self.enc(torch.log1p(x))
    return self.qz_mu(h), self.qz_logvar(h)

  def decode(self, z):
    d = self.dec(z)
    return (_clamp_exp(self.px_loc(d)), _clamp_exp(self.px_disp(d)),
            self.px_gate(d), _clamp_exp(self.py_loc(d)),
            _clamp_exp(self.py_disp(d)))

  def loss(self, x, y, mask, gen):
    qz_mu, qz_logvar = self.posterior(x)
    z = qz_mu + torch.exp(0.5 * qz_logvar) * torch.randn(
        qz_mu.shape, generator=gen)
    mu, theta, gate, mu_y, theta_y = self.decode(z)
    nb = _torch_nb_llk(x, mu, theta)
    log_g, log_1mg = F.logsigmoid(gate), F.logsigmoid(-gate)
    llk_x = torch.where(x < 0.5, torch.logaddexp(log_g, log_1mg + nb),
                        log_1mg + nb).sum(-1)
    llk_y = _torch_nb_llk(y, mu_y, theta_y).sum(-1) * ALPHA * mask
    kl = 0.5 * (qz_mu.square() + qz_logvar.exp() - qz_logvar - 1.0).sum(-1)
    return -(llk_x + llk_y - kl).mean()


def _train_torch_sisua(train, test):
  torch.manual_seed(0)
  gen = torch.Generator().manual_seed(1)
  x = torch.as_tensor(np.asarray(train.X.todense(), np.float32))
  y = torch.as_tensor(np.asarray(train.numpy("proteomic"), np.float32))
  model = TorchSISUA(train.n_vars, y.shape[1])
  opt = torch.optim.Adam(model.parameters(), lr=LR)
  n = len(x)
  # FIXED labeled subset for the whole run (both frameworks follow the
  # reference's cached masking map)
  mask_all = (torch.rand(n, generator=gen) < LABELS_PERCENT).float()
  for _ in range(EPOCHS):
    perm = torch.randperm(n, generator=gen)
    for lo in range(0, n - BATCH + 1, BATCH):
      idx = perm[lo:lo + BATCH]
      opt.zero_grad()
      loss = model.loss(x[idx], y[idx], mask_all[idx], gen)
      loss.backward()
      opt.step()
  model.eval()
  with torch.no_grad():
    xt = torch.as_tensor(np.asarray(test.X.todense(), np.float32))
    qz_mu, _ = model.posterior(xt)
    mu, theta, gate, mu_y, _ = model.decode(qz_mu)
  xt = np.asarray(xt)
  return (_zinb_nll(xt, mu.numpy(), theta.numpy(), gate.numpy()),
          _protein_spearman(np.asarray(test.numpy("proteomic")),
                            mu_y.numpy()))


def _train_jax_sisua(train, test):
  model = SISUA([RVmeta(train.n_vars, "zinbd", name="rna"),
                 RVmeta(train.get_dim("proteomic"), "nbd", name="adt")],
                latents=RVmeta(LATENT, "diag", name="latents"),
                encoder=NetConf((HID,), batchnorm=False, dropout=0.0),
                decoder=NetConf((HID,), batchnorm=False, dropout=0.0),
                alpha=ALPHA, seed=0)
  model.fit(train, epochs=EPOCHS, batch_size=BATCH, learning_rate=LR,
            labels_percent=LABELS_PERCENT, valid_freq=0, patience=0,
            device_cache=True, verbose=False)
  x = np.asarray(test.X.todense(), np.float32)
  qz = model.encode(x)
  pX_rna, pX_adt = model.decode(np.asarray(qz.mean()))
  zi = pX_rna.base
  nb = zi.count_distribution
  mu = np.broadcast_to(np.asarray(nb.loc), x.shape)
  theta = np.broadcast_to(np.asarray(nb.disp), x.shape)
  gate = np.broadcast_to(np.asarray(zi.gate_logits), x.shape)
  mu_y = np.asarray(pX_adt.base.loc)
  return (_zinb_nll(x, mu, theta, gate),
          _protein_spearman(np.asarray(test.numpy("proteomic")), mu_y))


@pytest.fixture(scope="module")
def sisua_data():
  sco = generate_synthetic(n_cells=N_CELLS, n_genes=N_GENES,
                           n_proteins=N_PROT, seed=5218, zero_inflation=0.3)
  return sco.split(0.8, seed=1)


@pytest.mark.slow
def test_sisua_matches_torch_reference(sisua_data):
  train, test = sisua_data
  nll_torch, rho_torch = _train_torch_sisua(train, test)
  nll_jax, rho_jax = _train_jax_sisua(train, test)
  nll_base = _baseline_nb_nll(np.asarray(train.X.todense()),
                              np.asarray(test.X.todense()))
  print(f"\nSISUA held-out: torch NLL={nll_torch:.1f} ρ={rho_torch:.3f} | "
        f"jax NLL={nll_jax:.1f} ρ={rho_jax:.3f} | baseline NLL={nll_base:.1f}")
  assert nll_jax < nll_base
  assert nll_torch < nll_base
  rel = abs(nll_jax - nll_torch) / abs(nll_torch)
  assert rel < 0.05, (nll_jax, nll_torch, rel)
  # protein prediction quality: both substantially better than chance and
  # within a tight absolute band of each other
  assert rho_jax > 0.3 and rho_torch > 0.3, (rho_jax, rho_torch)
  assert abs(rho_jax - rho_torch) < 0.1, (rho_jax, rho_torch)


# ======================================================================
# TotalVI: joint RNA+ADT with NB-mixture protein likelihood
# (working model beyond the reference stub scvi.py:174-175;
#  semantics per Gayoso et al. 2021 — see sisua_tpu/models/totalvi.py)
# ======================================================================

class TorchTotalVI(torch.nn.Module):
  """Independent PyTorch totalVI core: encoder over concat(log1p RNA,
  log1p ADT) → (z, library); SCVI RNA decode (softmax scale · exp(l), exp
  dispersion); protein background/foreground NB mixture with hierarchical
  q(log β | z) against a learned per-protein Normal prior."""

  def __init__(self, n_genes, n_prot, latent=LATENT, hid=HID):
    super().__init__()
    n_in = n_genes + n_prot
    self.enc = torch.nn.Sequential(torch.nn.Linear(n_in, hid),
                                   torch.nn.ReLU())
    self.qz_mu = torch.nn.Linear(hid, latent)
    self.qz_logvar = torch.nn.Linear(hid, latent)
    self.enc_l = torch.nn.Sequential(torch.nn.Linear(n_in, 64),
                                     torch.nn.ReLU())
    self.ql_mu = torch.nn.Linear(64, 1)
    self.ql_logvar = torch.nn.Linear(64, 1)
    self.dec = torch.nn.Sequential(torch.nn.Linear(latent, hid),
                                   torch.nn.ReLU())
    self.px_scale = torch.nn.Linear(hid, n_genes)
    self.px_r = torch.nn.Linear(hid, n_genes)
    self.py_back_mean = torch.nn.Linear(hid, n_prot)
    self.py_back_scale = torch.nn.Linear(hid, n_prot)
    self.py_fore_scale = torch.nn.Linear(hid, n_prot)
    self.py_mixing = torch.nn.Linear(hid, n_prot)
    self.py_r = torch.nn.Parameter(torch.zeros(n_prot))
    self.back_prior_mean = torch.nn.Parameter(torch.zeros(n_prot))
    self.back_prior_logscale = torch.nn.Parameter(torch.zeros(n_prot))

  def posteriors(self, x, y):
    inp = torch.cat([torch.log1p(x), torch.log1p(y)], -1)
    h, hl = self.enc(inp), self.enc_l(inp)
    return (self.qz_mu(h), self.qz_logvar(h),
            self.ql_mu(hl), self.ql_logvar(hl))

  def decode(self, z, l, log_back=None):
    l = torch.clamp(l, 0.0, 1e3)
    d = self.dec(z)
    scale = torch.clamp(torch.softmax(self.px_scale(d), -1), 1e-7, 1 - 1e-7)
    mu = torch.exp(l) * scale
    theta = torch.exp(self.px_r(d))
    qb_mu = torch.clamp(self.py_back_mean(d), -8.0, 12.0)
    qb_scale = F.softplus(self.py_back_scale(d)) + 1e-4
    if log_back is None:
      log_back = qb_mu  # deterministic decode: posterior mean
    back = torch.exp(torch.clamp(log_back, -8.0, 12.0))
    alpha = F.softplus(self.py_fore_scale(d)) + 1.0 + 1e-4
    fore = back * alpha
    disp = torch.exp(self.py_r).expand_as(fore)
    mixing = self.py_mixing(d)
    return mu, theta, (qb_mu, qb_scale), back, fore, disp, mixing

  def loss(self, x, y, lib_mean, lib_var, gen):
    qz_mu, qz_logvar, ql_mu, ql_logvar = self.posteriors(x, y)
    z = qz_mu + torch.exp(0.5 * qz_logvar) * torch.randn(
        qz_mu.shape, generator=gen)
    l = ql_mu + torch.exp(0.5 * ql_logvar) * torch.randn(
        ql_mu.shape, generator=gen)
    d = self.dec(z)
    qb_mu = torch.clamp(self.py_back_mean(d), -8.0, 12.0)
    qb_scale = F.softplus(self.py_back_scale(d)) + 1e-4
    log_back = qb_mu + qb_scale * torch.randn(qb_mu.shape, generator=gen)
    mu, theta, _, back, fore, disp, mixing = self.decode(z, l, log_back)
    llk_x = _torch_nb_llk(x, mu, theta).sum(-1)
    log_pi, log_1mpi = F.logsigmoid(mixing), F.logsigmoid(-mixing)
    llk_y = torch.logaddexp(log_pi + _torch_nb_llk(y, back, disp),
                            log_1mpi + _torch_nb_llk(y, fore, disp)).sum(-1)
    kl_z = 0.5 * (qz_mu.square() + qz_logvar.exp() - qz_logvar - 1.0).sum(-1)
    prior_var = torch.as_tensor(lib_var)
    kl_l = 0.5 * ((ql_mu - lib_mean).square() / prior_var
                  + ql_logvar.exp() / prior_var
                  + torch.log(prior_var) - ql_logvar - 1.0).sum(-1)
    p_var = torch.exp(2.0 * self.back_prior_logscale)
    kl_b = 0.5 * ((qb_mu - self.back_prior_mean).square() / p_var
                  + qb_scale.square() / p_var
                  + torch.log(p_var) - 2.0 * torch.log(qb_scale) - 1.0
                  ).sum(-1)
    return -(llk_x + llk_y - kl_z - kl_l - kl_b).mean()


def _train_torch_totalvi(train, test):
  torch.manual_seed(0)
  gen = torch.Generator().manual_seed(1)
  x = torch.as_tensor(np.asarray(train.X.todense(), np.float32))
  y = torch.as_tensor(np.asarray(train.numpy("proteomic"), np.float32))
  lib_mean, lib_var = get_library_size(train.X)
  lib_mean, lib_var = float(lib_mean[0, 0]), float(lib_var[0, 0])
  model = TorchTotalVI(train.n_vars, y.shape[1])
  opt = torch.optim.Adam(model.parameters(), lr=LR)
  n = len(x)
  for _ in range(EPOCHS):
    perm = torch.randperm(n, generator=gen)
    for lo in range(0, n - BATCH + 1, BATCH):
      idx = perm[lo:lo + BATCH]
      opt.zero_grad()
      loss = model.loss(x[idx], y[idx], lib_mean, lib_var, gen)
      loss.backward()
      opt.step()
  model.eval()
  with torch.no_grad():
    xt = torch.as_tensor(np.asarray(test.X.todense(), np.float32))
    yt = torch.as_tensor(np.asarray(test.numpy("proteomic"), np.float32))
    qz_mu, _, ql_mu, _ = model.posteriors(xt, yt)
    mu, theta, _, back, fore, disp, mixing = model.decode(qz_mu, ql_mu)
  xt, yt = np.asarray(xt), np.asarray(yt)
  pi = 1.0 / (1.0 + np.exp(-mixing.numpy()))
  y_mean = pi * back.numpy() + (1 - pi) * fore.numpy()
  return (_nb_nll(xt, mu.numpy(), theta.numpy()),
          _nb_mixture_nll(yt, back.numpy(), fore.numpy(), disp.numpy(),
                          mixing.numpy()),
          _protein_spearman(yt, y_mean))


def _train_jax_totalvi(train, test):
  model = TotalVI([RVmeta(train.n_vars, "nbd", name="rna"),
                   RVmeta(train.get_dim("proteomic"), "nbd", name="adt")],
                  latents=RVmeta(LATENT, "diag", name="latents"),
                  encoder=NetConf((HID,), batchnorm=False, dropout=0.0),
                  decoder=NetConf((HID,), batchnorm=False, dropout=0.0),
                  seed=0)
  model.fit(train, epochs=EPOCHS, batch_size=BATCH, learning_rate=LR,
            valid_freq=0, patience=0, device_cache=True, verbose=False)
  x = np.asarray(test.X.todense(), np.float32)
  yt = np.asarray(test.numpy("proteomic"), np.float32)
  qz, ql = model.encode(np.concatenate([x, yt], -1))
  pX_rna, pY = model.decode((np.asarray(qz.mean()), np.asarray(ql.mean())))
  nb = pX_rna.base
  mu = np.broadcast_to(np.asarray(nb.loc), x.shape)
  theta = np.broadcast_to(np.asarray(nb.disp), x.shape)
  mix = pY.base
  back = np.asarray(mix.loc_back)
  fore = np.asarray(mix.loc_fore)
  disp = np.broadcast_to(np.asarray(mix.disp), back.shape)
  mixing = np.asarray(mix.mixing_logits)
  pi = 1.0 / (1.0 + np.exp(-mixing))
  y_mean = pi * back + (1 - pi) * fore
  return (_nb_nll(x, mu, theta),
          _nb_mixture_nll(yt, back, fore, disp, mixing),
          _protein_spearman(yt, y_mean))


@pytest.fixture(scope="module")
def totalvi_data():
  sco = generate_synthetic(n_cells=N_CELLS, n_genes=N_GENES,
                           n_proteins=N_PROT, seed=5218, zero_inflation=0.0)
  return sco.split(0.8, seed=1)


@pytest.mark.slow
def test_totalvi_matches_torch_reference(totalvi_data):
  train, test = totalvi_data
  rna_t, prot_t, rho_t = _train_torch_totalvi(train, test)
  rna_j, prot_j, rho_j = _train_jax_totalvi(train, test)
  rna_base = _baseline_nb_nll(np.asarray(train.X.todense()),
                              np.asarray(test.X.todense()))
  prot_base = _baseline_nb_nll(np.asarray(train.numpy("proteomic")),
                               np.asarray(test.numpy("proteomic")))
  print(f"\nTotalVI held-out: torch RNA={rna_t:.1f} ADT={prot_t:.2f} "
        f"ρ={rho_t:.3f} | jax RNA={rna_j:.1f} ADT={prot_j:.2f} ρ={rho_j:.3f}"
        f" | baselines RNA={rna_base:.1f} ADT={prot_base:.2f}")
  assert rna_j < rna_base and rna_t < rna_base
  assert prot_j < prot_base and prot_t < prot_base
  assert abs(rna_j - rna_t) / abs(rna_t) < 0.05, (rna_j, rna_t)
  assert abs(prot_j - prot_t) / abs(prot_t) < 0.07, (prot_j, prot_t)
  assert rho_j > 0.3 and rho_t > 0.3, (rho_j, rho_t)
  assert abs(rho_j - rho_t) < 0.1, (rho_j, rho_t)
