"""Cross-framework parity anchors for the chromatin models: PEAKVI
(composed-Bernoulli accessibility) and MULTIVI (mixture-of-experts joint
RNA+ATAC posterior, Jeffreys alignment, mosaic gating) — VERDICT r4
next-round 6. DCA/SISUA/SCVI/TotalVI already carry independent PyTorch
anchors (`test_parity_dca.py`, `test_parity_sisua_totalvi.py`,
`test_model_parity.py` — the reference's cross-library pattern,
`/root/reference/tests/test_scvi_integration.py:1-206`); these were the
two families pinned only by self-tests.

Protocol (identical to the other parity files): a compact independent
PyTorch reimplementation of each model's semantics trains on identical
`generate_multiome` data with the same architecture/optimizer budget;
held-out quality is computed for BOTH frameworks by the same NumPy
likelihood code and must agree within the tolerance band used by
`test_parity_sisua_totalvi.py` (relative NLL < 5%, metric gap < 0.1),
and both must beat the no-model baselines.

Semantics mirrored in torch:

  * PEAKVI — binarized peaks; Bernoulli logit composed from
    σ(decoder)·σ(depth)·σ(region) in log space
    (``sisua_tpu/models/peakvi.py::_compose_logits``); standard-normal z.
  * MULTIVI — per-modality encoders; joint posterior μ = Σ wₘ μₘ,
    σ² = Σ wₘ² σₘ² with observed-modality weights; SCVI RNA decode
    (library latent from the RNA branch, prior N(local_mean, √local_var),
    KL gated by the RNA-observed mask); PeakVI ATAC decode; Jeffreys
    penalty over PAIRED cells normalized by the paired count
    (``sisua_tpu/models/multivi.py``).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from scipy import stats as sp_stats

from sisua_tpu.data import generate_multiome
from sisua_tpu.models import MULTIVI, PEAKVI, NetConf, RVmeta

LATENT, HID = 12, 96
EPOCHS, BATCH, LR = 25, 125, 1e-3


# ----------------------------------------------------------------- shared
# likelihood code: ALL held-out numbers for BOTH frameworks go through these.

def _nb_nll(x, mu, theta):
  theta = np.broadcast_to(theta, mu.shape)
  p = theta / (theta + mu)
  lp = sp_stats.nbinom.logpmf(x.astype(np.int64), theta, p)
  return float(-np.mean(lp.sum(-1)))


def _bernoulli_nll(x_bin, logits):
  lp = np.where(x_bin > 0.5,
                -np.log1p(np.exp(-logits)),
                -np.log1p(np.exp(logits)))
  return float(-np.mean(lp.sum(-1)))


def _latent_ari(z, y, seed=0):
  from sklearn.cluster import KMeans
  from sklearn.metrics import adjusted_rand_score
  pred = KMeans(n_clusters=len(np.unique(y)), n_init=10,
                random_state=seed).fit_predict(z)
  return float(adjusted_rand_score(y, pred))


def _baseline_bernoulli_nll(train_bin, test_bin):
  """Per-peak base-rate Bernoulli: the no-model anchor."""
  p = np.clip(train_bin.mean(0), 1e-4, 1 - 1e-4)
  logits = np.log(p) - np.log1p(-p)
  return _bernoulli_nll(test_bin, np.broadcast_to(logits, test_bin.shape))


def _baseline_nb_nll(train_x, test_x):
  mu = train_x.mean(0) + 1e-6
  var = train_x.var(0) + 1e-6
  theta = np.clip(np.where(var > mu, mu**2 / np.maximum(var - mu, 1e-6),
                           1e6), 1e-3, 1e6)
  return _nb_nll(test_x, np.broadcast_to(mu, test_x.shape), theta)


def _compose_logits_t(ly, ld, lr):
  log_p = F.logsigmoid(ly)
  if ld is not None:
    log_p = log_p + F.logsigmoid(ld)
  if lr is not None:
    log_p = log_p + F.logsigmoid(lr)
  log_p = torch.clamp(log_p, max=-1e-7)
  return log_p - torch.log(-torch.expm1(log_p))


def _kl_normal(mu, logvar):
  return 0.5 * (mu.square() + logvar.exp() - logvar - 1.0).sum(-1)


# ======================================================================
# PEAKVI
# ======================================================================

class TorchPEAKVI(torch.nn.Module):
  def __init__(self, n_regions, latent=LATENT, hid=HID):
    super().__init__()
    self.enc = torch.nn.Sequential(torch.nn.Linear(n_regions, hid),
                                   torch.nn.ReLU())
    self.qz_mu = torch.nn.Linear(hid, latent)
    self.qz_logvar = torch.nn.Linear(hid, latent)
    self.dec = torch.nn.Sequential(torch.nn.Linear(latent, hid),
                                   torch.nn.ReLU())
    self.y_dense = torch.nn.Linear(hid, n_regions)
    self.region_factor = torch.nn.Parameter(torch.zeros(n_regions))
    self.depth = torch.nn.Sequential(torch.nn.Linear(n_regions, 32),
                                     torch.nn.ReLU(),
                                     torch.nn.Linear(32, 1))

  def posterior(self, xb):
    h = self.enc(xb)
    return self.qz_mu(h), self.qz_logvar(h)

  def logits(self, z, xb, depth=True, region=True):
    ly = self.y_dense(self.dec(z))
    return _compose_logits_t(ly, self.depth(xb) if depth else None,
                             self.region_factor if region else None)

  def loss(self, x, gen):
    xb = (x > 0).float()
    mu, logvar = self.posterior(xb)
    z = mu + torch.exp(0.5 * logvar) * torch.randn(mu.shape, generator=gen)
    logits = self.logits(z, xb)
    llk = -F.binary_cross_entropy_with_logits(
        logits, xb, reduction="none").sum(-1)
    return -(llk - _kl_normal(mu, logvar)).mean()


def _train_torch_peakvi(train_A, test_A):
  torch.manual_seed(0)
  gen = torch.Generator().manual_seed(1)
  x = torch.as_tensor(train_A)
  model = TorchPEAKVI(x.shape[1])
  opt = torch.optim.Adam(model.parameters(), lr=LR)
  n = len(x)
  for _ in range(EPOCHS):
    perm = torch.randperm(n, generator=gen)
    for lo in range(0, n - BATCH + 1, BATCH):
      idx = perm[lo:lo + BATCH]
      opt.zero_grad()
      model.loss(x[idx], gen).backward()
      opt.step()
  model.eval()
  with torch.no_grad():
    xt = torch.as_tensor(test_A)
    xb = (xt > 0).float()
    mu, _ = model.posterior(xb)
    logits = model.logits(mu, xb)
  return (_bernoulli_nll((test_A > 0).astype(np.float64), logits.numpy()),
          _latent_ari(mu.numpy(), _train_torch_peakvi.y_te))


def _train_jax_peakvi(train, test):
  m = PEAKVI(RVmeta(train.get_dim("atac"), "bernoulli", name="atac"),
             latents=RVmeta(LATENT, "diag", name="latents"),
             encoder=NetConf((HID,), batchnorm=False, dropout=0.0),
             decoder=NetConf((HID,), batchnorm=False, dropout=0.0),
             seed=0)
  m.fit(train, epochs=EPOCHS, batch_size=BATCH, learning_rate=LR,
        valid_freq=0, patience=0, verbose=False)
  import jax.numpy as jnp
  from sisua_tpu.models.peakvi import PEAKVIModule
  x = np.asarray(test.numpy("atac"), np.float32)
  qz = m.encode(x)
  qz = qz[0] if isinstance(qz, (tuple, list)) else qz
  z_mean = np.asarray(qz.mean())
  variables = {"params": m.state.params}
  if m.state.batch_stats is not None:
    variables["batch_stats"] = m.state.batch_stats
  dl = m.module.apply(variables, jnp.asarray(x), training=False,
                      method=PEAKVIModule.depth_logit)
  out = m.module.apply(variables, jnp.asarray(z_mean), training=False,
                       depth_logit=jnp.asarray(dl),
                       method=PEAKVIModule.decode,
                       rngs={"sample": m._next_key()})
  logits = np.asarray(out[0].base.logits)
  return (_bernoulli_nll((x > 0).astype(np.float64), logits),
          _latent_ari(z_mean, _train_jax_peakvi.y_te))


@pytest.fixture(scope="module")
def multiome_data():
  sco = generate_multiome(n_cells=2500, n_genes=150, n_regions=200, seed=7)
  return sco.split(0.8, seed=1)


@pytest.mark.slow
def test_peakvi_matches_torch_reference(multiome_data):
  train, test = multiome_data
  A_tr = np.asarray(train.numpy("atac"), np.float32)
  A_te = np.asarray(test.numpy("atac"), np.float32)
  y_te = np.asarray(test.numpy("celltype")).argmax(-1)
  _train_torch_peakvi.y_te = y_te
  _train_jax_peakvi.y_te = y_te
  nll_t, ari_t = _train_torch_peakvi(A_tr, A_te)
  nll_j, ari_j = _train_jax_peakvi(train, test)
  nll_base = _baseline_bernoulli_nll((A_tr > 0).astype(np.float64),
                                     (A_te > 0).astype(np.float64))
  print(f"\nPEAKVI held-out: torch NLL={nll_t:.1f} ARI={ari_t:.3f} | "
        f"jax NLL={nll_j:.1f} ARI={ari_j:.3f} | baseline NLL={nll_base:.1f}")
  assert nll_j < nll_base and nll_t < nll_base
  assert abs(nll_j - nll_t) / abs(nll_t) < 0.05, (nll_j, nll_t)
  # latent geometry: both recover celltype structure, within a band
  assert ari_j > 0.2 and ari_t > 0.2, (ari_j, ari_t)
  assert abs(ari_j - ari_t) < 0.25, (ari_j, ari_t)


# ======================================================================
# MULTIVI
# ======================================================================

class TorchMULTIVI(torch.nn.Module):
  """Independent MoE joint posterior + SCVI RNA decode + PeakVI ATAC
  decode + paired-normalized Jeffreys, gated for mosaic data."""

  def __init__(self, n_genes, n_regions, latent=LATENT, hid=HID):
    super().__init__()
    def mlp(n_in):
      return torch.nn.Sequential(torch.nn.Linear(n_in, hid),
                                 torch.nn.ReLU())
    self.enc_r, self.enc_a = mlp(n_genes), mlp(n_regions)
    self.qr_mu = torch.nn.Linear(hid, latent)
    self.qr_logvar = torch.nn.Linear(hid, latent)
    self.qa_mu = torch.nn.Linear(hid, latent)
    self.qa_logvar = torch.nn.Linear(hid, latent)
    self.ql_mu = torch.nn.Linear(hid, 1)
    self.ql_logvar = torch.nn.Linear(hid, 1)
    self.dec_r, self.dec_a = mlp(latent), mlp(latent)
    self.px_scale = torch.nn.Linear(hid, n_genes)
    self.px_r = torch.nn.Parameter(torch.zeros(n_genes))
    self.y_dense = torch.nn.Linear(hid, n_regions)
    self.region_factor = torch.nn.Parameter(torch.zeros(n_regions))
    self.depth = torch.nn.Sequential(torch.nn.Linear(n_regions, 32),
                                     torch.nn.ReLU(),
                                     torch.nn.Linear(32, 1))

  def posteriors(self, rna, atac):
    m_r = (rna.sum(-1) > 0).float()[:, None]
    m_a = (atac.sum(-1) > 0).float()[:, None]
    total = torch.clamp(m_r + m_a, min=1.0)
    w_r = torch.where(m_r + m_a > 0, m_r / total,
                      torch.full_like(m_r, 0.5))
    w_a = torch.where(m_r + m_a > 0, m_a / total,
                      torch.full_like(m_a, 0.5))
    h_r = self.enc_r(torch.log1p(rna))
    h_a = self.enc_a((atac > 0).float())
    mu_r, lv_r = self.qr_mu(h_r), self.qr_logvar(h_r)
    mu_a, lv_a = self.qa_mu(h_a), self.qa_logvar(h_a)
    mu = w_r * mu_r + w_a * mu_a
    var = w_r**2 * lv_r.exp() + w_a**2 * lv_a.exp()
    return ((mu, torch.log(torch.clamp(var, min=1e-8))),
            (self.ql_mu(h_r), self.ql_logvar(h_r)),
            (mu_r, lv_r), (mu_a, lv_a), m_r[:, 0], m_a[:, 0])

  def decode_rna(self, z, l):
    log_scale = F.log_softmax(self.px_scale(self.dec_r(z)), -1)
    mu = torch.exp(torch.clamp(l, 0.0, 1e3) + log_scale)
    return mu, torch.exp(self.px_r)

  def decode_atac(self, z, atac_bin, depth=True, region=True):
    ly = self.y_dense(self.dec_a(z))
    return _compose_logits_t(
        ly, self.depth(atac_bin) if depth else None,
        self.region_factor if region else None)

  def loss(self, rna, atac, lib_mean, lib_var, gen):
    (qz, ql, qr, qa, m_r, m_a) = self.posteriors(rna, atac)
    z = qz[0] + torch.exp(0.5 * qz[1]) * torch.randn(qz[0].shape,
                                                     generator=gen)
    l = ql[0] + torch.exp(0.5 * ql[1]) * torch.randn(ql[0].shape,
                                                     generator=gen)
    mu, theta = self.decode_rna(z, l)
    llk_r = (torch.lgamma(rna + theta) - torch.lgamma(theta)
             - torch.lgamma(rna + 1.0)
             - theta * torch.log1p(mu / (theta + 1e-8))
             + rna * (torch.log(mu + 1e-8)
                      - torch.log(theta + mu + 1e-8))).sum(-1)
    ab = (atac > 0).float()
    logits = self.decode_atac(z, ab)
    llk_a = -F.binary_cross_entropy_with_logits(
        logits, ab, reduction="none").sum(-1)
    kl_z = _kl_normal(*qz)
    # library KL vs per-dataset prior, gated by the RNA-observed mask
    pl_mu, pl_var = lib_mean, lib_var
    kl_l = (0.5 * (ql[1].exp() / pl_var
                   + (ql[0] - pl_mu).square() / pl_var
                   - 1.0 - ql[1] + torch.log(pl_var))).sum(-1)
    # Jeffreys over paired cells, normalized by the paired count
    var_r, var_a = qr[1].exp(), qa[1].exp()
    kl_ra = 0.5 * (var_r / var_a + (qr[0] - qa[0]).square() / var_a
                   - 1.0 + qa[1] - qr[1]).sum(-1)
    kl_ar = 0.5 * (var_a / var_r + (qa[0] - qr[0]).square() / var_r
                   - 1.0 + qr[1] - qa[1]).sum(-1)
    m = m_r * m_a
    jeff = (0.5 * (kl_ra + kl_ar) * m).sum() / torch.clamp(m.sum(), min=1.0)
    elbo = llk_r * m_r + llk_a * m_a - kl_z - kl_l * m_r
    return -elbo.mean() + jeff


def _train_torch_multivi(train, test):
  torch.manual_seed(0)
  gen = torch.Generator().manual_seed(1)
  X = torch.as_tensor(np.asarray(train.numpy("transcriptomic"), np.float32))
  A = torch.as_tensor(np.asarray(train.numpy("atac"), np.float32))
  logc = torch.log(X.sum(-1) + 1e-8)
  lib_mean = torch.full((1,), float(logc.mean()))
  lib_var = torch.full((1,), float(logc.var()))
  model = TorchMULTIVI(X.shape[1], A.shape[1])
  opt = torch.optim.Adam(model.parameters(), lr=LR)
  n = len(X)
  for _ in range(EPOCHS):
    perm = torch.randperm(n, generator=gen)
    for lo in range(0, n - BATCH + 1, BATCH):
      idx = perm[lo:lo + BATCH]
      opt.zero_grad()
      model.loss(X[idx], A[idx], lib_mean, lib_var, gen).backward()
      opt.step()
  model.eval()
  with torch.no_grad():
    Xt = torch.as_tensor(np.asarray(test.numpy("transcriptomic"),
                                    np.float32))
    At = torch.as_tensor(np.asarray(test.numpy("atac"), np.float32))
    qz, ql, *_ = model.posteriors(Xt, At)
    mu, theta = model.decode_rna(qz[0], ql[0])
    logits = model.decode_atac(qz[0], (At > 0).float())
  return (_nb_nll(np.asarray(Xt), mu.numpy(),
                  np.broadcast_to(theta.numpy(), Xt.shape)),
          _bernoulli_nll((np.asarray(At) > 0).astype(np.float64),
                         logits.numpy()),
          qz[0].numpy())


def _train_jax_multivi(train, test):
  import jax.numpy as jnp
  from sisua_tpu.models.multivi import MULTIVIModule
  G = train.get_dim("transcriptomic")
  R = train.get_dim("atac")
  m = MULTIVI([RVmeta(G, "nbd", name="transcriptomic"),
               RVmeta(R, "bernoulli", name="atac")],
              latents=RVmeta(LATENT, "diag", name="latents"),
              encoder=(NetConf((HID,), name="encoder_rna"),
                       NetConf((HID,), name="encoder_atac")),
              decoder=(NetConf((HID,), name="decoder_rna"),
                       NetConf((HID,), name="decoder_atac")),
              seed=0)
  m.fit(train, epochs=EPOCHS, batch_size=BATCH, learning_rate=LR,
        valid_freq=0, patience=0, verbose=False)
  X = np.asarray(test.numpy("transcriptomic"), np.float32)
  A = np.asarray(test.numpy("atac"), np.float32)
  x = np.concatenate([X, A], axis=1)
  qz, ql = m.encode(x)
  z_mean, l_mean = np.asarray(qz.mean()), np.asarray(ql.mean())
  variables = {"params": m.state.params}
  if m.state.batch_stats is not None:
    variables["batch_stats"] = m.state.batch_stats
  dl = m.module.apply(variables, jnp.asarray(x), training=False,
                      method=MULTIVIModule.depth_logit)
  pX, pA = m.module.apply(variables,
                          (jnp.asarray(z_mean), jnp.asarray(l_mean)),
                          training=False, depth_logit=jnp.asarray(dl),
                          method=MULTIVIModule.decode,
                          rngs={"sample": m._next_key()})
  nb = pX.base
  mu = np.asarray(nb.loc)
  theta = np.broadcast_to(np.asarray(nb.disp), mu.shape)
  logits = np.asarray(pA.base.logits)
  return (_nb_nll(X, mu, theta),
          _bernoulli_nll((A > 0).astype(np.float64), logits),
          z_mean)


@pytest.mark.slow
def test_multivi_matches_torch_reference(multiome_data):
  train, test = multiome_data
  y_te = np.asarray(test.numpy("celltype")).argmax(-1)
  nll_r_t, nll_a_t, z_t = _train_torch_multivi(train, test)
  nll_r_j, nll_a_j, z_j = _train_jax_multivi(train, test)
  X_tr = np.asarray(train.numpy("transcriptomic"), np.float64)
  X_te = np.asarray(test.numpy("transcriptomic"), np.float64)
  A_tr = (np.asarray(train.numpy("atac")) > 0).astype(np.float64)
  A_te = (np.asarray(test.numpy("atac")) > 0).astype(np.float64)
  base_r = _baseline_nb_nll(X_tr, X_te)
  base_a = _baseline_bernoulli_nll(A_tr, A_te)
  ari_t, ari_j = _latent_ari(z_t, y_te), _latent_ari(z_j, y_te)
  print(f"\nMULTIVI held-out: torch rnaNLL={nll_r_t:.1f} "
        f"atacNLL={nll_a_t:.1f} ARI={ari_t:.3f} | jax rnaNLL={nll_r_j:.1f} "
        f"atacNLL={nll_a_j:.1f} ARI={ari_j:.3f} | "
        f"baselines rna={base_r:.1f} atac={base_a:.1f}")
  assert nll_r_j < base_r and nll_r_t < base_r
  assert nll_a_j < base_a and nll_a_t < base_a
  assert abs(nll_r_j - nll_r_t) / abs(nll_r_t) < 0.05, (nll_r_j, nll_r_t)
  assert abs(nll_a_j - nll_a_t) / abs(nll_a_t) < 0.05, (nll_a_j, nll_a_t)
  # joint-latent geometry: both recover celltype structure, within a band
  assert ari_j > 0.2 and ari_t > 0.2, (ari_j, ari_t)
  assert abs(ari_j - ari_t) < 0.25, (ari_j, ari_t)
