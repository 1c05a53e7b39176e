"""CellAssign — marker-based probabilistic cell-type assignment
(Zhang et al. 2019, Nature Methods; scvi-tools ``CellAssign``).

Beyond-reference surface: the reference ships a marker-gene knowledge base
(``/root/reference/sisua/data/const.py:75-116`` — ``MARKER_GENES``,
``MARKER_ADT_GENE``) but only uses it for *correlation scoring*; CellAssign
is the canonical tool that turns exactly that kind of marker table into
per-cell type assignments, closing the loop between the knowledge base and
annotation (the reference's annotations all come pre-labeled from the
loaders).

Model. Cells are a mixture over C known types with a binary marker matrix
ρ ∈ {0,1}^{G×C} (marker panel genes only; an all-zero column models the
"other/unknown" type):

    x_ng | c  ~  NB(μ_ngc, θ_g),
    log μ_ngc = log s_n + β_g + δ_gc · ρ_gc,       δ_gc > δ_min ≥ 0

β_g is a per-gene baseline, δ_gc the (positive) log fold-change a marker
gene gains in its type, s_n the observed size factor, θ_g a per-gene
dispersion (the paper's spline-on-mean dispersion is simplified to a free
per-gene parameter — stated deviation). Type priors π are learned.

Inference: direct marginal maximum likelihood — the per-cell type
assignment marginalizes in a single ``logsumexp`` over the class axis
(γ_nc ∝ π_c·Π_g NB) — trained with Adam on jitted static-shape minibatches.
The (B, G, C) likelihood tensor is one broadcastted fused elementwise chain
off two matmul-shaped contractions; XLA handles it without custom kernels
at marker-panel sizes (G ≲ hundreds).

Surface: ``fit(X)``, ``predict(X)`` → (N, C) responsibilities γ (pandas
DataFrame with type names when the marker matrix is a DataFrame),
``predict(..., hard=True)`` → type labels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["CellAssign"]


def _nb_log_prob(x, log_mu, log_theta):
  """NB(μ, θ) log-pmf, mean/dispersion parameterization, elementwise —
  lgamma-difference form (stable for all μ, θ > 0)."""
  from jax.scipy.special import gammaln
  theta = jnp.exp(log_theta)
  log_theta_mu = jnp.logaddexp(log_theta, log_mu)
  return (theta * (log_theta - log_theta_mu)
          + x * (log_mu - log_theta_mu)
          + gammaln(x + theta) - gammaln(theta) - gammaln(x + 1.0))


class CellAssign:
  """Assign cells to known types from a binary marker-gene matrix.

  >>> rho = pd.DataFrame(..., index=genes, columns=celltypes)  # binary
  >>> ca = CellAssign(rho, seed=0)
  >>> ca.fit(X)                       # X: (cells, len(genes)) counts
  >>> gamma = ca.predict(X)           # (cells, types) probabilities
  >>> labels = ca.predict(X, hard=True)

  ``min_delta`` floors every marker's log fold-change (scvi-tools' shrinkage
  analogue: markers must be OVER-expressed in their type by at least this
  much, keeping the "other" column identifiable). ``shrinkage`` adds an L2
  penalty on δ (the paper's hierarchical log-normal prior, simplified).
  """

  def __init__(self, marker_matrix, min_delta: float = 0.5,
               shrinkage: float = 1e-3, seed: int = 0):
    self.celltypes = None
    self.var_names = None
    try:  # pandas DataFrame: keep names
      self.celltypes = list(map(str, marker_matrix.columns))
      self.var_names = list(map(str, marker_matrix.index))
      marker_matrix = marker_matrix.values
    except AttributeError:
      pass
    rho = np.asarray(marker_matrix, np.float32)
    assert rho.ndim == 2, "marker matrix must be (genes, celltypes)"
    assert set(np.unique(rho)) <= {0.0, 1.0}, "marker matrix must be binary"
    assert (rho.sum(0) > 0).sum() >= 1, "need at least one marked type"
    self.rho = rho
    self.n_genes, self.n_types = rho.shape
    self.min_delta = float(min_delta)
    self.shrinkage = float(shrinkage)
    self.seed = int(seed)
    self._params = None

  # ------------------------------------------------------------------ math
  def _log_mu(self, params, log_s):
    """(B, G, C) log means: log s_n + β_g + (δ_min + softplus(raw))·ρ."""
    delta = self.min_delta + jax.nn.softplus(params["delta_raw"])
    beta = params["beta"]
    return (log_s[:, None, None] + beta[None, :, None]
            + (delta * self.rho)[None, :, :])

  def _log_gamma(self, params, x, log_s):
    """Unnormalized per-cell log responsibilities (B, C)."""
    log_mu = self._log_mu(params, log_s)                     # (B, G, C)
    lp = _nb_log_prob(x[:, :, None], log_mu,
                      params["log_theta"][None, :, None])    # (B, G, C)
    log_pi = jax.nn.log_softmax(params["pi_logits"])
    return log_pi[None, :] + jnp.sum(lp, axis=1)             # (B, C)

  def _neg_llk(self, params, x, log_s):
    marginal = jax.scipy.special.logsumexp(
        self._log_gamma(params, x, log_s), axis=-1)          # (B,)
    penalty = self.shrinkage * jnp.sum(
        (params["delta_raw"] * self.rho) ** 2)
    return -jnp.mean(marginal) + penalty

  def _size_factors(self, x):
    """Fallback size factors when the caller provides none.

    The paper computes s_n from the FULL transcriptome; a marker panel is
    the worst possible proxy — marked cells' elevated markers inflate
    their apparent size (panel totals can double), which drags β up /
    δ down and bleeds baseline cells into marked types. When the panel
    carries enough genes marked for NO type, use those (type-independent
    by construction); otherwise fall back to the whole panel. Passing
    transcriptome-wide ``size_factors`` explicitly is always better."""
    bg = self.rho.sum(-1) == 0
    cols = x[:, bg] if bg.sum() >= 3 else x
    lib = cols.sum(-1)
    return np.log(lib / max(lib.mean(), 1e-8) + 1e-8).astype(np.float32)

  # ------------------------------------------------------------------ fit
  def fit(self, x, size_factors: Optional[np.ndarray] = None,
          epochs: int = 150, batch_size: int = 512,
          learning_rate: float = 1e-2, verbose: bool = False
          ) -> "CellAssign":
    x = np.asarray(x.numpy() if hasattr(x, "numpy") else x, np.float32)
    assert x.shape[1] == self.n_genes, (
        f"X has {x.shape[1]} genes, marker matrix {self.n_genes}")
    log_s = (np.log(np.asarray(size_factors, np.float32))
             if size_factors is not None else self._size_factors(x))
    rng = np.random.default_rng(self.seed)
    params = {
        # init β at the pooled per-gene mean rate (log), δ small, θ at 1
        "beta": jnp.asarray(np.log(x.mean(0) + 1e-3), jnp.float32),
        "delta_raw": jnp.full((self.n_genes, self.n_types), 0.5,
                              jnp.float32),
        "log_theta": jnp.zeros((self.n_genes,), jnp.float32),
        "pi_logits": jnp.zeros((self.n_types,), jnp.float32),
    }
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, xb, lsb):
      loss, g = jax.value_and_grad(self._neg_llk)(p, xb, lsb)
      updates, s = tx.update(g, s, p)
      return optax.apply_updates(p, updates), s, loss

    n = x.shape[0]
    bs = min(batch_size, n)
    steps_per_epoch = max(n // bs, 1)
    self.history = {"loss": []}
    for epoch in range(int(epochs)):
      order = rng.permutation(n)
      ep_loss = 0.0
      for it in range(steps_per_epoch):
        sl = order[it * bs:(it + 1) * bs]
        if sl.shape[0] < bs:
          break
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x[sl]), jnp.asarray(log_s[sl]))
        ep_loss += float(loss)
      self.history["loss"].append(ep_loss / steps_per_epoch)
      if verbose and epoch % 20 == 0:
        print(f"[cellassign] epoch {epoch}: {self.history['loss'][-1]:.4f}")
    self._params = params
    return self

  # ------------------------------------------------------------- inference
  def predict(self, x, size_factors: Optional[np.ndarray] = None,
              hard: bool = False, batch_size: int = 2048):
    """Per-cell type responsibilities γ (N, C); with ``hard=True`` the
    argmax labels (type names when the marker matrix carried them)."""
    assert self._params is not None, "call fit() first"
    x = np.asarray(x.numpy() if hasattr(x, "numpy") else x, np.float32)
    log_s = (np.log(np.asarray(size_factors, np.float32))
             if size_factors is not None else self._size_factors(x))
    fn = jax.jit(lambda xb, lsb: jax.nn.softmax(
        self._log_gamma(self._params, xb, lsb), axis=-1))
    out = [np.asarray(fn(jnp.asarray(x[s:s + batch_size]),
                         jnp.asarray(log_s[s:s + batch_size])))
           for s in range(0, x.shape[0], batch_size)]
    gamma = np.concatenate(out, 0)
    if hard:
      idx = gamma.argmax(-1)
      if self.celltypes is not None:
        return np.asarray([self.celltypes[i] for i in idx])
      return idx
    if self.celltypes is not None:
      import pandas as pd
      return pd.DataFrame(gamma, columns=self.celltypes)
    return gamma

  def get_fold_changes(self):
    """Fitted marker log fold-changes δ·ρ, shape (genes, types)."""
    assert self._params is not None, "call fit() first"
    delta = self.min_delta + jax.nn.softplus(self._params["delta_raw"])
    out = np.asarray(delta) * self.rho
    if self.celltypes is not None and self.var_names is not None:
      import pandas as pd
      return pd.DataFrame(out, index=self.var_names,
                          columns=self.celltypes)
    return out
