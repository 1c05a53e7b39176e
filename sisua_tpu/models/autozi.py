"""AUTOZI — automatic detection of zero-inflated genes (Clivio et al. 2019,
scvi-tools ``AUTOZI``).

Beyond-reference surface: the reference hard-codes the ZI question per omic
(``/root/reference/sisua/data/_single_cell_base.py:518-533`` — transcriptomic
is always 'zinb', proteomic always 'nb'); AUTOZI makes it a per-gene
*posterior* question — "is this gene's excess-zero signal real zero
inflation or just NB sampling?" — which is the canonical scvi-tools tool for
choosing between the two likelihood families the reference exposes.

Model. Each gene g carries a spike-and-slab mixture over its likelihood:

    p(x_ng) = δ_g · ZINB(x_ng; μ, θ, π_ng) + (1 − δ_g) · NB(x_ng; μ, θ)

with a Beta(α_g, β_g) variational posterior over the Bernoulli weight δ_g
and a Beta(0.5, 0.5) prior (the paper's default). Two exact identities make
this essentially free on top of the existing SCVI engine:

  * mixing a ZINB (gate π) with its own NB at weight δ IS a ZINB with the
    rescaled gate δ·π:  δ(πδ₀ + (1−π)NB) + (1−δ)NB = δπ·δ₀ + (1−δπ)·NB —
    so the whole mixture collapses into the standard ``ZeroInflated``
    distribution with composed gate logits (one fused elementwise chain in
    log-sigmoid space, same shape as before → the Pallas fused-likelihood
    routing, mesh sharding, and predict merging are inherited untouched);
  * KL(Beta‖Beta) is analytic, added once per minibatch scaled by 1/N
    (global-parameter KL under the per-cell-mean loss convention).

Training draws one δ ~ Beta(α, β) per step (shared across the batch,
scvi-tools' MC scheme; ``jax.random.beta`` is reparameterized through JAX's
implicit gamma gradients); evaluation uses the posterior mean α/(α+β).

Surface (scvi-tools parity): ``get_alphas_betas()`` → the per-gene Beta
posterior parameters; ``get_zi_probabilities()`` → posterior mean
P(gene is zero-inflated); both optionally as pandas indexed by gene.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import dist as D
from ..rv import parse_rv
from .base import _flatten
from .module import Array, VAEOutput
from .scvi import SCVI, SCVIModule

__all__ = ["AUTOZI", "AUTOZIModule"]

# Beta(0.5, 0.5) — the paper's (and scvi-tools') default spike-and-slab prior
PRIOR_ALPHA = 0.5
PRIOR_BETA = 0.5


def beta_kl(a: Array, b: Array, a0: float, b0: float) -> Array:
  """Analytic KL(Beta(a, b) ‖ Beta(a0, b0)), elementwise."""
  from jax.scipy.special import digamma, gammaln

  def log_beta_fn(x, y):
    return gammaln(x) + gammaln(y) - gammaln(x + y)

  return (log_beta_fn(a0, b0) - log_beta_fn(a, b)
          + (a - a0) * digamma(a)
          + (b - b0) * digamma(b)
          + (a0 - a + b0 - b) * digamma(a + b))


def compose_gate_logits(log_delta: Array, gate_logits: Array) -> Array:
  """Logits of the effective gate π' = δ·σ(gate): the δ-weighted
  ZINB/NB mixture collapsed to one ZeroInflated (module docstring).
  ``log_delta`` must be finite and < 0 (δ clipped away from {0, 1})."""
  log_pi = log_delta + jax.nn.log_sigmoid(gate_logits)
  log_pi = jnp.minimum(log_pi, -1e-7)  # keep 1 − π' > 0
  return log_pi - jnp.log(-jnp.expm1(log_pi))


class AUTOZIModule(SCVIModule):
  """SCVI topology + per-gene Beta posterior over the ZI spike weight.

  ``log_alpha_delta`` / ``log_beta_delta`` are the per-gene Beta posterior
  parameters (log-space for positivity; init 0 → Beta(1, 1), mean ½).
  ``decode`` rescales the decoded dropout gate by δ — sampled from the Beta
  posterior under ``training`` (one (D,) draw per step, scvi-tools' MC
  scheme), the posterior mean otherwise (deterministic predict/serving)."""

  def setup(self):
    super().setup()
    n_genes = self.outputs[0].dim
    self.log_alpha_delta = self.param(
        "log_alpha_delta", nn.initializers.zeros, (n_genes,))
    self.log_beta_delta = self.param(
        "log_beta_delta", nn.initializers.zeros, (n_genes,))

  def delta_posterior(self) -> Tuple[Array, Array]:
    a = jnp.exp(jnp.clip(self.log_alpha_delta, -10.0, 10.0))
    b = jnp.exp(jnp.clip(self.log_beta_delta, -10.0, 10.0))
    return a, b

  def sample_delta(self, training: bool = False) -> Array:
    a, b = self.delta_posterior()
    if training:
      # Beta sampling goes through gamma REJECTION sampling, whose
      # per-iteration key derivation is pathological under the session's
      # TPU-native rbg PRNG: measured 10.4 ms vs 0.30 ms per (500,) draw
      # inside a scanned step (34×), which throttled the whole fused
      # window executable to ~5.5k cells/s (scvi engine: ~450k). Bridge:
      # draw 32 cheap bits from the ambient stream and seed a threefry
      # key for the rejection loop — full speed under ANY ambient impl,
      # same Beta(α, β) distribution, still reparameterized (implicit
      # gamma gradients attach to a/b, not the key path).
      seed = jax.random.bits(self.make_rng("sample"), (), jnp.uint32)
      tkey = jax.random.key(seed, impl="threefry2x32")
      delta = jax.random.beta(tkey, a, b)
    else:
      delta = a / (a + b)
    return jnp.clip(delta, 1e-6, 1.0 - 1e-6)

  def decode(self, latent_samples, library: Optional[Array] = None,
             training: bool = False, batch: Optional[Array] = None):
    outs = super().decode(latent_samples, library=library,
                          training=training, batch=batch)
    pX = outs[0]
    base = pX.base  # Independent(ZeroInflated(count, gate)) by construction
    log_delta = jnp.log(self.sample_delta(training=training))
    new_gate = compose_gate_logits(log_delta, base.gate_logits)
    new = D.Independent(
        D.ZeroInflated(count_distribution=base.count_distribution,
                       gate_logits=new_gate),
        pX.reinterpreted_batch_ndims)
    return (new,) + tuple(outs[1:])


class AUTOZI(SCVI):
  """SCVI with per-gene spike-and-slab zero-inflation detection.

  ``outputs[0]`` is coerced to ``'zinbd'`` with per-cell decoded gates
  (``inflation='full'``) — the slab the per-gene δ switches on. Everything
  else (library encoder/prior, dispersion modes, batch conditioning, mesh
  paths) is SCVI.

  ``n_total_cells`` scales the global Beta KL per minibatch (set
  automatically by :meth:`fit` from the training data when unset).
  """

  module_cls = AUTOZIModule

  def __init__(self, outputs, n_total_cells: Optional[int] = None, **kwargs):
    outputs = [parse_rv(o, f"output{i}")
               for i, o in enumerate(_flatten(outputs))]
    # the spike-and-slab needs the ZI slab: coerce the likelihood family
    # and keep the per-cell decoded gate (δ rescales it per gene)
    if outputs[0].posterior not in ("zinbd",):
      outputs[0] = outputs[0].replace(posterior="zinbd")
    kwargs["inflation"] = "full"
    self._n_total_cells = None if n_total_cells is None else int(
        n_total_cells)
    super().__init__(outputs, **kwargs)
    self._init_kwargs_for_save["n_total_cells"] = self._n_total_cells

  def fit(self, train, *args, **kwargs):
    if self._n_total_cells is None:
      n = getattr(train, "n_obs", None)
      if n is None:
        arr = train[0] if isinstance(train, (tuple, list)) else train
        n = np.asarray(arr).shape[0]
      self._n_total_cells = int(n)
      self._init_kwargs_for_save["n_total_cells"] = self._n_total_cells
      # the KL scale is baked into traced steps — invalidate stale ones
      self._jit_cache.clear()
    return super().fit(train, *args, **kwargs)

  def _extra_loss(self, params, aux_params, out: VAEOutput, batch, key,
                  training: bool):
    """Global-parameter KL: Σ_g KL(Beta(α_g, β_g) ‖ Beta(½, ½)) / N —
    contributes once per dataset pass under the per-cell-mean loss."""
    a = jnp.exp(jnp.clip(params["log_alpha_delta"], -10.0, 10.0))
    b = jnp.exp(jnp.clip(params["log_beta_delta"], -10.0, 10.0))
    kl = jnp.sum(beta_kl(a, b, PRIOR_ALPHA, PRIOR_BETA))
    n_total = float(self._n_total_cells or 10_000)
    term = kl / n_total
    return term, {"klqp_delta": term}

  # ------------------------------------------------------------- accessors
  def get_alphas_betas(self, as_numpy: bool = True):
    """Per-gene Beta posterior parameters over the ZI weight δ_g
    (scvi-tools ``AUTOZI.get_alphas_betas`` surface)."""
    self._ensure_initialized()
    a = jnp.exp(jnp.clip(self.params["log_alpha_delta"], -10.0, 10.0))
    b = jnp.exp(jnp.clip(self.params["log_beta_delta"], -10.0, 10.0))
    if as_numpy:
      a, b = np.asarray(a), np.asarray(b)
    return {"alpha_posterior": a, "beta_posterior": b}

  def get_zi_probabilities(self, var_names=None):
    """Posterior mean P(gene is zero-inflated) = α/(α+β), shape
    ``(n_genes,)``; a pandas Series indexed by gene when ``var_names`` (or
    recorded metadata) is available."""
    ab = self.get_alphas_betas()
    q = ab["alpha_posterior"] / (ab["alpha_posterior"]
                                 + ab["beta_posterior"])
    if var_names is None:
      main = self.outputs[0].name or "transcriptomic"
      var_names = (self.metadata.get(main)
                   or self.metadata.get("transcriptomic"))
    if var_names is not None and len(var_names) == q.shape[0]:
      import pandas as pd
      return pd.Series(q, index=list(var_names), name="p_zero_inflated")
    return q
