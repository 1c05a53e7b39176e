"""Count likelihoods: Poisson, NB (two parameterizations), zero-inflation.

These are the workhorse likelihoods of the model zoo (reference posterior
vocabulary 'nb'/'nbd'/'zinb'/'zinbd'/'poisson'/'zip', cf.
``/root/reference/sisua/data/_single_cell_base.py:518-533`` and
``configs/base.yaml:27-43``).

Parameterization parity:
  * ``NegativeBinomial(total_count, logits)`` — TFP convention: ``logits`` is
    log-odds of *success*; ``mean = total_count * exp(logits)``.
  * ``NegativeBinomialDisp(loc, disp)`` — scVI's mean/inverse-dispersion
    convention (Lopez et al. 2018): ``r = disp`` (θ), ``p = loc/(loc+disp)``.
    Log-prob matches scVI's ``log_nb_positive`` term-for-term.
  * ``ZeroInflated(count_distribution, gate_logits)`` — mixture of a point
    mass at 0 (prob σ(gate)) and the count distribution. The reference unwraps
    ``.count_distribution`` to build the 'imputed' omic
    (``sisua/analysis/posterior.py:210-220``) — same attribute here.

All log-probs are elementwise (batch over genes); wrap in ``Independent`` or
sum in the ELBO for per-cell likelihoods — keeping them elementwise lets XLA
fuse the mask/sum of the semi-supervised loss into one reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Array, Distribution, register_kl

__all__ = [
    "Poisson",
    "Bernoulli",
    "NegativeBinomial",
    "NegativeBinomialDisp",
    "NegativeBinomialDispLog",
    "NegativeBinomialLog",
    "NegativeBinomialMixture",
    "ZeroInflated",
]


def _lgamma(x):
  return jax.lax.lgamma(x)


def _lgamma_diff(r, x):
  """lgamma(x + r) − lgamma(r), stable for huge r.

  For r ≳ 1e6 the two lgammas are ~r·log r ≈ 1e7+ and their float32
  difference loses every significant digit of the ~x·log r true value;
  switch to the asymptotic x·log r + x(x−1)/(2r) + O(1/r²) there."""
  direct = _lgamma(x + r) - _lgamma(r)
  safe_r = jnp.maximum(r, 1.0)  # avoid log(0) in the unselected branch
  asym = x * jnp.log(safe_r) + x * (x - 1.0) / (2.0 * safe_r)
  return jnp.where(r > 1e6, asym, direct)


# the numerically stable -softplus(-x) form, provided by jax itself
log_sigmoid = jax.nn.log_sigmoid


class Poisson(Distribution):
  rate: Array

  @property
  def batch_shape(self):
    return jnp.shape(self.rate)

  def log_prob(self, x):
    # rate==0 with x==0 is log(1)=0, not 0*log(0)=NaN (a float32-
    # underflowed rate at an observed zero must not NaN the whole ELBO).
    # The safe-where form keeps the BACKWARD pass finite too — xlogy alone
    # fixes the value but d/d(rate) xlogy(0, rate) is still NaN at rate=0,
    # which would NaN the params one step later.
    safe_rate = jnp.where(self.rate > 0, self.rate, 1.0)
    ll = x * jnp.log(safe_rate) - self.rate - _lgamma(x + 1.0)
    # rate==0: impossible for x>0 (-inf), certain for x==0 (the safe ll
    # already equals 0 - 0 - lgamma(1) = 0 there, with finite gradients)
    return jnp.where(jnp.logical_and(x > 0, self.rate == 0), -jnp.inf, ll)

  def mean(self):
    return self.rate

  def variance(self):
    return self.rate

  def mode(self):
    return jnp.floor(self.rate)

  def sample(self, key, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape
    return jax.random.poisson(key, self.rate, shape).astype(
        jnp.result_type(self.rate))


class Bernoulli(Distribution):
  logits: Array

  @property
  def batch_shape(self):
    return jnp.shape(self.logits)

  def probs(self):
    return jax.nn.sigmoid(self.logits)

  def log_prob(self, x):
    # -binary_cross_entropy: x*log σ(l) + (1-x)*log σ(-l)
    return x * log_sigmoid(self.logits) + (1.0 - x) * log_sigmoid(-self.logits)

  def mean(self):
    return self.probs()

  def variance(self):
    p = self.probs()
    return p * (1.0 - p)

  def mode(self):
    return (self.logits > 0).astype(jnp.result_type(self.logits))

  def sample(self, key, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape
    return jax.random.bernoulli(key, self.probs(), shape).astype(
        jnp.result_type(self.logits))


class NegativeBinomial(Distribution):
  """NB over counts of successes before ``total_count`` failures (TFP conv)."""

  total_count: Array  # r > 0
  logits: Array       # log-odds of success

  @property
  def batch_shape(self):
    return jnp.broadcast_shapes(jnp.shape(self.total_count),
                                jnp.shape(self.logits))

  def log_prob(self, x):
    r, l = self.total_count, self.logits
    log_p = log_sigmoid(l)        # log probability of success
    log_1mp = log_sigmoid(-l)     # log probability of failure
    return (_lgamma_diff(r, x) - _lgamma(x + 1.0)
            + r * log_1mp + x * log_p)

  def mean(self):
    return self.total_count * jnp.exp(self.logits)

  def variance(self):
    return self.mean() / jax.nn.sigmoid(-self.logits)

  def mode(self):
    return jnp.where(self.total_count > 1.0,
                     jnp.floor((self.total_count - 1.0) * jnp.exp(self.logits)),
                     0.0)

  def sample(self, key, sample_shape=()):
    # Gamma–Poisson mixture: λ ~ Gamma(r, rate=(1-p)/p), x ~ Poisson(λ)
    kg, kp = jax.random.split(key)
    shape = tuple(sample_shape) + self.batch_shape
    r = jnp.broadcast_to(self.total_count, shape)
    g = jax.random.gamma(kg, r) * jnp.exp(self.logits)
    return jax.random.poisson(kp, g).astype(jnp.result_type(self.logits))


class NegativeBinomialDisp(Distribution):
  """NB with mean/dispersion parameterization (scVI's ``log_nb_positive``)."""

  loc: Array   # mean μ > 0
  disp: Array  # inverse-dispersion θ > 0

  @property
  def batch_shape(self):
    return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.disp))

  def log_prob(self, x, eps: float = 1e-8):
    mu, theta = self.loc, self.disp
    log_theta_mu = jnp.log(theta + mu + eps)
    # θ·(log θ − log(θ+μ)) as −θ·log1p(μ/θ): at θ ≥ 1e8 the two logs are
    # equal in float32 and the direct difference silently evaluates to 0.
    # For tiny ratios use the series −θ·r (=−μ) directly: TPU's log1p
    # lowers to log(1+x), which rounds 1+1e-34 back to 1
    ratio = (mu + eps) / (theta + eps)
    theta_term = jnp.where(ratio < 1e-6,
                           -(theta + eps) * ratio,
                           -theta * jnp.log1p(ratio))
    return (theta_term
            + x * (jnp.log(mu + eps) - log_theta_mu)
            + _lgamma_diff(theta, x) - _lgamma(x + 1.0))

  def mean(self):
    return jnp.broadcast_to(self.loc, self.batch_shape)

  def variance(self):
    return self.loc + jnp.square(self.loc) / self.disp

  def mode(self):
    return jnp.where(self.disp > 1.0,
                     jnp.floor(self.loc * (self.disp - 1.0) / self.disp), 0.0)

  def sample(self, key, sample_shape=()):
    kg, kp = jax.random.split(key)
    shape = tuple(sample_shape) + self.batch_shape
    theta = jnp.broadcast_to(self.disp, shape)
    g = jax.random.gamma(kg, theta) * (self.loc / self.disp)
    return jax.random.poisson(kp, g).astype(jnp.result_type(self.loc))


class NegativeBinomialDispLog(Distribution):
  """``NegativeBinomialDisp`` with the mean carried in LOG space.

  Built by decode paths that know ``log μ`` natively (SCVI's
  ``log μ = log-library + log_softmax(scale)``): constructing the linear
  ``loc = exp(l)·softmax(s)`` only for the likelihood to take ``log(loc)``
  again costs an exp→log round trip in both value-precision and — on the
  bandwidth-bound wide regime — HBM traffic for the extra (B, D)
  intermediates. Here the log-pmf uses ``L = log μ − log θ`` (the NB
  logits) directly:

    log NB(x; μ, θ) = x·L − (x+θ)·softplus(L) + lgammadiff(θ, x) − lgamma(x+1)

  which is scVI's ``log_nb_positive`` rewritten in logits form —
  identical term-for-term after ``softplus(L) = log(θ+μ) − log θ``.
  ``loc``/``mean`` are derived lazily for serving paths."""

  log_loc: Array  # log μ
  disp: Array     # inverse-dispersion θ > 0

  @property
  def batch_shape(self):
    return jnp.broadcast_shapes(jnp.shape(self.log_loc),
                                jnp.shape(self.disp))

  @property
  def loc(self):
    return jnp.exp(self.log_loc)

  def log_prob(self, x, eps: float = 1e-8):
    theta = self.disp
    logits = self.log_loc - jnp.log(theta + eps)
    sp = jax.nn.softplus(logits)
    return (x * logits - (x + theta) * sp
            + _lgamma_diff(theta, x) - _lgamma(x + 1.0))

  def mean(self):
    return jnp.broadcast_to(self.loc, self.batch_shape)

  def variance(self):
    m = self.loc
    return m + jnp.square(m) / self.disp

  def mode(self):
    return jnp.where(self.disp > 1.0,
                     jnp.floor(self.loc * (self.disp - 1.0) / self.disp),
                     0.0)

  def sample(self, key, sample_shape=()):
    kg, kp = jax.random.split(key)
    shape = tuple(sample_shape) + self.batch_shape
    theta = jnp.broadcast_to(self.disp, shape)
    g = jax.random.gamma(kg, theta) * jnp.exp(
        jnp.broadcast_to(self.log_loc, shape) - jnp.log(theta))
    return jax.random.poisson(kp, g).astype(jnp.result_type(self.log_loc))


class NegativeBinomialLog(Distribution):
  """NB with BOTH mean and inverse-dispersion carried in LOG space.

  The per-cell-per-gene ('full') dispersion decode (SCVI/TotalVI RNA,
  reference ``sisua/models/scvi.py:128-171``) emits ``log θ`` as a raw
  Dense output and ``log μ = log-library + log_softmax(scale)``; the
  linear-space construction exponentiated both only for the likelihood to
  take their logs again (the NB logits are ``log μ − log θ``). In the
  bandwidth-bound wide-gene regime each of those exp→log round trips
  costs a (B, D) HBM intermediate. Here the log-pmf is evaluated directly
  from the log-space parameters:

    L = log μ − log θ       (NB logits — one fused subtraction)
    log NB(x) = x·L − (x+θ)·softplus(L) + lgammadiff(θ, x) − lgamma(x+1)

  with ``θ = exp(clip(log θ, ±15))`` — the same clipped-exp positive
  parameterization as the 'zinb' head (``rv._positive``) and the fused
  kernel's unconstrained mode, so the Pallas route
  (``ops/zinb_pallas.py`` ``constrained=False``) is bit-consistent: it
  receives ``log θ`` raw and exponentiates inside VMEM tiles. ``loc`` /
  ``disp`` are derived lazily for serving paths."""

  log_loc: Array   # log μ
  log_disp: Array  # log θ (raw, unclipped; θ = exp(clip(·, ±15)))

  _EXP_CLIP = 15.0  # matches rv._EXP_CLIP and zinb_pallas._EXP_CLIP

  @property
  def batch_shape(self):
    return jnp.broadcast_shapes(jnp.shape(self.log_loc),
                                jnp.shape(self.log_disp))

  @property
  def loc(self):
    return jnp.exp(self.log_loc)

  @property
  def disp(self):
    return jnp.exp(jnp.clip(self.log_disp, -self._EXP_CLIP, self._EXP_CLIP))

  def log_prob(self, x):
    # Clip ONCE and derive both logits and θ from the same clipped value:
    # mixing raw log θ in the logits with clipped θ in the (x+θ)·softplus
    # term would describe two different distributions for |log θ| > 15 and
    # the pmf would no longer normalize (ADVICE r4).
    ld = jnp.clip(self.log_disp, -self._EXP_CLIP, self._EXP_CLIP)
    logits = self.log_loc - ld
    theta = jnp.exp(ld)
    sp = jax.nn.softplus(logits)
    return (x * logits - (x + theta) * sp
            + _lgamma_diff(theta, x) - _lgamma(x + 1.0))

  def mean(self):
    return jnp.broadcast_to(self.loc, self.batch_shape)

  def variance(self):
    m = self.loc
    return m + jnp.square(m) / self.disp

  def mode(self):
    d = self.disp
    return jnp.where(d > 1.0, jnp.floor(self.loc * (d - 1.0) / d), 0.0)

  def sample(self, key, sample_shape=()):
    kg, kp = jax.random.split(key)
    shape = tuple(sample_shape) + self.batch_shape
    theta = jnp.broadcast_to(self.disp, shape)
    log_ratio = self.log_loc - jnp.clip(self.log_disp, -self._EXP_CLIP,
                                        self._EXP_CLIP)
    g = jax.random.gamma(kg, theta) * jnp.exp(
        jnp.broadcast_to(log_ratio, shape))
    return jax.random.poisson(kp, g).astype(jnp.result_type(self.log_loc))


class NegativeBinomialMixture(Distribution):
  """Element-wise two-component NB mixture (TotalVI's protein likelihood,
  Gayoso et al. 2021): each feature mixes a *background* NB(μ_b, θ) and a
  *foreground* NB(μ_b·α, θ) with mixing probability σ(mixing_logits) for the
  background component. Unlike MixtureSameFamily (joint-event mixture), the
  mixture is independent per element."""

  loc_back: Array        # background mean μ_b > 0
  loc_fore: Array        # foreground mean μ_f > 0 (μ_b·α, α > 1)
  disp: Array            # shared inverse-dispersion θ > 0
  mixing_logits: Array   # σ(·) = P(background)

  @property
  def batch_shape(self):
    return jnp.broadcast_shapes(jnp.shape(self.loc_back),
                                jnp.shape(self.loc_fore),
                                jnp.shape(self.disp),
                                jnp.shape(self.mixing_logits))

  def _components(self):
    return (NegativeBinomialDisp(loc=self.loc_back, disp=self.disp),
            NegativeBinomialDisp(loc=self.loc_fore, disp=self.disp))

  @property
  def mixing_probs(self):
    return jax.nn.sigmoid(self.mixing_logits)

  def log_prob(self, x):
    back, fore = self._components()
    log_pi = log_sigmoid(self.mixing_logits)
    log_1mpi = log_sigmoid(-self.mixing_logits)
    return jnp.logaddexp(log_pi + back.log_prob(x),
                         log_1mpi + fore.log_prob(x))

  def mean(self):
    pi = self.mixing_probs
    return pi * self.loc_back + (1.0 - pi) * self.loc_fore

  def foreground_probability(self, x):
    """Posterior P(foreground | x) — the 'denoised protein' signal."""
    back, fore = self._components()
    log_pi = log_sigmoid(self.mixing_logits)
    log_1mpi = log_sigmoid(-self.mixing_logits)
    lb = log_pi + back.log_prob(x)
    lf = log_1mpi + fore.log_prob(x)
    return jnp.exp(lf - jnp.logaddexp(lb, lf))

  def variance(self):
    pi = self.mixing_probs
    back, fore = self._components()
    m = self.mean()
    return (pi * (back.variance() + jnp.square(self.loc_back - m))
            + (1 - pi) * (fore.variance() + jnp.square(self.loc_fore - m)))

  def mode(self):
    return jnp.where(self.mixing_probs > 0.5,
                     self._components()[0].mode(),
                     self._components()[1].mode())

  def sample(self, key, sample_shape=()):
    kb, kf, km = jax.random.split(key, 3)
    # components must be drawn at the MIXTURE's batch shape: with shared
    # per-gene params (1, D) and per-cell mixing (B, D), sampling the
    # components at their own (narrower) shape can't broadcast back up —
    # and would reuse one draw across cells even if it could
    bs = tuple(self.batch_shape)
    back = NegativeBinomialDisp(loc=jnp.broadcast_to(self.loc_back, bs),
                                disp=jnp.broadcast_to(self.disp, bs))
    fore = NegativeBinomialDisp(loc=jnp.broadcast_to(self.loc_fore, bs),
                                disp=jnp.broadcast_to(self.disp, bs))
    b = back.sample(kb, sample_shape)
    f = fore.sample(kf, sample_shape)
    use_back = jax.random.bernoulli(
        km, jnp.broadcast_to(self.mixing_probs, b.shape))
    return jnp.where(use_back, b, f)


class ZeroInflated(Distribution):
  """Zero-inflation wrapper: with prob σ(gate_logits) emit exactly 0."""

  count_distribution: Distribution
  gate_logits: Array

  # TFP-compatible alias used by the reference's unwrap logic
  @property
  def distribution(self):
    return self.count_distribution

  @property
  def gate(self):
    return jax.nn.sigmoid(self.gate_logits)

  @property
  def batch_shape(self):
    return jnp.broadcast_shapes(self.count_distribution.batch_shape,
                                jnp.shape(self.gate_logits))

  def log_prob(self, x):
    g = self.gate_logits
    lp = self.count_distribution.log_prob(x)
    lp0 = self.count_distribution.log_prob(jnp.zeros_like(x))
    log_pi = log_sigmoid(g)        # P(inflated zero)
    log_1mpi = log_sigmoid(-g)
    at_zero = jnp.logaddexp(log_pi, log_1mpi + lp0)
    return jnp.where(x <= 0.0, at_zero, log_1mpi + lp)

  def mean(self):
    return jax.nn.sigmoid(-self.gate_logits) * self.count_distribution.mean()

  def variance(self):
    pi = self.gate
    m = self.count_distribution.mean()
    v = self.count_distribution.variance()
    return (1.0 - pi) * (v + pi * jnp.square(m))

  def mode(self):
    return jnp.where(self.gate > 0.5, 0.0, self.count_distribution.mode())

  def sample(self, key, sample_shape=()):
    kz, kc = jax.random.split(key)
    # draw counts at the WRAPPER's batch shape: a gate broader than the
    # count distribution (per-cell gate over shared per-gene counts) must
    # produce independent count draws per batch element, and broadcast_to
    # cannot shrink the gate down to the count shape anyway
    bs = tuple(self.batch_shape)
    cd = self.count_distribution
    if tuple(cd.batch_shape) != bs:
      cd = jax.tree_util.tree_map(lambda p: jnp.broadcast_to(p, bs), cd)
    counts = cd.sample(kc, sample_shape)
    zero = jax.random.bernoulli(kz, jnp.broadcast_to(self.gate, counts.shape))
    return jnp.where(zero, jnp.zeros_like(counts), counts)
