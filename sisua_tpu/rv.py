"""RVmeta — declarative random-variable spec + parameterizing heads.

Re-provides the reference's ``odin.bay.RVmeta`` capability (imported at
``/root/reference/sisua/models/single_cell_model.py:27-35`` and used across the
model zoo): a small spec ``RVmeta(dim, posterior, projection, name)`` that
knows how to

  1. build a parameterizing *head*: a Dense projection from hidden features to
     raw distribution parameters (``projection=True``), and
  2. constrain raw parameters and construct the matching pytree Distribution.

Posterior vocabulary (pinned by ``SURVEY.md`` §2.4 and the reference's
``configs/base.yaml:27-43``): 'diag', 'normal', 'zinb', 'zinbd', 'nb', 'nbd',
'poisson', 'zip', 'onehot', 'bernoulli', 'mixgaus', 'mixnb', 'mixtril', 'mdn',
'mse'/'linear'/'relu' (deterministic), 'tril'.

Activation conventions (documented numerical choices, cf. reference
``sisua/models/scvi.py:128-171``): positive count parameters use
``exp(clip(raw, -15, 15))`` (the reference notes softplus "doesn't work" for
the scale path); Normal scales use ``softplus(raw) + 1e-4``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import dist as D

__all__ = ["RVmeta", "POSTERIORS", "parse_rv"]

Array = jax.Array

_EXP_CLIP = 15.0
_SCALE_EPS = 1e-4


def _positive(raw: Array, kw: Optional[dict] = None) -> Array:
  """exp with clipped pre-activation: stable positive parameterization.

  When ``kw['constrained']`` is truthy the input is already positive (a model
  fed final parameters directly, e.g. SCVI's decode with projection=False,
  reference ``sisua/models/scvi.py:128-166``) and is passed through untouched.
  """
  if kw and kw.get("constrained"):
    return raw
  return jnp.exp(jnp.clip(raw, -_EXP_CLIP, _EXP_CLIP))


def _soft_scale(raw: Array) -> Array:
  return jax.nn.softplus(raw) + _SCALE_EPS


def _tril_size(d: int) -> int:
  return d * (d + 1) // 2


def _fill_tril(flat: Array, d: int) -> Array:
  """(..., d(d+1)/2) → (..., d, d) lower-triangular with softplus diagonal."""
  idx = jnp.tril_indices(d)
  out = jnp.zeros(flat.shape[:-1] + (d, d), flat.dtype)
  out = out.at[..., idx[0], idx[1]].set(flat)
  diag = _soft_scale(jnp.diagonal(out, axis1=-2, axis2=-1))
  eye = jnp.eye(d, dtype=flat.dtype)
  return out * (1.0 - eye) + eye * diag[..., None, :] * eye


# Each entry: n_params(dim, kwargs) and builder(raw_flat, dim, kwargs) → dist.
POSTERIORS: Dict[str, Any] = {}


def _register(*names):
  def deco(cls):
    for n in names:
      POSTERIORS[n] = cls
    return cls

  return deco


class _Spec:
  deterministic = False
  zero_inflated = False
  binary = False

  @staticmethod
  def n_params(dim: int, kw: dict) -> int:
    raise NotImplementedError

  @staticmethod
  def build(raw: Array, dim: int, kw: dict) -> D.Distribution:
    raise NotImplementedError

  @staticmethod
  def prior(dim: int, kw: dict, dtype=jnp.float32) -> Optional[D.Distribution]:
    return None


@_register("normal", "gaus", "gaussian")
class _NormalSpec(_Spec):
  @staticmethod
  def n_params(dim, kw):
    return 2 * dim

  @staticmethod
  def build(raw, dim, kw):
    loc, scale = jnp.split(raw, 2, axis=-1)
    return D.Independent(D.Normal(loc=loc, scale=_soft_scale(scale)), 1)

  @staticmethod
  def prior(dim, kw, dtype=jnp.float32):
    return D.Independent(
        D.Normal(loc=jnp.zeros((dim,), dtype), scale=jnp.ones((dim,), dtype)), 1)


@_register("diag")
class _DiagSpec(_Spec):
  @staticmethod
  def n_params(dim, kw):
    return 2 * dim

  @staticmethod
  def build(raw, dim, kw):
    loc, scale = jnp.split(raw, 2, axis=-1)
    return D.MultivariateNormalDiag(loc=loc, scale_diag=_soft_scale(scale))

  @staticmethod
  def prior(dim, kw, dtype=jnp.float32):
    return D.MultivariateNormalDiag(loc=jnp.zeros((dim,), dtype),
                                    scale_diag=jnp.ones((dim,), dtype))


@_register("tril", "mvntril")
class _TrilSpec(_Spec):
  @staticmethod
  def n_params(dim, kw):
    return dim + _tril_size(dim)

  @staticmethod
  def build(raw, dim, kw):
    loc, flat = raw[..., :dim], raw[..., dim:]
    return D.MultivariateNormalTriL(loc=loc, scale_tril=_fill_tril(flat, dim))

  @staticmethod
  def prior(dim, kw, dtype=jnp.float32):
    return D.MultivariateNormalDiag(loc=jnp.zeros((dim,), dtype),
                                    scale_diag=jnp.ones((dim,), dtype))


@_register("nb")
class _NBSpec(_Spec):
  @staticmethod
  def n_params(dim, kw):
    return 2 * dim

  @staticmethod
  def build(raw, dim, kw):
    count, logits = jnp.split(raw, 2, axis=-1)
    return D.Independent(
        D.NegativeBinomial(total_count=_positive(count, kw), logits=logits), 1)


@_register("nbd")
class _NBDSpec(_Spec):
  @staticmethod
  def n_params(dim, kw):
    return 2 * dim

  @staticmethod
  def build(raw, dim, kw):
    loc, disp = jnp.split(raw, 2, axis=-1)
    return D.Independent(
        D.NegativeBinomialDisp(loc=_positive(loc, kw), disp=_positive(disp, kw)), 1)


@_register("zinb")
class _ZINBSpec(_Spec):
  zero_inflated = True

  @staticmethod
  def n_params(dim, kw):
    return 3 * dim

  @staticmethod
  def build(raw, dim, kw):
    count, logits, gate = jnp.split(raw, 3, axis=-1)
    nb = D.NegativeBinomial(total_count=_positive(count, kw), logits=logits)
    return D.Independent(D.ZeroInflated(count_distribution=nb,
                                        gate_logits=gate), 1)


@_register("zinbd")
class _ZINBDSpec(_Spec):
  zero_inflated = True

  @staticmethod
  def n_params(dim, kw):
    return 3 * dim

  @staticmethod
  def build(raw, dim, kw):
    loc, disp, gate = jnp.split(raw, 3, axis=-1)
    nb = D.NegativeBinomialDisp(loc=_positive(loc, kw), disp=_positive(disp, kw))
    return D.Independent(D.ZeroInflated(count_distribution=nb,
                                        gate_logits=gate), 1)


@_register("poisson", "pois")
class _PoissonSpec(_Spec):
  @staticmethod
  def n_params(dim, kw):
    return dim

  @staticmethod
  def build(raw, dim, kw):
    return D.Independent(D.Poisson(rate=_positive(raw, kw)), 1)


@_register("zip")
class _ZIPSpec(_Spec):
  zero_inflated = True

  @staticmethod
  def n_params(dim, kw):
    return 2 * dim

  @staticmethod
  def build(raw, dim, kw):
    rate, gate = jnp.split(raw, 2, axis=-1)
    return D.Independent(
        D.ZeroInflated(count_distribution=D.Poisson(rate=_positive(rate, kw)),
                       gate_logits=gate), 1)


@_register("onehot")
class _OneHotSpec(_Spec):
  binary = True

  @staticmethod
  def n_params(dim, kw):
    return dim

  @staticmethod
  def build(raw, dim, kw):
    return D.OneHotCategorical(logits=raw)


@_register("bernoulli", "bern")
class _BernoulliSpec(_Spec):
  binary = True

  @staticmethod
  def n_params(dim, kw):
    return dim

  @staticmethod
  def build(raw, dim, kw):
    return D.Independent(D.Bernoulli(logits=raw), 1)


@_register("mse", "linear", "relu")
class _DeterministicSpec(_Spec):
  deterministic = True

  @staticmethod
  def n_params(dim, kw):
    return dim

  @staticmethod
  def build(raw, dim, kw):
    act = kw.get("activation", "linear")
    loc = jax.nn.relu(raw) if act == "relu" else raw
    return D.VectorDeterministic(loc=loc)


@_register("nzmse")
class _NonzeroMSESpec(_Spec):
  """Nonzero-masked MSE (the scScope objective, Deng et al. 2019):
  ``-log_prob(x)`` averages squared error over the *observed* (x > 0)
  entries only, so dropout zeros are free to be imputed. Scored in
  ``log1p`` space by default (``log_space=False`` kwarg opts out) — raw
  counts span decades and drown the gradient in the largest entries."""
  deterministic = True

  @staticmethod
  def n_params(dim, kw):
    return dim

  @staticmethod
  def build(raw, dim, kw):
    act = kw.get("activation", "relu")
    loc = jax.nn.relu(raw) if act == "relu" else raw
    return D.NonzeroMaskedDeterministic(
        loc=loc, log_space=bool(kw.get("log_space", True)))


def _n_components(kw) -> int:
  return int(kw.get("n_components", 2))


@_register("mixgaus", "mixgaussian", "mdn")
class _MixGausSpec(_Spec):
  @staticmethod
  def n_params(dim, kw):
    k = _n_components(kw)
    return k * (2 * dim + 1)

  @staticmethod
  def build(raw, dim, kw):
    k = _n_components(kw)
    loc = raw[..., : k * dim].reshape(raw.shape[:-1] + (k, dim))
    scale = raw[..., k * dim: 2 * k * dim].reshape(raw.shape[:-1] + (k, dim))
    logits = raw[..., 2 * k * dim:]
    comp = D.Independent(D.Normal(loc=loc, scale=_soft_scale(scale)), 1)
    return D.MixtureSameFamily(mixture_logits=logits, components=comp)

  @staticmethod
  def prior(dim, kw, dtype=jnp.float32):
    return D.MultivariateNormalDiag(loc=jnp.zeros((dim,), dtype),
                                    scale_diag=jnp.ones((dim,), dtype))


@_register("mixnb")
class _MixNBSpec(_Spec):
  @staticmethod
  def n_params(dim, kw):
    k = _n_components(kw)
    zi = bool(kw.get("zero_inflated", False))
    return k * ((3 if zi else 2) * dim + 1)

  @staticmethod
  def build(raw, dim, kw):
    k = _n_components(kw)
    zi = bool(kw.get("zero_inflated", False))
    n_comp_params = (3 if zi else 2) * dim
    body = raw[..., : k * n_comp_params].reshape(
        raw.shape[:-1] + (k, n_comp_params))
    logits = raw[..., k * n_comp_params:]
    loc = _positive(body[..., :dim], kw)
    disp = _positive(body[..., dim: 2 * dim], kw)
    nb = D.NegativeBinomialDisp(loc=loc, disp=disp)
    if zi:
      comp = D.Independent(
          D.ZeroInflated(count_distribution=nb,
                         gate_logits=body[..., 2 * dim:]), 1)
    else:
      comp = D.Independent(nb, 1)
    return D.MixtureSameFamily(mixture_logits=logits, components=comp)


@_register("mixtril")
class _MixTrilSpec(_Spec):
  @staticmethod
  def n_params(dim, kw):
    k = _n_components(kw)
    return k * (dim + _tril_size(dim) + 1)

  @staticmethod
  def build(raw, dim, kw):
    k = _n_components(kw)
    per = dim + _tril_size(dim)
    body = raw[..., : k * per].reshape(raw.shape[:-1] + (k, per))
    logits = raw[..., k * per:]
    loc = body[..., :dim]
    tril = _fill_tril(body[..., dim:], dim)
    comp = D.MultivariateNormalTriL(loc=loc, scale_tril=tril)
    return D.MixtureSameFamily(mixture_logits=logits, components=comp)

  @staticmethod
  def prior(dim, kw, dtype=jnp.float32):
    return D.MultivariateNormalDiag(loc=jnp.zeros((dim,), dtype),
                                    scale_diag=jnp.ones((dim,), dtype))


@dataclasses.dataclass(frozen=True)
class RVmeta:
  """Random-variable spec: ``RVmeta(dim, posterior, projection, name)``.

  Hashable & frozen so it can be a static field of flax modules and a key in
  YAML-reflected configs (reference pattern: ``train.py:31-43``).
  """

  dim: int
  posterior: str = "diag"
  projection: bool = True
  name: Optional[str] = None
  kwargs: Tuple[Tuple[str, Any], ...] = ()

  def __post_init__(self):
    if self.posterior not in POSTERIORS:
      raise ValueError(
          f"Unknown posterior '{self.posterior}'. "
          f"Supported: {sorted(set(POSTERIORS))}")
    if isinstance(self.kwargs, dict):  # allow dict at construction
      object.__setattr__(self, "kwargs", tuple(sorted(self.kwargs.items())))
    # 'relu'/'linear'/'mse' pick their head activation from the posterior name
    if self.posterior in ("relu",) and "activation" not in dict(self.kwargs):
      object.__setattr__(
          self, "kwargs", self.kwargs + (("activation", "relu"),))

  # ---- introspection ------------------------------------------------------
  @property
  def kw(self) -> dict:
    return dict(self.kwargs)

  @property
  def spec(self) -> type:
    return POSTERIORS[self.posterior]

  @property
  def event_shape(self) -> Tuple[int, ...]:
    return (self.dim,)

  @property
  def is_zero_inflated(self) -> bool:
    return self.spec.zero_inflated

  @property
  def is_deterministic(self) -> bool:
    return self.spec.deterministic

  @property
  def is_binary(self) -> bool:
    return self.spec.binary

  @property
  def n_params(self) -> int:
    return self.spec.n_params(self.dim, self.kw)

  # ---- construction --------------------------------------------------------
  def create_distribution(self, raw_params: Array,
                          constrained: bool = False) -> D.Distribution:
    """Constrain flat raw params (last axis = n_params) → Distribution.

    ``constrained=True`` skips positivity activations — the caller already
    produced final (positive) parameters (SCVI direct-param decode)."""
    kw = self.kw
    if constrained:
      kw = dict(kw, constrained=True)
    return self.spec.build(raw_params, self.dim, kw)

  def create_prior(self, dtype=jnp.float32) -> Optional[D.Distribution]:
    return self.spec.prior(self.dim, self.kw, dtype)

  def replace(self, **updates) -> "RVmeta":
    return dataclasses.replace(self, **updates)

  def __repr__(self):
    return (f"RVmeta(dim={self.dim}, posterior='{self.posterior}', "
            f"projection={self.projection}, name={self.name!r})")


def parse_rv(x, default_name: str = "rv") -> RVmeta:
  """Coerce YAML/ctor shorthand into an RVmeta (reference reflection pattern,
  ``train.py:31-43``): accepts RVmeta, (dim, posterior[, name]) tuples, or
  {'dim':…, 'posterior':…} dicts."""
  if isinstance(x, RVmeta):
    return x
  if isinstance(x, dict):
    kw = dict(x)
    dim = int(kw.pop("dim"))
    posterior = kw.pop("posterior", "diag")
    name = kw.pop("name", default_name)
    projection = bool(kw.pop("projection", True))
    return RVmeta(dim, posterior, projection, name, tuple(sorted(kw.items())))
  if isinstance(x, (tuple, list)):
    dim = int(x[0])
    posterior = x[1] if len(x) > 1 else "diag"
    name = x[2] if len(x) > 2 else default_name
    return RVmeta(dim, posterior, True, name)
  raise TypeError(f"Cannot parse RVmeta from {x!r}")
