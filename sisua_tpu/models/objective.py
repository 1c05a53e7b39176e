"""ELBO objective: likelihood terms, KL terms, semi-supervised masking.

The TPU-native replacement for the reference's `[odin]` BetaVAE/multitaskVAE
loss (call stack ``SURVEY.md`` §3.1: ``ELBO = Σ llkᵢ·maskᵢ − β·KL``):

  * first output = main omic, always unmasked;
  * extra outputs are *labels*: in multitask (SISUA-family) models their
    log-likelihood is weighted by α and multiplied by the per-example
    semi-supervised mask generated in the data pipeline
    (reference ``sisua/data/_single_cell_base.py:577-593``);
  * KL per latent: analytic when available and ``analytic=True``, else
    Monte-Carlo from the forward latent samples (SCALE path,
    ``sisua/models/scale.py:44-48``);
  * β may be an ``Interpolation`` schedule evaluated at the current step
    (KL warm-up).

Pure function of (VAEOutput, batch, coefficients) — XLA fuses the whole
masked-reduction + KL into the surrounding backward pass; a Pallas-fused
variant of the ZINB term lives in ``sisua_tpu.ops``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .. import dist as D
from .module import VAEOutput

__all__ = ["elbo_terms", "compute_loss", "route_fused_likelihood",
           "set_planned_steps"]

Array = jax.Array

# Fused-kernel routing. Three measured facts on v5e (RESULTS.md):
#   * below ~4M likelihood elements the step is overhead-bound and XLA's own
#     fusion is faster per step — never route Pallas there;
#   * in the bandwidth-bound tall regime (4096×2048, 8.4M elements) the
#     Pallas row-sum is ~12% faster per step AND compiles ~8× faster —
#     Pallas is strictly better there regardless of run length;
#   * in the wide-gene regime (512×33k SCVI) XLA's fused step is a few
#     percent faster at steady state, but its train executable compiles
#     ~60 s slower (68 s vs 8.6 s). Whether that compile delta amortizes
#     depends on how many steps the run will take — a pure size gate can't
#     know, so fit() passes the PLANNED step count down and the router
#     compares planned_steps × per-step delta vs the compile delta.
# The per-step winner above the gate flips with the FEATURE width (the
# kernel's row-sum tiling wins while rows dominate, loses once a single
# row spans many tiles), so the long-run→XLA rule only applies at wide
# feature counts; the boundary between the two measured anchors (2048 and
# 33k genes) is unmeasured — 16k splits it conservatively (Pallas keeps
# the 8× compile edge when wrong).
# Override with SISUA_TPU_FUSED_LIKELIHOOD=on|off|auto (default auto).
_PALLAS_MIN_ELEMENTS = 4_000_000
_XLA_LONGRUN_MIN_FEATURES = 16_384
_AMORTIZATION_BREAKEVEN_STEPS = 100_000
_PLANNED_STEPS: Optional[int] = None


def set_planned_steps(n: Optional[int]) -> Optional[int]:
  """Amortization hint for the fused-likelihood router (set by fit() for
  the duration of training; None = unknown → interactive/serving default).
  Returns the previous value so callers can restore it."""
  global _PLANNED_STEPS
  prev = _PLANNED_STEPS
  _PLANNED_STEPS = None if n is None else int(n)
  return prev


def _pallas_mode() -> str:
  import os
  return os.environ.get("SISUA_TPU_FUSED_LIKELIHOOD", "auto").lower()


def route_fused_likelihood(elements: int, mode: Optional[str] = None,
                           planned_steps: Optional[int] = None,
                           features: Optional[int] = None) -> bool:
  """Amortization-aware routing decision for the fused ZINB/NB kernel.

  ``True`` → Pallas kernel; ``False`` → the distribution math (XLA fusion).
  Explicit env mode wins; in 'auto', small shapes always go to XLA (faster
  per step AND faster to compile). Large shapes go to Pallas — it is
  strictly better in the tall/bandwidth-bound regime — except wide-feature
  runs (``features ≥ _XLA_LONGRUN_MIN_FEATURES``, where XLA holds a small
  per-step edge) that are long enough (planned_steps ≥ break-even) for
  that edge to pay back XLA's compile-time premium."""
  mode = _pallas_mode() if mode is None else mode
  if mode == "on":
    return True
  if mode == "off":
    return False
  if elements < _PALLAS_MIN_ELEMENTS:
    return False
  if features is not None and features < _XLA_LONGRUN_MIN_FEATURES:
    return True  # tall regime: Pallas faster per step AND to compile
  steps = _PLANNED_STEPS if planned_steps is None else planned_steps
  if steps is not None and steps >= _AMORTIZATION_BREAKEVEN_STEPS:
    return False  # long wide run: the compile premium amortizes away
  return True


def _fast_log_prob(dist: D.Distribution, x: Array) -> Array:
  """Row-summed log-prob, routed through the fused Pallas ZINB kernel when
  the shape is in its winning regime; falls back to the dist math. Both NB
  parameterizations route: logits ('zinb'/'nb' heads) directly, and
  mean/dispersion ('zinbd'/'nbd' — SCVI's decode) via the exact remap
  NB(μ, θ) = NB(total_count=θ, logits=log μ − log θ)."""
  mode = _pallas_mode()
  if (mode != "off"
      and isinstance(dist, D.Independent)
      and dist.reinterpreted_batch_ndims == 1
      and x.ndim == 2
      and len(dist.batch_shape) == 1  # no MC sample dims in the params
      and x.shape[0] % 8 == 0
      and route_fused_likelihood(x.size, mode, features=x.shape[-1])):
    base = dist.base
    zi = isinstance(base, D.ZeroInflated)
    count = base.count_distribution if zi else base
    kind = (
        "logits" if isinstance(count, D.NegativeBinomial) else
        "disp" if isinstance(count, D.NegativeBinomialDisp) else None)
    if kind is not None:
      from ..ops import zinb_pallas as zp
      if zp.pallas_available():
        if kind == "logits":
          r = jnp.broadcast_to(count.total_count, x.shape)
          logits = jnp.broadcast_to(count.logits, x.shape)
        else:
          r = jnp.broadcast_to(count.disp, x.shape)
          logits = zp._disp_to_logits(jnp.broadcast_to(count.loc, x.shape),
                                      r)
        if zi:
          gate = jnp.broadcast_to(base.gate_logits, x.shape)
          return zp.zinb_log_prob_rowsum(x, r, logits, gate,
                                         constrained=True)
        return zp.nb_log_prob_rowsum(x, r, logits, constrained=True)
  return dist.log_prob(x)


def _kl_term(q: D.Distribution, prior: Optional[D.Distribution],
             z: Array, analytic: bool) -> Array:
  """KL(q ‖ prior) per example. Falls back to MC using the forward sample."""
  if prior is None:
    return jnp.zeros(q.batch_shape, dtype=jnp.float32)
  if analytic:
    try:
      return D.kl_divergence(q, prior)
    except D.NoAnalyticKL:
      pass
  # Monte-Carlo: E_q[log q(z) − log p(z)] with the reparameterized forward
  # draw(s); leading sample dims (if any) are averaged.
  lq = q.log_prob(z)
  lp = prior.log_prob(z)
  kl = lq - lp
  extra = kl.ndim - len(q.batch_shape)
  if extra > 0:
    kl = jnp.mean(kl, axis=tuple(range(extra)))
  return kl


def elbo_terms(out: VAEOutput,
               targets: Sequence[Array],
               mask: Optional[Array] = None,
               analytic: bool = True,
               mask_outputs: bool = False,
               alpha: float = 1.0,
               mask_renorm: bool = False,
               ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
  """Per-example log-likelihood and KL dictionaries.

  Returns ``(llk, kl)`` keyed ``llk_<name>`` / ``klqp_<name>`` — the metric
  names the reference's learning-curve plots expect
  (``sisua/analysis/results_sheet.py:57-101``).

  ``mask_renorm`` (extension, off by default): the reference reduces the
  masked label likelihood as a *batch* mean (``Σ llkᵢ·maskᵢ / B``), so the
  supervision term's expected magnitude shrinks linearly with
  ``labels_percent`` — at a 2% label budget the label heads contribute
  ``α·0.02`` of the gradient signal of a fully-labeled run, and the
  semi-supervised advantage washes out (RESULTS.md low-label zoo). With
  renormalization the masked terms are averaged over the *labeled* examples
  only (scaled ``B / Σmask``), making supervision strength invariant to the
  label budget. Batches with zero labeled cells contribute zero.
  """
  llk: Dict[str, Array] = {}
  for i, (pX, x) in enumerate(zip(out.outputs, targets)):
    name = f"x{i}" if i else "x"
    lp = _fast_log_prob(pX, x)
    # average over any leading MC sample dims down to batch shape
    extra = lp.ndim - 1
    if extra > 0:
      lp = jnp.mean(lp, axis=tuple(range(extra)))
    if i > 0:
      lp = alpha * lp
      if mask_outputs and mask is not None:
        m = mask.astype(lp.dtype).reshape(lp.shape[0])
        lp = lp * m
        if mask_renorm:
          lp = lp * (m.shape[0] / jnp.maximum(jnp.sum(m), 1.0))
    llk[f"llk_{name}"] = lp
  kl: Dict[str, Array] = {}
  for j, (q, prior, z) in enumerate(
      zip(out.latents, out.priors, out.latent_samples)):
    name = f"z{j}" if j else "z"
    kl[f"klqp_{name}"] = _kl_term(q, prior, z, analytic)
  return llk, kl


def compute_loss(out: VAEOutput,
                 targets: Sequence[Array],
                 mask: Optional[Array] = None,
                 beta: Array | float = 1.0,
                 alpha: float = 1.0,
                 analytic: bool = True,
                 mask_outputs: bool = False,
                 mask_renorm: bool = False,
                 ) -> Tuple[Array, Dict[str, Array]]:
  """Scalar −ELBO plus scalar metrics (means over the batch)."""
  llk, kl = elbo_terms(out, targets, mask=mask, analytic=analytic,
                       mask_outputs=mask_outputs, alpha=alpha,
                       mask_renorm=mask_renorm)
  total_llk = sum(llk.values())
  total_kl = sum(kl.values())
  elbo = total_llk - beta * total_kl
  loss = -jnp.mean(elbo)
  metrics = {k: jnp.mean(v) for k, v in {**llk, **kl}.items()}
  metrics["loss"] = loss
  metrics["elbo"] = jnp.mean(elbo)
  metrics["beta"] = jnp.asarray(beta, jnp.float32)
  return loss, metrics
