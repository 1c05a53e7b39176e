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

__all__ = ["elbo_terms", "compute_loss", "route_fused_likelihood"]

Array = jax.Array

# Fused-kernel routing, measured on v5e (RESULTS.md "wide-gene regime"):
#   * below ~4M likelihood elements the step is overhead-bound and XLA's
#     own fusion is faster per step — never route Pallas there;
#   * above the gate the Pallas fused forward+analytic-backward beats
#     XLA's fusion per step in EVERY measured regime at HEAD — tall
#     4096×2048 (~12%), wide 512×33k under both epoch layouts (f32
#     45.0k vs 41.8k cells/s gather, 60.3k vs 41.5k permslice; bf16
#     62.1k vs 45.0k) — AND compiles 8–70× faster (8.6–21 s vs 68 s
#     gather / 24 min under permslice, where XLA's fusion search
#     explodes). History: before the fused analytic backward, XLA held a
#     ~5% steady-state edge in the wide regime and routing weighed its
#     compile premium against the planned step count; the round-3
#     interleaved re-measurement (2 sessions, both layouts, both dtypes)
#     shows that edge is gone, so 'auto' is simply Pallas-above-the-gate.
# Override with SISUA_TPU_FUSED_LIKELIHOOD=on|off|auto (default auto).
_PALLAS_MIN_ELEMENTS = 4_000_000


def _pallas_mode() -> str:
  import os
  return os.environ.get("SISUA_TPU_FUSED_LIKELIHOOD", "auto").lower()


def route_fused_likelihood(elements: int, mode: Optional[str] = None) -> bool:
  """Routing decision for the fused ZINB/NB kernel.

  ``True`` → Pallas kernel; ``False`` → the distribution math (XLA fusion).
  Explicit env mode wins; in 'auto', small shapes go to XLA (faster per
  step AND faster to compile below the element gate), large shapes to
  Pallas (faster per step and far faster to compile in every measured
  regime — see the module comment for the decision history)."""
  mode = _pallas_mode() if mode is None else mode
  if mode == "on":
    return True
  if mode == "off":
    return False
  return elements >= _PALLAS_MIN_ELEMENTS


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
      and route_fused_likelihood(x.size, mode)):
    base = dist.base
    zi = isinstance(base, D.ZeroInflated)
    count = base.count_distribution if zi else base
    kind = (
        "logits" if isinstance(count, D.NegativeBinomial) else
        "disp" if isinstance(count, D.NegativeBinomialDisp) else
        "displog" if isinstance(count, D.NegativeBinomialDispLog) else
        "loglog" if isinstance(count, D.NegativeBinomialLog) else None)
    if kind is not None:
      from ..ops import zinb_pallas as zp
      if zp.pallas_available():
        # native shapes pass straight through: per-gene parameters (SCVI's
        # (D,) dispersion) are broadcast inside the kernel's VMEM tiles and
        # their gradients reduced in-kernel — never materialized as (B, D)
        # HBM arrays (the old broadcast_to here cost a full write+read per
        # operand plus a (B, D) gradient write the XLA reducer re-read)
        constrained = True
        if kind == "logits":
          r, logits = count.total_count, count.logits
        elif kind == "displog":
          # log-space decode: logits = log μ − log θ with log μ native —
          # no exp→log round trip, and XLA fuses this subtraction into the
          # single (B, D) materialization the kernel reads
          r = count.disp
          logits = count.log_loc - jnp.log(r + 1e-8)
        elif kind == "loglog":
          # fully log-space decode (per-cell-per-gene dispersion): the
          # kernel receives log θ and exponentiates it inside VMEM
          # tiles (constrained=False ≡ exp(clip(·, ±15)), exactly the
          # distribution's θ) — neither exp(θ) nor log μ ever become
          # (B, D) HBM intermediates; logits is the ONE materialized array.
          # log θ is clipped HERE, once, so logits and θ derive from the
          # same value (raw-vs-clipped mismatch denormalizes the pmf for
          # |log θ| > 15, ADVICE r4); the kernel's clip is then a no-op.
          r = jnp.clip(count.log_disp, -15.0, 15.0)
          logits = count.log_loc - r
          constrained = False
        else:
          r = count.disp
          logits = zp._disp_to_logits(count.loc, r)
        import os
        if os.environ.get("SISUA_TPU_FWD_OPERANDS", "f32") == "bf16" \
            and zp.bf16_operands_ok(x.shape[0]):
          # bf16-operand mode: full (B, D) parameter fields move to/from
          # HBM at 2 B/element (the producer matmul's convert fuses into
          # its epilogue, so the bf16 array is the only materialization);
          # per-gene (1, D) rows stay f32. Counts x stay f32 (exact).
          # Measured A/B: benchmarks/bwd_dtype_ab.py --operands
          def _c(a):
            a = jnp.asarray(a)
            return (a.astype(jnp.bfloat16)
                    if a.shape == x.shape and a.dtype == jnp.float32
                    else a)
          r, logits = _c(r), _c(logits)
          if zi:
            return zp.zinb_log_prob_rowsum(x, r, logits,
                                           _c(base.gate_logits),
                                           constrained=constrained)
          return zp.nb_log_prob_rowsum(x, r, logits,
                                       constrained=constrained)
        if zi:
          return zp.zinb_log_prob_rowsum(x, r, logits, base.gate_logits,
                                         constrained=constrained)
        return zp.nb_log_prob_rowsum(x, r, logits, constrained=constrained)
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
               output_masks: Optional[Sequence[Optional[Array]]] = None,
               latent_masks: Optional[Sequence[Optional[Array]]] = None,
               ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
  """Per-example log-likelihood and KL dictionaries.

  Returns ``(llk, kl)`` keyed ``llk_<name>`` / ``klqp_<name>`` — the metric
  names the reference's learning-curve plots expect
  (``sisua/analysis/results_sheet.py:57-101``).

  ``output_masks`` (mosaic-data extension): optional per-output (B,) gates
  for MISSING-modality cells (MULTIVI's unpaired multiome support) —
  unlike the semi-supervised ``mask`` they apply to EVERY output
  (including the main omic), at train and eval alike, and are data
  missingness rather than a supervision budget.

  ``latent_masks``: optional per-LATENT (B,) gates with the same
  missing-modality semantics, for latents inferred from one modality
  branch — a latent whose evidence is unobserved for a cell must not
  charge that cell's KL (scvi-tools MULTIVI restricts library
  inference/KL to RNA-observed cells; an ATAC-only cell's all-zero RNA
  row would otherwise pull the library encoder toward the prior from
  non-data, ADVICE r4).

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
    if output_masks is not None and output_masks[i] is not None:
      lp = lp * output_masks[i].astype(lp.dtype).reshape(lp.shape[0])
    llk[f"llk_{name}"] = lp
  kl: Dict[str, Array] = {}
  for j, (q, prior, z) in enumerate(
      zip(out.latents, out.priors, out.latent_samples)):
    name = f"z{j}" if j else "z"
    term = _kl_term(q, prior, z, analytic)
    if latent_masks is not None and j < len(latent_masks) \
        and latent_masks[j] is not None:
      term = term * latent_masks[j].astype(term.dtype).reshape(term.shape[0])
    kl[f"klqp_{name}"] = term
  return llk, kl


def compute_loss(out: VAEOutput,
                 targets: Sequence[Array],
                 mask: Optional[Array] = None,
                 beta: Array | float = 1.0,
                 alpha: float = 1.0,
                 analytic: bool = True,
                 mask_outputs: bool = False,
                 mask_renorm: bool = False,
                 output_masks: Optional[Sequence[Optional[Array]]] = None,
                 latent_masks: Optional[Sequence[Optional[Array]]] = None,
                 ) -> Tuple[Array, Dict[str, Array]]:
  """Scalar −ELBO plus scalar metrics (means over the batch)."""
  llk, kl = elbo_terms(out, targets, mask=mask, analytic=analytic,
                       mask_outputs=mask_outputs, alpha=alpha,
                       mask_renorm=mask_renorm, output_masks=output_masks,
                       latent_masks=latent_masks)
  total_llk = sum(llk.values())
  total_kl = sum(kl.values())
  elbo = total_llk - beta * total_kl
  loss = -jnp.mean(elbo)
  metrics = {k: jnp.mean(v) for k, v in {**llk, **kl}.items()}
  metrics["loss"] = loss
  metrics["elbo"] = jnp.mean(elbo)
  metrics["beta"] = jnp.asarray(beta, jnp.float32)
  return loss, metrics
