"""Pallas-fused ZINB/NB log-likelihood row reduction.

The ELBO hot loop's dominant non-matmul cost is the count log-likelihood:
per (cell, gene) element it needs lgamma×3, softplus×2, exp, log, plus a
row-sum reduction (reference math: ``sisua_tpu/dist/count.py``). This kernel
fuses parameter constraint (exp-clip), the ZINB log-pmf, and the row
reduction into one VMEM pass over (B, D) tiles — one HBM read per operand,
no intermediate (B, D) temporaries.

lgamma is not a Mosaic-lowerable transcendental, so the kernel evaluates it
directly with the Lanczos approximation (g=7, n=9 — float32-exact to ~1e-6
relative, same coefficients as the classic Numerical Recipes formulation),
using the reflection-free positive-argument path (count arguments are > 0).

Use ``zinb_log_prob_rowsum(x, count_raw, logits, gate_logits)`` — returns the
per-cell summed log-probability. ``nb_log_prob_rowsum`` is the gate-free
variant. Both carry a custom VJP whose backward pass is a second fused
kernel (digamma via the Lanczos derivative), so training uses fused passes
in both directions. Fallback to the pure-jnp path with
``SISUA_TPU_NO_PALLAS=1`` or on non-TPU backends.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

__all__ = ["zinb_log_prob_rowsum", "nb_log_prob_rowsum",
           "zinbd_log_prob_rowsum", "nbd_log_prob_rowsum",
           "pallas_available"]

_LANCZOS_G = 7.0
_LANCZOS = (
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)
_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)
_EXP_CLIP = 15.0


def _lgamma_lanczos(x):
  """lgamma for x > 0 via Lanczos g=7 (vector ops only; ~1e-6 rel err).

  lgamma(x) = ½log 2π + (z+½)·log t − t + log A(z),  z = x−1, t = z+g+½.

  All series terms are written in x directly: computing z = x−1 first and
  then z+i re-adds the 1, and in float32 (x−1)+1 rounds tiny x to exactly
  0 — the i=1 denominator becomes 0, lgamma(1e-8) returns +inf, and every
  NB log-prob with a tiny dispersion collapses to −inf (observed as inf
  training loss on the fused path)."""
  a = jnp.full_like(x, _LANCZOS[0])
  for i, c in enumerate(_LANCZOS[1:]):
    a = a + c / (x + float(i))          # z + (i+1) == x + i, exactly
  t = x + (_LANCZOS_G - 0.5)            # z + g + ½ == x + (g − ½)
  return _HALF_LOG_2PI + (x - 0.5) * jnp.log(t) - t + jnp.log(a)


def _lgamma_stirling(x):
  """lgamma for x > 0 via shift-8 + Stirling (vector ops only; ~1e-6 rel).

  lgamma(x) = lgamma(x+8) − log Π_{k<8}(x+k); Stirling at y = x+8 ≥ 8.
  The product is normalized by y⁻¹ per factor (Π(x+k)/y ∈ (~1e-12, 1])
  so f32 never overflows even at x ~ 1e6, folding the y⁸ back in as
  (y−8.5)·log y. Cost: 1 divide + 2 logs + ~25 mul/add — the Lanczos
  evaluation needs 8 divides + 2 logs, and VPU divides are multi-op
  (reciprocal + Newton), which the kernel probe measures as the
  difference (benchmarks/kernel_probe.py)."""
  y = x + 8.0
  inv = 1.0 / y
  p = ((x * inv) * ((x + 1.0) * inv) * ((x + 2.0) * inv)
       * ((x + 3.0) * inv) * ((x + 4.0) * inv) * ((x + 5.0) * inv)
       * ((x + 6.0) * inv) * ((x + 7.0) * inv))
  inv2 = inv * inv
  series = inv * (1.0 / 12.0 - inv2 * (1.0 / 360.0 - inv2 * (1.0 / 1260.0)))
  return ((y - 8.5) * jnp.log(y) - y + _HALF_LOG_2PI - jnp.log(p) + series)


def _lgamma_ref(x):
  return jax.lax.lgamma(x)


# stock stable form; works inside pallas kernels (plain jnp ops)
_log_sigmoid = jax.nn.log_sigmoid


def _zinb_elem(x, count_raw, logits, gate, constrained: bool,
               lgamma=None):
  lg = lgamma or _LGAMMA
  # constrained r comes in raw (θ = exp(head output)); clamp to the dist
  # layer's eps so an underflowed θ == 0.0 cannot reach lgamma(0) = +inf
  r = jnp.maximum(count_raw, 1e-8) if constrained else jnp.exp(
      jnp.clip(count_raw, -_EXP_CLIP, _EXP_CLIP))
  log_p = _log_sigmoid(logits)
  log_1mp = _log_sigmoid(-logits)
  # lgamma(x+r) − lgamma(r): for huge r both are ~r·log r and the float32
  # difference is pure cancellation (→ garbage, NaN at r ≈ 1e38); switch
  # to the asymptotic x·log r + x(x−1)/(2r) there (mirrors dist/count.py)
  lg_diff = jnp.where(r > 1e6,
                      x * jnp.log(r) + x * (x - 1.0) / (2.0 * r),
                      lg(x + r) - lg(r))
  nb = lg_diff - lg(x + 1.0) + r * log_1mp + x * log_p
  nb0 = r * log_1mp  # NB log-prob at x=0 (lgamma terms cancel)
  log_pi = _log_sigmoid(gate)
  log_1mpi = _log_sigmoid(-gate)
  at_zero = jnp.logaddexp(log_pi, log_1mpi + nb0)
  return jnp.where(x <= 0.0, at_zero, log_1mpi + nb)


def pallas_available() -> bool:
  if os.environ.get("SISUA_TPU_NO_PALLAS"):
    return False
  try:
    return jax.devices()[0].platform in ("tpu", "axon")
  except Exception:
    return False


# Select the in-kernel lgamma: Lanczos inside Pallas, lax.lgamma outside.
_LGAMMA = _lgamma_ref


def _kernel_lgamma():
  """The lgamma evaluated INSIDE Pallas kernels (read at trace time).
  Both are f32-accurate to ~2e-6 rel (test_ops pins each); the choice is
  a measured perf call — see benchmarks/kernel_probe.py."""
  name = os.environ.get("SISUA_TPU_LGAMMA", "stirling")
  return _lgamma_lanczos if name == "lanczos" else _lgamma_stirling


# Tile sizes: bound the VMEM working set (the lgamma evaluation holds
# ~a dozen (block_b × block_d) f32 temporaries). 2048 is the measured
# optimum of the 1024×33k fwd+bwd tile sweep (benchmarks/
# results_kernel_probe.md: 6.0 ms at 8×2048 vs 6.4 ms at the old 8×4096;
# ≥64×4096 overflows VMEM). Env-overridable for the probe's sweep.
_BLOCK_D = int(os.environ.get("SISUA_TPU_BLOCK_D", 2048))


def bf16_operands_ok(b: int) -> bool:
  """Whether a batch of ``b`` rows can tile the kernels with bf16 operand
  blocks — the single source of truth for the bf16-operand gate (the
  objective's routing queries this instead of restating the sublane
  constant)."""
  return _block_b(b, bf16=True) is not None


def _block_b(b: int, bf16: bool = False):
  """Row-tile height: the env override when it divides the batch, else 8.
  bf16 operand tiles need a 16-row sublane (Mosaic's native bf16 tiling
  is (16, 128)); returns None when the batch can't tile that way — the
  caller falls back to the XLA path."""
  bb = int(os.environ.get("SISUA_TPU_BLOCK_B", 8))
  bb = bb if bb > 0 and b % bb == 0 else 8
  if bf16:
    if bb % 16:
      bb = 16
    if b % bb:
      return None
  return bb


def _make_kernel(d: int, block_b: int, constrained: bool,
                 pg=(False, False, False)):
  """Fused forward. ``pg`` flags each parameter (count, logits, gate) as
  per-gene — a (1, D) row the kernel broadcasts IN VMEM instead of the
  caller materializing a (B, D) copy in HBM (saves one full-array
  write+read per broadcast operand; SCVI's per-gene dispersion is the
  production case, reference ``scvi/models/vae.py`` px_r)."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  block_d = min(_BLOCK_D, ((d + 127) // 128) * 128)
  n_col = -(-d // block_d)
  d_pad = n_col * block_d

  def kernel(x_ref, count_ref, logits_ref, gate_ref, out_ref):
    j = pl.program_id(1)
    x = x_ref[:]
    # operands may arrive bf16 (halved HBM reads — the bf16-operand mode);
    # all math runs f32 in-registers, so the upcast is free for f32 tiles
    f32 = lambda a: a.astype(jnp.float32)  # noqa: E731
    # Mosaic has no lgamma primitive — use the vector-ops evaluation
    lp = _zinb_elem(f32(x), f32(count_ref[:]), f32(logits_ref[:]),
                    f32(gate_ref[:]), constrained,
                    lgamma=_kernel_lgamma())
    # mask padded gene columns (global column index vs true width d)
    col = j * block_d + jax.lax.broadcasted_iota(jnp.int32, lp.shape, 1)
    lp = jnp.where(col < d, lp, 0.0)
    partial = jnp.sum(lp, axis=1, keepdims=True)
    # column blocks iterate fastest (last grid dim): accumulate into out
    @pl.when(j == 0)
    def _init():
      out_ref[:] = partial
    @pl.when(j != 0)
    def _acc():
      out_ref[:] += partial

  def elem_spec(per_gene):
    if per_gene:
      return pl.BlockSpec((1, block_d), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    return pl.BlockSpec((block_b, block_d), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)

  def call(x, count_raw, logits, gate):
    b = x.shape[0]
    pad_cols = d_pad - d
    def pad(a):
      return jnp.pad(a, ((0, 0), (0, pad_cols))) if pad_cols else a
    grid = (max(1, b // block_b), n_col)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        grid=grid,
        in_specs=[elem_spec(False)] + [elem_spec(p) for p in pg],
        out_specs=pl.BlockSpec((block_b, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
    )(pad(x), pad(count_raw), pad(logits), pad(gate))
    return out[:, 0]

  return call


def _rowsum_ref(x, count_raw, logits, gate, constrained):
  return jnp.sum(_zinb_elem(x, count_raw, logits, gate, constrained), -1)


def _digamma_shift6(x):
  """digamma for x > 0 with vector ops only (Mosaic has no digamma
  primitive): recurrence ψ(x) = ψ(x+6) − Σ_{k<6} 1/(x+k), then the
  asymptotic series at y = x+6 ≥ 6 (~1e-7 abs err)."""
  s = (1.0 / x + 1.0 / (x + 1.0) + 1.0 / (x + 2.0)
       + 1.0 / (x + 3.0) + 1.0 / (x + 4.0) + 1.0 / (x + 5.0))
  y = x + 6.0
  inv = 1.0 / y
  inv2 = inv * inv
  series = jnp.log(y) - 0.5 * inv - inv2 * (
      1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 * (1.0 / 252.0)))
  return series - s


def _digamma_diff(r, x):
  """ψ(x+r) − ψ(r) without cancellation, for r > 0, x ≥ 0.

  Subtracting two digamma evaluations loses ~4 digits whenever x ≪ r
  (the NB d/dθ gradient is exactly that regime); here every term is
  proportional to x, so x = 0 gives exactly 0 and small x stays at full
  f32 precision. One log1p is the only transcendental — cheaper than two
  digammas. Vector ops only → usable inside the Pallas kernel."""
  s = sum(x / ((r + k) * (x + r + k)) for k in range(6))
  y1 = r + 6.0
  inv1 = 1.0 / y1
  inv2 = 1.0 / (x + y1)
  di = -x * inv1 * inv2                  # inv2 − inv1
  si = inv1 + inv2
  i1s = inv1 * inv1
  i2s = inv2 * inv2
  # series(y2) − series(y1) for series(y)=log y − inv/2 − inv²/12
  #                                        + inv⁴/120 − inv⁶/252
  out = (jnp.log1p(x * inv1)
         - 0.5 * di
         - di * si * (1.0 / 12.0
                      - (1.0 / 120.0) * (i1s + i2s)
                      + (1.0 / 252.0) * (i1s * i1s + i1s * i2s
                                         + i2s * i2s)))
  return out + s


def _zinb_grads_elem(x, count_raw, logits, gate, constrained: bool):
  """Analytic per-element gradients of the ZINB log-pmf w.r.t.
  (count_raw, logits, gate). Shared by the XLA backward and the fused
  Pallas backward kernel (vector ops only)."""
  if constrained:
    r = jnp.maximum(count_raw, 1e-8)
    dr_dcr = (count_raw >= 1e-8).astype(x.dtype)
  else:
    clipped = jnp.clip(count_raw, -_EXP_CLIP, _EXP_CLIP)
    r = jnp.exp(clipped)
    dr_dcr = r * ((count_raw > -_EXP_CLIP)
                  & (count_raw < _EXP_CLIP)).astype(x.dtype)
  sig_l = jax.nn.sigmoid(logits)
  sig_nl = jax.nn.sigmoid(-logits)
  log_1mp = -jax.nn.softplus(logits)        # log(1−p)
  # x > 0 branch: lp = logσ(−γ) + nb; d nb/d r mirrors the forward's
  # large-r asymptotic switch exactly
  dig = jnp.where(r > 1e6,
                  x / r - x * (x - 1.0) / (2.0 * r * r),
                  _digamma_diff(r, x))
  dpos_dr = dig + log_1mp
  dpos_dl = x * sig_nl - r * sig_l
  sig_g = jax.nn.sigmoid(gate)
  sig_ng = jax.nn.sigmoid(-gate)
  dpos_dg = -sig_g
  # x == 0 branch: lp = logaddexp(logσ(γ), logσ(−γ) + nb0)
  nb0 = r * log_1mp
  a = -jax.nn.softplus(-gate)
  b = -jax.nn.softplus(gate) + nb0
  wb = jnp.exp(b - jnp.logaddexp(a, b))     # posterior weight of the NB arm
  dzero_dr = wb * log_1mp
  dzero_dl = -wb * r * sig_l
  dzero_dg = (1.0 - wb) * sig_ng - wb * sig_g
  iszero = x <= 0.0
  return (jnp.where(iszero, dzero_dr, dpos_dr) * dr_dcr,
          jnp.where(iszero, dzero_dl, dpos_dl),
          jnp.where(iszero, dzero_dg, dpos_dg))


def _bwd_write_dtype():
  """dtype of the backward kernel's (B, D) gradient WRITES (read at trace
  time). The fused backward is bound by its 3×(B, D) f32 gradient writes
  (results_kernel_probe.md, Backward note); bf16 halves those bytes. The
  per-row cotangent is uniform across a row and the fields are O(1)-scale,
  so bf16's 8 mantissa bits cost ~1e-2 relative on individual elements —
  and the consumers are the decoder's matmul transposes, which the MXU
  runs in bf16 anyway. Per-gene (1, D) accumulators always stay f32 (they
  accumulate across row blocks). A/B: benchmarks/bwd_dtype_ab.py."""
  name = os.environ.get("SISUA_TPU_BWD_WRITES", _BWD_WRITES_DEFAULT)
  return jnp.bfloat16 if name == "bf16" else jnp.float32


# default set by the measured A/B (benchmarks/results_bwd_dtype_ab.md):
# bf16 writes are 1.03–1.06× on the whole fused fwd+bwd at {1024,2048}×33k
# in both dispersion modes, gradients agree to ≤3.2e-3 max rel, and the
# 20k×4000 SCVI convergence overlay diverges ≤7.6e-4 in loss — a small,
# consistent, numerically-free win, kept per SURVEY §7.1 step 9
_BWD_WRITES_DEFAULT = "bf16"


def _make_bwd_kernel(d: int, block_b: int, constrained: bool,
                     pg=(False, False, False), out_dtype=jnp.float32):
  """Fused backward: the three elementwise gradient fields in one pass
  (the XLA digamma pair over b×d elements was ~40% of the wide-gene
  step; in-kernel it rides the same tiling as the forward).

  The kernel is HBM-write-bound (benchmarks/results_kernel_probe.md:
  ~28 B/element ≈ the measured elementwise floor), so per-gene (``pg``)
  parameters get their gradient REDUCED over rows inside the kernel —
  a (1, D) output instead of a (B, D) field XLA would write out and then
  re-read just to sum it. With any per-gene operand the grid is
  (columns, rows): rows iterate innermost, so each (1, block_d)
  accumulator's revisits are consecutive and it stays resident in VMEM
  for its entire reduction (the Mosaic-supported pattern — the forward's
  row-sum accumulates over inner columns the same way).

  ``out_dtype`` applies to the full (B, D) gradient fields only — the
  write-bound bytes; per-gene accumulators are always f32."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  block_d = min(_BLOCK_D, ((d + 127) // 128) * 128)
  n_col = -(-d // block_d)
  d_pad = n_col * block_d
  any_pg = any(pg)

  def kernel(x_ref, count_ref, logits_ref, gate_ref, g_ref,
             dcr_ref, dl_ref, dg_ref):
    f32 = lambda a: a.astype(jnp.float32)  # noqa: E731 (bf16 operand mode)
    d_cr, d_l, d_g = _zinb_grads_elem(
        f32(x_ref[:]), f32(count_ref[:]), f32(logits_ref[:]),
        f32(gate_ref[:]), constrained)
    g = g_ref[:]  # (block_b, 1) per-row cotangent
    i = pl.program_id(1) if any_pg else pl.program_id(0)
    for per_gene, ref, field in ((pg[0], dcr_ref, d_cr),
                                 (pg[1], dl_ref, d_l),
                                 (pg[2], dg_ref, d_g)):
      if per_gene:
        partial = jnp.sum(g * field, axis=0, keepdims=True)
        @pl.when(i == 0)
        def _init(ref=ref, partial=partial):
          ref[:] = partial
        @pl.when(i != 0)
        def _acc(ref=ref, partial=partial):
          ref[:] += partial
      else:
        ref[:] = (g * field).astype(out_dtype)

  def call(x, count_raw, logits, gate, g):
    b = x.shape[0]
    pad_cols = d_pad - d
    def pad(a):
      return jnp.pad(a, ((0, 0), (0, pad_cols))) if pad_cols else a
    n_row = max(1, b // block_b)
    if any_pg:
      grid = (n_col, n_row)   # rows innermost: per-gene accumulation dim
      ij = lambda fn: (lambda j, i: fn(i, j))
    else:
      grid = (n_row, n_col)
      ij = lambda fn: fn

    def spec(shape, fn):
      return pl.BlockSpec(shape, ij(fn), memory_space=pltpu.VMEM)

    full_spec = spec((block_b, block_d), lambda i, j: (i, j))
    gene_spec = spec((1, block_d), lambda i, j: (0, j))
    row_spec = spec((block_b, 1), lambda i, j: (i, 0))
    full_shape = jax.ShapeDtypeStruct((b, d_pad), out_dtype)
    gene_shape = jax.ShapeDtypeStruct((1, d_pad), jnp.float32)
    grads = pl.pallas_call(
        kernel,
        out_shape=tuple(gene_shape if p else full_shape for p in pg),
        grid=grid,
        in_specs=[full_spec] + [gene_spec if p else full_spec for p in pg]
                 + [row_spec],
        out_specs=tuple(gene_spec if p else full_spec for p in pg),
    )(pad(x), pad(count_raw), pad(logits), pad(gate), g[:, None])
    if pad_cols:
      grads = tuple(a[:, :d] for a in grads)
    return grads

  return call


def _pg_flags(x, count_raw, logits, gate):
  """Per-operand layout flags for the fused kernels, or None if some
  operand shape is outside (B, D) / per-gene (1, D)."""
  b, d = x.shape
  flags = []
  for p in (count_raw, logits, gate):
    s = jnp.shape(p)
    if s == (b, d):
      flags.append(False)
    elif s == (1, d):
      flags.append(True)
    else:
      return None
  return tuple(flags)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _zinb_rowsum(x, count_raw, logits, gate, constrained):
  # the fused kernel tiles (B, D) operands and broadcasts per-gene (1, D)
  # rows in VMEM; any other broadcast shape falls back to the XLA path,
  # which handles general broadcasting — mirroring the backward's guard
  pg = _pg_flags(x, count_raw, logits, gate) if x.ndim == 2 else None
  if not pallas_available() or pg is None or x.shape[0] % 8 != 0:
    return _rowsum_ref(x, count_raw, logits, gate, constrained)
  b, d = x.shape
  bf16_ops = any(jnp.asarray(a).dtype == jnp.bfloat16
                 for a in (count_raw, logits, gate))
  bb = _block_b(b, bf16=bf16_ops)
  if bb is None:
    return _rowsum_ref(x, count_raw, logits, gate, constrained)
  call = _make_kernel(d, bb, constrained, pg)
  return call(x, count_raw, logits, gate)


def _zinb_fwd(x, count_raw, logits, gate, constrained):
  out = _zinb_rowsum(x, count_raw, logits, gate, constrained)
  return out, (x, count_raw, logits, gate)


def _unbroadcast(grad, shape):
  """Reduce a full-shape gradient back to a broadcast input's shape."""
  if grad.shape == tuple(shape):
    return grad
  extra = grad.ndim - len(shape)
  if extra > 0:
    grad = jnp.sum(grad, axis=tuple(range(extra)))
  axes = tuple(i for i, s in enumerate(shape) if s == 1)
  if axes:
    grad = jnp.sum(grad, axis=axes, keepdims=True)
  return grad


def _zinb_bwd(constrained, res, g):
  """Hand-derived elementwise gradients (see _zinb_grads_elem); fused into
  a Pallas kernel when the forward also ran fused. Per-gene (1, D)
  parameters get their gradient reduced over rows INSIDE the kernel —
  see _make_bwd_kernel."""
  x, count_raw, logits, gate = res
  pg = (_pg_flags(x, count_raw, logits, gate)
        if x.ndim == 2 and g.ndim == 1 else None)
  if pg is not None and pallas_available() and x.shape[0] % 8 == 0:
    # bf16-operand mode: cotangents MUST match the (bf16) primal dtype,
    # which also forces the halved writes; otherwise the write dtype is
    # the measured-default policy
    bf16_ops = any(jnp.asarray(a).dtype == jnp.bfloat16
                   for a in (count_raw, logits, gate))
    out_dtype = jnp.bfloat16 if bf16_ops else _bwd_write_dtype()
    bb = _block_b(x.shape[0], bf16=bf16_ops)
    if bb is not None:
      call = _make_bwd_kernel(x.shape[1], bb, constrained,
                              pg, out_dtype=out_dtype)
      d_cr, d_l, d_g = call(x, count_raw, logits, gate, g)
      # custom_vjp cotangents must match primal dtype; for f32 primals
      # with bf16 writes the f32 convert is a pure elementwise op XLA
      # fuses into each consumer's operand read (the decoder matmul
      # transposes), so the bf16 array stays the only materialized
      # gradient buffer — the write savings survive
      outs = []
      for a, prim in ((d_cr, count_raw), (d_l, logits), (d_g, gate)):
        want = jnp.asarray(prim).dtype
        outs.append(a if a.dtype == want else a.astype(want))
      return (None, *outs)
  d_r, d_l, d_g = _zinb_grads_elem(
      x, *(jnp.asarray(a, jnp.float32) for a in (count_raw, logits, gate)),
      constrained)
  gb = jnp.expand_dims(g, -1)               # per-row cotangent → per-element
  # cotangent dtype must match the primal (bf16-operand mode primals)
  return (None, *(
      _unbroadcast(gb * d, jnp.shape(p)).astype(jnp.asarray(p).dtype)
      for d, p in ((d_r, count_raw), (d_l, logits), (d_g, gate))))


_zinb_rowsum.defvjp(_zinb_fwd, _zinb_bwd)


def _norm_param(p, x):
  """Canonicalize a parameter to (B, D) or per-gene (1, D) next to a 2-D
  ``x`` so the fused kernels can broadcast it in VMEM; other shapes pass
  through to the jnp fallback's general broadcasting."""
  p = jnp.asarray(p)
  if x.ndim == 2:
    if p.ndim == 1 and p.shape[0] == x.shape[1]:
      return p[None]
    if p.ndim == 0:
      return jnp.full((1, x.shape[1]), p, p.dtype)
  return p


def zinb_log_prob_rowsum(x, count_raw, logits, gate_logits,
                         constrained: bool = False):
  """Per-row Σ_genes ZINB log-pmf; fused on TPU, jnp fallback elsewhere.
  Parameters may be (B, D), per-gene (D,)/(1, D), or scalar — per-gene
  operands are broadcast inside the kernel, never materialized in HBM."""
  return _zinb_rowsum(x, _norm_param(count_raw, x), _norm_param(logits, x),
                      _norm_param(gate_logits, x), constrained)


# Effective −∞ for the no-inflation gate. Must be far below any reachable
# NB log-prob at zero (−r·softplus(logits) can hit −10⁴ for wide heads):
# a merely-moderate value like −40 FLOORS at_zero = logaddexp(gate, nb0)
# at gate whenever nb0 < gate, silently clamping the loss and damping its
# gradients on observed-zero/high-mean elements. −1e30 keeps logaddexp and
# softplus exact in float32 (logaddexp(−1e30, nb0) ≡ nb0).
_NB_GATE = -1e30


def nb_log_prob_rowsum(x, count_raw, logits, constrained: bool = False):
  """Gate-free NB variant (gate −∞ ⇒ no inflation): reuse the ZINB kernel
  with an effectively −∞ gate (see _NB_GATE). The gate is a per-gene
  (1, D) constant row, so it costs one VMEM row instead of a (B, D) HBM
  operand in the forward and a (B, D) gradient write in the backward."""
  gate = (jnp.full((1, x.shape[-1]), _NB_GATE, jnp.float32)
          if x.ndim == 2 else jnp.full_like(logits, _NB_GATE))
  return _zinb_rowsum(x, _norm_param(count_raw, x), _norm_param(logits, x),
                      gate, constrained)


def _disp_to_logits(mu, theta, eps: float = 1e-8):
  """Mean/dispersion → (total_count, logits): NB(μ, θ) is exactly
  NB(total_count=θ, logits=log μ − log θ) — p = μ/(μ+θ)."""
  return jnp.log(mu + eps) - jnp.log(theta + eps)


def zinbd_log_prob_rowsum(x, mu, theta, gate_logits):
  """ZINB in scVI's mean/dispersion parameterization (the 'zinbd' head and
  SCVI's decode path) through the same fused kernel."""
  return _zinb_rowsum(x, theta, _disp_to_logits(mu, theta), gate_logits,
                      True)


def nbd_log_prob_rowsum(x, mu, theta):
  """NB mean/dispersion variant ('nbd')."""
  return nb_log_prob_rowsum(x, theta, _disp_to_logits(mu, theta), True)
