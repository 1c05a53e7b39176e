"""Fused-op numerics: Lanczos lgamma and the ZINB row-sum (CPU fallback path
— the Pallas TPU compilation itself is exercised by bench/graft runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sisua_tpu.ops.zinb_pallas import (_lgamma_lanczos, _lgamma_stirling,
                                       _rowsum_ref, _zinb_elem,
                                       nb_log_prob_rowsum,
                                       zinb_log_prob_rowsum)


@pytest.mark.parametrize("lgamma", [_lgamma_lanczos, _lgamma_stirling],
                         ids=["lanczos", "stirling"])
def test_kernel_lgamma_accuracy(lgamma):
  # include tiny arguments: the old series computed z = x−1 then z+i, and
  # (1e-8 − 1) + 1 rounds to exactly 0 in f32 → division by zero → +inf.
  # The Stirling variant's normalized shift product must also survive both
  # extremes (overflow at large x, underflow of Π(x+k)/y at tiny x).
  x = jnp.asarray(np.concatenate([
      [1e-8, 1e-6, 1e-4, 1e-2, 0.1, 0.5],
      np.linspace(0.01, 10, 300), np.linspace(10, 1e6, 300)]), jnp.float32)
  got = np.asarray(lgamma(x))
  assert np.isfinite(got).all()
  rel = np.abs(got - np.asarray(jax.lax.lgamma(x)))
  rel /= np.maximum(np.abs(np.asarray(jax.lax.lgamma(x))), 1.0)
  assert rel.max() < 2e-5


def test_extreme_dispersion_stability():
  """Regression: tiny θ must not produce −inf (the inf-training-loss bug)
  and huge θ must converge to the Poisson limit, in BOTH the fused-kernel
  formula and the distribution math."""
  from scipy import stats
  import sisua_tpu.dist as D
  from sisua_tpu.ops.zinb_pallas import nbd_log_prob_rowsum
  x = jnp.asarray([[1.0], [7.0], [0.0], [100.0]], jnp.float32)
  # tiny dispersion: finite everywhere
  mu = jnp.full((4, 1), 2.0)
  th_tiny = jnp.full((4, 1), 1e-8)
  k = np.asarray(nbd_log_prob_rowsum(x, mu, th_tiny))
  d = np.asarray(D.NegativeBinomialDisp(loc=mu, disp=th_tiny).log_prob(x))
  assert np.isfinite(k).all() and np.isfinite(d).all()
  # huge dispersion: NB(μ, θ→∞) → Poisson(μ)
  th_huge = jnp.full((4, 1), 1e8)
  d = np.asarray(D.NegativeBinomialDisp(loc=mu, disp=th_huge).log_prob(x))
  ref = stats.poisson.logpmf(np.asarray(x).ravel(), 2.0)
  np.testing.assert_allclose(d.ravel(), ref, rtol=1e-3)
  k = np.asarray(nbd_log_prob_rowsum(x, mu, th_huge)).ravel()
  np.testing.assert_allclose(k, ref, rtol=1e-3)


def test_zinb_elem_lanczos_matches_lax():
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.poisson(3, (32, 64)).astype(np.float32))
  cr = jnp.asarray(rng.normal(0.5, 1, (32, 64)).astype(np.float32))
  lg = jnp.asarray(rng.normal(0, 1, (32, 64)).astype(np.float32))
  gt = jnp.asarray(rng.normal(0, 1, (32, 64)).astype(np.float32))
  a = _zinb_elem(x, cr, lg, gt, False)
  b = _zinb_elem(x, cr, lg, gt, False, lgamma=_lgamma_lanczos)
  assert float(jnp.abs(a - b).max()) < 1e-3


def test_rowsum_matches_distribution_math():
  import sisua_tpu.dist as D
  rng = np.random.default_rng(1)
  x = jnp.asarray(rng.poisson(3, (16, 40)).astype(np.float32))
  cr = jnp.asarray(rng.normal(0.5, 1, (16, 40)).astype(np.float32))
  lg = jnp.asarray(rng.normal(0, 1, (16, 40)).astype(np.float32))
  gt = jnp.asarray(rng.normal(0, 1, (16, 40)).astype(np.float32))
  got = zinb_log_prob_rowsum(x, cr, lg, gt)
  r = jnp.exp(jnp.clip(cr, -15, 15))
  dist = D.Independent(D.ZeroInflated(
      count_distribution=D.NegativeBinomial(total_count=r, logits=lg),
      gate_logits=gt), 1)
  np.testing.assert_allclose(np.asarray(got), np.asarray(dist.log_prob(x)),
                             rtol=1e-4)
  # NB variant == ZINB with gate → −∞
  nb = D.Independent(D.NegativeBinomial(total_count=r, logits=lg), 1)
  got_nb = nb_log_prob_rowsum(x, cr, lg)
  np.testing.assert_allclose(np.asarray(got_nb), np.asarray(nb.log_prob(x)),
                             rtol=1e-4)


def test_rowsum_gradients():
  rng = np.random.default_rng(2)
  x = jnp.asarray(rng.poisson(3, (8, 24)).astype(np.float32))
  cr = jnp.asarray(rng.normal(0, 1, (8, 24)).astype(np.float32))
  lg = jnp.asarray(rng.normal(0, 1, (8, 24)).astype(np.float32))
  gt = jnp.asarray(rng.normal(0, 1, (8, 24)).astype(np.float32))
  g1 = jax.grad(lambda c: zinb_log_prob_rowsum(x, c, lg, gt).sum())(cr)
  g2 = jax.grad(lambda c: _rowsum_ref(x, c, lg, gt, False).sum())(cr)
  np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_rowsum_analytic_gradients_exhaustive():
  """The hand-derived backward must match autodiff of the reference math
  for all three inputs, both parameterizations, with zero counts, random
  cotangents, and dispersions straddling the large-r asymptotic switch."""
  rng = np.random.default_rng(9)
  B, Dm = 8, 24
  x = jnp.asarray(rng.poisson(2, (B, Dm)).astype(np.float32))
  x = x.at[:, :8].set(0.0)  # plenty of exact zeros
  gt = jnp.asarray(rng.normal(0, 2, (B, Dm)).astype(np.float32))
  ct = jnp.asarray(rng.normal(0, 1, (B,)).astype(np.float32))  # cotangent

  for constrained in (False, True):
    if constrained:
      cr = jnp.asarray(
          np.concatenate([rng.gamma(2, 2, (B, Dm - 4)),
                          [[1e-9, 0.5, 2e6, 8e6]] * B], axis=1),
          jnp.float32)  # clamp region + both sides of the 1e6 switch
    else:
      cr = jnp.asarray(rng.normal(0, 2, (B, Dm)).astype(np.float32))
    lg = jnp.asarray(rng.normal(0, 2, (B, Dm)).astype(np.float32))

    def fused(c, l, g):
      from sisua_tpu.ops.zinb_pallas import _zinb_rowsum
      return jnp.vdot(_zinb_rowsum(x, c, l, g, constrained), ct)

    def ref(c, l, g):
      return jnp.vdot(_rowsum_ref(x, c, l, g, constrained), ct)

    got = jax.grad(fused, argnums=(0, 1, 2))(cr, lg, gt)
    exp = jax.grad(ref, argnums=(0, 1, 2))(cr, lg, gt)
    for name, a, b in zip("r logits gate".split(), got, exp):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5,
          err_msg=f"{name} constrained={constrained}")


def test_objective_fast_path_consistency(sco):
  """ELBO through _fast_log_prob must equal plain dist math (CPU → fallback,
  but the dispatch predicate itself is exercised)."""
  from sisua_tpu.models import VAE, RVmeta, NetConf
  from sisua_tpu.models.objective import _fast_log_prob
  import sisua_tpu.dist as D
  rng = np.random.default_rng(3)
  x = jnp.asarray(rng.poisson(2, (16, 30)).astype(np.float32))
  r = jnp.exp(jnp.asarray(rng.normal(0, 1, (16, 30)), jnp.float32))
  dist = D.Independent(D.ZeroInflated(
      count_distribution=D.NegativeBinomial(total_count=r,
                                            logits=jnp.zeros((16, 30))),
      gate_logits=jnp.zeros((16, 30))), 1)
  np.testing.assert_allclose(np.asarray(_fast_log_prob(dist, x)),
                             np.asarray(dist.log_prob(x)), rtol=1e-5)


def test_fused_likelihood_env_override(monkeypatch):
  """SISUA_TPU_FUSED_LIKELIHOOD=off must route around the Pallas kernel
  entirely; =on forces routing below the size gate (numerics unchanged —
  on CPU the pallas_available() check still falls back to dist math)."""
  from sisua_tpu.models import objective
  from sisua_tpu.models.objective import _fast_log_prob
  import sisua_tpu.dist as D
  rng = np.random.default_rng(7)
  x = jnp.asarray(rng.poisson(2, (16, 30)).astype(np.float32))
  r = jnp.exp(jnp.asarray(rng.normal(0, 1, (16, 30)), jnp.float32))
  dist = D.Independent(D.ZeroInflated(
      count_distribution=D.NegativeBinomial(total_count=r,
                                            logits=jnp.zeros((16, 30))),
      gate_logits=jnp.zeros((16, 30))), 1)
  ref = np.asarray(dist.log_prob(x))
  for mode in ("off", "on", "auto"):
    monkeypatch.setenv("SISUA_TPU_FUSED_LIKELIHOOD", mode)
    np.testing.assert_allclose(np.asarray(_fast_log_prob(dist, x)), ref,
                               rtol=1e-5)
  monkeypatch.setenv("SISUA_TPU_FUSED_LIKELIHOOD", "nonsense")
  assert objective._pallas_mode() == "nonsense"  # treated as not-off/on


def test_fused_likelihood_routing():
  """VERDICT r2 #4 history: routing was briefly amortization-aware
  (planned-steps × per-step delta vs compile delta) while XLA held a ~5%
  wide-regime steady-state edge. The round-3 interleaved re-measurement
  (both epoch layouts, both dtypes, two sessions — RESULTS.md wide-gene
  section) shows the Pallas fused forward+analytic-backward is now faster
  per step in EVERY regime above the element gate AND compiles 8–70×
  faster, so 'auto' is Pallas-above-the-gate; this pins that decision
  table."""
  from sisua_tpu.models.objective import (_PALLAS_MIN_ELEMENTS,
                                          route_fused_likelihood)
  big = 10 * _PALLAS_MIN_ELEMENTS
  # explicit mode wins over everything
  assert route_fused_likelihood(100, mode="on")
  assert not route_fused_likelihood(big, mode="off")
  # small shapes: XLA is faster per step AND compiles fast
  assert not route_fused_likelihood(_PALLAS_MIN_ELEMENTS - 1, mode="auto")
  # at/above the gate: Pallas, regardless of run length or feature width
  assert route_fused_likelihood(_PALLAS_MIN_ELEMENTS, mode="auto")
  assert route_fused_likelihood(big, mode="auto")


def test_fused_routing_skips_mc_sample_dims(monkeypatch):
  """Training-time MC (mc_samples>1) gives distribution params a leading
  (S, …) dim while the target x stays 2-D; the Pallas route would then
  rank-reduce-broadcast params to x.shape and crash at trace time. The
  gate must fall back to dist math whenever the params carry sample dims."""
  from sisua_tpu.models import objective
  from sisua_tpu.models.objective import _fast_log_prob
  from sisua_tpu.ops import zinb_pallas as zp
  import sisua_tpu.dist as D
  monkeypatch.setenv("SISUA_TPU_FUSED_LIKELIHOOD", "on")
  monkeypatch.setattr(zp, "pallas_available", lambda: True)

  def _boom(*a, **k):
    raise AssertionError("MC-shaped params must not reach the kernel")
  monkeypatch.setattr(zp, "zinb_log_prob_rowsum", _boom)
  monkeypatch.setattr(zp, "nb_log_prob_rowsum", _boom)
  rng = np.random.default_rng(5)
  S, B, Dm = 3, 16, 30
  x = jnp.asarray(rng.poisson(2, (B, Dm)).astype(np.float32))
  r = jnp.exp(jnp.asarray(rng.normal(0, 1, (S, B, Dm)), jnp.float32))
  dist = D.Independent(D.ZeroInflated(
      count_distribution=D.NegativeBinomial(total_count=r,
                                            logits=jnp.zeros((S, B, Dm))),
      gate_logits=jnp.zeros((S, B, Dm))), 1)
  lp = _fast_log_prob(dist, x)       # must take the dist-math path
  assert lp.shape == (S, B)
  np.testing.assert_allclose(np.asarray(lp), np.asarray(dist.log_prob(x)),
                             rtol=1e-6)
  # 2-D params still route (the kernel stub gets hit)
  dist2 = D.Independent(D.ZeroInflated(
      count_distribution=D.NegativeBinomial(total_count=r[0],
                                            logits=jnp.zeros((B, Dm))),
      gate_logits=jnp.zeros((B, Dm))), 1)
  with pytest.raises(AssertionError, match="must not reach"):
    _fast_log_prob(dist2, x)


def test_nb_rowsum_extreme_params_not_floored():
  """Regression: the NB-via-ZINB emulation used gate=-40, flooring the
  x=0 log-prob at ~-40 whenever the true NB zero-prob was below it
  (theta=10, mu=1000 → -46.15/element) and damping its gradients."""
  import sisua_tpu.dist as D
  from sisua_tpu.ops.zinb_pallas import nbd_log_prob_rowsum
  x = jnp.zeros((8, 4), jnp.float32)
  mu = jnp.full((8, 4), 1000.0)
  th = jnp.full((8, 4), 10.0)
  ref = D.Independent(D.NegativeBinomialDisp(loc=mu, disp=th), 1).log_prob(x)
  got = nbd_log_prob_rowsum(x, mu, th)
  np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)
  assert float(got[0]) < -180.0  # the floored version gave ~-160
  g = jax.grad(lambda m: nbd_log_prob_rowsum(x, m, th).sum())(mu)
  assert np.abs(np.asarray(g)).min() > 1e-3  # gradients not damped


def test_disp_parameterization_remap_exact():
  """NB(mean μ, dispersion θ) == NB(total_count=θ, logits=log μ − log θ):
  the remap that routes 'zinbd'/'nbd' heads through the fused kernel."""
  import sisua_tpu.dist as D
  from sisua_tpu.ops.zinb_pallas import (_disp_to_logits,
                                         _rowsum_ref)
  rng = np.random.default_rng(4)
  x = jnp.asarray(rng.poisson(3.0, (16, 24)).astype(np.float32))
  mu = jnp.asarray(rng.gamma(2.0, 2.0, (16, 24)).astype(np.float32))
  theta = jnp.asarray(rng.gamma(3.0, 1.0, (16, 24)).astype(np.float32))
  gate = jnp.asarray(rng.normal(0, 1, (16, 24)).astype(np.float32))
  ref = D.Independent(
      D.ZeroInflated(
          count_distribution=D.NegativeBinomialDisp(loc=mu, disp=theta),
          gate_logits=gate), 1).log_prob(x)
  remapped = _rowsum_ref(x, theta, _disp_to_logits(mu, theta), gate,
                         constrained=True)
  np.testing.assert_allclose(np.asarray(remapped), np.asarray(ref),
                             rtol=2e-5, atol=2e-4)
  # gate-free NBD
  ref_nb = D.Independent(
      D.NegativeBinomialDisp(loc=mu, disp=theta), 1).log_prob(x)
  remap_nb = _rowsum_ref(x, theta, _disp_to_logits(mu, theta),
                         jnp.full_like(gate, -40.0), constrained=True)
  np.testing.assert_allclose(np.asarray(remap_nb), np.asarray(ref_nb),
                             rtol=2e-5, atol=2e-4)


def test_rowsum_broadcast_params_fall_back():
  """Per-gene dispersion (theta shape (D,)) must give the same rowsum as a
  full (B, D) broadcast — on TPU via the in-kernel per-gene path, on CPU
  via the jnp fallback's broadcasting."""
  from sisua_tpu.ops import zinb_pallas as zp
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.poisson(3.0, (16, 12)).astype(np.float32))
  mu = jnp.asarray(rng.uniform(1, 5, (16, 12)).astype(np.float32))
  theta = jnp.asarray(rng.uniform(0.5, 2, (12,)).astype(np.float32))
  out = zp.nbd_log_prob_rowsum(x, mu, theta)
  full = zp.nbd_log_prob_rowsum(x, mu, jnp.broadcast_to(theta, x.shape))
  np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                             rtol=1e-5, atol=1e-5)


def test_rowsum_per_gene_value_and_grad_layouts():
  """Per-gene (D,)/(1, D) and scalar parameter layouts must match the full
  (B, D) broadcast in BOTH value and gradients, with per-gene gradients
  landing back in the per-gene shape (the in-kernel reduction contract:
  d(1,D) == row-sum of the full d(B,D))."""
  from sisua_tpu.ops import zinb_pallas as zp
  rng = np.random.default_rng(11)
  B, Dm = 16, 24
  x = jnp.asarray(rng.poisson(2.0, (B, Dm)).astype(np.float32))
  x = x.at[:, :6].set(0.0)
  lg_full = jnp.asarray(rng.normal(0, 1, (B, Dm)).astype(np.float32))
  gt_full = jnp.asarray(rng.normal(0, 1, (B, Dm)).astype(np.float32))
  ct = jnp.asarray(rng.normal(0, 1, (B,)).astype(np.float32))

  for constrained in (False, True):
    cr_row = jnp.asarray(
        (rng.gamma(2, 1, (Dm,)) if constrained
         else rng.normal(0, 1, (Dm,))).astype(np.float32))

    def f_row(c):
      return jnp.vdot(zp.zinb_log_prob_rowsum(x, c, lg_full, gt_full,
                                              constrained), ct)

    def f_full(c):
      return jnp.vdot(zp.zinb_log_prob_rowsum(
          x, jnp.broadcast_to(c, x.shape), lg_full, gt_full, constrained),
          ct)

    np.testing.assert_allclose(float(f_row(cr_row)), float(f_full(cr_row)),
                               rtol=1e-5)
    g_row = jax.grad(f_row)(cr_row)
    g_full = jax.grad(f_full)(cr_row)
    assert g_row.shape == (Dm,)
    np.testing.assert_allclose(np.asarray(g_row), np.asarray(g_full),
                               rtol=2e-4, atol=1e-5,
                               err_msg=f"constrained={constrained}")

  # scalar + (1, D) layouts through the NB wrapper (per-gene constant gate)
  th_scalar = jnp.float32(1.3)
  a = zp.nb_log_prob_rowsum(x, th_scalar, lg_full, constrained=True)
  b = zp.nb_log_prob_rowsum(x, jnp.full_like(x, th_scalar), lg_full,
                            constrained=True)
  np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
  c = zp.zinb_log_prob_rowsum(x, th_scalar, lg_full,
                              gt_full[:1], constrained=True)
  d = zp.zinb_log_prob_rowsum(x, jnp.full_like(x, th_scalar), lg_full,
                              jnp.broadcast_to(gt_full[:1], x.shape),
                              constrained=True)
  np.testing.assert_allclose(np.asarray(c), np.asarray(d), rtol=1e-5)


def test_int16_exact_int_min():
  from sisua_tpu.ops.sparse import int16_exact
  assert not int16_exact(np.array([0, -2**31], dtype=np.int32))
  assert not int16_exact(np.array([-2**63], dtype=np.int64))


def test_fused_routing_displog(monkeypatch):
  """The log-space NB (NegativeBinomialDispLog — SCVI's single-dispersion
  decode) must route through the fused kernel with logits computed as
  log μ − log θ, numerically matching the dist math."""
  from sisua_tpu.models.objective import _fast_log_prob
  from sisua_tpu.ops import zinb_pallas as zp
  import sisua_tpu.dist as D
  rng = np.random.default_rng(13)
  B, Dm = 16, 30
  x = jnp.asarray(rng.poisson(2, (B, Dm)).astype(np.float32))
  log_mu = jnp.asarray(rng.normal(0, 1, (B, Dm)), jnp.float32)
  th = jnp.exp(jnp.asarray(rng.normal(0, 0.5, (1, Dm)), jnp.float32))
  gt = jnp.asarray(rng.normal(0, 1, (B, Dm)), jnp.float32)
  dist = D.Independent(D.ZeroInflated(
      count_distribution=D.NegativeBinomialDispLog(log_loc=log_mu, disp=th),
      gate_logits=gt), 1)
  ref = np.asarray(dist.log_prob(x))
  # CPU fallback value parity through the routing entry
  monkeypatch.setenv("SISUA_TPU_FUSED_LIKELIHOOD", "on")
  np.testing.assert_allclose(np.asarray(_fast_log_prob(dist, x)), ref,
                             rtol=1e-4, atol=1e-4)
  # the kernel IS reached when pallas reports available (stub proves it)
  calls = {}
  monkeypatch.setattr(zp, "pallas_available", lambda: True)
  def _grab(x_, r_, logits_, gate_, constrained=False):
    calls["r"] = r_; calls["logits"] = logits_
    return zp._rowsum_ref(x_, r_, logits_, gate_, constrained)
  monkeypatch.setattr(zp, "zinb_log_prob_rowsum", _grab)
  got = np.asarray(_fast_log_prob(dist, x))
  np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
  assert calls["r"].shape == (1, Dm)          # per-gene θ stayed a row
  np.testing.assert_allclose(
      np.asarray(calls["logits"]),
      np.asarray(log_mu - jnp.log(th + 1e-8)), rtol=1e-6)


def test_fused_routing_loglog(monkeypatch):
  """The fully-log-space NB (NegativeBinomialLog — SCVI/TotalVI 'full'
  dispersion decode) must route through the fused kernel with the RAW
  log θ as the count operand and constrained=False (the kernel
  exponentiates in VMEM), numerically matching the dist math."""
  from sisua_tpu.models.objective import _fast_log_prob
  from sisua_tpu.ops import zinb_pallas as zp
  import sisua_tpu.dist as D
  rng = np.random.default_rng(17)
  B, Dm = 16, 30
  x = jnp.asarray(rng.poisson(2, (B, Dm)).astype(np.float32))
  log_mu = jnp.asarray(rng.normal(0, 1, (B, Dm)), jnp.float32)
  log_th = jnp.asarray(rng.normal(0, 0.5, (B, Dm)), jnp.float32)
  gt = jnp.asarray(rng.normal(0, 1, (B, Dm)), jnp.float32)
  dist = D.Independent(D.ZeroInflated(
      count_distribution=D.NegativeBinomialLog(log_loc=log_mu,
                                               log_disp=log_th),
      gate_logits=gt), 1)
  ref = np.asarray(dist.log_prob(x))
  # CPU fallback value parity through the routing entry
  monkeypatch.setenv("SISUA_TPU_FUSED_LIKELIHOOD", "on")
  np.testing.assert_allclose(np.asarray(_fast_log_prob(dist, x)), ref,
                             rtol=1e-4, atol=1e-4)
  # the kernel IS reached and receives raw log θ + constrained=False
  calls = {}
  monkeypatch.setattr(zp, "pallas_available", lambda: True)
  def _grab(x_, r_, logits_, gate_, constrained=True):
    calls["r"] = r_; calls["logits"] = logits_
    calls["constrained"] = constrained
    return zp._rowsum_ref(x_, r_, logits_, gate_, constrained)
  monkeypatch.setattr(zp, "zinb_log_prob_rowsum", _grab)
  got = np.asarray(_fast_log_prob(dist, x))
  np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
  assert calls["constrained"] is False
  np.testing.assert_allclose(np.asarray(calls["r"]), np.asarray(log_th),
                             rtol=1e-6)
  np.testing.assert_allclose(np.asarray(calls["logits"]),
                             np.asarray(log_mu - log_th), rtol=1e-6)
  # gradient parity through the custom-VJP kernel emulation path
  monkeypatch.undo()
  monkeypatch.setenv("SISUA_TPU_FUSED_LIKELIHOOD", "on")
  g_fast = jax.grad(lambda lt: jnp.sum(_fast_log_prob(
      D.Independent(D.ZeroInflated(
          count_distribution=D.NegativeBinomialLog(log_loc=log_mu,
                                                   log_disp=lt),
          gate_logits=gt), 1), x)))(log_th)
  g_ref = jax.grad(lambda lt: jnp.sum(D.Independent(D.ZeroInflated(
      count_distribution=D.NegativeBinomialLog(log_loc=log_mu, log_disp=lt),
      gate_logits=gt), 1).log_prob(x)))(log_th)
  np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                             rtol=5e-3, atol=1e-4)


def test_bf16_operand_mode_fallback_and_cotangents():
  """bf16-operand mode (SISUA_TPU_FWD_OPERANDS=bf16): on non-TPU backends
  the jnp fallback must accept bf16 parameter fields, produce finite
  values within bf16 tolerance of f32, and return cotangents whose dtypes
  MATCH the primals (custom_vjp contract; per-gene f32 rows stay f32)."""
  import jax
  import jax.numpy as jnp

  from sisua_tpu.ops.zinb_pallas import zinb_log_prob_rowsum

  rng = np.random.default_rng(3)
  x = jnp.asarray(rng.poisson(2.0, (16, 64)).astype(np.float32))
  r32 = jnp.exp(jnp.asarray(rng.normal(0, 0.5, (16, 64)), jnp.float32))
  l32 = jnp.asarray(rng.normal(0, 1, (16, 64)), jnp.float32)
  g32 = jnp.asarray(rng.normal(-2, 1, (16, 64)), jnp.float32)

  def loss(r, l, g):
    return jnp.sum(zinb_log_prob_rowsum(x, r, l, g, constrained=True))

  vf, gf = jax.value_and_grad(loss, argnums=(0, 1, 2))(r32, l32, g32)
  vb, gb = jax.value_and_grad(loss, argnums=(0, 1, 2))(
      r32.astype(jnp.bfloat16), l32.astype(jnp.bfloat16),
      g32.astype(jnp.bfloat16))
  assert [g.dtype for g in gb] == [jnp.bfloat16] * 3
  assert abs(float(vb) - float(vf)) / abs(float(vf)) < 0.01
  for a, b in zip(gf, gb):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-12) < 0.03
  # mixed: per-gene f32 dispersion keeps an f32 cotangent
  r_pg = jnp.ones((1, 64), jnp.float32)
  _, gm = jax.value_and_grad(loss, argnums=(0, 1, 2))(
      r_pg, l32.astype(jnp.bfloat16), g32.astype(jnp.bfloat16))
  assert gm[0].dtype == jnp.float32
  assert gm[1].dtype == jnp.bfloat16 and gm[2].dtype == jnp.bfloat16
