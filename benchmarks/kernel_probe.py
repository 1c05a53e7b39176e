"""ZINB-kernel microbenchmark: where the wide-regime step time really goes.

Measures, on the real chip, in ONE session (interleaved reps so the ±30%
tunnel swing cancels):

  * `sol_mem`    — 4-operand elementwise rowsum kernel with 1 FMA/element:
                   the HBM-bound speed-of-light for the ZINB kernel's
                   traffic pattern (4 × f32 reads/element).
  * `sol_fma64`  — same tiling, 64 chained FMAs/element: the VPU-bound
                   speed-of-light (reports achieved f32 GFLOP/s).
  * `lg_*`       — one lgamma/element through the same tiling, for each
                   in-kernel lgamma evaluation (lanczos vs stirling).
  * `zinb_fwd_*` / `zinb_fwdbwd_*` — the production fused rowsum forward
                   (and +backward) per lgamma variant.
  * tile sweep   — block_b × block_d grid on the winning variant.

Every timed window wraps R kernel invocations in one lax.scan (per-call
dispatch over the axon tunnel is ~ms — scan amortizes it) with a
carry-dependent input perturbation so XLA cannot hoist the kernel out of
the loop, and syncs by FETCHING the accumulator (block_until_ready over
the tunnel acks dispatch without awaiting execution).

  python benchmarks/kernel_probe.py --out benchmarks/results_kernel_probe.md
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

B = int(os.environ.get("PROBE_B", 1024))
D = int(os.environ.get("PROBE_D", 33_000))
R = int(os.environ.get("PROBE_R", 32))
REPS = int(os.environ.get("PROBE_REPS", 3))


def _operands():
  import jax
  import jax.numpy as jnp
  k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 4)
  x = jax.random.poisson(k0, 2.0, (B, D)).astype(jnp.float32)
  r = jnp.exp(jax.random.normal(k1, (B, D)) * 0.5)       # dispersion θ
  l = jax.random.normal(k2, (B, D))                      # NB logits
  g = jax.random.normal(k3, (B, D)) - 2.0                # gate logits
  return x, r, l, g


def _scan_window(fn):
  """R invocations of fn(x, r, l, g)->(B,) in one executable; the carry
  perturbs an operand so the kernel cannot be hoisted (loop-invariant)."""
  import jax
  import jax.numpy as jnp

  @jax.jit
  def window(x, r, l, g):
    def body(acc, _):
      out = fn(x, r + acc * 1e-30, l, g)
      return jnp.sum(out), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=R)
    return acc

  return window


def _time_window(window, args, n=3):
  import numpy as np
  ts = []
  float(window(*args))  # compile + warm
  for _ in range(n):
    t0 = time.perf_counter()
    float(window(*args))
    ts.append((time.perf_counter() - t0) / R)
  return float(np.median(ts))


def _elemwise_probe_kernel(n_fma: int):
  """4-input rowsum through the production tiling, n_fma FMAs/element."""
  import jax
  import jax.numpy as jnp
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  from sisua_tpu.ops import zinb_pallas as zp

  block_d = min(zp._BLOCK_D, ((D + 127) // 128) * 128)
  n_col = -(-D // block_d)

  def kernel(x_ref, a_ref, b_ref, c_ref, out_ref):
    j = pl.program_id(1)
    acc = x_ref[:]
    a, bb = a_ref[:], b_ref[:]
    for _ in range(n_fma):
      acc = acc * a + bb
    col = j * block_d + jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    acc = jnp.where(col < D, acc, 0.0)
    partial = jnp.sum(acc, axis=1, keepdims=True)
    @pl.when(j == 0)
    def _init():
      out_ref[:] = partial
    @pl.when(j != 0)
    def _acc():
      out_ref[:] += partial

  def call(x, a, b, c):
    bb = zp._block_b(B)
    d_pad = n_col * block_d
    pad_cols = d_pad - D
    def pad(t):
      return jnp.pad(t, ((0, 0), (0, pad_cols))) if pad_cols else t
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        grid=(B // bb, n_col),
        in_specs=[pl.BlockSpec((bb, block_d), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((bb, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
    )(pad(x), pad(a), pad(b), pad(c))
    return out[:, 0]

  return call


def _lgamma_probe_kernel(which: str):
  """One lgamma(x + r)/element through the production tiling."""
  import jax
  import jax.numpy as jnp
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  from sisua_tpu.ops import zinb_pallas as zp
  lg = (zp._lgamma_lanczos if which == "lanczos" else zp._lgamma_stirling)

  block_d = min(zp._BLOCK_D, ((D + 127) // 128) * 128)
  n_col = -(-D // block_d)

  def kernel(x_ref, a_ref, b_ref, c_ref, out_ref):
    j = pl.program_id(1)
    v = lg(x_ref[:] + a_ref[:] + 1.0)
    col = j * block_d + jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    v = jnp.where(col < D, v, 0.0)
    partial = jnp.sum(v, axis=1, keepdims=True)
    @pl.when(j == 0)
    def _init():
      out_ref[:] = partial
    @pl.when(j != 0)
    def _acc():
      out_ref[:] += partial

  def call(x, a, b, c):
    bb = zp._block_b(B)
    d_pad = n_col * block_d
    pad_cols = d_pad - D
    def pad(t):
      return jnp.pad(t, ((0, 0), (0, pad_cols))) if pad_cols else t
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        grid=(B // bb, n_col),
        in_specs=[pl.BlockSpec((bb, block_d), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((bb, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
    )(pad(x), pad(a), pad(b), pad(c))
    return out[:, 0]

  return call


def _zinb_fwd(x, r, l, g):
  from sisua_tpu.ops import zinb_pallas as zp
  return zp.zinb_log_prob_rowsum(x, r, l, g, constrained=True)


def _zinb_fwdbwd_fn():
  import jax
  import jax.numpy as jnp

  def loss(r, l, g, x):
    return jnp.sum(_zinb_fwd(x, r, l, g))

  grad = jax.grad(loss, argnums=(0, 1, 2))

  def fn(x, r, l, g):
    dr, dl, dg = grad(r, l, g, x)
    return dr.sum(1) + dl.sum(1) + dg.sum(1)

  return fn


def main(argv=None):
  p = argparse.ArgumentParser("kernel_probe")
  p.add_argument("--out", default="/tmp/kernel_probe.md")
  p.add_argument("--sweep", action="store_true",
                 help="also run the tile sweep (block_b × block_d)")
  args = p.parse_args(argv)

  import numpy as np

  from sisua_tpu.ops import zinb_pallas as zp
  assert zp.pallas_available(), "probe requires the TPU pallas path"

  ops = _operands()
  elems = B * D

  variants = [
      ("sol_mem", _scan_window(_elemwise_probe_kernel(1))),
      ("sol_fma64", _scan_window(_elemwise_probe_kernel(64))),
      ("lg_lanczos", _scan_window(_lgamma_probe_kernel("lanczos"))),
      ("lg_stirling", _scan_window(_lgamma_probe_kernel("stirling"))),
  ]
  for lg in ("lanczos", "stirling"):
    # env is read at TRACE time → set before the jitted window first runs
    def fwd(x, r, l, g, lg=lg):
      os.environ["SISUA_TPU_LGAMMA"] = lg
      return _zinb_fwd(x, r, l, g)
    def fwdbwd(x, r, l, g, lg=lg, fn=_zinb_fwdbwd_fn()):
      os.environ["SISUA_TPU_LGAMMA"] = lg
      return fn(x, r, l, g)
    variants.append((f"zinb_fwd_{lg}", _scan_window(fwd)))
    variants.append((f"zinb_fwdbwd_{lg}", _scan_window(fwdbwd)))

  # interleave REPS passes over all variants; per-variant median of medians
  times = {name: [] for name, _ in variants}
  for rep in range(REPS):
    for name, window in variants:
      try:
        times[name].append(_time_window(window, ops))
      except Exception as e:  # noqa: BLE001 — a variant may not compile
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        times[name].append(float("nan"))
    print(f"rep {rep}: " + " ".join(
        f"{n}={times[n][-1]*1e3:.2f}ms" for n, _ in variants), flush=True)

  rows = []
  for name, _ in variants:
    dt = float(np.nanmedian(times[name]))
    row = {"variant": name, "ms_per_call": round(dt * 1e3, 3),
           "gelem_per_s": round(elems / dt / 1e9, 2)}
    if name == "sol_fma64":
      row["gflops_f32"] = round(128 * elems / dt / 1e9, 1)
    if name == "sol_mem":
      row["hbm_gbs"] = round(16 * elems / dt / 1e9, 1)  # 4 f32 reads/elem
    rows.append(row)
    print(json.dumps(row), flush=True)

  # derived accounting: cost of each variant in measured FMA-equivalents
  # per element (the honest unit for "transcendental-corrected" MFU: XLA's
  # flop counter scores lgamma/softplus chains as ~1 flop; here each costs
  # what the VPU actually charges relative to a fused multiply-add)
  med = {n: float(np.nanmedian(ts)) for n, ts in times.items()}
  t_mem, t64 = med.get("sol_mem"), med.get("sol_fma64")
  if t_mem and t64 and t64 > t_mem:
    t_fma = (t64 - t_mem) / 63.0  # marginal seconds per 1 FMA/element pass
    vpu_gflops = 2.0 * elems / t_fma / 1e9
    derived = {"variant": "derived",
               "vpu_f32_gflops": round(vpu_gflops, 1),
               "hbm_bound_gelem_s": round(elems / t_mem / 1e9, 2)}
    for name in med:
      if name.startswith(("lg_", "zinb_")):
        derived[f"{name}_fma_equiv"] = round((med[name] - t_mem) / t_fma, 1)
    rows.append(derived)
    print(json.dumps(derived), flush=True)

  if args.sweep:
    best_lg = min(("lanczos", "stirling"),
                  key=lambda s: np.nanmedian(times[f"zinb_fwdbwd_{s}"]))
    os.environ["SISUA_TPU_LGAMMA"] = best_lg
    fn = _zinb_fwdbwd_fn()
    for bb in (8, 16, 32, 64, 128, 256):
      for bd in (512, 1024, 2048, 4096):
        os.environ["SISUA_TPU_BLOCK_B"] = str(bb)
        zp._BLOCK_D = bd
        window = _scan_window(fn)
        try:
          dt = _time_window(window, ops)
        except Exception as e:  # noqa: BLE001 — VMEM overflow etc.
          print(f"tile bb={bb} bd={bd}: FAILED {type(e).__name__}", flush=True)
          continue
        row = {"variant": f"tile_fwdbwd_{best_lg}", "block_b": bb,
               "block_d": bd, "ms_per_call": round(dt * 1e3, 3),
               "gelem_per_s": round(elems / dt / 1e9, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    os.environ.pop("SISUA_TPU_BLOCK_B", None)
    zp._BLOCK_D = 4096

  os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
  with open(args.out + ".jsonl", "w") as f:
    for r in rows:
      f.write(json.dumps(r) + "\n")
  cols = sorted({k for r in rows for k in r})
  lines = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
  for r in rows:
    lines.append("| " + " | ".join(str(r.get(c, "")) for c in cols) + " |")
  with open(args.out, "w") as f:
    f.write(f"B={B} D={D} R={R} REPS={REPS}\n\n" + "\n".join(lines) + "\n")
  print("→", args.out)


if __name__ == "__main__":
  main()
