"""A/B: f32 vs bf16 gradient WRITES in the fused ZINB backward.

The builder's own kernel probe concluded the fused backward is "bound by
its 3×(B, D) f32 gradient WRITES" (results_kernel_probe.md, Backward
note), and the wide-regime roofline sits at 65–98% of static-bytes HBM —
so halving the write bytes (bf16) is the obvious next lever (VERDICT r4
next-round 2). This script measures it two ways:

  1. **Kernel timing** — fused fwd+bwd (value_and_grad of the summed
     rowsum) at {1024, 2048} × 33k for both dispersion modes (per-gene
     (1, D) θ = scvi default, and per-cell-per-gene (B, D) θ), f32 vs
     bf16 writes, scan-fused windows with a fetch sync (the tunnel acks
     dispatch without awaiting execution).
  2. **Convergence parity** — SCVI trained on the same synthetic wide
     data with identical seeds under both modes; reports the full loss
     trajectory overlay and the max relative divergence.

  PYTHONPATH=/root/.axon_site:. python benchmarks/bwd_dtype_ab.py \
      --out benchmarks/results_bwd_dtype_ab.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

R = 30  # kernel invocations per timed window


def _operands(b, d, per_gene):
  import jax
  import jax.numpy as jnp
  k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 4)
  x = jax.random.poisson(k0, 2.0, (b, d)).astype(jnp.float32)
  rshape = (1, d) if per_gene else (b, d)
  r = jnp.exp(jax.random.normal(k1, rshape) * 0.5)
  l = jax.random.normal(k2, (b, d))
  g = jax.random.normal(k3, (b, d)) - 2.0
  return x, r, l, g


def _fwdbwd_window(per_gene):
  import jax
  import jax.numpy as jnp

  from sisua_tpu.ops import zinb_pallas as zp

  def loss(r, l, g, x):
    return jnp.sum(zp.zinb_log_prob_rowsum(x, r, l, g, constrained=True))

  vag = jax.value_and_grad(loss, argnums=(0, 1, 2))

  @jax.jit
  def window(x, r, l, g):
    def body(acc, _):
      v, grads = vag(r + acc * 1e-30, l, g, x)
      return v + sum(jnp.sum(gr) * 1e-30 for gr in grads), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=R)
    return acc

  return window


def _time(window, args, n=3):
  import numpy as np
  ts = []
  float(window(*args))  # compile + warm
  for _ in range(n):
    t0 = time.perf_counter()
    float(window(*args))
    ts.append((time.perf_counter() - t0) / R)
  return float(np.median(ts))


def _grad_agreement(per_gene, b=256, d=4096):
  """One-shot gradient comparison between the two write dtypes."""
  import jax
  import jax.numpy as jnp
  import numpy as np

  from sisua_tpu.ops import zinb_pallas as zp

  def loss(r, l, g, x):
    return jnp.sum(zp.zinb_log_prob_rowsum(x, r, l, g, constrained=True))

  args = _operands(b, d, per_gene)
  x, r, l, g = args
  out = {}
  for mode in ("f32", "bf16"):
    os.environ["SISUA_TPU_BWD_WRITES"] = mode
    out[mode] = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(r, l, g, x)
  rels = []
  for a, bb in zip(out["f32"], out["bf16"]):
    a, bb = np.asarray(a, np.float64), np.asarray(bb, np.float64)
    rels.append(float(np.abs(a - bb).max() / max(np.abs(a).max(), 1e-12)))
  return rels  # [d_r, d_logits, d_gate] max rel err vs f32


def _operands_window(per_gene, operands_bf16):
  import jax
  import jax.numpy as jnp

  from sisua_tpu.ops import zinb_pallas as zp

  def loss(r, l, g, x):
    return jnp.sum(zp.zinb_log_prob_rowsum(x, r, l, g, constrained=True))

  vag = jax.value_and_grad(loss, argnums=(0, 1, 2))

  @jax.jit
  def window(x, r, l, g):
    def body(acc, _):
      v, grads = vag(r + acc.astype(r.dtype) * 1e-30, l, g, x)
      return v + sum(jnp.sum(gr).astype(jnp.float32) * 1e-30
                     for gr in grads), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=R)
    return acc

  def prep(args):
    x, r, l, g = args
    if operands_bf16:
      cast = lambda a: (a.astype(jnp.bfloat16)  # noqa: E731
                        if a.shape == x.shape else a)
      r, l, g = cast(r), cast(l), cast(g)
    return x, r, l, g

  return window, prep


def operands_ab(shapes, out_lines):
  """bf16 OPERAND reads A/B (r5 follow-up to the write A/B): full (B, D)
  parameter fields stored/read at 2 B/element, math still f32 in-kernel."""
  import numpy as np
  out_lines.append("")
  out_lines.append("bf16 operand mode (SISUA_TPU_FWD_OPERANDS=bf16 "
                   "equivalent; x stays f32, per-gene rows stay f32):")
  out_lines.append("")
  out_lines.append("| shape | dispersion | f32-ops ms | bf16-ops ms | "
                   "speedup |")
  out_lines.append("|---|---|---|---|---|")
  for b, d in shapes:
    for per_gene in (True, False):
      times = {}
      for mode in (False, True):
        os.environ["SISUA_TPU_BWD_WRITES"] = "bf16"  # HEAD default
        window, prep = _operands_window(per_gene, mode)
        args = prep(_operands(b, d, per_gene))
        times[mode] = _time(window, args)
      row = {"batch": b, "genes": d, "operands": "bf16-ab",
             "dispersion": "per-gene" if per_gene else "full(B,D)",
             "f32_ops_ms": round(times[False] * 1e3, 2),
             "bf16_ops_ms": round(times[True] * 1e3, 2),
             "speedup": round(times[False] / times[True], 3)}
      out_lines.append(
          f"| {b}×{d} | {row['dispersion']} | {row['f32_ops_ms']} | "
          f"{row['bf16_ops_ms']} | {row['speedup']}× |")
      print(json.dumps(row), flush=True)
  # grad agreement vs the all-f32 reference
  import jax
  import jax.numpy as jnp

  from sisua_tpu.ops import zinb_pallas as zp

  def loss(r, l, g, x):
    return jnp.sum(zp.zinb_log_prob_rowsum(x, r, l, g, constrained=True))

  for per_gene in (True, False):
    args = _operands(256, 4096, per_gene)
    x, r, l, g = args
    ref = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(r, l, g, x)
    _, prep = _operands_window(per_gene, True)
    xb, rb, lb, gb = prep(args)
    got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(rb, lb, gb, xb)
    rels = []
    for a, bb_ in zip(ref, got):
      a = np.asarray(a, np.float64)
      bb_ = np.asarray(bb_, np.float64)
      rels.append(float(np.abs(a - bb_).max()
                        / max(np.abs(a).max(), 1e-12)))
    out_lines.append(
        f"grad agreement bf16-ops ({'per-gene' if per_gene else 'full'} "
        f"dispersion, 256×4096): max rel err vs f32 "
        + ", ".join(f"{v:.2e}" for v in rels))
    print(json.dumps({"per_gene": per_gene,
                      "operand_grad_rel_err": rels}), flush=True)


def kernel_ab(shapes, out_lines):
  import numpy as np
  rows = []
  for b, d in shapes:
    for per_gene in (True, False):
      times = {}
      for mode in ("f32", "bf16"):
        os.environ["SISUA_TPU_BWD_WRITES"] = mode
        window = _fwdbwd_window(per_gene)
        args = _operands(b, d, per_gene)
        times[mode] = _time(window, args)
      speed = times["f32"] / times["bf16"]
      row = {"batch": b, "genes": d,
             "dispersion": "per-gene" if per_gene else "full(B,D)",
             "f32_ms": round(times["f32"] * 1e3, 2),
             "bf16_ms": round(times["bf16"] * 1e3, 2),
             "bf16_speedup": round(speed, 3)}
      rows.append(row)
      line = (f"| {b}×{d} | {row['dispersion']} | {row['f32_ms']} | "
              f"{row['bf16_ms']} | {row['bf16_speedup']}× |")
      out_lines.append(line)
      print(json.dumps(row), flush=True)
  return rows


def convergence_ab(out_lines, cells=20000, genes=4000, batch=1024,
                   epochs=12, env_var="SISUA_TPU_BWD_WRITES"):
  """Same data, same seeds, both dtypes of ``env_var``: loss overlay."""
  import numpy as np

  from sisua_tpu.data import generate_synthetic
  from sisua_tpu.models import SCVI, NetConf, RVmeta

  sco = generate_synthetic(n_cells=cells, n_genes=genes, n_proteins=8,
                           seed=5218)
  hist = {}
  for mode in ("f32", "bf16"):
    os.environ[env_var] = mode
    m = SCVI(RVmeta(genes, "zinbd", name="rna"),
             latents=RVmeta(16, "diag", name="latents"),
             encoder=NetConf((256,), batchnorm=True), seed=0)
    m.fit(sco, epochs=epochs, batch_size=batch, valid_freq=0,
          device_cache=True, verbose=False)
    hist[mode] = np.asarray(m.history["loss"], np.float64)
    print(json.dumps({"mode": mode,
                      "loss": [round(v, 3) for v in hist[mode]]}),
          flush=True)
  rel = np.abs(hist["bf16"] - hist["f32"]) / np.abs(hist["f32"])
  out_lines.append("")
  out_lines.append(f"Convergence parity (SCVI zinbd {cells}×{genes}, "
                   f"batch {batch}, {epochs} epochs, seed 0):")
  out_lines.append("")
  out_lines.append("| epoch | loss f32 | loss bf16 | rel diff |")
  out_lines.append("|---|---|---|---|")
  for e in range(epochs):
    out_lines.append(f"| {e} | {hist['f32'][e]:.3f} | {hist['bf16'][e]:.3f}"
                     f" | {rel[e]:.2e} |")
  out_lines.append("")
  out_lines.append(f"max relative loss divergence: {rel.max():.2e}; "
                   f"final-epoch: {rel[-1]:.2e}")
  return float(rel.max()), float(rel[-1])


def main(argv=None):
  p = argparse.ArgumentParser("bwd_dtype_ab")
  p.add_argument("--out", default="/tmp/bwd_dtype_ab.md")
  p.add_argument("--skip-convergence", action="store_true")
  p.add_argument("--operands", action="store_true",
                 help="run the bf16 OPERAND-read A/B instead of the "
                      "write A/B (r5 follow-up)")
  args = p.parse_args(argv)

  import jax
  lines = [f"backend={jax.devices()[0].platform} "
           f"device={jax.devices()[0].device_kind}",
           "",
           "Fused ZINB fwd+bwd, f32 vs bf16 (B, D) gradient writes "
           f"(scan×{R}, fetch-synced, median of 3 windows):",
           "",
           "| shape | dispersion | f32 ms | bf16 ms | bf16 speedup |",
           "|---|---|---|---|---|"]
  if args.operands:
    operands_ab([(1024, 33000), (2048, 33000)], lines)
    if not args.skip_convergence:
      # f32-ops vs bf16-ops trajectories (writes at HEAD default in both)
      convergence_ab(lines, env_var="SISUA_TPU_FWD_OPERANDS")
      os.environ.pop("SISUA_TPU_FWD_OPERANDS", None)
    with open(args.out, "w") as f:
      f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")
    return
  kernel_ab([(1024, 33000), (2048, 33000)], lines)
  for per_gene in (True, False):
    rels = _grad_agreement(per_gene)
    lines.append("")
    lines.append(f"grad agreement ({'per-gene' if per_gene else 'full'} "
                 f"dispersion, 256×4096): max rel err vs f32 "
                 f"[d_r, d_logits, d_gate] = "
                 + ", ".join(f"{r:.2e}" for r in rels))
    print(json.dumps({"per_gene": per_gene, "grad_rel_err": rels}),
          flush=True)
  if not args.skip_convergence:
    convergence_ab(lines)
  with open(args.out, "w") as f:
    f.write("\n".join(lines) + "\n")
  print(f"wrote {args.out}")


if __name__ == "__main__":
  main()
