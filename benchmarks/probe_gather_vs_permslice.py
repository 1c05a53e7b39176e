import sys, time
sys.path.insert(0, "/root/repo")
import sisua_tpu
import jax, jax.numpy as jnp
import numpy as np

N, G, B = 40_000, 500, 128
STEPS = N // B
UNROLL = 8
x = jnp.asarray(np.random.default_rng(0).poisson(2.0, (N, G)).astype(np.float32))
w = jnp.asarray(np.random.default_rng(1).normal(0, 0.1, (G, 64)).astype(np.float32))

def epoch_gather(x, key):
  perm = jax.random.permutation(key, N)
  def body(acc, i):
    rows = jax.lax.dynamic_slice(perm, (i * B,), (B,))
    b = jnp.take(x, rows, axis=0)
    h = jnp.tanh(b @ w)
    return acc * 0.999 + jnp.sum(h), None
  acc, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS), unroll=UNROLL)
  return acc

def epoch_permslice(x, key):
  perm = jax.random.permutation(key, N)
  xp = jnp.take(x, perm, axis=0)
  def body(acc, i):
    b = jax.lax.dynamic_slice(xp, (i * B, 0), (B, G))
    h = jnp.tanh(b @ w)
    return acc * 0.999 + jnp.sum(h), None
  acc, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS), unroll=UNROLL)
  return acc

def epoch_noshuffle(x, key):  # floor: pure contiguous slices, no permute
  def body(acc, i):
    b = jax.lax.dynamic_slice(x, (i * B, 0), (B, G))
    h = jnp.tanh(b @ w)
    return acc * 0.999 + jnp.sum(h), None
  acc, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS), unroll=UNROLL)
  return acc

def many(fn, n_epochs=20):
  @jax.jit
  def run(x, key):
    def e(acc, k):
      return acc + fn(x, k), None
    acc, _ = jax.lax.scan(e, 0.0, jax.random.split(key, n_epochs))
    return acc
  return run

for name, fn in [("gather", epoch_gather), ("permslice", epoch_permslice),
                 ("noshuffle-floor", epoch_noshuffle)]:
  run = many(fn)
  k = jax.random.PRNGKey(0)
  # fetch-sync: block_until_ready over the axon tunnel acks dispatch
  # without awaiting execution — the round-2 numbers taken with it are
  # superseded by the production-protocol A/B in RESULTS.md
  r = run(x, k); jax.device_get(r)
  ts = []
  for rep in range(5):
    t0 = time.perf_counter()
    jax.device_get(run(x, k))
    ts.append(time.perf_counter() - t0)
  med = float(np.median(ts)) / 20
  print(f"{name}: {med*1e3:.2f} ms/epoch  ({med/STEPS*1e6:.1f} us/step)  acc={float(r):.1f}")
