"""Window-executable trainer semantics: NaN-window rollback, mid-window
checkpointing, small-dataset fallback, jit-closure caching (regressions
from the window-metrics review)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sisua_tpu.data.feeder import DataFeeder
from sisua_tpu.models import VAE, RVmeta
from sisua_tpu.train.trainer import Trainer, TrainState


def _mock_core(nan_after: int = 10 ** 9, base: float = 100.0):
  """Deterministic step core: loss = base − step, NaN from `nan_after`;
  params record the step so rollback is observable."""
  def core(state: TrainState, batch, key):
    step = state.step
    loss = jnp.where(step >= nan_after, jnp.nan,
                     base - step.astype(jnp.float32))
    new = state.replace(step=step + 1,
                        params={"w": state.params["w"] + 1.0})
    return new, {"loss": loss}
  return core


def _state0():
  return TrainState(step=jnp.zeros((), jnp.int32),
                    params={"w": jnp.zeros(())},
                    batch_stats=None, opt_state=None)


def _feeder(n=64, d=4, batch=16):
  return DataFeeder([np.ones((n, d), np.float32)], batch_size=batch,
                    labels_percent=0.0, shuffle=False)


def test_max_iter_stops_device_cached_path():
  """max_iter stops the windowed device-resident loop at the first window
  boundary past the step budget (4 steps/epoch here)."""
  trainer = Trainer(step_core=_mock_core(), valid_freq=0,
                    device_cache=True, metrics_interval=2, max_iter=9)
  state = trainer.fit(_state0(), _feeder(), epochs=20,
                      key=jax.random.PRNGKey(0))
  # 2-epoch windows of 8 steps: budget of 9 → stop after window 2 (16 steps)
  assert int(state.step) == 16, int(state.step)
  assert len(trainer.history["loss"]) == 4


def test_max_iter_stops_out_of_core_path():
  # 512 cells × 4 dims f32 (8 KB) against a 2 KB budget → 16-row chunks,
  # 6 pinned; 32 steps/epoch; max_iter=5 stops at the first epoch boundary
  trainer = Trainer(step_core=_mock_core(), valid_freq=0,
                    device_cache=True, max_iter=5,
                    hbm_budget_bytes=2048)
  assert trainer._plan_out_of_core(_feeder(n=512)) is not None
  state = trainer.fit(_state0(), _feeder(n=512), epochs=20,
                      key=jax.random.PRNGKey(0))
  assert int(state.step) == 32, int(state.step)  # epoch-granular stop
  assert len(trainer.history["loss"]) == 1


def test_nan_window_does_not_poison_best_state():
  """A NaN inside a window must not let an earlier epoch of the SAME
  window snapshot the (already-contaminated) post-window state."""
  # 4 steps/epoch; NaN from global step 6 → window 0 (epochs 0-1) has a
  # finite epoch 0 and a NaN epoch 1
  trainer = Trainer(step_core=_mock_core(nan_after=6), valid_freq=0,
                    device_cache=True, metrics_interval=2)
  state = trainer.fit(_state0(), _feeder(), epochs=4,
                      key=jax.random.PRNGKey(0))
  # rollback target must be the PRE-window best (the initial snapshot),
  # not the post-window state whose params ran through NaN steps
  assert int(state.step) == 0, int(state.step)
  assert np.isfinite(trainer.history["loss"][0])
  assert not np.isfinite(trainer.history["loss"][1])


def test_mid_window_improvement_checkpoints():
  """A new best on a non-final epoch of a window must still trigger the
  checkpoint callback (once per improving window)."""
  calls = []
  trainer = Trainer(step_core=_mock_core(), valid_freq=0,
                    device_cache=True, metrics_interval=2)
  trainer.fit(_state0(), _feeder(), epochs=4, key=jax.random.PRNGKey(0),
              checkpoint_fn=lambda st: calls.append(int(st.step)))
  # loss strictly decreases → both windows improve → exactly 2 checkpoints,
  # each of the post-window state (steps 8 and 16)
  assert calls == [8, 16], calls


def test_device_cache_smaller_than_batch_streams():
  """n_obs < batch_size must fall back to streaming, not ZeroDivision."""
  rng = np.random.default_rng(0)
  x = rng.poisson(2.0, (20, 8)).astype(np.float32)
  m = VAE(RVmeta(8, "zinb", name="rna"),
          encoder={"units": [8]}, decoder={"units": [8]})
  m.fit(x, epochs=2, batch_size=64, device_cache=True)
  assert len(m.history["loss"]) == 2
  assert np.isfinite(m.history["loss"]).all()


@pytest.mark.slow
def test_predict_family_jit_closures_cached():
  """Repeated predict/predict_mean/etc. must reuse one jitted callable
  per (method, sample_shape) — not rebuild (and recompile) per call."""
  rng = np.random.default_rng(1)
  x = rng.poisson(2.0, (128, 8)).astype(np.float32)
  m = VAE(RVmeta(8, "zinb", name="rna"),
          encoder={"units": [8]}, decoder={"units": [8]})
  m.fit(x, epochs=1, batch_size=32)
  n0 = len(m._jit_cache)
  m.predict_mean(x, sample_shape=(2,))
  assert len(m._jit_cache) == n0 + 1
  m.predict_mean(x, sample_shape=(2,))       # same key → no new entry
  assert len(m._jit_cache) == n0 + 1
  m.predict_mean(x, sample_shape=(3,))       # different trace → new entry
  assert len(m._jit_cache) == n0 + 2
  m.predict(x, device_cache=True)
  m.predict(x, device_cache=True)
  m.get_normalized_expression(x)
  m.get_normalized_expression(x)
  keys = {k[0] for k in m._jit_cache}
  assert {"predict_mean", "predict_dc", "norm_expr"} <= keys


def test_second_fit_merges_history():
  """fit() twice on the same model (warm start) must work and concatenate
  histories (regression: trainer.step_fn AttributeError)."""
  rng = np.random.default_rng(2)
  x = rng.poisson(2.0, (128, 8)).astype(np.float32)
  m = VAE(RVmeta(8, "zinb", name="rna"),
          encoder={"units": [8]}, decoder={"units": [8]})
  m.fit(x, epochs=2, batch_size=32)
  m.fit(x, epochs=3, batch_size=32)
  assert len(m.history["loss"]) == 5


def test_prefetch_iter_releases_worker_on_early_break():
  """Abandoning the prefetch generator (max_iter break) must unblock and
  retire the worker thread (review finding: leaked thread on q.put)."""
  import threading
  import time as _time
  from sisua_tpu.train.trainer import _prefetch_iter

  started = threading.Event()
  before = set(threading.enumerate())

  def slow_producer():
    started.set()
    for i in range(1000):
      yield i

  it = _prefetch_iter(slow_producer(), depth=2)
  assert next(it) == 0
  started.wait(5)
  # identify THE worker thread (global counts are flaky: unrelated daemons
  # start/stop); exactly one new thread belongs to the prefetcher
  workers = [t for t in threading.enumerate() if t not in before]
  assert len(workers) == 1, workers
  it.close()  # what an abandoned for-loop does via GC
  workers[0].join(timeout=5)
  assert not workers[0].is_alive()


def test_device_cached_evaluate_matches_streaming(splits, small_nets):
  """Device-cached validation (one lax.map executable + remainder batch)
  must agree with the streaming per-batch evaluation."""
  import jax
  from sisua_tpu.models import VAE, RVmeta

  train, test = splits
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), seed=2, **small_nets)
  m.fit(train, epochs=1, batch_size=64, valid_freq=0, patience=0)
  tr = m.trainer
  feeder = test.create_dataset(batch_size=64, shuffle=False,
                               labels_percent=1.0)
  assert feeder.n_obs % 64 != 0  # exercise the ragged remainder
  key = jax.random.PRNGKey(7)
  stream = tr.evaluate(m.state, feeder, key)          # device_cache=False
  cached = tr._evaluate_device_cached(m.state, feeder, key)
  assert set(stream) == set(cached)
  for k in stream:
    # same math, different MC z-draw keys per batch → statistical agreement
    assert abs(stream[k] - cached[k]) / (abs(stream[k]) + 1e-6) < 0.05, \
        (k, stream[k], cached[k])
  # second call reuses the uploaded payload (cache hit on the same feeder)
  again = tr._evaluate_device_cached(m.state, feeder, key)
  for k in cached:
    np.testing.assert_allclose(again[k], cached[k], rtol=1e-6)


def test_fit_with_validation_uses_cached_eval(splits, small_nets):
  from sisua_tpu.models import VAE, RVmeta
  train, test = splits
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), seed=2, **small_nets)
  m.fit(train, valid=test, epochs=4, batch_size=64, device_cache=True,
        metrics_interval=2, patience=10)
  assert "val_loss" in m.history
  vals = [v for v in m.history["val_loss"] if np.isfinite(v)]
  assert vals, m.history["val_loss"]


def test_epoch_layout_permslice_same_batches():
  """'permslice' (whole-epoch permuted copy + contiguous slices) must see
  the SAME batches as the default per-step gather: same perm, same step
  keys, same grouping (the 1M-cell locality optimization, RESULTS.md).
  Pinned with an exact integer checksum through a mock core — comparing
  trained params instead would only measure ulp-level fusion differences
  chaotically amplified by Adam's grad/sqrt(v) on near-zero gradients.
  All sums stay < 2**24 so float32 accumulation is exact."""
  rng = np.random.default_rng(0)
  X = rng.integers(0, 8, (256, 20)).astype(np.float32)
  lib = rng.integers(0, 4, (256, 2)).astype(np.float32)
  col_w = jnp.arange(1, 21, dtype=jnp.float32)

  def core(state, batch, key):
    step = state.step.astype(jnp.float32)
    chk = (jnp.sum(batch["inputs"][0] * col_w) * (step + 1.0)
           + 1000.0 * jnp.sum(batch["mask"]) * (step + 1.0)
           + jnp.sum(batch["library"]))
    return state.replace(step=state.step + 1), {"loss": chk}

  def run(layout):
    state = TrainState(step=jnp.zeros((), jnp.int32), params={},
                       batch_stats=None, opt_state=None)
    trainer = Trainer(step_core=core, valid_freq=0)
    trainer.epoch_layout = layout
    epoch_fn, _ = trainer._build_epoch_fn(32, 0.5, has_library=True,
                                          unroll=2)
    acc0 = {"loss": jnp.zeros(())}
    _, acc = epoch_fn(state, acc0, [jnp.asarray(X)], jnp.asarray(lib),
                      jax.random.PRNGKey(7))
    return float(acc["loss"])

  assert run("gather") == run("permslice")
  # 'auto' must route to ONE of the two identical-batch bodies (256 rows,
  # tiny table → the permslice side of the shape rule)
  assert run("auto") == run("gather")


def test_epoch_layout_auto_shape_rule():
  """epoch_layout='auto' picks by shape, per the two measured anchors
  (RESULTS.md): permslice for small-row tables where the whole-epoch
  permuted copy is cheap (8192×33k: +20–35%), gather for tall tables
  where the row-key sort + copy lose (1M×500: −17%), and never a second
  resident copy that crowds a 16 GB chip."""
  from sisua_tpu.train.trainer import (_PERMSLICE_MAX_BYTES,
                                       _PERMSLICE_MAX_ROWS, _auto_permslice)
  GB = 1024 ** 3
  assert _auto_permslice(8192, int(1.1 * GB))        # wide-regime anchor
  assert not _auto_permslice(1_000_000, 2 * GB)      # 1M-protocol anchor
  assert not _auto_permslice(100_000, int(0.2 * GB))  # headline: wash → gather
  assert _auto_permslice(_PERMSLICE_MAX_ROWS, _PERMSLICE_MAX_BYTES)
  assert not _auto_permslice(_PERMSLICE_MAX_ROWS + 1, 1 * GB)
  assert not _auto_permslice(8192, _PERMSLICE_MAX_BYTES + 1)


def test_epoch_layout_out_of_core_pins_gather(monkeypatch):
  """The out-of-core path builds its epoch fn with allow_permslice=False:
  HBM is deliberately full of pinned chunks there, so the 'auto' rule must
  never schedule the whole-chunk permuted copy (OOM), even when the chunk
  shape satisfies the permslice bounds."""
  import jax.numpy as jnp
  from sisua_tpu.train import trainer as trainer_mod
  from sisua_tpu.train.trainer import TrainState, Trainer

  def boom(n, b):  # noqa: ARG001
    raise AssertionError("auto rule consulted despite allow_permslice=False")

  def run(allow):
    state = TrainState(step=jnp.zeros((), jnp.int32), params={},
                       batch_stats=None, opt_state=None)
    trainer = Trainer(step_core=lambda s, b, k:
                      (s, {"loss": jnp.sum(b["inputs"][0])}),
                      valid_freq=0)
    epoch_fn, _ = trainer._build_epoch_fn(32, 0.0, has_library=False,
                                          allow_permslice=allow)
    X = jnp.zeros((128, 4), jnp.float32)
    epoch_fn(state, {"loss": jnp.zeros(())}, [X], None,
             jax.random.PRNGKey(0))

  monkeypatch.setattr(trainer_mod, "_auto_permslice", boom)
  run(allow=False)  # gate short-circuits before the auto rule
  with pytest.raises(AssertionError, match="auto rule consulted"):
    run(allow=True)
