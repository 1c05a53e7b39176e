"""Driver contract: entry() compiles single-chip; dryrun_multichip executes
one sharded training step over the virtual 8-device mesh."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_entry_compiles():
  import __graft_entry__ as g
  fn, args = g.entry()
  loss, mean = jax.jit(fn)(*args)
  assert np.isfinite(float(loss))
  assert mean.shape == (64, 512)


def test_dryrun_multichip():
  import __graft_entry__ as g
  assert len(jax.devices()) == 8
  g.dryrun_multichip(8)  # asserts internally (loss finite, 8-device batch)
