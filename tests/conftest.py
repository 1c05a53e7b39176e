"""Test configuration: CPU JAX with 8 virtual devices, no network, tmp data.

Must set env vars before jax initializes (import side effects)."""

import os

# force CPU: the ambient environment points JAX_PLATFORMS at the (slow,
# single-chip) axon TPU tunnel; tests run on an 8-virtual-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("SISUA_DATA", "/tmp/sisua_test_data")
os.environ.setdefault("SISUA_EXP", "/tmp/sisua_test_exp")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def sco():
  """Small synthetic 3-omic dataset shared across tests."""
  from sisua_tpu.data import generate_synthetic
  return generate_synthetic(n_cells=600, n_genes=80, n_proteins=8,
                            n_celltypes=4, seed=5218)


@pytest.fixture(scope="session")
def splits(sco):
  return sco.split(0.8, seed=1)


@pytest.fixture()
def small_nets():
  from sisua_tpu.nn import NetConf
  return dict(encoder=NetConf((32, 32), batchnorm=True, input_dropout=0.3),
              decoder=NetConf((32, 32), batchnorm=True))
