"""Test configuration: CPU JAX with 8 virtual devices, no network, tmp data.

Must set env vars before jax initializes (import side effects)."""

import os

# force CPU: the ambient environment points JAX at the (slow, single-chip)
# axon TPU tunnel; tests run on an 8-virtual-device CPU mesh. The axon
# sitecustomize calls jax.config.update("jax_platforms", "axon,cpu") at
# interpreter start, which OVERRIDES the JAX_PLATFORMS env var — so the env
# var alone is not enough; we must write the config back before the backend
# initializes (jax.config.update raises once a backend is live).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("SISUA_DATA", "/tmp/sisua_test_data")
os.environ.setdefault("SISUA_EXP", "/tmp/sisua_test_exp")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu", (
    "tests require an 8-virtual-device CPU backend; got "
    f"{jax.devices()}")

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
