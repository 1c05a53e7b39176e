"""sisua_tpu — TPU-native (JAX/XLA/Pallas) framework for semi-supervised
single-cell deep generative modeling, with the capabilities of
trungnt13/sisua re-designed TPU-first."""

__version__ = "0.1.0"
