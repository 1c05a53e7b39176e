"""NetConf + flax.linen building blocks (encoder/decoder MLPs, heads).

Re-provides ``odin.networks.NetConf`` (reference usage:
``sisua/models/single_cell_model.py:78-81``, ``configs/base.yaml:10-17``):
``units/hidden_dim``, ``nlayers``, ``batchnorm``, ``dropout``,
``input_dropout``, ``pyramid``, ``use_conv``, ``name``.

TPU notes: all layers keep static shapes; matmuls run in bfloat16 on the MXU
with float32 accumulation/params when ``compute_dtype='bfloat16'`` — the MLP
stack is exactly the shape XLA tiles well (gene-dim × hidden matmuls).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .rv import RVmeta

__all__ = ["NetConf", "MLP", "DistributionDense", "parse_netconf"]


def _resolve_dtype(name: Optional[str]):
  if name is None or name == "float32":
    return None  # flax default: float32 throughout
  return jnp.dtype(name)


_ACTIVATIONS = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "elu": nn.elu,
    "selu": nn.selu,
    "swish": nn.swish,
    "silu": nn.swish,
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
    "softplus": nn.softplus,
    "linear": lambda x: x,
}


@dataclasses.dataclass(frozen=True)
class NetConf:
  """Declarative MLP config. ``units`` may be an int (replicated ``nlayers``
  times) or an explicit tuple of layer widths."""

  units: Tuple[int, ...] = (64, 64)
  nlayers: int = 2
  activation: str = "relu"
  batchnorm: bool = False
  dropout: float = 0.0
  input_dropout: float = 0.0
  pyramid: bool = False
  use_conv: bool = False
  kernel_size: int = 5
  # 'bfloat16' runs the dense stack's matmuls on the MXU in bf16 (params and
  # batchnorm statistics stay float32); None/'float32' is the exact path.
  compute_dtype: Optional[str] = None
  name: Optional[str] = None

  def __post_init__(self):
    u = self.units
    if isinstance(u, int):
      u = (u,) * max(1, int(self.nlayers))
    else:
      u = tuple(int(x) for x in u)
    if self.pyramid:
      u = tuple(max(8, u[0] // (2 ** i)) for i in range(len(u)))
    object.__setattr__(self, "units", u)
    object.__setattr__(self, "nlayers", len(u))

  def build(self, name: Optional[str] = None) -> "MLP":
    return MLP(conf=self, name=name or self.name)

  def replace(self, **updates) -> "NetConf":
    return dataclasses.replace(self, **updates)


def parse_netconf(x, default_name: str = "net") -> NetConf:
  """YAML/ctor shorthand → NetConf (reference reflection, ``train.py:31-43``)."""
  if isinstance(x, NetConf):
    return x
  if isinstance(x, dict):
    kw = dict(x)
    if "hidden_dim" in kw:  # reference alias
      kw["units"] = kw.pop("hidden_dim")
    kw.setdefault("name", default_name)
    known = {f.name for f in dataclasses.fields(NetConf)}
    kw = {k: v for k, v in kw.items() if k in known}
    if isinstance(kw.get("units"), list):
      kw["units"] = tuple(kw["units"])
    return NetConf(**kw)
  if isinstance(x, int):
    return NetConf(units=(x,), nlayers=1, name=default_name)
  if isinstance(x, (tuple, list)):
    return NetConf(units=tuple(int(i) for i in x), name=default_name)
  raise TypeError(f"Cannot parse NetConf from {x!r}")


class MLP(nn.Module):
  """Dense stack with optional batchnorm / dropout / input-dropout / conv1d."""

  conf: NetConf

  @nn.compact
  def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
    c = self.conf
    act = _ACTIVATIONS[c.activation]
    dtype = _resolve_dtype(c.compute_dtype)
    if dtype is not None:
      x = x.astype(dtype)
    if c.input_dropout > 0:
      x = nn.Dropout(rate=c.input_dropout, deterministic=not training,
                     name="input_dropout")(x)
    if c.use_conv:
      # rare path kept for NetConf parity: treat features as a 1-D sequence.
      # batchnorm/dropout settings apply here exactly as on the dense stack
      # — a config that requests regularization must not silently train
      # unregularized just because use_conv flipped the layer type
      h = x[..., None]
      for i, u in enumerate(c.units):
        h = nn.Conv(features=u, kernel_size=(c.kernel_size,), strides=(2,),
                    dtype=dtype, name=f"conv{i}")(h)
        if c.batchnorm:
          h = nn.BatchNorm(use_running_average=not training,
                           momentum=0.9, dtype=dtype, name=f"bn{i}")(h)
        h = act(h)
        if c.dropout > 0:
          h = nn.Dropout(rate=c.dropout, deterministic=not training,
                         name=f"dropout{i}")(h)
      x = h.reshape(h.shape[:-2] + (-1,))
      return x
    for i, u in enumerate(c.units):
      x = nn.Dense(features=u, dtype=dtype, name=f"dense{i}")(x)
      if c.batchnorm:
        # batch statistics accumulate in float32 regardless of compute dtype
        x = nn.BatchNorm(use_running_average=not training,
                         momentum=0.9, dtype=dtype, name=f"bn{i}")(x)
      x = act(x)
      if c.dropout > 0:
        x = nn.Dropout(rate=c.dropout, deterministic=not training,
                       name=f"dropout{i}")(x)
    return x


class DistributionDense(nn.Module):
  """Dense projection hidden → raw params → pytree Distribution.

  The JAX analogue of odin.bay's ``DenseDistribution`` layer (pinned by
  reference test ``tests/test_singlecell_models.py:44-62``). With
  ``rv.projection=False`` the input is interpreted as already-constrained
  flat parameters and only packaging happens (SCVI's direct-param decode,
  reference ``sisua/models/scvi.py:160-166``).
  """

  rv: RVmeta
  # bf16 runs the (often gene-dim-wide, MXU-dominant) head matmul in
  # bfloat16; raw parameters are always cast back to float32 before the
  # distribution is constrained, so log-prob math stays in float32.
  compute_dtype: Optional[str] = None

  @nn.compact
  def __call__(self, h: jax.Array):
    if self.rv.projection:
      raw = nn.Dense(features=self.rv.n_params,
                     dtype=_resolve_dtype(self.compute_dtype),
                     name=f"{self.rv.name or 'rv'}_params")(h)
      raw = raw.astype(jnp.float32)
    else:
      # projection=False: the model computed final (already-constrained)
      # parameters itself — package only (SCVI path).
      return self.rv.create_distribution(h.astype(jnp.float32),
                                         constrained=True)
    return self.rv.create_distribution(raw)
