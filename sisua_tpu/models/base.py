"""SingleCellModel — keras-feel wrapper over the pure-flax VAE engine.

Re-provides the API of ``/root/reference/sisua/models/single_cell_model.py``
(ctor surface :74-101, encode :119-139, predict :153-211, fit :213-236,
class-id :238-245, create_posterior :247-281, checkpointing :283-306) on a
functional core: the model owns a flax module, a parameter pytree, and a
Trainer; all compute paths are jitted pure functions.

Key TPU-first deviations from the reference:
  * ``predict`` returns params-first pytree Distributions merged across
    minibatches with one tree-concat (no CPU-pinned distribution surgery);
  * the training step is a single compiled executable per run; semi-
    supervised masks come in through the feeder batch (static shapes);
  * checkpoints are msgpack pytrees + JSON metamodel (no pickle).
"""

from __future__ import annotations

import os
import warnings
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data.const import UNIVERSAL_RANDOM_SEED
from ..data.feeder import DataFeeder
from ..interpolation import Interpolation, get_interpolation
from ..nn import NetConf, parse_netconf
from ..rv import RVmeta, parse_rv
from ..train.checkpoint import (load_weights, save_metamodel,
                                save_weights)
from ..train.trainer import Trainer, TrainState
from .module import VAEModule, VAEOutput
from .objective import compute_loss

__all__ = ["SingleCellModel"]


def _flatten(x) -> Tuple:
  if x is None:
    return ()
  if isinstance(x, (tuple, list)):
    return tuple(x)
  return (x,)


def _merge_batch_leaves(axis):
  """tree_map reducer that concatenates per-batch distribution leaves
  along ``axis`` — EXCEPT batch-invariant parameter rows (e.g. the (1, D)
  per-gene dispersion of SCVI's 'single' mode / MULTIVI), which every
  batch returns identically: stacking k copies makes a phantom (k, D)
  leaf whose broadcast against the (N, D) mean fails. Constants are
  recognized by a singleton leading dim (they never gain MC sample dims)
  + bit-equality across batches — per-cell leaves over different cells
  are never bit-identical. Shared by the streaming and device-cached
  predict paths so the two can never diverge."""
  def merge(*xs):
    x0 = xs[0]
    if (len(xs) > 1 and np.shape(x0) == np.shape(xs[1])
        and np.ndim(x0) >= 1 and np.shape(x0)[0] == 1
        and all(np.array_equal(x0, x) for x in xs[1:])):
      return x0
    return np.concatenate(xs, axis=axis)
  return merge


def _to_snake_case(name: str) -> str:
  """keras' auto-name algorithm (generic_utils.to_snake_case): the
  reference's models are keras Models whose default ``.name`` is this."""
  import re
  s = re.sub(r"(.)([A-Z][a-z0-9]+)", r"\1_\2", name)
  return re.sub(r"([a-z])([A-Z])", r"\1_\2", s).lower()


class SingleCellModel:
  """Base class of the zoo. Subclasses customize via class attrs + ctor."""

  module_cls = VAEModule
  #: multitask semi-supervised masking of non-primary outputs (SISUA family)
  mask_outputs: bool = False

  def __init__(self,
               outputs: Union[RVmeta, Sequence[RVmeta]],
               latents: Union[RVmeta, Sequence[RVmeta], None] = None,
               encoder: Union[NetConf, Sequence[NetConf], None] = None,
               decoder: Union[NetConf, Sequence[NetConf], None] = None,
               log_norm: bool = True,
               beta: Union[float, Interpolation] = 1.0,
               alpha: float = 1.0,
               gamma: float = 1.0,
               analytic: bool = True,
               mask_renorm: bool = False,
               reduce_latent: str = "concat",
               compute_dtype: Optional[str] = None,
               seed: int = UNIVERSAL_RANDOM_SEED,
               dataset: Optional[str] = None,
               metadata: Optional[Dict] = None,
               name: Optional[str] = None,
               batch_key: str = "batch",
               prng: str = "rbg",
               **module_kwargs):
    outputs = tuple(parse_rv(o, f"output{i}")
                    for i, o in enumerate(_flatten(outputs)))
    if latents is None:
      latents = RVmeta(10, "diag", True, "latents")
    latents = tuple(parse_rv(z, f"latent{i}")
                    for i, z in enumerate(_flatten(latents)))
    if encoder is None:
      encoder = NetConf((64, 64), batchnorm=True, input_dropout=0.3,
                        name="encoder")
    encoder = tuple(parse_netconf(e, f"encoder{i}")
                    for i, e in enumerate(_flatten(encoder)))
    if decoder is None:
      decoder = NetConf((64, 64), batchnorm=True, name="decoder")
    decoder = tuple(parse_netconf(d, f"decoder{i}")
                    for i, d in enumerate(_flatten(decoder)))
    if compute_dtype:
      # mixed precision: MLP trunks + head matmuls in bf16 on the MXU;
      # params, batch stats, and all log-prob math stay float32
      encoder = tuple(e.replace(compute_dtype=compute_dtype) for e in encoder)
      decoder = tuple(d.replace(compute_dtype=compute_dtype) for d in decoder)
      module_kwargs.setdefault("compute_dtype", compute_dtype)
    self.compute_dtype = compute_dtype

    self.outputs = outputs
    self.latents = latents
    self.encoder = encoder
    self.decoder = decoder
    self.log_norm = bool(log_norm)
    self.beta = get_interpolation(beta)
    self.alpha = float(alpha)
    self.gamma = float(gamma)
    self.analytic = bool(analytic)
    # label-budget-invariant supervision weighting (objective.elbo_terms);
    # off by default = the reference's batch-mean masked reduction
    self.mask_renorm = bool(mask_renorm)
    self.reduce_latent = reduce_latent
    self.seed = int(seed)
    # 'rbg' (XLA RngBitGenerator) is the TPU-native generator: threefry's
    # serial lane math costs ~18% of the whole step on overhead-bound
    # models (measured A/B at the headline protocol, RESULTS.md); rbg is
    # splittable, checkpoint-stable, and identical in convergence. Pass
    # prng='threefry2x32' for jax-default streams.
    self.prng = str(prng)
    self.dataset = dataset
    self.metadata = metadata or {}
    self.batch_key = str(batch_key)
    # default name matches the reference's keras auto-name (snake_case of
    # the class: SISUA→'sisua', DeepCountAutoencoder→'deep_count_autoencoder')
    # so name-keyed lookups (ResultsSheet['SISUA'/'sisua'], figure titles)
    # behave like upstream
    self._name = name or _to_snake_case(type(self).__name__)
    self._module_kwargs = dict(module_kwargs)
    self.module = self._build_module(**module_kwargs)
    self._state: Optional[TrainState] = None
    self.trainer: Optional[Trainer] = None
    # new-style typed key: carries its impl, accepted by flax for any
    # generator (raw rbg key data is (4,)-shaped and fails flax's check)
    self._rng = jax.random.key(self.seed, impl=self.prng)
    self._jit_cache: Dict = {}
    import threading
    # one model may serve several evaluation threads (cross_analyze's
    # thread pool): key splitting and executable-cache population must be
    # atomic or two threads draw IDENTICAL keys / compile twice
    self._lock = threading.RLock()
    import dataclasses as _dc
    # a constant beta round-trips as its value; a warm-up SCHEDULE must
    # round-trip whole (kind/vmin/vmax/norm/delay/cyclical) — collapsing
    # it to vmax would silently drop KL annealing on the resume path
    beta_spec = (self.beta.vmax if self.beta.kind == "const"
                 and not self.beta.cyclical else _dc.asdict(self.beta))
    self._init_kwargs_for_save = dict(
        outputs=outputs, latents=latents, encoder=encoder, decoder=decoder,
        log_norm=log_norm, beta=beta_spec, alpha=alpha,
        gamma=gamma, analytic=analytic, mask_renorm=mask_renorm,
        reduce_latent=reduce_latent,
        compute_dtype=compute_dtype, seed=seed, name=self._name,
        batch_key=batch_key, prng=self.prng,
        **{k: v for k, v in module_kwargs.items() if k != "compute_dtype"})

  def set_metadata(self, sco) -> "SingleCellModel":
    """Record the dataset name and per-omic var_names on the model
    (reference single_cell_model.py:103-109); persisted by save_weights
    into the JSON metamodel, so a loaded checkpoint knows what it was
    trained on."""
    self.dataset = sco.name
    for om in sco.omics:
      self.metadata[str(om)] = list(np.asarray(sco.get_var_names(om),
                                               dtype=str))
    return self

  # ------------------------------------------------------------- construct
  def _build_module(self, **kwargs):
    return self.module_cls(outputs=self.outputs, latents=self.latents,
                           encoder_confs=self.encoder,
                           decoder_confs=self.decoder,
                           log_norm=self.log_norm,
                           reduce_latent=self.reduce_latent, **kwargs)

  def _next_key(self) -> jax.Array:
    with self._lock:  # read-split-store must be atomic under thread pools
      self._rng, sub = jax.random.split(self._rng)
      return sub

  @property
  def uses_library(self) -> bool:
    """Whether the module consumes the per-cell library stats (SCVI)."""
    return False

  @property
  def n_batch(self) -> int:
    """Batch-covariate conditioning cardinality (0 = off)."""
    return int(getattr(self.module, "n_batch", 0))

  def _module_input(self, inputs):
    """Map the batch's input list to the module's encoder input. Default:
    the first (main) omic; TotalVI concatenates all omics. With batch
    conditioning the trailing input is the batch one-hot, appended to the
    module input (the module splits it back off)."""
    x = inputs[0]
    x = x if isinstance(x, jnp.ndarray) else jnp.asarray(x)
    if self.n_batch and len(inputs) >= 2:
      b = inputs[-1]
      b = b if isinstance(b, jnp.ndarray) else jnp.asarray(b)
      if b.shape[-1] == self.n_batch:
        x = jnp.concatenate([x, b.astype(x.dtype)], axis=-1)
    return x

  def _serving_source_indices(self, n_sources: int) -> List[int]:
    """Feeder-source indices ``_module_input`` actually consumes. The
    serving path must not gather/upload label omics it will drop (SISUA's
    protein source on a 33k-gene serving call is pure wasted transfer,
    and counting it in the device budget forces needless chunking).
    Order is preserved so the trailing batch one-hot stays trailing."""
    idx = [0]
    if self.n_batch and n_sources >= 2:
      idx.append(n_sources - 1)
    return idx

  # ---------------------------------------------------------------- naming
  @property
  def name(self) -> str:
    return self._name

  @property
  def id(self) -> str:
    """Lower-cased capital letters of the class name — 'DeepCountAutoencoder'
    → 'dca' (reference :238-245)."""
    return "".join(c for c in type(self).__name__ if c.isupper()).lower()

  @property
  def is_semi_supervised(self) -> bool:
    return self.mask_outputs and len(self.outputs) > 1

  @property
  def is_zero_inflated(self) -> bool:
    return self.outputs[0].is_zero_inflated

  @property
  def posteriors(self) -> Tuple[RVmeta, ...]:
    return self.outputs

  @property
  def n_outputs(self) -> int:
    return len(self.outputs)

  @property
  def n_latents(self) -> int:
    return len(self.latents)

  @property
  def params(self):
    self._ensure_initialized()
    return self._state.params

  @property
  def batch_stats(self):
    self._ensure_initialized()
    return self._state.batch_stats

  @property
  def state(self) -> TrainState:
    self._ensure_initialized()
    return self._state

  # ------------------------------------------------------------------ init
  def _batch_onehot(self, sco) -> np.ndarray:
    """Per-cell batch one-hot from ``sco.obs[self.batch_key]``. The
    level→code mapping is DEFINED by the first data seen (fit) and
    persisted in ``metadata['batch_categories']`` (→ the checkpoint
    metamodel): inference data carrying a subset of the training levels
    must condition on the SAME codes, not a remapping of its own sorted
    uniques. Later data may only append unseen levels while ``n_batch``
    capacity remains — existing codes never move."""
    nb = self.n_batch
    if self.batch_key not in sco.obs.columns:
      warnings.warn(f"batch conditioning is on (n_batch={nb}) but "
                    f"obs['{self.batch_key}'] is absent; assuming one batch")
      return np.eye(nb, dtype=np.float32)[np.zeros(sco.n_obs, np.int64)]
    col = [str(v) for v in np.asarray(sco.obs[self.batch_key])]
    uniq = [str(v) for v in self.metadata.get("batch_categories", [])]
    unseen = sorted(set(col) - set(uniq))
    if unseen:
      assert len(uniq) + len(unseen) <= nb, (
          f"obs['{self.batch_key}'] carries {len(unseen)} level(s) beyond "
          f"the {len(uniq)} known ones; total exceeds n_batch={nb}")
      uniq = uniq + unseen
      self.metadata["batch_categories"] = list(uniq)
    idx = {v: i for i, v in enumerate(uniq)}
    codes = np.array([idx[v] for v in col], np.int64)
    return np.eye(nb, dtype=np.float32)[codes]

  def _dummy_batch(self, batch_size: int = 2):
    x = jnp.zeros((batch_size, self.outputs[0].dim), jnp.float32)
    lib = jnp.ones((batch_size, 2), jnp.float32)
    return x, lib

  def _apply_kwargs(self, library):
    return {"library": library} if self.uses_library else {}

  def _ensure_initialized(self):
    if self._state is not None:
      return
    x, lib = self._dummy_batch()
    key = jax.random.key(self.seed, impl=self.prng)
    variables = self.module.init(
        {"params": key, "sample": key, "dropout": key}, x,
        training=True, **self._apply_kwargs(lib))
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    self._state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                             batch_stats=batch_stats, opt_state=None,
                             aux_params=self._init_aux(params, key),
                             aux_opt_state=None)

  def _init_aux(self, params, key):
    return None  # FactorVAE overrides

  # --------------------------------------------------------------- forward
  def apply(self, x, library=None, training: bool = False,
            sample_shape: Tuple[int, ...] = (),
            key: Optional[jax.Array] = None,
            params=None, batch_stats=None,
            mutable: bool = False):
    """Raw module application → VAEOutput (+ mutated batch_stats)."""
    self._ensure_initialized()
    params = self._state.params if params is None else params
    batch_stats = (self._state.batch_stats if batch_stats is None
                   else batch_stats)
    variables = {"params": params}
    if batch_stats is not None:
      variables["batch_stats"] = batch_stats
    key = key if key is not None else self._next_key()
    k_sample, k_drop = jax.random.split(key)
    rngs = {"sample": k_sample, "dropout": k_drop}
    kwargs = dict(training=training, sample_shape=tuple(sample_shape),
                  **self._apply_kwargs(library))
    if mutable and batch_stats is not None and training:
      out, mut = self.module.apply(variables, x, rngs=rngs,
                                   mutable=["batch_stats"], **kwargs)
      return out, mut["batch_stats"]
    out = self.module.apply(variables, x, rngs=rngs, **kwargs)
    return (out, batch_stats) if mutable else out

  def __call__(self, x, library=None, training=False, sample_shape=()):
    return self.apply(x, library=library, training=training,
                      sample_shape=sample_shape)

  def encode(self, x, library=None, training: bool = False,
             sample_shape: Tuple[int, ...] = ()):
    """q(Z|X) distributions (log1p applied inside per ``log_norm``)."""
    out = self.apply(jnp.asarray(x, jnp.float32),
                     library=None if library is None else jnp.asarray(library),
                     training=training, sample_shape=sample_shape)
    return out.latents if len(out.latents) > 1 else out.latents[0]

  def decode(self, z, library=None, training: bool = False):
    """p(X|Z) distributions from latent samples/means."""
    self._ensure_initialized()
    variables = {"params": self._state.params}
    if self._state.batch_stats is not None:
      variables["batch_stats"] = self._state.batch_stats
    zs = z if isinstance(z, (tuple, list)) else (z,)
    if self.uses_library:
      if len(zs) < 2:
        raise ValueError(
            f"{type(self).__name__}.decode needs BOTH latent samples "
            "(z, library) — pass encode()'s full tuple output, or use "
            "get_normalized_expression for the library-free scale")
      pX = self.module.apply(variables, tuple(jnp.asarray(zi) for zi in zs),
                             method=self.module_cls.decode, training=training)
    else:
      zcat = self.module.reduce_latents([jnp.asarray(zi) for zi in zs]) \
          if len(zs) > 1 else jnp.asarray(zs[0])
      pX = self.module.apply(variables, zcat,
                             method=self.module_cls.decode, training=training)
    return pX if len(pX) > 1 else pX[0]

  # -------------------------------------------------------------- loss/step
  def _loss(self, params, batch_stats, batch, key, beta, training: bool,
            aux_params=None):
    # streaming feeders may ship inputs compressed (transfer_dtype int16 —
    # exact for counts); widen to float32 in-executable before any math
    if any(jnp.asarray(a).dtype != jnp.float32 for a in batch["inputs"]):
      batch = dict(batch, inputs=[
          jnp.asarray(a).astype(jnp.float32) for a in batch["inputs"]])
    x = self._masked_module_input(batch, training)
    library = batch.get("library")
    variables = {"params": params}
    if batch_stats is not None:
      variables["batch_stats"] = batch_stats
    k1, k2 = jax.random.split(key)
    rngs = {"sample": k1, "dropout": k2}
    kwargs = dict(training=training, **self._apply_kwargs(library))
    # training-time MC: S reparameterized draws per example; llk and MC-KL
    # terms average over the leading sample dim inside elbo_terms
    # (the reference train config's `sample_shape`, configs/base.yaml:53)
    mc = int(getattr(self, "_train_mc_samples", 1) or 1)
    if training and mc > 1:
      kwargs["sample_shape"] = (mc,)
    if training and batch_stats is not None:
      out, mut = self.module.apply(variables, x, rngs=rngs,
                                   mutable=["batch_stats"], **kwargs)
      new_bs = mut["batch_stats"]
    else:
      out = self.module.apply(variables, x, rngs=rngs, **kwargs)
      new_bs = batch_stats
    loss, metrics = compute_loss(
        out, self._loss_targets(batch), mask=batch.get("mask"), beta=beta,
        alpha=self.alpha, analytic=self.analytic,
        mask_outputs=self.mask_outputs if training else False,
        mask_renorm=self.mask_renorm if training else False,
        output_masks=self._output_masks(batch),
        latent_masks=self._latent_masks(batch))
    extra = self._extra_loss(params, aux_params, out, batch, k2, training)
    if extra is not None:
      loss = loss + extra[0]
      metrics.update(extra[1])
      metrics["loss"] = loss
    return loss, (metrics, new_bs, out)

  def _extra_loss(self, params, aux_params, out: VAEOutput, batch, key,
                  training: bool):
    return None  # FactorVAE adds the γ·TC term

  def _loss_targets(self, batch):
    """Likelihood targets. Hook for models whose likelihood is defined on a
    transform of the raw omic (PeakVI binarizes accessibility counts)."""
    return batch["inputs"]

  def _output_masks(self, batch):
    """Optional per-output (B,) likelihood gates for missing-modality cells
    (MULTIVI mosaic data); ``None`` = all observed. Unlike the
    semi-supervised ``mask`` these apply to every output at train AND
    eval — they encode data missingness, not a supervision budget."""
    return None

  def _latent_masks(self, batch):
    """Optional per-latent (B,) KL gates with the same missing-modality
    semantics — a latent inferred from an unobserved modality branch must
    not charge that cell's KL (MULTIVI gates the RNA-encoded library
    latent by the RNA-observed mask)."""
    return None

  def _masked_module_input(self, batch, training: bool):
    """Training-time module input. Hook for models whose ENCODER consumes a
    semi-supervised omic (TotalVI's joint RNA+ADT input): they must zero
    the masked modality for unlabeled cells or the encoder leaks the very
    labels the mask hides from the loss."""
    return self._module_input(batch["inputs"])

  def make_train_step_core(self, tx):
    """Pure (unjitted) train step: (state, batch, key) → (state, metrics).

    β is computed inside from ``state.step`` (traced), so the step can be
    ``lax.scan``-ed into multi-step executables (see Trainer.scan_steps)."""
    import optax

    def step(state: TrainState, batch, key):
      beta = self.beta(state.step)
      def loss_fn(p):
        return self._loss(p, state.batch_stats, batch, key, beta,
                          training=True, aux_params=state.aux_params)
      (loss, (metrics, new_bs, _)), grads = jax.value_and_grad(
          loss_fn, has_aux=True)(state.params)
      if getattr(self, "_track_grad_norms", False):
        # reference train-config `track_gradient_norms` (configs/base.yaml:62)
        metrics["grad_norm"] = optax.global_norm(grads)
      updates, new_opt = tx.update(grads, state.opt_state, state.params)
      new_params = optax.apply_updates(state.params, updates)
      new_state = state.replace(step=state.step + 1, params=new_params,
                                batch_stats=new_bs, opt_state=new_opt)
      new_state, metrics = self._aux_step(new_state, batch, key, metrics)
      return new_state, metrics

    return step

  def make_train_step(self, tx):
    """Jitted single-step variant (donated state for in-place updates)."""
    core = self.make_train_step_core(tx)

    def step(state: TrainState, batch, key, beta=None):
      # beta retained for signature compatibility; the core derives it
      return core(state, batch, key)

    return jax.jit(step, donate_argnums=(0,))

  def _aux_step(self, state: TrainState, batch, key, metrics):
    return state, metrics  # FactorVAE trains the discriminator here

  def make_eval_step(self):
    def eval_step(state: TrainState, batch, key):
      _, (metrics, _, _) = self._loss(state.params, state.batch_stats, batch,
                                      key, beta=self.beta(state.step),
                                      training=False)
      return metrics
    return jax.jit(eval_step)

  # -------------------------------------------------------------------- fit
  def _to_feeder(self, data, batch_size: int, labels_percent: float,
                 shuffle: bool = True) -> DataFeeder:
    """SingleCellOMIC | ndarray | DataFeeder → DataFeeder (reference
    ``_to_data`` :44-61).

    With batch conditioning (n_batch > 0): for a SingleCellOMIC the batch
    one-hot is built from ``obs[batch_key]`` and appended automatically;
    for raw arrays/feeders the LAST array must already be the one-hot
    (width n_batch) or the model conditions on the uniform batch prior."""
    if isinstance(data, DataFeeder):
      return data
    if hasattr(data, "create_dataset"):  # SingleCellOMIC
      # select output omics BY NAME when the model's RV names are omics of
      # this dataset (the experimenter names outputs after omics) — a
      # positional pick silently trains label heads on the wrong omic when
      # the container's omic order differs (e.g. after an h5ad round-trip)
      avail = set(data.omics)
      rv_names = [rv.name for rv in self.outputs]
      if all(n in avail for n in rv_names):
        omics = rv_names
      else:
        omics = list(data.omics)[: self.n_outputs]
        matched = [n for n in rv_names if n in avail]
        if matched and len(rv_names) > 1:
          # Half-matched names are almost always a naming slip, and the
          # positional pick can be silently WRONG with shape-compatible
          # data (e.g. outputs ('rna', 'celltype') on a container ordered
          # (transcriptomic, proteomic, celltype) trains the label head
          # on the 10-dim PROTEIN matrix — loss huge, accuracy at chance;
          # caught live by the zoo sweep's scanvi row).
          import warnings
          warnings.warn(
              f"Output RV names {rv_names} only partially match the "
              f"dataset's omics {sorted(avail)}; falling back to the "
              f"POSITIONAL omics {omics}. If a label head is involved "
              "this silently trains on the wrong matrix — name every "
              "output RV after its omic to select by name.",
              stacklevel=3)
      extra = None
      if self.n_batch:
        extra = [self._batch_onehot(data)]
      return data.create_dataset(omics=omics,
                                 labels_percent=labels_percent,
                                 batch_size=batch_size, shuffle=shuffle,
                                 extra_matrices=extra)
    from scipy import sparse as _sp
    arrs = [a if _sp.issparse(a) else np.asarray(a, np.float32)
            for a in _flatten(data)]
    from ..data.utils import get_library_size
    mean, var = get_library_size(arrs[0])
    lib = np.concatenate([mean, var], 1)
    return DataFeeder(arrs, library=lib, labels_percent=labels_percent,
                      batch_size=batch_size, shuffle=shuffle)

  def fit(self,
          train,
          valid=None,
          epochs: int = 100,
          batch_size: int = 64,
          learning_rate: float = 1e-3,
          optimizer: str = "adam",
          clipnorm: float = 100.0,
          labels_percent: float = 0.8,
          valid_freq: int = 500,
          patience: int = 20,
          min_delta: float = 1e-4,
          track_gradient_norms: bool = False,
          terminate_on_nan: bool = True,
          allow_rollback: bool = True,
          max_iter: Optional[int] = None,
          callbacks: Sequence = (),
          checkpoint_path: Optional[str] = None,
          scan_steps: int = 1,
          device_cache: bool = False,
          device_dtype: str = "float32",
          transfer_dtype: Optional[str] = None,
          metrics_interval: int = 1,
          mesh=None,
          hbm_budget_bytes: Optional[int] = None,
          profile_dir: Optional[str] = None,
          mc_samples: int = 1,
          freeze: Sequence[str] = (),
          verbose: bool = False) -> "SingleCellModel":
    """Compile + train (the reference's fit combo :213-236).

    ``freeze=('decoder', 'output_head_rna', …)``: parameters whose path
    contains a component starting with any of these prefixes receive ZERO
    updates (optax.masked) — the transfer-learning primitive behind
    ``fit_query``. Switching the freeze set between fit calls re-initializes
    the optimizer state (its structure depends on the mask).

    ``scan_steps=k`` fuses k train steps into one executable via lax.scan
    (one host→device transfer per k steps — recommended on TPU; per-epoch
    step count rounds down to a multiple of k under a fresh shuffle each
    epoch, so coverage is unbiased).

    ``transfer_dtype='auto'|'int16'`` compresses the STREAMING path's
    host→device batch uploads (exact int16 for integral counts; widened
    back to float32 in-executable) — measured ~1.8× upload throughput on
    transfer-bound links. The device-resident path has its own
    ``device_dtype`` compression.

    ``device_cache=True`` on a dataset LARGER than HBM switches to the
    out-of-core path: rows partition into HBM-sized random chunks, as many
    as fit stay pinned on device, the rest stream per epoch with upload
    overlapped against compute (``hbm_budget_bytes`` overrides the
    detected budget)."""
    if not self.is_semi_supervised:
      labels_percent = 0.0
    # persistent XLA compilation cache (under SISUA_EXP): later sessions
    # skip the 4–20 s per-regime recompile; opt out with
    # SISUA_NO_COMPILATION_CACHE=1
    from ..utils.others import enable_compilation_cache
    enable_compilation_cache()
    # track what the model was fitted on (reference fit :221-226)
    for src in (train, valid):
      if hasattr(src, "omics") and hasattr(src, "get_var_names"):
        self.set_metadata(src)
        break
    self._train_mc_samples = int(mc_samples)
    self._track_grad_norms = bool(track_gradient_norms)
    train_feeder = self._to_feeder(train, batch_size, labels_percent)
    valid_feeder = (self._to_feeder(valid, batch_size, 1.0, shuffle=False)
                    if valid is not None else None)
    if transfer_dtype and not device_cache:
      train_feeder.set_transfer_dtype(transfer_dtype)
      if valid_feeder is not None:
        valid_feeder.set_transfer_dtype(transfer_dtype)
    self._ensure_initialized()
    trainer = Trainer(step_core=None, eval_fn=None, optimizer=optimizer,
                      learning_rate=learning_rate, clipnorm=clipnorm,
                      valid_freq=valid_freq,
                      patience=patience, min_delta=min_delta,
                      terminate_on_nan=terminate_on_nan,
                      allow_rollback=allow_rollback, max_iter=max_iter,
                      scan_steps=scan_steps, device_cache=device_cache,
                      device_dtype=device_dtype,
                      metrics_interval=metrics_interval,
                      mesh=mesh, hbm_budget_bytes=hbm_budget_bytes,
                      verbose=verbose)
    tx = trainer.make_optimizer()
    freeze = (freeze,) if isinstance(freeze, str) else tuple(freeze)
    if freeze:
      import optax
      import jax.tree_util as jtu
      def _trainable(path, _):
        comps = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        return not any(c.startswith(f) for c in comps for f in freeze)
      mask = jtu.tree_map_with_path(_trainable, self._state.params)
      n_frozen = sum(not m for m in jax.tree.leaves(mask))
      assert n_frozen, f"freeze={freeze} matched no parameters"
      tx = optax.masked(tx, mask)
    if (self._state.opt_state is None
        or getattr(self, "_last_freeze", ()) != freeze):
      self._state = self._state.replace(opt_state=tx.init(self._state.params))
    self._last_freeze = freeze
    trainer.step_core = self.make_train_step_core(tx)
    trainer.eval_fn = self.make_eval_step()
    ckpt_fn = None
    if checkpoint_path is not None:
      ckpt_fn = lambda st: save_weights(  # noqa: E731
          checkpoint_path, st.params, st.batch_stats, st.aux_params)
    import contextlib
    trace_cm = contextlib.nullcontext()
    if profile_dir is not None:
      # first-class tracing (SURVEY §5: the reference had none) — view the
      # trace with tensorboard/xprof pointed at profile_dir
      from ..utils.others import profile_trace
      trace_cm = profile_trace(profile_dir)
    with trace_cm:
      self._state = trainer.fit(self._state, train_feeder, valid_feeder,
                                epochs=epochs, key=self._next_key(),
                                callbacks=callbacks, checkpoint_fn=ckpt_fn,
                                model=self)
    # merge histories across successive fit calls (reference keeps one)
    if self.trainer is None:
      self.trainer = trainer
    else:
      for k, v in trainer.history.items():
        self.trainer.history.setdefault(k, []).extend(v)
      self.trainer._timings.extend(trainer._timings)
      self.trainer.step_core = trainer.step_core
      self.trainer.eval_fn = trainer.eval_fn
    return self

  def fit_query(self, query, train_keys: Sequence[str] = ("encoder",
                                                          "latent_head"),
                **fit_kwargs) -> "SingleCellModel":
    """scArches-style reference mapping (Lotfollahi et al. 2022 surgery,
    scvi-tools ``load_query_data`` semantics): adapt the INFERENCE network
    to a query dataset while the generative model stays frozen, so query
    cells embed into the reference latent space without distorting it.

    Everything except parameters under ``train_keys`` prefixes (default:
    the encoders and latent heads) is frozen. With batch conditioning
    (``n_batch`` capacity remaining), unseen query ``obs[batch_key]``
    levels are appended automatically and condition the frozen decoder.
    Accepts every ``fit`` kwarg."""
    self._ensure_initialized()
    train_keys = tuple(train_keys)
    frozen = tuple(sorted(
        str(k) for k in self._state.params.keys()
        if not str(k).startswith(train_keys)))
    assert frozen and len(frozen) < len(self._state.params), (
        f"train_keys={train_keys} must split the parameter tree; "
        f"top-level keys: {sorted(map(str, self._state.params.keys()))}")
    return self.fit(query, freeze=frozen, **fit_kwargs)

  @property
  def history(self) -> Dict[str, List[float]]:
    if self.trainer is not None:
      return self.trainer.history
    return getattr(self, "_loaded_history", {})

  # ---------------------------------------------------------------- evaluate
  def evaluate(self, data, batch_size: int = 256) -> Dict[str, float]:
    """Average loss/LLK/KL metrics over a dataset (keras-feel companion to
    fit/predict; mask = 1 as in validation)."""
    self._ensure_initialized()
    feeder = self._to_feeder(data, batch_size, 1.0, shuffle=False)
    eval_step = self._cached_jit(("eval_step",), self.make_eval_step)
    agg: Dict[str, list] = {}
    n = 0
    for batch in feeder.full_batches():
      b = batch["inputs"][0].shape[0]
      metrics = eval_step(self._state, batch, self._next_key())
      for k, v in metrics.items():
        agg.setdefault(k, []).append(np.asarray(v) * b)
      n += b
    return {k: float(np.sum(v) / n) for k, v in agg.items()}

  # ---------------------------------------------------------------- predict
  def _cached_jit(self, cache_key, builder):
    """Per-model cache of jitted closures. A fresh ``@jax.jit`` per call
    would recompile on EVERY invocation (jit's cache is keyed on the
    function object); cached callables re-specialize only on new input
    shapes. ``cache_key`` must cover every non-array value the closure
    bakes into the trace (sample_shape, output index, …)."""
    with self._lock:  # get-then-set double-compiles under thread pools
      fn = self._jit_cache.get(cache_key)
      if fn is None:
        fn = self._jit_cache[cache_key] = builder()
      return fn

  @staticmethod
  def _pad_to_batches(mat, k: int, B: int, n: int, dtype=np.float32,
                      rows: Optional[np.ndarray] = None):
    """Pad an (n, d) matrix (dense/sparse/gatherable) to k·B rows and
    reshape to (k, B, d) device batches. ``rows`` restricts to a row
    subset (the out-of-core serving chunks); ``n`` is then the real
    (untrimmed) count within that subset."""
    from scipy import sparse as _sp
    take = (np.arange(n, dtype=np.int64) if rows is None
            else np.ascontiguousarray(rows[:n], np.int64))
    if hasattr(mat, "gather"):
      buf = np.zeros((k * B, mat.shape[1]), np.float32)
      mat.gather(take, out=buf[:n])
    else:
      a = mat
      if _sp.issparse(a):
        a = np.asarray((a[take] if rows is not None else a).todense(),
                       np.float32)
      else:
        # slice only on the chunked path — rows=None would otherwise
        # fancy-index-copy the whole matrix a second time
        a = np.asarray(a, np.float32)
        if rows is not None:
          a = a[take]
      buf = np.zeros((k * B, a.shape[1]), np.float32)
      buf[:n] = a[:n]
    if dtype != np.float32:
      buf = buf.astype(dtype)
    return jnp.asarray(buf).reshape(k, B, -1)

  def _sparse_or_dense_batches(self, src, k: int, B: int, n: int, dtype,
                               rows: Optional[np.ndarray] = None):
    """(k, B, d) device batches for one feeder source. CSR sources whose
    triplets are clearly smaller than the dense block upload sparse —
    (vals, cols, rowlen) over the wire, one scatter-add densify in HBM —
    which cuts the transfer-bound serving upload ~3-7× at scRNA sparsity
    (~90% zeros). Everything else takes the dense pad path. ``rows``
    restricts to an out-of-core serving chunk."""
    from ..ops.sparse import (col_dtype_for, csr_row_triplets,
                              make_densify, worthwhile)
    indptr = getattr(src, "indptr", None)
    d = src.shape[1]
    itemsize = np.dtype(dtype).itemsize
    if indptr is None:
      return self._pad_to_batches(src, k, B, n, dtype=dtype, rows=rows)
    take = None if rows is None else np.ascontiguousarray(rows[:n],
                                                          np.int64)
    nnz = (int(indptr[-1]) if take is None
           else int((indptr[take + 1] - indptr[take]).sum()))
    if not worthwhile(nnz, k * B, d, itemsize, itemsize):
      return self._pad_to_batches(src, k, B, n, dtype=dtype, rows=rows)
    # bucket the padded-nnz cap (≤12.5% slack) so same-shaped serving
    # chunks with slightly different nnz reuse one densify executable
    step = max(8, 1 << (max(int(nnz).bit_length(), 4) - 4))
    cap = -(-max(8, nnz) // step) * step
    vals, cols, rowlen = csr_row_triplets(
        indptr, src.indices, src.data, rows=take, cap=cap, n_rows=k * B,
        val_dtype=dtype, col_dtype=col_dtype_for(d))
    densify = make_densify(k * B, d, cap, dtype)
    return densify(jnp.asarray(vals), jnp.asarray(cols),
                   jnp.asarray(rowlen)).reshape(k, B, d)

  def _serving_chunks(self, feeder, mesh=None,
                      budget_fraction: float = 0.35,
                      extra_bytes_per_row: int = 0):
    """Row chunks for out-of-core serving: None when the dense (k, B, d)
    upload fits the device budget, else a list of equal-size row-index
    arrays (last one padded by wrapping — consumers trim with each
    chunk's real count). Chunks share one static shape so every chunk
    reuses the same cached executable. ``extra_bytes_per_row`` budgets
    per-row side uploads beyond the input sources (compute_llk's target
    matrices ride along and must not blow the estimate)."""
    from ..parallel.mesh import device_memory_limit
    n = feeder.n_obs
    B = feeder.batch_size
    sel = self._serving_source_indices(len(feeder.sources))
    bytes_per_row = 4 * sum(feeder.sources[i].shape[1] for i in sel) \
        + int(extra_bytes_per_row)
    budget = int(budget_fraction * device_memory_limit())
    if mesh is not None:
      from ..parallel.mesh import DATA_AXIS
      nd = max(1, mesh.shape.get(DATA_AXIS, 1))
      budget *= nd
      B = -(-B // nd) * nd  # match _device_batches' mesh rounding
    env = os.environ.get("SISUA_TPU_SERVING_BUDGET")
    if env:  # explicit aggregate cap (tests force chunking on tiny data)
      budget = int(env)
    if n * bytes_per_row <= budget:
      return None
    rows_per = max(B, (budget // 2 // bytes_per_row) // B * B)
    if rows_per >= n:
      return None  # cannot chunk below one batch — single upload
    idx = np.arange(n, dtype=np.int64)
    chunks = []
    for lo in range(0, n, rows_per):
      # np.resize wraps cyclically, so even a final chunk shorter than
      # half rows_per pads to the shared static shape
      chunks.append(np.resize(idx[lo:lo + rows_per], rows_per))
    return chunks

  def _iter_serving_chunks(self, feeder, mesh=None,
                           extra_bytes_per_row: int = 0):
    """Yield (rows, n_valid) serving chunks — a single (None, None) when
    the whole dataset fits the device budget."""
    chunks = self._serving_chunks(feeder, mesh=mesh,
                                  extra_bytes_per_row=extra_bytes_per_row)
    if chunks is None:
      yield None, None
      return
    rows_per = len(chunks[0])
    n = feeder.n_obs
    for ci, rows in enumerate(chunks):
      yield rows, min(rows_per, n - ci * rows_per)

  def _device_batches(self, feeder, input_dtype: Optional[str] = None,
                      mesh=None, rows: Optional[np.ndarray] = None,
                      n_valid: Optional[int] = None):
    """Densify the feeder's sources into full (k, B, d) device batches:
    returns ``(xb, lib_b, k, B, n)`` (last batch zero-padded; trim to n
    after the fetch). Shared by every device-cached inference path.

    ``input_dtype='auto'`` uploads the counts as int16 when they are
    integral and < 32768 (halving the host→device bytes — the serving
    path is transfer-bound on remote-attached chips); the consumer must
    widen back to float32 in-executable.

    With ``mesh``: the within-batch cell axis is sharded over the mesh's
    'data' axis (batch size rounds up to a multiple of it), so every
    downstream executable runs data-parallel across the mesh.

    ``rows``/``n_valid``: an out-of-core serving chunk (row subset padded
    to a shared static size; ``n_valid`` is the real count to trim to)."""
    n = feeder.n_obs if n_valid is None else int(n_valid)
    B = feeder.batch_size
    if mesh is not None:
      from ..parallel.mesh import DATA_AXIS
      nd = mesh.shape[DATA_AXIS]
      B = -(-B // nd) * nd
    k = -(-n // B) if rows is None else len(rows) // B
    sel = self._serving_source_indices(len(feeder.sources))
    dtype = np.float32
    if input_dtype in ("auto", "int16"):
      # validate EVERY consumed source in full via the shared helper — a
      # sampled prefix (or probing only sources[0]) silently wraps
      # out-of-range counts after the int16 cast. The verdict is cached on
      # the feeder (sources are fixed for its lifetime): out-of-core
      # serving calls this once per CHUNK, and a full-dataset rescan per
      # chunk would turn the transfer saving into O(n_chunks · n) host work.
      cache = getattr(feeder, "_int16_verdicts", None)
      if cache is None:
        cache = feeder._int16_verdicts = {}
      ok = cache.get(tuple(sel))
      if ok is None:
        from scipy import sparse as _sp
        from ..ops.sparse import int16_exact

        def _values(src):
          if _sp.issparse(src) or hasattr(src, "indptr"):
            return src.data                  # sparse / _CSRSource values
          return src.m if hasattr(src, "m") else np.asarray(src)

        ok = all(int16_exact(_values(feeder.sources[i])) for i in sel)
        cache[tuple(sel)] = ok
      if ok:
        dtype = np.int16
      elif input_dtype == "int16":
        raise ValueError("input_dtype='int16' requires integral counts "
                         "< 32768 in every consumed source")
    xs = [self._sparse_or_dense_batches(feeder.sources[i], k, B, n, dtype,
                                        rows=rows) for i in sel]
    x_full = self._module_input([x.reshape(k * B, -1) for x in xs])
    xb = x_full.reshape(k, B, x_full.shape[-1])
    lib_b = (self._pad_to_batches(feeder.library, k, B, n, rows=rows)
             if feeder.library is not None else None)
    if mesh is not None:
      from jax.sharding import NamedSharding, PartitionSpec as P
      from ..parallel.mesh import DATA_AXIS
      sh = NamedSharding(mesh, P(None, DATA_AXIS))
      xb = jax.device_put(xb, sh)
      if lib_b is not None:
        lib_b = jax.device_put(lib_b, sh)
    return xb, lib_b, k, B, n

  def _mesh_state(self, mesh):
    """(params, batch_stats) placed on the mesh — wide kernels column-
    sharded over 'model' when present, everything else replicated. Cached
    per (mesh, state); identity is checked through a weakref, NOT id():
    a freed TrainState's address can be reused by its successor, and an
    id-keyed hit would silently serve the OLD weights."""
    with self._lock:  # same thread-pool atomicity as _cached_jit
      entry = self._jit_cache.get("mesh_state")
      if entry is not None:
        mesh_ref, state_ref, cached = entry
        if mesh_ref() is mesh and state_ref() is self._state:
          return cached
      import weakref
      from ..parallel.mesh import replicated_sharding, shard_params
      params = shard_params(self._state.params, mesh)
      batch_stats = self._state.batch_stats
      if batch_stats is not None:
        batch_stats = jax.device_put(batch_stats,
                                     replicated_sharding(mesh))
      cached = (params, batch_stats)
      # single-entry cache: a superseded state's placement is dropped
      self._jit_cache["mesh_state"] = (weakref.ref(mesh),
                                       weakref.ref(self._state), cached)
      return cached

  def _infer_state(self, mesh):
    if mesh is None:
      return self._state.params, self._state.batch_stats
    return self._mesh_state(mesh)

  def predict(self,
              inputs,
              sample_shape: Tuple[int, ...] = (),
              batch_size: int = 256,
              device_cache: bool = False,
              mesh=None,
              verbose: bool = False):
    """Minibatch inference → (pX dists, qZ dists), each merged across batches
    (reference :153-211; merging is one tree-concat here).

    ``device_cache=True`` uploads the whole dataset once and runs every
    batch inside ONE executable (``lax.map`` over stacked batches) with a
    single result fetch — on remote-attached chips this replaces 2 RPCs per
    batch with 2 total.

    ``mesh``: run inference data-parallel over a device mesh (implies the
    device-cached path; cells shard over the 'data' axis)."""
    self._ensure_initialized()
    feeder = self._to_feeder(inputs, batch_size, 0.0, shuffle=False)
    sample_shape = tuple(sample_shape) if not isinstance(
        sample_shape, int) else (sample_shape,)
    if device_cache or mesh is not None:
      return self._predict_device_cached(feeder, sample_shape, mesh=mesh)

    def _build_fwd():
      @partial(jax.jit, static_argnames=("training",))
      def fwd(params, batch_stats, x, library, key, training=False):
        variables = {"params": params}
        if batch_stats is not None:
          variables["batch_stats"] = batch_stats
        return self.module.apply(
            variables, x, rngs={"sample": key}, training=training,
            sample_shape=sample_shape, **self._apply_kwargs(library))
      return fwd

    fwd = self._cached_jit(("predict_fwd", sample_shape), _build_fwd)

    outs: List[VAEOutput] = []
    for batch in feeder.full_batches():
      key = self._next_key()
      out = fwd(self._state.params, self._state.batch_stats,
                self._module_input(batch["inputs"]),
                jnp.asarray(batch.get("library"))
                if batch.get("library") is not None else None, key)
      outs.append(jax.device_get(out))
    # Merge across minibatches: output distributions carry leading MC sample
    # dims (batch axis = len(sample_shape)); latent posteriors never do
    # (batch axis = 0). Priors are per-batch constants — not merged.
    # Batch-invariant (1, D) parameter rows collapse to one copy — see
    # _merge_batch_leaves.
    ax_out = len(sample_shape)
    pX = jax.tree_util.tree_map(_merge_batch_leaves(ax_out),
                                *[o.outputs for o in outs])
    # modules may carry extra nuisance posteriors (e.g. TotalVI's q(log β))
    # beyond the model's declared latents — only the embeddings are merged
    qZ = jax.tree_util.tree_map(
        _merge_batch_leaves(0), *[o.latents[:self.n_latents] for o in outs])
    pX = pX if len(pX) > 1 else pX[0]
    qZ = qZ if len(qZ) > 1 else qZ[0]
    return pX, qZ

  def _predict_device_cached(self, feeder, sample_shape: Tuple[int, ...],
                             mesh=None):
    """All-batches-in-one-executable inference (see predict). Datasets
    whose dense upload exceeds the device budget run in fixed-size row
    chunks through the same cached executable (results concatenate on
    host — full distributions, so host RAM is the only bound)."""
    module, apply_kwargs = self.module, self._apply_kwargs
    n_latents = self.n_latents

    def _build_run():
      @jax.jit
      def run(params, batch_stats, xb, lib_b, keys):
        variables = {"params": params}
        if batch_stats is not None:
          variables["batch_stats"] = batch_stats
        def one(args):
          x, l, kk = args
          out = module.apply(variables, x, rngs={"sample": kk},
                             training=False, sample_shape=sample_shape,
                             **apply_kwargs(l))
          # ship only what predict returns (not samples/priors/nuisances)
          return out.outputs, out.latents[:n_latents]
        lib_in = lib_b if lib_b is not None else \
            jnp.zeros((xb.shape[0], xb.shape[1], 0))
        return jax.lax.map(lambda a: one(a), (xb, lib_in, keys))
      return run

    run = self._cached_jit(("predict_dc", sample_shape), _build_run)
    params, batch_stats = self._infer_state(mesh)
    ax_out = len(sample_shape)

    def merge(leaf, ax, n, B):
      # batch-invariant parameter rows (per-gene (1, D) dispersion etc.):
      # lax.map stacked k identical copies → keep one (see the streaming
      # merge above for the rationale); constants never gain sample dims,
      # so the per-batch leaf is exactly (1, D) → stacked (k, 1, D) —
      # rank 3 with a singleton middle while true batch width B > 1
      if (leaf.ndim == 3 and leaf.shape[1] == 1 and B != 1
          and (leaf.shape[0] == 1 or np.array_equal(leaf[0], leaf[-1]))):
        return leaf[0]
      # (k, S..., B, ...) → (S..., k·B, ...) → trim padding to n rows
      leaf = np.moveaxis(leaf, 0, ax)
      s = leaf.shape
      leaf = leaf.reshape(s[:ax] + (s[ax] * s[ax + 1],) + s[ax + 2:])
      return leaf[(slice(None),) * ax + (slice(0, n),)]

    parts = []
    for rows, nv in self._iter_serving_chunks(feeder, mesh):
      xb, lib_b, k, B, n = self._device_batches(feeder, mesh=mesh,
                                                rows=rows, n_valid=nv)
      keys = jax.random.split(self._next_key(), k)
      outputs, latents = jax.device_get(
          run(params, batch_stats, xb, lib_b, keys))  # one fetch/chunk
      parts.append((
          jax.tree_util.tree_map(lambda x: merge(x, ax_out, n, B), outputs),
          jax.tree_util.tree_map(lambda x: merge(x, 0, n, B), latents)))
    if len(parts) == 1:
      pX, qZ = parts[0]
    else:
      pX = jax.tree_util.tree_map(
          _merge_batch_leaves(ax_out), *[p[0] for p in parts])
      qZ = jax.tree_util.tree_map(
          _merge_batch_leaves(0), *[p[1] for p in parts])
    pX = pX if len(pX) > 1 else pX[0]
    qZ = qZ if len(qZ) > 1 else qZ[0]
    return pX, qZ

  def predict_mean(self, inputs, sample_shape: Tuple[int, ...] = (),
                   batch_size: int = 256,
                   input_dtype: Optional[str] = "auto",
                   fetch_dtype: str = "float32",
                   mesh=None):
    """Posterior means only, computed ON DEVICE and fetched as (n, d)
    arrays: ``(output_means, latent_means)``. MC sample dims are averaged
    in-executable. On remote-attached chips full ``predict`` is transfer-
    bound (it ships every distribution parameter, ×MC samples); this ships
    3–30× less for the common imputation/embedding workflow.

    Transfer compression for the (transfer-bound) serving path:
    ``input_dtype='auto'`` uploads integral counts as int16 (exact, half
    the upstream bytes; widened to float32 in-executable);
    ``fetch_dtype='bfloat16'`` halves the downstream bytes at ~0.4%
    relative error on the means (results are returned as float32).

    ``mesh``: a ``parallel.create_mesh()`` — cells shard over the 'data'
    axis so batch scoring runs data-parallel across every chip in the
    mesh (serving-side analogue of ``fit(mesh=...)``)."""
    self._ensure_initialized()
    feeder = self._to_feeder(inputs, batch_size, 0.0, shuffle=False)
    sample_shape = tuple(sample_shape) if not isinstance(
        sample_shape, int) else (sample_shape,)
    module, apply_kwargs = self.module, self._apply_kwargs
    n_latents = self.n_latents
    mc_axes = tuple(range(len(sample_shape)))
    out_dt = jnp.dtype(fetch_dtype)

    def _build_run():
      @jax.jit
      def run(params, batch_stats, xb, lib_b, keys):
        variables = {"params": params}
        if batch_stats is not None:
          variables["batch_stats"] = batch_stats
        def one(args):
          x, l, kk = args
          out = module.apply(variables, x.astype(jnp.float32),
                             rngs={"sample": kk},
                             training=False, sample_shape=sample_shape,
                             **apply_kwargs(l))
          x_means = tuple(
              (jnp.mean(p.mean(), axis=mc_axes) if mc_axes
               else p.mean()).astype(out_dt) for p in out.outputs)
          z_means = tuple(q.mean().astype(out_dt)
                          for q in out.latents[:n_latents])
          return x_means, z_means
        lib_in = lib_b if lib_b is not None else \
            jnp.zeros((xb.shape[0], xb.shape[1], 0))
        return jax.lax.map(lambda a: one(a), (xb, lib_in, keys))
      return run

    params, batch_stats = self._infer_state(mesh)
    parts_x, parts_z = [], []
    # datasets whose dense upload exceeds the device budget score in
    # fixed-size row chunks through the SAME cached executable
    for rows, nv in self._iter_serving_chunks(feeder, mesh):
      xb, lib_b, k, B, n = self._device_batches(
          feeder, input_dtype=input_dtype, mesh=mesh, rows=rows,
          n_valid=nv)
      keys = jax.random.split(self._next_key(), k)
      run = self._cached_jit(
          ("predict_mean", sample_shape, str(xb.dtype), str(out_dt)),
          _build_run)
      x_means, z_means = jax.device_get(
          run(params, batch_stats, xb, lib_b, keys))
      def unstack(leaf, kk=k, bb=B, nn=n):  # (k, B, d) → (n, d), f32
        return np.asarray(
            leaf.reshape(kk * bb, *leaf.shape[2:])[:nn], np.float32)
      parts_x.append([unstack(m) for m in x_means])
      parts_z.append([unstack(m) for m in z_means])
    if len(parts_x) == 1:
      return parts_x[0], parts_z[0]
    cat = lambda parts: [np.concatenate([p[i] for p in parts], axis=0)
                         for i in range(len(parts[0]))]
    return cat(parts_x), cat(parts_z)

  def get_normalized_expression(self, inputs,
                                sample_shape: Tuple[int, ...] = (),
                                batch_size: int = 256,
                                output_index: int = 0,
                                reduce_mc: bool = True,
                                mesh=None) -> np.ndarray:
    """Library-size-free denoised expression: each posterior draw's output
    mean normalized to row proportions, MC-averaged on device → (n, d).

    For SCVI/TotalVI decoders this is exactly ``px_scale`` (the decoder
    emits ``px_rate = exp(L)·softmax(scale)``, so row-normalizing the mean
    divides the sampled library back out) — the scvi-tools
    ``get_normalized_expression`` surface. For other families it is the
    mean-proportion denoised profile (reference ``scvi.py:128-171``).

    ``reduce_mc=False`` skips the on-device MC average and returns the
    per-draw scales ``(S, n, d)`` (S = prod(sample_shape)) — the posterior
    samples :meth:`differential_expression` consumes."""
    self._ensure_initialized()
    feeder = self._to_feeder(inputs, batch_size, 0.0, shuffle=False)
    sample_shape = tuple(sample_shape) if not isinstance(
        sample_shape, int) else (sample_shape,)
    module, apply_kwargs = self.module, self._apply_kwargs
    mc_axes = tuple(range(len(sample_shape)))
    idx = int(output_index)
    reduce_mc = bool(reduce_mc) or not mc_axes
    S = int(np.prod(sample_shape)) if sample_shape else 1

    def _build_run():
      @jax.jit
      def run(params, batch_stats, xb, lib_b, keys):
        variables = {"params": params}
        if batch_stats is not None:
          variables["batch_stats"] = batch_stats
        def one(args):
          x, l, kk = args
          out = module.apply(variables, x, rngs={"sample": kk},
                             training=False, sample_shape=sample_shape,
                             **apply_kwargs(l))
          m = out.outputs[idx].mean()
          scale = m / jnp.sum(m, axis=-1, keepdims=True)  # per-draw props
          if reduce_mc:
            return jnp.mean(scale, axis=mc_axes) if mc_axes else scale
          # flatten MC dims → (S, B, d) so the host reshape is uniform
          return scale.reshape((S,) + scale.shape[len(mc_axes):])
        lib_in = lib_b if lib_b is not None else \
            jnp.zeros((xb.shape[0], xb.shape[1], 0))
        return jax.lax.map(lambda a: one(a), (xb, lib_in, keys))
      return run

    run = self._cached_jit(("norm_expr", sample_shape, idx, reduce_mc),
                           _build_run)
    params, batch_stats = self._infer_state(mesh)
    parts = []
    for rows, nv in self._iter_serving_chunks(feeder, mesh):
      xb, lib_b, k, B, n = self._device_batches(feeder, mesh=mesh,
                                                rows=rows, n_valid=nv)
      keys = jax.random.split(self._next_key(), k)
      scale = jax.device_get(run(params, batch_stats, xb, lib_b, keys))
      if reduce_mc:
        parts.append(scale.reshape(k * B, -1)[:n])
      else:  # (k, S, B, d) → (S, k·B, d) → valid rows only
        scale = np.moveaxis(scale, 0, 1).reshape(S, k * B, -1)[:, :n]
        parts.append(scale)
    if len(parts) == 1:
      return parts[0]
    return np.concatenate(parts, 0 if reduce_mc else 1)

  def differential_expression(self, inputs, groupby: str,
                              group1=None, group2=None,
                              mode: str = "change", delta: float = 0.25,
                              sample_shape: Tuple[int, ...] = (25,),
                              n_pairs: int = 5000, max_cells: int = 256,
                              batch_size: int = 256, output_index: int = 0,
                              seed: int = 0, mesh=None):
    """Bayesian differential expression between cell groups (the scvi-tools
    ``differential_expression`` surface; Lopez 2018 §'vanilla', Boyeau 2019
    §'change' — beyond the reference, which ships no DE).

    Posterior scales are sampled per cell (``get_normalized_expression``
    with ``reduce_mc=False``), then ``n_pairs`` random cross-group draw
    pairs estimate, per gene:

      * ``mode='vanilla'``: ``proba_m1 = P(s1 > s2)`` and its bayes factor
        ``log(p) − log(1−p)``;
      * ``mode='change'`` (default): ``lfc = log2(s1) − log2(s2)`` with
        ``proba_de = P(|lfc| > delta)``, lfc mean/median/std.

    ``groupby`` names an ``obs`` column of the container; ``group2=None``
    compares against all other cells; ``group1=None`` runs one-vs-rest for
    every level and stacks the frames (a ``group1`` column marks each).
    ``max_cells`` caps the per-group subsample (memory: S·max_cells·genes
    floats per group on host). Returns a pandas DataFrame indexed by the
    output's var names."""
    import pandas as pd
    if not hasattr(inputs, "obs"):
      raise TypeError("differential_expression needs a SingleCellOMIC "
                      f"container with obs['{groupby}'], got {type(inputs)}")
    if groupby not in inputs.obs.columns:
      raise KeyError(f"obs has no column '{groupby}'; "
                     f"available: {list(inputs.obs.columns)}")
    labels = np.asarray([str(v) for v in np.asarray(inputs.obs[groupby])])
    if group1 is None:
      frames = []
      for lvl in pd.unique(labels):
        df = self.differential_expression(
            inputs, groupby, group1=lvl, group2=group2, mode=mode,
            delta=delta, sample_shape=sample_shape, n_pairs=n_pairs,
            max_cells=max_cells, batch_size=batch_size,
            output_index=output_index, seed=seed, mesh=mesh)
        df.insert(0, "group1", str(lvl))
        frames.append(df)
      return pd.concat(frames, axis=0)

    rng = np.random.RandomState(seed)
    m1 = labels == str(group1)
    m2 = (labels == str(group2)) if group2 is not None else ~m1
    if not m1.any() or not m2.any():
      raise ValueError(f"empty group: |{group1}|={int(m1.sum())}, "
                       f"|{group2 or 'rest'}|={int(m2.sum())}")

    def _scales(mask):
      idx = np.flatnonzero(mask)
      if len(idx) > int(max_cells):
        idx = rng.choice(idx, int(max_cells), replace=False)
      s = self.get_normalized_expression(
          inputs[np.sort(idx)], sample_shape=sample_shape,
          batch_size=batch_size, output_index=output_index,
          reduce_mc=False, mesh=mesh)
      return np.asarray(s, np.float64).reshape(-1, s.shape[-1])  # (S·m, d)

    s1, s2 = _scales(m1), _scales(m2)
    i1 = rng.randint(0, len(s1), int(n_pairs))
    i2 = rng.randint(0, len(s2), int(n_pairs))
    a, b = s1[i1], s2[i2]
    eps = 1e-10
    out = {"scale1": s1.mean(0), "scale2": s2.mean(0)}
    if mode == "vanilla":
      p = (a > b).mean(0)
      out["proba_m1"] = p
      out["bayes_factor"] = np.log(p + eps) - np.log1p(eps - p)
    elif mode == "change":
      lfc = np.log2(a + eps) - np.log2(b + eps)
      p = (np.abs(lfc) > float(delta)).mean(0)
      out.update(proba_de=p,
                 bayes_factor=np.log(p + eps) - np.log1p(eps - p),
                 lfc_mean=lfc.mean(0), lfc_median=np.median(lfc, 0),
                 lfc_std=lfc.std(0))
    else:
      raise ValueError(f"mode must be 'vanilla' or 'change', got {mode!r}")
    names = None
    if output_index == 0:
      names = list(np.asarray(inputs.var_names, str))
    else:
      main = self.outputs[output_index].name
      if main and main in getattr(inputs, "omics", ()):
        names = list(np.asarray(inputs.get_var_names(main), str))
    df = pd.DataFrame(out)
    if names is not None and len(names) == len(df):
      df.index = pd.Index(names, name="gene")
    return df

  def compute_llk(self, inputs, targets: Dict[str, Sequence],
                  sample_shape: Tuple[int, ...] = (),
                  batch_size: int = 256, mesh=None) -> Dict[str, float]:
    """Mean per-cell log-likelihood of each (tagged) target set under the
    posterior predictive, computed entirely ON DEVICE in one executable.

    ``targets``: tag → list of per-output target matrices (n × d_i). MC
    sample dims are collapsed with logsumexp − log S. Returns
    ``{f"{tag}_output{i}": mean_llk}``. This is Posterior.cal_llk's 4-way
    computation without shipping distribution parameters to the host."""
    self._ensure_initialized()
    feeder = self._to_feeder(inputs, batch_size, 0.0, shuffle=False)
    sample_shape = tuple(sample_shape) if not isinstance(
        sample_shape, int) else (sample_shape,)
    module, apply_kwargs = self.module, self._apply_kwargs
    S = int(np.prod(sample_shape)) if sample_shape else 1

    def _build_run():
      @jax.jit
      def run(params, batch_stats, xb, lib_b, tgt_b, mask_b, keys):
        variables = {"params": params}
        if batch_stats is not None:
          variables["batch_stats"] = batch_stats
        def one(args):
          x, l, tgts, msk, kk = args
          out = module.apply(variables, x, rngs={"sample": kk},
                             training=False, sample_shape=sample_shape,
                             **apply_kwargs(l))
          res = {}
          for t, mats in tgts.items():
            for i, (pX, m) in enumerate(zip(out.outputs, mats)):
              lp = pX.log_prob(m)                       # (S…, B)
              if lp.ndim > 1:
                lp = jax.scipy.special.logsumexp(
                    lp.reshape(-1, lp.shape[-1]), axis=0) \
                    - jnp.log(float(S))
              res[f"{t}_output{i}"] = jnp.sum(lp * msk)
          return res
        lib_in = lib_b if lib_b is not None else \
            jnp.zeros((xb.shape[0], xb.shape[1], 0))
        sums = jax.lax.map(lambda a: one(a),
                           (xb, lib_in, tgt_b, mask_b, keys))
        return {kk: jnp.sum(v) for kk, v in sums.items()}
      return run

    run = self._cached_jit(("compute_llk", sample_shape), _build_run)
    params, batch_stats = self._infer_state(mesh)
    totals: Dict[str, float] = {}
    # the per-row TARGET uploads (one full-size float32 block per tag per
    # output) ride alongside the inputs — they must count in the device
    # budget or the 'fits on device' decision undercounts by 2-3×
    tgt_bytes = 4 * sum(int(np.shape(m)[1]) for mats in targets.values()
                        for m in mats)
    for rows, nv in self._iter_serving_chunks(feeder, mesh,
                                              extra_bytes_per_row=tgt_bytes):
      xb, lib_b, k, B, n = self._device_batches(feeder, mesh=mesh,
                                                rows=rows, n_valid=nv)
      tgt_b = {t: [self._pad_to_batches(m, k, B, n, rows=rows)
                   for m in targets[t]] for t in targets}
      row_mask = np.zeros((k * B,), np.float32)
      row_mask[:n] = 1.0
      mask_b = jnp.asarray(row_mask).reshape(k, B)
      if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS
        sh = NamedSharding(mesh, P(None, DATA_AXIS))
        tgt_b = jax.tree_util.tree_map(lambda m: jax.device_put(m, sh),
                                       tgt_b)
        mask_b = jax.device_put(mask_b, sh)
      keys = jax.random.split(self._next_key(), k)
      sums = jax.device_get(run(params, batch_stats,
                                xb, lib_b, tgt_b, mask_b, keys))
      for kk, v in sums.items():
        totals[kk] = totals.get(kk, 0.0) + float(v)
    return {kk: v / feeder.n_obs for kk, v in totals.items()}

  def marginal_log_prob(self, inputs, sample_shape: int = 100,
                        batch_size: int = 32) -> np.ndarray:
    """Importance-weighted marginal log-likelihood
    log p(x) ≈ logsumexp_s[log p(x|z_s) + log p(z_s) − log q(z_s|x)] − log S
    (the reference's ``marginal_log_prob`` used by cal_marginal_llk,
    ``posterior.py:940-976``)."""
    self._ensure_initialized()
    feeder = self._to_feeder(inputs, batch_size, 0.0, shuffle=False)

    def _build_iw():
      @jax.jit
      def iw(params, batch_stats, x, target, library, key):
        variables = {"params": params}
        if batch_stats is not None:
          variables["batch_stats"] = batch_stats
        out = self.module.apply(variables, x, rngs={"sample": key},
                                training=False,
                                sample_shape=(sample_shape,),
                                **self._apply_kwargs(library))
        llk = out.outputs[0].log_prob(target)          # (S, B)
        lq = sum(q.log_prob(z) for q, z in zip(out.latents,
                                               out.latent_samples))
        lp = sum((prior.log_prob(z) if prior is not None
                  else jnp.zeros(z.shape[:-1]))
                 for prior, z in zip(out.priors, out.latent_samples))
        lw = llk + lp - lq                              # (S, B)
        return jax.scipy.special.logsumexp(lw, axis=0) - jnp.log(
            float(sample_shape))
      return iw

    iw = self._cached_jit(("marginal_iw", int(sample_shape)), _build_iw)

    chunks = []
    for batch in feeder.full_batches():
      lib = batch.get("library")
      chunks.append(np.asarray(iw(
          self._state.params, self._state.batch_stats,
          self._module_input(batch["inputs"]),
          jnp.asarray(batch["inputs"][0]),
          jnp.asarray(lib) if lib is not None else None, self._next_key())))
    return np.concatenate(chunks, 0)

  # ---------------------------------------------------------------- analysis
  def create_posterior(self, test, dropout_rate: float = 0.2,
                       retain_rate: float = 0.2,
                       corruption_distribution: str = "binomial",
                       sample_shape: int = 10, batch_size: int = 256,
                       device_cache: bool = False,
                       mesh=None,
                       verbose: bool = False):
    """Posterior analysis hub (reference :247-281 → analysis/posterior).
    ``device_cache=True`` runs the predictions one-executable-per-dataset
    (single fetch — much faster on remote-attached chips)."""
    from ..analysis.posterior import Posterior
    return Posterior(self, test, dropout_rate=dropout_rate,
                     retain_rate=retain_rate,
                     corruption_distribution=corruption_distribution,
                     sample_shape=sample_shape, batch_size=batch_size,
                     device_cache=device_cache, mesh=mesh, verbose=verbose)

  # -------------------------------------------------------------------- io
  def save_weights(self, path: str, backend: str = "msgpack") -> str:
    """``backend='orbax'`` writes a sharded-array-aware orbax checkpoint
    (multi-chip states restore with their shardings); default msgpack."""
    self._ensure_initialized()
    save_weights(path, self._state.params, self._state.batch_stats,
                 self._state.aux_params, backend=backend)
    save_metamodel(path, type(self).__name__, self.dataset, self.metadata,
                   self._init_kwargs_for_save)
    # persist the training history so reloaded models keep their learning
    # curves (the reference loses keras history on load)
    hist = self.history
    if hist:
      import json
      with open(os.path.join(path, "history.json"), "w") as f:
        json.dump({k: [float(x) for x in v] for k, v in hist.items()}, f)
    return path

  def load_weights(self, path: str, raise_notfound: bool = False
                   ) -> "SingleCellModel":
    if (not os.path.isfile(os.path.join(path, "params.msgpack"))
        and not os.path.isdir(os.path.join(path, "orbax"))):
      if raise_notfound:
        raise FileNotFoundError(f"No checkpoint at {path}")
      return self
    self._ensure_initialized()
    params, bs, aux = load_weights(path, self._state.params,
                                   self._state.batch_stats,
                                   self._state.aux_params)
    self._state = self._state.replace(params=params, batch_stats=bs,
                                      aux_params=aux)
    hist_path = os.path.join(path, "history.json")
    if os.path.isfile(hist_path) and self.trainer is None:
      import json
      with open(hist_path) as f:
        self._loaded_history = json.load(f)
    return self

  save = save_weights

  def __repr__(self):
    return (f"{type(self).__name__}(id='{self.id}', outputs={self.outputs}, "
            f"latents={self.latents}, semi={self.is_semi_supervised})")
