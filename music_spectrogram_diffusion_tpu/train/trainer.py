"""Sharded training loop.

Replaces the external t5x trainer the reference delegates to
(reference gin/train.gin:50-66,101-123): optax Adafactor (decay 0.8),
constant LR with linear warmup, optional microbatching via gradient
accumulation, and a jit-compiled train step over a ('data', 'model')
mesh. Sharding is carried by the arrays themselves (committed
NamedShardings set at state creation / batch placement); GSPMD inserts
the gradient all-reduce and tensor-parallel collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from music_spectrogram_diffusion_tpu import config as cfg_lib
from music_spectrogram_diffusion_tpu.parallel import mesh as mesh_lib

Array = jnp.ndarray
PyTree = Any


@flax.struct.dataclass
class TrainState:
  step: Array
  params: PyTree
  opt_state: optax.OptState


def warmup_constant_schedule(learning_rate: float,
                             warmup_steps: int) -> optax.Schedule:
  """Linear warmup to a constant LR (reference: t5x WarmupConstant)."""
  def schedule(step):
    return learning_rate * jnp.minimum(
        1.0, (step + 1) / jnp.maximum(1, warmup_steps))
  return schedule


def make_optimizer(
    train_cfg: cfg_lib.TrainConfig) -> optax.GradientTransformation:
  """Adafactor with factored second moments, matching the reference setup."""
  tx = optax.adafactor(
      learning_rate=warmup_constant_schedule(
          train_cfg.learning_rate, train_cfg.warmup_steps),
      decay_rate=train_cfg.adafactor_decay_rate,
      decay_offset=0,
      multiply_by_parameter_scale=True,
      clipping_threshold=1.0,
  )
  if train_cfg.num_microbatches > 1:
    tx = optax.MultiSteps(tx, every_k_schedule=train_cfg.num_microbatches)
  return tx


@dataclasses.dataclass
class Trainer:
  """Owns the sharded train/eval steps for one model.

  Usage:
    trainer = Trainer(model=m, train_cfg=cfg, mesh=mesh)
    state = trainer.create_state(rng, input_shapes, input_types)
    state, metrics = trainer.train_step(state, trainer.shard_batch(batch),
                                        rng)
  """
  model: Any  # has loss_fn(params, batch, rng) and init_variables(...)
  train_cfg: cfg_lib.TrainConfig
  mesh: jax.sharding.Mesh
  rules: Any = mesh_lib.DEFAULT_RULES

  def __post_init__(self):
    self.optimizer = make_optimizer(self.train_cfg)
    self._param_shardings = None
    self._train_step_fn: Optional[Callable] = None
    self._eval_step_fn: Optional[Callable] = None

  # -- state creation -------------------------------------------------------

  def create_state(self, rng: jax.Array,
                   input_shapes: Mapping[str, Tuple[int, ...]],
                   input_types: Optional[Mapping[str, Any]] = None,
                   params: Optional[PyTree] = None) -> TrainState:
    """Initialize (or adopt) params and optimizer state, sharded on mesh."""
    with self.mesh, mesh_lib.axis_rules(self.rules):
      variables = jax.jit(
          lambda r: self.model.init_variables(r, input_shapes, input_types)
      )(rng)
      self._param_shardings = mesh_lib.param_shardings(
          variables, self.mesh, self.rules)
      if params is None:
        params = variables["params"]
      params = mesh_lib.shard_pytree(params, self._param_shardings)
      opt_state = jax.jit(self.optimizer.init)(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state)

  @property
  def param_shardings(self):
    return self._param_shardings

  def shard_batch(self, batch: Dict[str, Array]) -> Dict[str, Array]:
    """Place this host's batch on the mesh, sharded over 'data'.

    Single-process: a device_put of the full batch. Multi-host: `batch`
    is the PROCESS-LOCAL slice (global_batch / process_count examples);
    every host's slices assemble into one globally-sharded array
    (t5x-style per-host feeding).
    """
    data_size = self.mesh.shape["data"]
    local_size = next(iter(batch.values())).shape[0]
    global_size = local_size * jax.process_count()
    if global_size % data_size != 0:
      raise ValueError(
          f"global batch size {global_size} is not divisible by the "
          f"data mesh axis ({data_size} devices)")
    from music_spectrogram_diffusion_tpu.parallel import multihost
    return multihost.host_local_batch_to_global(batch, self.mesh)

  # -- steps ----------------------------------------------------------------

  def _step_fn(self, state: TrainState, batch: Dict[str, Array],
               rng: jax.Array,
               aux=None) -> Tuple[TrainState, Dict[str, Array]]:
    dropout_rng = jax.random.fold_in(rng, state.step)

    def loss_fn(params):
      if aux is None:
        return self.model.loss_fn(params, batch, dropout_rng)
      return self.model.loss_fn(params, batch, dropout_rng, aux)

    (_, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt_state = self.optimizer.update(
        grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics = dict(metrics)
    metrics["grad_norm"] = optax.global_norm(grads)
    return TrainState(step=state.step + 1, params=new_params,
                      opt_state=new_opt_state), metrics

  def train_step(self, state: TrainState, batch: Dict[str, Array],
                 rng: jax.Array) -> Tuple[TrainState, Dict[str, Array]]:
    # Models may expose `aux_params` (e.g. the distillation teacher's
    # frozen tree): it is threaded through the jit as a real argument —
    # a closure capture would bake ~#params of literal constants into
    # the serialized program.
    aux = getattr(self.model, "aux_params", None)
    if self._train_step_fn is None:
      self._train_step_fn = jax.jit(self._step_fn, donate_argnums=(0,))
    with self.mesh, mesh_lib.axis_rules(self.rules):
      if aux is None:
        return self._train_step_fn(state, batch, rng)
      return self._train_step_fn(state, batch, rng, aux)

  def eval_step(self, state: TrainState,
                batch: Dict[str, Array]) -> Dict[str, Array]:
    aux = getattr(self.model, "aux_params", None)
    if self._eval_step_fn is None:
      self._eval_step_fn = jax.jit(self.model.loss_fn)
    with self.mesh, mesh_lib.axis_rules(self.rules):
      if aux is None:
        _, metrics = self._eval_step_fn(state.params, batch, None)
      else:
        _, metrics = self._eval_step_fn(state.params, batch, None, aux)
      return metrics
