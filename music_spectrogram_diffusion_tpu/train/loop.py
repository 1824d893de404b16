"""High-level training loop: data -> sharded steps -> checkpoints -> logs.

Replaces the external t5x train binary the reference delegates to
(reference gin/train.gin): checkpoint every `checkpoint_period` steps,
loss/throughput metrics each log period, optional train-eval pass.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import numpy as np

from music_spectrogram_diffusion_tpu import config as cfg_lib
from music_spectrogram_diffusion_tpu.train import checkpoints
from music_spectrogram_diffusion_tpu.train import metrics as metrics_lib
from music_spectrogram_diffusion_tpu.train import trainer as trainer_lib


class MetricsLogger:
  """JSONL metrics writer (one line per log step) + stdout echo."""

  def __init__(self, log_dir: Optional[str], echo: bool = True):
    self._file = None
    self._echo = echo
    if log_dir:
      os.makedirs(log_dir, exist_ok=True)
      self._file = open(os.path.join(log_dir, "metrics.jsonl"), "a")

  def write(self, step: int, metrics: Dict[str, Any]) -> None:
    payload = {"step": step}
    for k, v in metrics.items():
      try:
        payload[k] = float(v)
      except (TypeError, ValueError):
        continue
    if self._file:
      self._file.write(json.dumps(payload) + "\n")
      self._file.flush()
    if self._echo:
      parts = " ".join(f"{k}={v:.5g}" for k, v in payload.items()
                       if k != "step")
      print(f"[step {step}] {parts}")

  def close(self):
    if self._file:
      self._file.close()


@dataclasses.dataclass
class TrainLoop:
  """Drives Trainer over a data iterator with checkpointing."""
  trainer: trainer_lib.Trainer
  experiment: cfg_lib.ExperimentConfig
  model_dir: str
  log_period: int = 100
  eval_fn: Optional[Callable[[trainer_lib.TrainState], Dict[str, float]]] = None

  def maybe_resume(self, state: trainer_lib.TrainState
                   ) -> trainer_lib.TrainState:
    """Resume the full TrainState (params + optimizer state + step) from
    the latest checkpoint in model_dir, if any (reference
    gin/resume.gin + gin/train.gin:115-123 save/restore full state).
    Older params-only checkpoints restore params and keep the fresh
    optimizer state."""
    latest = checkpoints.latest_checkpoint(self.model_dir)
    if latest is None:
      return state
    meta = checkpoints.checkpoint_metadata(latest)
    target = {"params": jax.tree.map(np.asarray, state.params)}
    if meta.get("has_opt_state"):
      target["opt_state"] = jax.tree.map(np.asarray, state.opt_state)
    restored = checkpoints.restore_checkpoint(latest, target=target)

    # Restored leaves are committed by device_put; every one must live on
    # the same device set or the jitted train step rejects the mix. Keep
    # mesh shardings as-is and lift single-device leaves (optimizer
    # scalars like Adafactor's count) to mesh-replicated.
    replicated = jax.sharding.NamedSharding(
        self.trainer.mesh, jax.sharding.PartitionSpec())

    def _replace(like, value):
      def put(a, b):
        sh = a.sharding
        if not isinstance(sh, jax.sharding.NamedSharding):
          sh = replicated
        return jax.device_put(b, sh)
      return jax.tree.map(put, like, value)

    params = _replace(state.params, restored["params"])
    opt_state = state.opt_state
    if meta.get("has_opt_state"):
      opt_state = _replace(state.opt_state, restored["opt_state"])
    step = restored.get("step", 0)
    print(f"resumed from {latest} at step {step} "
          f"(opt_state={'restored' if meta.get('has_opt_state') else 'fresh'})")
    step_arr = jax.device_put(np.asarray(step, np.int32), replicated)
    return trainer_lib.TrainState(
        step=step_arr, params=params, opt_state=opt_state)

  def run(self,
          train_iter: Iterator[Dict[str, np.ndarray]],
          state: trainer_lib.TrainState,
          num_steps: Optional[int] = None,
          rng: Optional[jax.Array] = None) -> trainer_lib.TrainState:
    if rng is None:
      rng = jax.random.PRNGKey(0)
    train_cfg = self.experiment.train
    num_steps = num_steps or train_cfg.train_steps
    # Only process 0 writes checkpoints/metrics (multi-host training:
    # every process runs this loop over the same global mesh).
    primary = jax.process_index() == 0
    logger = MetricsLogger(self.model_dir if primary else None,
                           echo=primary)

    start_step = int(state.step)
    window_t0 = time.time()
    window_start = start_step
    window_frames = 0.0
    window_seqs = 0.0
    n_devices = len(jax.devices())

    # Counters stay device-side (lazy jax scalars) between log periods so
    # the loop never forces a device->host sync per step; only the log /
    # checkpoint boundaries fetch values.
    for step in range(start_step + 1, num_steps + 1):
      batch = self.trainer.shard_batch(next(train_iter))
      state, metrics = self.trainer.train_step(state, batch, rng)
      window_frames = window_frames + metrics["n_frames"]
      window_seqs = window_seqs + metrics["n_seqs"]

      if step % self.log_period == 0 or step == num_steps:
        elapsed = time.time() - window_t0
        # seconds_per_step is the PER-STEP mean over the window (the
        # first window also absorbs the trace+compile time).
        window_steps = max(step - window_start, 1)
        logged = {k: v for k, v in metrics.items()}
        logged.update(metrics_lib.throughput_metrics(
            float(window_seqs), float(window_frames),
            max(elapsed, 1e-9), n_devices,
            num_steps=window_steps))
        logger.write(step, logged)
        window_t0 = time.time()
        window_start = step
        window_frames = window_seqs = 0.0

      if step % train_cfg.checkpoint_period == 0 or step == num_steps:
        # All processes participate (orbax coordinates the multi-host
        # save); plain-file sidecars are written by process 0 only.
        path = checkpoints.save_checkpoint(
            self.model_dir, step, state.params,
            opt_state=state.opt_state,
            config_json=self.experiment.to_json())
        if primary:
          print(f"saved checkpoint: {path}")

      if (self.eval_fn is not None and
          step % train_cfg.eval_period == 0):
        eval_metrics = self.eval_fn(state)
        logger.write(step, {f"eval/{k}": v
                            for k, v in eval_metrics.items()})

    logger.close()
    return state
