"""Shared tiny-training harness for the real 2-process multihost test.

`run_training` is used both by the worker subprocesses (2 processes x 4
virtual CPU devices, jax.distributed coordination) and by the
single-process reference run inside the test (8 virtual devices, same
global mesh shape) — final params must match.

Run as a module (one worker process):
  python -m tests.multihost_worker <process_id> <num_processes> <port> <out.npz>
"""

from __future__ import annotations

import sys

import numpy as np

GLOBAL_BATCH = 8
STEPS = 3
TARGET_FRAMES = 8
INPUT_TOKENS = 16


def make_example(i: int):
  """Deterministic example for global stream position i."""
  r = np.random.RandomState(1000 + i)
  return {
      "encoder_input_tokens": r.randint(
          1, 200, (INPUT_TOKENS,)).astype(np.int32),
      "encoder_continuous_inputs": r.randn(
          TARGET_FRAMES, 128).astype(np.float32),
      "encoder_continuous_mask": np.ones((TARGET_FRAMES,), bool),
      "decoder_target_tokens": r.randn(
          TARGET_FRAMES, 128).astype(np.float32),
      "decoder_target_mask": np.ones((TARGET_FRAMES,), bool),
  }


def assembled_order(step: int, num_feeders: int = 2):
  """Global-batch example ids in ASSEMBLED order for one step.

  Host h of `num_feeders` feeds the round-robin ids
  [step*B + feeder + num_feeders*j]; the global array concatenates the
  hosts' local slices in process order. The single-process reference
  feeds this exact order so both settings train on identical batches.
  """
  order = []
  for h in range(num_feeders):
    order.extend(step * GLOBAL_BATCH + h + num_feeders * j
                 for j in range(GLOBAL_BATCH // num_feeders))
  return order


def run_training(local_ids_fn):
  """Train STEPS steps; local_ids_fn(step) -> this process's example ids
  (in local feeding order). Returns the final params as a flat dict."""
  import jax

  from music_spectrogram_diffusion_tpu import config as cfg_lib
  from music_spectrogram_diffusion_tpu.audio import codecs
  from music_spectrogram_diffusion_tpu.models.diffusion import (
      model as model_lib, network)
  from music_spectrogram_diffusion_tpu.ops import diffusion as dops
  from music_spectrogram_diffusion_tpu.parallel import multihost
  from music_spectrogram_diffusion_tpu.train import checkpoints
  from music_spectrogram_diffusion_tpu.train import trainer as trainer_lib

  net_cfg = cfg_lib.network_config("tiny", with_context=True,
                                   vocab_size=256, dropout_rate=0.0)
  model = model_lib.ContextDiffusionModel(
      network.ContextTransformer(config=net_cfg),
      dops.DiffusionConfig(sampler=dops.SamplerConfig(num_steps=2)),
      codecs.MelGan())
  mesh = multihost.global_mesh(model=1)
  t = trainer_lib.Trainer(model=model, train_cfg=cfg_lib.TrainConfig(),
                          mesh=mesh)

  def local_batch(step):
    exs = [make_example(i) for i in local_ids_fn(step)]
    return {k: np.stack([e[k] for e in exs]) for k in exs[0]}

  first = local_batch(0)
  state = t.create_state(jax.random.PRNGKey(0),
                         {k: v.shape for k, v in first.items()},
                         {k: v.dtype for k, v in first.items()})
  for step in range(STEPS):
    sharded = t.shard_batch(local_batch(step))
    state, _ = t.train_step(state, sharded, jax.random.PRNGKey(42))

  # model=1 mesh -> params are replicated, hence fully addressable on
  # every process; np.asarray reads the local replica.
  flat = checkpoints._flatten(
      jax.tree_util.tree_map(np.asarray, state.params))
  return {k: np.asarray(v) for k, v in flat.items()}


def main():
  process_id, num_processes = int(sys.argv[1]), int(sys.argv[2])
  port, out_path = sys.argv[3], sys.argv[4]

  import jax
  jax.config.update("jax_platforms", "cpu")  # axon sitecustomize guard
  jax.distributed.initialize(
      coordinator_address=f"127.0.0.1:{port}",
      num_processes=num_processes, process_id=process_id)
  assert jax.process_count() == num_processes
  assert len(jax.devices()) == 8, jax.devices()

  n = num_processes

  def my_ids(step):
    return [step * GLOBAL_BATCH + process_id + n * j
            for j in range(GLOBAL_BATCH // n)]

  params = run_training(my_ids)
  if jax.process_index() == 0:
    np.savez(out_path, **params)
  # All processes must exit cleanly together.
  jax.experimental.multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
  main()
