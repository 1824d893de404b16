"""Multi-host scaffolding (single-process exercises of the pod paths,
plus a real 2-subprocess jax.distributed run)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_spectrogram_diffusion_tpu.data import core
from music_spectrogram_diffusion_tpu.parallel import mesh as mesh_lib
from music_spectrogram_diffusion_tpu.parallel import multihost


def test_host_local_batch_to_global_single_process():
  """With one process the assembled batch equals a plain sharded put."""
  mesh = mesh_lib.make_mesh(data=4, model=1, devices=jax.devices()[:4])
  local = {"x": np.arange(32, dtype=np.float32).reshape(8, 4),
           "y": np.arange(8, dtype=np.int32)}
  out = multihost.host_local_batch_to_global(local, mesh)
  assert out["x"].shape == (8, 4)
  np.testing.assert_array_equal(np.asarray(out["x"]), local["x"])
  # Sharded over 'data': 4 shards of 2 rows each.
  assert len(out["x"].sharding.device_set) == 4


def test_process_local_batch_size():
  assert multihost.process_local_batch_size(256) == 256  # 1 process


def test_shard_for_host_round_robin():
  ds = core.Dataset.from_list([{"i": np.asarray(i)} for i in range(10)])
  shard0 = [int(e["i"]) for e in multihost.shard_for_host(ds, 3, 0)]
  shard1 = [int(e["i"]) for e in multihost.shard_for_host(ds, 3, 1)]
  shard2 = [int(e["i"]) for e in multihost.shard_for_host(ds, 3, 2)]
  assert shard0 == [0, 3, 6, 9]
  assert shard1 == [1, 4, 7]
  assert shard2 == [2, 5, 8]
  assert sorted(shard0 + shard1 + shard2) == list(range(10))


def test_is_primary():
  assert multihost.is_primary()


def test_microbatching_accumulates_before_update():
  """num_microbatches=2: params move only every second train_step call."""
  from music_spectrogram_diffusion_tpu import config as cfg_lib
  from music_spectrogram_diffusion_tpu.audio import codecs
  from music_spectrogram_diffusion_tpu.models.diffusion import (
      model as model_lib, network)
  from music_spectrogram_diffusion_tpu.ops import diffusion as dops
  from music_spectrogram_diffusion_tpu.train import trainer as trainer_lib

  net_cfg = cfg_lib.network_config("tiny", with_context=True,
                                   vocab_size=256, dropout_rate=0.0)
  model = model_lib.ContextDiffusionModel(
      network.ContextTransformer(config=net_cfg),
      dops.DiffusionConfig(sampler=dops.SamplerConfig(num_steps=2)),
      codecs.MelGan())
  r = np.random.RandomState(0)
  batch = {
      "encoder_input_tokens": jnp.asarray(
          r.randint(1, 200, (2, 16)), jnp.int32),
      "encoder_continuous_inputs": jnp.asarray(
          r.randn(2, 8, 128).astype(np.float32)),
      "encoder_continuous_mask": jnp.ones((2, 8), bool),
      "decoder_target_tokens": jnp.asarray(
          r.randn(2, 8, 128).astype(np.float32)),
      "decoder_target_mask": jnp.ones((2, 8), bool),
  }
  mesh = mesh_lib.make_mesh(data=2, model=1, devices=jax.devices()[:2])
  t = trainer_lib.Trainer(
      model=model, train_cfg=cfg_lib.TrainConfig(num_microbatches=2),
      mesh=mesh)
  state0 = t.create_state(
      jax.random.PRNGKey(0), {k: v.shape for k, v in batch.items()},
      {k: v.dtype for k, v in batch.items()})
  p0 = np.asarray(jax.tree_util.tree_leaves(state0.params)[0]).copy()

  sharded = t.shard_batch(batch)
  state1, _ = t.train_step(state0, sharded, jax.random.PRNGKey(1))
  p1 = np.asarray(jax.tree_util.tree_leaves(state1.params)[0])
  np.testing.assert_array_equal(p0, p1)  # accumulating, no update yet

  state2, _ = t.train_step(state1, sharded, jax.random.PRNGKey(1))
  p2 = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
  assert not np.array_equal(p1, p2)  # second microbatch applies the step


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
  """REAL multi-process training: 2 subprocesses (4 virtual CPU devices
  each) coordinate through jax.distributed, feed per-host shards
  through shard_batch/make_array_from_process_local_data, train 3
  steps, and must land on the same params as a single-process run over
  the identical global batches (t5x pod-training semantics, reference
  gin/train.gin:110-112)."""
  import os
  import socket
  import subprocess
  import sys as _sys

  import pytest as _pytest

  from tests import multihost_worker

  # Free port for the coordination service.
  with socket.socket() as s:
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]

  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  env = {**os.environ,
         "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
         "JAX_PLATFORMS": "cpu"}
  out = str(tmp_path / "params0.npz")
  procs = [
      subprocess.Popen(
          [_sys.executable, "-m", "tests.multihost_worker",
           str(pid), "2", str(port), out],
          cwd=repo, env=env,
          stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
      for pid in range(2)
  ]
  logs = []
  try:
    for p in procs:
      stdout, _ = p.communicate(timeout=600)
      logs.append(stdout.decode(errors="replace"))
  except subprocess.TimeoutExpired:
    for p in procs:
      p.kill()
    _pytest.fail("multihost workers timed out")
  for p, log in zip(procs, logs):
    assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

  multi = dict(np.load(out))

  # Single-process reference over the same ASSEMBLED global batches
  # (this test process runs with 8 virtual devices via conftest).
  single = multihost_worker.run_training(
      lambda step: multihost_worker.assembled_order(step))
  assert set(multi) == set(single)
  for k in single:
    np.testing.assert_allclose(
        multi[k], single[k], atol=2e-5, rtol=1e-5,
        err_msg=f"param {k} diverged between 1- and 2-process runs")
