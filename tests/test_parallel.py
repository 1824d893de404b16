"""Mesh/sharding + trainer tests on a virtual 8-device CPU mesh."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from music_spectrogram_diffusion_tpu import config as cfg_lib
from music_spectrogram_diffusion_tpu.audio import codecs
from music_spectrogram_diffusion_tpu.models.diffusion import model as model_lib
from music_spectrogram_diffusion_tpu.models.diffusion import network
from music_spectrogram_diffusion_tpu.ops import diffusion as dops
from music_spectrogram_diffusion_tpu.parallel import mesh as mesh_lib
from music_spectrogram_diffusion_tpu.train import trainer as trainer_lib

B, L_IN, L_CTX, L_TGT, D = 8, 16, 8, 8, 128


def make_batch():
  r = np.random.RandomState(0)
  return {
      "encoder_input_tokens": jnp.asarray(
          r.randint(1, 200, (B, L_IN)), jnp.int32),
      "encoder_continuous_inputs": jnp.asarray(
          r.randn(B, L_CTX, D).astype(np.float32)),
      "encoder_continuous_mask": jnp.ones((B, L_CTX), bool),
      "decoder_target_tokens": jnp.asarray(
          r.randn(B, L_TGT, D).astype(np.float32)),
      "decoder_target_mask": jnp.ones((B, L_TGT), bool),
  }


def make_model():
  net_cfg = cfg_lib.network_config("tiny", with_context=True,
                                   vocab_size=256, dropout_rate=0.0)
  module = network.ContextTransformer(config=net_cfg)
  dcfg = dops.DiffusionConfig(sampler=dops.SamplerConfig(num_steps=2))
  return model_lib.ContextDiffusionModel(module, dcfg, codecs.MelGan())


def test_eight_devices_available():
  assert len(jax.devices()) == 8


def test_mesh_and_param_shardings():
  mesh = mesh_lib.make_mesh(data=4, model=2)
  assert mesh.shape == {"data": 4, "model": 2}

  m = make_model()
  batch = make_batch()
  with mesh, mesh_lib.axis_rules():
    variables = m.init_variables(
        jax.random.PRNGKey(0), {k: v.shape for k, v in batch.items()},
        {k: v.dtype for k, v in batch.items()})
  shardings = mesh_lib.param_shardings(variables, mesh)
  flat = jax.tree_util.tree_leaves_with_path(shardings)
  assert flat, "no param shardings produced"
  # MLP wi kernels ('embed','mlp') must be sharded over 'model' on dim 1.
  specs = {jax.tree_util.keystr(k): v.spec for k, v in flat}
  mlp_specs = [v for k, v in specs.items() if "mlp" in k and "wi" in k]
  assert mlp_specs and all(s == jax.sharding.PartitionSpec(None, "model")
                           for s in mlp_specs), mlp_specs


def test_train_step_dp_tp():
  """One full training step under 4-way data x 2-way tensor parallelism."""
  mesh = mesh_lib.make_mesh(data=4, model=2)
  m = make_model()
  batch = make_batch()
  trainer = trainer_lib.Trainer(
      model=m, train_cfg=cfg_lib.TrainConfig(num_microbatches=1),
      mesh=mesh)
  state = trainer.create_state(
      jax.random.PRNGKey(0), {k: v.shape for k, v in batch.items()},
      {k: v.dtype for k, v in batch.items()})
  sharded_batch = trainer.shard_batch(batch)
  state2, metrics = trainer.train_step(state, sharded_batch,
                                       jax.random.PRNGKey(1))
  assert int(state2.step) == 1
  assert np.isfinite(float(metrics["loss"]))
  assert float(metrics["grad_norm"]) > 0
  # Params actually changed.
  l0 = jax.tree_util.tree_leaves(state2.params)[0]
  assert np.all(np.isfinite(np.asarray(l0)))

  # Second step reuses the compiled function.
  state3, metrics3 = trainer.train_step(state2, sharded_batch,
                                        jax.random.PRNGKey(1))
  assert int(state3.step) == 2
  assert np.isfinite(float(metrics3["loss"]))


def test_data_parallel_matches_single_device():
  """DP-8 training step must produce the same loss as single-device."""
  m = make_model()
  batch = make_batch()
  shapes = {k: v.shape for k, v in batch.items()}
  types = {k: v.dtype for k, v in batch.items()}

  mesh8 = mesh_lib.make_mesh(data=8, model=1)
  tr8 = trainer_lib.Trainer(model=m, train_cfg=cfg_lib.TrainConfig(),
                            mesh=mesh8)
  s8 = tr8.create_state(jax.random.PRNGKey(0), shapes, types)
  _, m8 = tr8.train_step(s8, tr8.shard_batch(batch), jax.random.PRNGKey(1))

  mesh1 = mesh_lib.make_mesh(data=1, model=1, devices=jax.devices()[:1])
  tr1 = trainer_lib.Trainer(model=m, train_cfg=cfg_lib.TrainConfig(),
                            mesh=mesh1)
  s1 = tr1.create_state(jax.random.PRNGKey(0), shapes, types)
  _, m1 = tr1.train_step(s1, tr1.shard_batch(batch), jax.random.PRNGKey(1))

  np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                             rtol=1e-4)


def test_sharded_inference_matches_single_device(tmp_path):
  """InferenceModel with a mesh: tensor-parallel predict == unsharded."""
  import dataclasses
  import os
  from music_spectrogram_diffusion_tpu import config as cfg_lib
  from music_spectrogram_diffusion_tpu.infer import inference
  from music_spectrogram_diffusion_tpu.train import checkpoints

  lengths = cfg_lib.TaskLengths(inputs=16, targets=8, targets_context=8)
  experiment = dataclasses.replace(
      cfg_lib.preset("context_tiny"),
      vocab_size=256,
      task_lengths=lengths,
      dropout_rate=0.0,
      diffusion=dataclasses.replace(
          cfg_lib.ExperimentConfig().diffusion,
          sampler=dataclasses.replace(
              cfg_lib.ExperimentConfig().diffusion.sampler, num_steps=2)))
  m = inference.build_model(experiment)
  shapes = {
      "encoder_input_tokens": (1, 16),
      "encoder_continuous_inputs": (1, 8, 128),
      "encoder_continuous_mask": (1, 8),
      "decoder_target_tokens": (1, 8, 128)}
  params = m.init_variables(jax.random.PRNGKey(0), shapes)["params"]
  ckpt = checkpoints.save_checkpoint(
      str(tmp_path), 1, params, config_json=experiment.to_json())

  batch = {
      "encoder_input_tokens": jnp.asarray(
          np.random.RandomState(0).randint(1, 200, (2, 16)), jnp.int32),
      "encoder_continuous_inputs": jnp.zeros((2, 8, 128)),
      "encoder_continuous_mask": jnp.ones((2, 8), bool),
      "decoder_target_tokens": jnp.zeros((2, 8, 128)),
      "decoder_target_mask": jnp.ones((2, 8), bool),
  }
  plain = inference.InferenceModel(ckpt)
  mesh = mesh_lib.make_mesh(data=2, model=2,
                            devices=jax.devices()[:4])
  sharded = inference.InferenceModel(ckpt, mesh=mesh)
  out_plain = plain.predict(batch, seed=3)
  out_sharded = sharded.predict(batch, seed=3)
  np.testing.assert_allclose(out_sharded, out_plain, rtol=2e-4,
                             atol=2e-4)
