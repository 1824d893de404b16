"""Training loop + checkpoint round trip on the synthetic task (CPU)."""

import pytest

pytestmark = pytest.mark.slow

import dataclasses
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from music_spectrogram_diffusion_tpu import config as cfg_lib
from music_spectrogram_diffusion_tpu.audio import codecs
from music_spectrogram_diffusion_tpu.data import synthetic, tasks
from music_spectrogram_diffusion_tpu.infer import inference
from music_spectrogram_diffusion_tpu.midi import vocabularies
from music_spectrogram_diffusion_tpu.parallel import mesh as mesh_lib
from music_spectrogram_diffusion_tpu.train import (checkpoints, loop,
                                                   trainer)

LENGTHS = {"inputs": 64, "targets": 16, "targets_context": 16}


def tiny_experiment(tmpdir):
  return dataclasses.replace(
      cfg_lib.preset("context_tiny"),
      vocab_size=1536,
      train=cfg_lib.TrainConfig(
          batch_size=2, learning_rate=1e-3, warmup_steps=2,
          train_steps=3, checkpoint_period=3, eval_period=100),
      task_lengths=cfg_lib.TaskLengths(**LENGTHS),
      diffusion=dataclasses.replace(
          cfg_lib.ExperimentConfig().diffusion,
          sampler=dataclasses.replace(
              cfg_lib.ExperimentConfig().diffusion.sampler, num_steps=2)))


def test_train_loop_and_checkpoint_restore(tmp_path):
  model_dir = str(tmp_path / "run")
  experiment = tiny_experiment(model_dir)
  model = inference.build_model(experiment)

  task = tasks.Task(
      name="tiny_train",
      source_fn=lambda: synthetic.synthetic_source(2, duration=3.0),
      audio_codec=model.audio_codec,
      vocab_config=vocabularies.VocabularyConfig(num_velocity_bins=1),
      note_rep=tasks.NoteRepresentationConfig(include_ties=True))
  ds = (task.model_dataset(LENGTHS, training=True).repeat().batch(2))

  mesh = mesh_lib.make_mesh(data=2, model=1, devices=jax.devices()[:2])
  t = trainer.Trainer(model=model, train_cfg=experiment.train, mesh=mesh)
  first = ds.first()
  state = t.create_state(
      jax.random.PRNGKey(0),
      {k: v.shape for k, v in first.items()},
      {k: jnp.asarray(v).dtype for k, v in first.items()})

  train_loop = loop.TrainLoop(
      trainer=t, experiment=experiment, model_dir=model_dir, log_period=1)
  state = train_loop.run(iter(ds), state, num_steps=3)
  assert int(state.step) == 3

  # Metrics were logged.
  lines = open(os.path.join(model_dir, "metrics.jsonl")).read().splitlines()
  assert len(lines) >= 3
  rec = json.loads(lines[0])
  assert "loss" in rec and np.isfinite(rec["loss"])

  # Checkpoint written at step 3 with config.
  ckpts = glob.glob(os.path.join(model_dir, "step_*"))
  assert len(ckpts) == 1 and ckpts[0].endswith("step_3")

  # Restore through the InferenceModel wrapper and predict.
  wrapper = inference.InferenceModel(model_dir, sampler_steps=2)
  assert wrapper.step == 3
  assert wrapper.experiment.size == "tiny"
  batch = {
      "encoder_input_tokens": np.ones((1, LENGTHS["inputs"]), np.int32),
      "encoder_continuous_inputs": np.zeros(
          (1, LENGTHS["targets_context"], 128), np.float32),
      "encoder_continuous_mask": np.zeros(
          (1, LENGTHS["targets_context"]), bool),
      "decoder_target_tokens": np.zeros(
          (1, LENGTHS["targets"], 128), np.float32),
      "decoder_target_mask": np.ones((1, LENGTHS["targets"]), bool),
  }
  out = wrapper.predict(batch, seed=0)
  assert out.shape == (1, LENGTHS["targets"], 128)
  assert np.all(np.isfinite(out))

  # Restored params match the trained state exactly.
  trained = jax.tree_util.tree_leaves(state.params)
  restored = jax.tree_util.tree_leaves(wrapper.params)
  assert len(trained) == len(restored)
  for a, b in zip(trained, restored):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_experiment_config_json_roundtrip():
  exp = cfg_lib.preset("context_base")
  text = exp.to_json()
  exp2 = cfg_lib.ExperimentConfig.from_json(text)
  assert exp2 == exp


def test_resume_from_checkpoint(tmp_path):
  """maybe_resume picks up params + step from the latest checkpoint."""
  model_dir = str(tmp_path / "resume_run")
  experiment = tiny_experiment(model_dir)
  model = inference.build_model(experiment)
  task = tasks.Task(
      name="tiny_resume",
      source_fn=lambda: synthetic.synthetic_source(2, duration=3.0),
      audio_codec=model.audio_codec,
      vocab_config=vocabularies.VocabularyConfig(num_velocity_bins=1),
      note_rep=tasks.NoteRepresentationConfig(include_ties=True))
  ds = task.model_dataset(LENGTHS, training=True).repeat().batch(2)
  mesh = mesh_lib.make_mesh(data=2, model=1, devices=jax.devices()[:2])
  t = trainer.Trainer(model=model, train_cfg=experiment.train, mesh=mesh)
  first = ds.first()
  shapes = {k: v.shape for k, v in first.items()}
  types = {k: jnp.asarray(v).dtype for k, v in first.items()}
  state = t.create_state(jax.random.PRNGKey(0), shapes, types)
  train_loop = loop.TrainLoop(
      trainer=t, experiment=experiment, model_dir=model_dir, log_period=10)
  state = train_loop.run(iter(ds), state, num_steps=3)

  # Fresh state resumes to step 3 with the trained params.
  state2 = t.create_state(jax.random.PRNGKey(99), shapes, types)
  resumed = train_loop.maybe_resume(state2)
  assert int(resumed.step) == 3
  a = jax.tree_util.tree_leaves(state.params)[0]
  b = jax.tree_util.tree_leaves(resumed.params)[0]
  np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_trajectory_matches_uninterrupted(tmp_path):
  """Interrupt-at-checkpoint + resume reproduces the uninterrupted run
  exactly: the full TrainState (params + Adafactor state + step) round
  trips through the checkpoint (reference gin/train.gin:115-123 saves
  full state)."""
  experiment = dataclasses.replace(
      tiny_experiment(None),
      train=cfg_lib.TrainConfig(
          batch_size=2, learning_rate=1e-3, warmup_steps=2,
          train_steps=20, checkpoint_period=10, eval_period=1000))
  model = inference.build_model(experiment)
  task = tasks.Task(
      name="tiny_traj",
      source_fn=lambda: synthetic.synthetic_source(2, duration=3.0),
      audio_codec=model.audio_codec,
      vocab_config=vocabularies.VocabularyConfig(num_velocity_bins=1),
      note_rep=tasks.NoteRepresentationConfig(include_ties=True))
  ds = task.model_dataset(LENGTHS, training=True).repeat().batch(2)
  mesh = mesh_lib.make_mesh(data=2, model=1, devices=jax.devices()[:2])
  first = ds.first()
  shapes = {k: v.shape for k, v in first.items()}
  types = {k: jnp.asarray(v).dtype for k, v in first.items()}

  def fresh(model_dir):
    t = trainer.Trainer(model=model, train_cfg=experiment.train, mesh=mesh)
    state = t.create_state(jax.random.PRNGKey(0), shapes, types)
    return t, loop.TrainLoop(trainer=t, experiment=experiment,
                             model_dir=model_dir, log_period=1000)

  # Uninterrupted: 20 steps straight through.
  t_a, loop_a = fresh(str(tmp_path / "uninterrupted"))
  state_a = loop_a.run(iter(ds), t_a.create_state(
      jax.random.PRNGKey(0), shapes, types), num_steps=20)

  # Interrupted: 10 steps, then a brand-new Trainer resumes from the
  # step_10 checkpoint and consumes the *continuation* of the stream.
  model_dir_b = str(tmp_path / "interrupted")
  t_b1, loop_b1 = fresh(model_dir_b)
  it_b = iter(ds)
  loop_b1.run(it_b, t_b1.create_state(
      jax.random.PRNGKey(0), shapes, types), num_steps=10)

  t_b2, loop_b2 = fresh(model_dir_b)
  state_b = t_b2.create_state(jax.random.PRNGKey(7), shapes, types)
  state_b = loop_b2.maybe_resume(state_b)
  assert int(state_b.step) == 10
  state_b = loop_b2.run(it_b, state_b, num_steps=20)

  assert int(state_a.step) == int(state_b.step) == 20
  for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                  jax.tree_util.tree_leaves(state_b.params)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
