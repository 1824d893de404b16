"""Progressive distillation: target math + one training round (tiny)."""

import pytest

pytestmark = pytest.mark.slow

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from music_spectrogram_diffusion_tpu import config as cfg_lib
from music_spectrogram_diffusion_tpu.audio import codecs
from music_spectrogram_diffusion_tpu.models.diffusion import (
    model as model_lib, network)
from music_spectrogram_diffusion_tpu.ops import diffusion as dops
from music_spectrogram_diffusion_tpu.parallel import mesh as mesh_lib
from music_spectrogram_diffusion_tpu.train import distill, trainer


def test_two_step_target_consistency():
  """One student DDIM step toward x̃ must land exactly where two teacher
  DDIM half-steps land."""
  schedule = dops.Schedule(name="cosine")
  rng = np.random.RandomState(0)
  z_t = jnp.asarray(rng.randn(2, 8, 4).astype(np.float32))
  t = jnp.asarray([1.0, 0.5])
  n_student = 4

  # A fixed nonlinear "teacher" (no clipping so algebra is exact).
  def denoise_x0(z, time):
    return jnp.tanh(z) * 0.5

  x_tilde = distill.two_step_teacher_target(
      denoise_x0, z_t, t, n_student, schedule, clip_x0=False)

  # Recompute the teacher's two half-steps.
  def alpha_sigma(tt):
    logsnr = dops.bcast_left(dops.logsnr_at(tt, schedule), z_t.shape)
    return (jnp.sqrt(jax.nn.sigmoid(logsnr)),
            jnp.sqrt(jax.nn.sigmoid(-logsnr)))

  dt = 1.0 / n_student
  a_t, s_t = alpha_sigma(t)
  a_1, s_1 = alpha_sigma(t - 0.5 * dt)
  a_2, s_2 = alpha_sigma(t - dt)
  x0a = denoise_x0(z_t, t)
  z1 = a_1 * x0a + s_1 * (z_t - a_t * x0a) / s_t
  x0b = denoise_x0(z1, t - 0.5 * dt)
  z2 = a_2 * x0b + s_2 * (z1 - a_1 * x0b) / s_1

  # One student DDIM step from z_t predicting x̃:
  z2_student = a_2 * x_tilde + s_2 * (z_t - a_t * x_tilde) / s_t
  np.testing.assert_allclose(np.asarray(z2_student), np.asarray(z2),
                             rtol=1e-4, atol=1e-4)


def _tiny_model(num_steps=4):
  net_cfg = cfg_lib.network_config("tiny", with_context=True,
                                   vocab_size=256, dropout_rate=0.0)
  module = network.ContextTransformer(config=net_cfg)
  dcfg = dops.DiffusionConfig(
      sampler=dops.SamplerConfig(num_steps=num_steps))
  return model_lib.ContextDiffusionModel(module, dcfg, codecs.MelGan())


def _tiny_batch(rng):
  return {
      "encoder_input_tokens": jnp.asarray(
          rng.randint(1, 200, (2, 16)), jnp.int32),
      "encoder_continuous_inputs": jnp.asarray(
          rng.randn(2, 8, 128).astype(np.float32)),
      "encoder_continuous_mask": jnp.ones((2, 8), bool),
      "decoder_target_tokens": jnp.asarray(
          rng.randn(2, 8, 128).astype(np.float32)),
      "decoder_target_mask": jnp.ones((2, 8), bool),
  }


def test_distill_round_trains():
  """One distillation round on the tiny model: finite loss, params move,
  student starts from teacher weights."""
  rng = np.random.RandomState(1)
  batch = _tiny_batch(rng)
  teacher = _tiny_model(num_steps=4)
  t_params = teacher.init_variables(
      jax.random.PRNGKey(0), {k: v.shape for k, v in batch.items()},
      {k: v.dtype for k, v in batch.items()})["params"]

  student = _tiny_model(num_steps=2)
  dmodel = distill.DistillModel(student, teacher, t_params,
                                num_student_steps=2)

  mesh = mesh_lib.make_mesh(data=2, model=1, devices=jax.devices()[:2])
  t = trainer.Trainer(
      model=dmodel,
      train_cfg=cfg_lib.TrainConfig(learning_rate=1e-3, warmup_steps=1),
      mesh=mesh)
  state = t.create_state(
      jax.random.PRNGKey(0), {k: v.shape for k, v in batch.items()},
      {k: v.dtype for k, v in batch.items()}, params=t_params)

  p_before = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
  np.testing.assert_array_equal(
      p_before, np.asarray(jax.tree_util.tree_leaves(t_params)[0]))

  sharded = t.shard_batch(batch)
  losses = []
  for i in range(3):
    state, metrics = t.train_step(state, sharded, jax.random.PRNGKey(2))
    losses.append(float(metrics["loss"]))
  assert all(np.isfinite(l) for l in losses), losses
  p_after = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
  assert not np.array_equal(p_before, p_after)


def test_student_experiment_halves_and_drops_cfg():
  exp = cfg_lib.preset("context_tiny")
  s = distill.student_experiment(exp, 500)
  assert s.diffusion.sampler.num_steps == 500
  assert s.diffusion.sampler.name == "ddim"
  assert s.diffusion.guidance.eval_condition_weight == 1.0
  # Weight 1.0 disables the CFG double-forward entirely in the sampler.
  assert exp.diffusion.guidance.eval_condition_weight != 1.0
