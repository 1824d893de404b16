"""Coverage for architecture variants: cross-attend styles, position
encodings, logvar types, DDIM, discrete time."""

import pytest

pytestmark = pytest.mark.slow

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_spectrogram_diffusion_tpu import config as cfg_lib
from music_spectrogram_diffusion_tpu.audio import codecs
from music_spectrogram_diffusion_tpu.models.diffusion import (
    model as model_lib, network)
from music_spectrogram_diffusion_tpu.ops import diffusion as dops

B, L_IN, L_CTX, L_TGT, D = 1, 12, 8, 8, 128


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


def run_variant(net_kwargs=None, dcfg=None):
  cfg = cfg_lib.network_config("tiny", with_context=True, vocab_size=256,
                               dropout_rate=0.0)
  if net_kwargs:
    cfg = dataclasses.replace(cfg, **net_kwargs)
  module = network.ContextTransformer(config=cfg)
  dcfg = dcfg or dops.DiffusionConfig(
      sampler=dops.SamplerConfig(num_steps=2))
  m = model_lib.ContextDiffusionModel(module, dcfg, codecs.MelGan())
  batch = make_batch()
  params = m.init_variables(
      jax.random.PRNGKey(0), {k: v.shape for k, v in batch.items()},
      {k: v.dtype for k, v in batch.items()})["params"]
  loss, _ = m.loss_fn(params, batch, jax.random.PRNGKey(1))
  out, _ = m.predict(params, batch, jax.random.PRNGKey(2))
  assert np.isfinite(float(loss))
  assert out.shape == (B, L_TGT, D)
  assert np.all(np.isfinite(np.asarray(out)))
  return out


def test_sum_cross_attends():
  run_variant({"cross_attend_style": "sum_cross_attends"})


@pytest.mark.parametrize("pe", ["fixed", "learnable_permuted_offset",
                                "random"])
def test_position_encodings(pe):
  run_variant({"position_encoding": pe})


def test_regular_context_positions():
  run_variant({"context_positions": "regular"})


@pytest.mark.parametrize("logvar", ["small", "medium:0.5"])
def test_logvar_types(logvar):
  run_variant(dcfg=dops.DiffusionConfig(
      sampler=dops.SamplerConfig(num_steps=2, logvar_type=logvar)))


def test_ddim_sampler():
  run_variant(dcfg=dops.DiffusionConfig(
      sampler=dops.SamplerConfig(name="ddim", num_steps=2)))


def test_discrete_time_training():
  run_variant(dcfg=dops.DiffusionConfig(
      time_sampling="discrete",
      train_schedule=dops.Schedule(name="cosine", num_steps=1000),
      sampler=dops.SamplerConfig(num_steps=2)))


def test_linear_train_schedule():
  run_variant(dcfg=dops.DiffusionConfig(
      train_schedule=dops.Schedule(name="linear", start=1e-4, stop=0.02,
                                   num_steps=1000),
      sampler=dops.SamplerConfig(num_steps=2)))


def test_no_guidance():
  run_variant(dcfg=dops.DiffusionConfig(
      guidance=dops.GuidanceConfig(eval_condition_weight=1.0),
      sampler=dops.SamplerConfig(num_steps=2)))


@pytest.mark.parametrize("loss_cfg", [("l2", "eps"), ("l1", "x0"),
                                      ("l2", "x0_and_eps")])
def test_loss_variants(loss_cfg):
  norm, ltype = loss_cfg
  run_variant(dcfg=dops.DiffusionConfig(
      loss_norm=norm, loss_type=ltype,
      sampler=dops.SamplerConfig(num_steps=2)))


def test_v_parameterisation():
  run_variant(dcfg=dops.DiffusionConfig(
      model_output="v", sampler=dops.SamplerConfig(num_steps=2)))


def test_remat_matches_plain():
  """Rematerialized layers: identical loss and gradients."""
  batch = make_batch()

  def build(remat):
    cfg = cfg_lib.network_config("tiny", with_context=True,
                                 vocab_size=256, dropout_rate=0.0,
                                 remat=remat)
    module = network.ContextTransformer(config=cfg)
    return model_lib.ContextDiffusionModel(
        module, dops.DiffusionConfig(
            sampler=dops.SamplerConfig(num_steps=2)), codecs.MelGan())

  m_plain = build(False)
  params = m_plain.init_variables(
      jax.random.PRNGKey(0), {k: v.shape for k, v in batch.items()},
      {k: v.dtype for k, v in batch.items()})["params"]
  m_remat = build(True)

  loss_plain, _ = m_plain.loss_fn(params, batch, jax.random.PRNGKey(1))
  loss_remat, _ = m_remat.loss_fn(params, batch, jax.random.PRNGKey(1))
  np.testing.assert_allclose(float(loss_remat), float(loss_plain),
                             rtol=1e-6)
  g_plain = jax.grad(
      lambda p: m_plain.loss_fn(p, batch, jax.random.PRNGKey(1))[0])(
          params)
  g_remat = jax.grad(
      lambda p: m_remat.loss_fn(p, batch, jax.random.PRNGKey(1))[0])(
          params)
  for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                  jax.tree_util.tree_leaves(g_remat)):
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-4, atol=1e-5)
  # Remat predict also works (init params shapes are identical).
  out, _ = m_remat.predict(params, batch, jax.random.PRNGKey(2))
  assert np.all(np.isfinite(np.asarray(out)))
