"""AR baseline tests: loss, cached decode vs teacher-forced parity."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_spectrogram_diffusion_tpu.audio import codecs
from music_spectrogram_diffusion_tpu.models.autoregressive import (
    model as model_lib, network, output_functions)

B, L_IN, L_TGT, D = 2, 12, 6, 128


def make_model(output_function=None):
  cfg = network.ARConfig(
      vocab_size=256, emb_dim=32, num_heads=2, num_encoder_layers=2,
      num_decoder_layers=2, head_dim=16, mlp_dim=64, dropout_rate=0.0,
      mlp_activations=("gelu", "linear"))
  module = network.ARTransformer(config=cfg)
  of = output_function or output_functions.Deterministic()
  return model_lib.AutoregressiveModel(module, of, codecs.MelGan())


def make_batch():
  r = np.random.RandomState(0)
  target = r.randn(B, L_TGT, D).astype(np.float32)
  decoder_input = np.roll(target, 1, axis=1)
  decoder_input[:, 0] = 0
  return {
      "encoder_input_tokens": jnp.asarray(
          r.randint(1, 200, (B, L_IN)), jnp.int32),
      "decoder_target_tokens": jnp.asarray(target),
      "decoder_input_tokens": jnp.asarray(decoder_input),
      "decoder_target_mask": jnp.ones((B, L_TGT), bool),
  }


@pytest.fixture(scope="module")
def model_and_params():
  m = make_model()
  batch = make_batch()
  variables = m.init_variables(
      jax.random.PRNGKey(0), {k: v.shape for k, v in batch.items()})
  return m, variables["params"]


def test_loss_and_grads(model_and_params):
  m, params = model_and_params
  batch = make_batch()
  loss, metrics = m.loss_fn(params, batch, jax.random.PRNGKey(0))
  assert np.isfinite(float(loss))
  assert float(metrics["n_frames"]) == B * L_TGT
  grads = jax.grad(lambda p: m.loss_fn(p, batch, None)[0])(params)
  assert all(np.all(np.isfinite(np.asarray(g)))
             for g in jax.tree_util.tree_leaves(grads))


def test_cached_decode_matches_teacher_forcing(model_and_params):
  """Feeding generated outputs teacher-forced must reproduce the same
  next-step predictions as the cached decode loop (Deterministic head)."""
  m, params = model_and_params
  batch = make_batch()
  decodes, _ = m.predict(params, batch, jax.random.PRNGKey(1))
  assert decodes.shape == (B, L_TGT, D)
  assert np.all(np.isfinite(np.asarray(decodes)))

  # Teacher-force the generated sequence: outputs must match the
  # generation exactly (deterministic head, causal masking).
  decoder_input = jnp.concatenate(
      [jnp.zeros((B, 1, D)), decodes[:, :-1]], axis=1)
  tf_out = m.module.apply(
      {"params": params},
      encoder_input_tokens=batch["encoder_input_tokens"],
      decoder_input_tokens=decoder_input,
      decoder_target_tokens=batch["decoder_target_tokens"],
      enable_dropout=False)
  np.testing.assert_allclose(np.asarray(tf_out), np.asarray(decodes),
                             rtol=2e-4, atol=2e-4)


def test_gaussian_mixture_head():
  of = output_functions.GaussianMixture(
      n_components=3, dims_per_component=D)
  m = make_model(output_function=of)
  cfg = m.module.config
  import dataclasses as dc
  m.module = network.ARTransformer(
      config=dc.replace(cfg, output_dim=of.expected_num_dims))
  batch = make_batch()
  variables = m.init_variables(
      jax.random.PRNGKey(0), {k: v.shape for k, v in batch.items()})
  params = variables["params"]
  loss, _ = m.loss_fn(params, batch, None)
  assert np.isfinite(float(loss))
  decodes, _ = m.predict(params, batch, jax.random.PRNGKey(2))
  assert decodes.shape == (B, L_TGT, D)
  assert np.all(np.isfinite(np.asarray(decodes)))


def test_gaussian_mixture_logprob_math():
  """Single-component mixture must equal the diagonal-normal logpdf."""
  of = output_functions.GaussianMixture(
      n_components=1, dims_per_component=2, min_sigma=0.5, max_sigma=0.5)
  outputs = jnp.asarray([[0.0, 1.0, -1.0, 0.0, 0.0]])  # logit, mu, sigma
  targets = jnp.asarray([[1.0, -1.0]])
  nll = of.get_loss(outputs, targets)
  sigma = 0.5
  expected = -np.sum(-0.5 * ((0.0 / sigma) ** 2)
                     - np.log(sigma) - 0.5 * np.log(2 * np.pi)) * 2 / 2
  expected = 2 * (0.5 * np.log(2 * np.pi) + np.log(sigma))
  np.testing.assert_allclose(np.asarray(nll)[0], expected, rtol=1e-5)
