"""Diffusion network + model tests: shapes, KV-cache parity, fused CFG."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_spectrogram_diffusion_tpu import config as cfg_lib
from music_spectrogram_diffusion_tpu.audio import codecs
from music_spectrogram_diffusion_tpu.models.diffusion import model as model_lib
from music_spectrogram_diffusion_tpu.models.diffusion import network
from music_spectrogram_diffusion_tpu.ops import diffusion as dops

B, L_IN, L_CTX, L_TGT, N_DIMS = 2, 16, 8, 8, 128


def tiny_config(**kw):
  return cfg_lib.network_config("tiny", with_context=True, vocab_size=256,
                                dropout_rate=0.0, **kw)


def make_batch(rng=0):
  r = np.random.RandomState(rng)
  return {
      "encoder_input_tokens": jnp.asarray(
          r.randint(0, 256, (B, L_IN)), jnp.int32),
      "encoder_continuous_inputs": jnp.asarray(
          r.randn(B, L_CTX, N_DIMS).astype(np.float32)),
      "encoder_continuous_mask": jnp.asarray(
          np.concatenate([np.ones((B, L_CTX // 2)),
                          np.zeros((B, L_CTX // 2))], axis=1)
          .astype(bool)),
      "decoder_target_tokens": jnp.asarray(
          r.randn(B, L_TGT, N_DIMS).astype(np.float32)),
      "decoder_target_mask": jnp.ones((B, L_TGT), bool),
  }


def make_model(num_steps=4, cond_weight=5.0):
  net_cfg = tiny_config()
  module = network.ContextTransformer(config=net_cfg)
  dcfg = dops.DiffusionConfig(
      guidance=dops.GuidanceConfig(eval_condition_weight=cond_weight),
      sampler=dops.SamplerConfig(num_steps=num_steps))
  return model_lib.ContextDiffusionModel(
      module, dcfg, codecs.MelGan())


@pytest.fixture(scope="module")
def model_and_params():
  m = make_model()
  batch = make_batch()
  variables = m.init_variables(
      jax.random.PRNGKey(0),
      {k: v.shape for k, v in batch.items()},
      {k: v.dtype for k, v in batch.items()})
  return m, variables["params"]


def test_forward_shapes(model_and_params):
  m, params = model_and_params
  batch = make_batch()
  out = m.module.apply(
      {"params": params},
      encoder_input_tokens=batch["encoder_input_tokens"],
      encoder_continuous_inputs=batch["encoder_continuous_inputs"],
      encoder_continuous_mask=batch["encoder_continuous_mask"],
      decoder_input_tokens=batch["decoder_target_tokens"],
      decoder_noise_time=jnp.asarray([0.2, 0.8]),
      enable_dropout=False)
  assert out.shape == (B, L_TGT, N_DIMS)
  assert bool(jnp.all(jnp.isfinite(out)))


def test_cached_kv_matches_direct(model_and_params):
  """decode with precomputed cross-KV == decode projecting KV inline."""
  m, params = model_and_params
  batch = make_batch()
  enc = m._encode(params, batch)
  z = batch["decoder_target_tokens"]
  t = jnp.asarray([0.3, 0.6])

  direct = m.module.apply(
      {"params": params}, enc, z, t, enable_dropout=False,
      method=m.module.decode)
  kv = m.module.apply(
      {"params": params}, enc, method=m.module.precompute_cross_kv)
  cached = m.module.apply(
      {"params": params}, enc, z, t, enable_dropout=False, cross_kv=kv,
      method=m.module.decode)
  np.testing.assert_allclose(np.asarray(direct), np.asarray(cached),
                             rtol=1e-5, atol=1e-5)


def test_uncond_equals_zeroed_conditioning(model_and_params):
  """The CFG uncond trick (zero masks, shared encodings) must equal the
  reference semantics (zero encodings AND masks)."""
  m, params = model_and_params
  batch = make_batch()
  enc = m._encode(params, batch)
  z = batch["decoder_target_tokens"]
  t = jnp.asarray([0.3, 0.6])

  # Reference uncond: everything multiplied by 0.
  enc_zeroed = jax.tree.map(lambda x: x * 0, enc)
  ref_uncond = m.module.apply(
      {"params": params}, enc_zeroed, z, t, enable_dropout=False,
      method=m.module.decode)

  # Ours: keep encodings, zero only the masks.
  enc_masked = [(e, jnp.zeros_like(mk)) for e, mk in enc]
  got = m.module.apply(
      {"params": params}, enc_masked, z, t, enable_dropout=False,
      method=m.module.decode)
  np.testing.assert_allclose(np.asarray(ref_uncond), np.asarray(got),
                             rtol=1e-5, atol=1e-5)


def test_fused_predict_matches_reference_path(model_and_params):
  m, params = model_and_params
  batch = make_batch()
  rng = jax.random.PRNGKey(11)
  fused, _ = m.predict(params, batch, rng)
  ref, _ = m.predict_reference_path(params, batch, rng)
  np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                             rtol=1e-4, atol=1e-4)


def test_predict_jits(model_and_params):
  m, params = model_and_params
  batch = make_batch()
  fn = jax.jit(lambda p, b, k: m.predict(p, b, k)[0])
  out = fn(params, batch, jax.random.PRNGKey(0))
  assert out.shape == (B, L_TGT, N_DIMS)
  # Output is in feature space (log-mel range), not [-1, 1].
  assert float(out.min()) >= codecs.MelGan.min_value - 1e-3
  assert float(out.max()) <= codecs.MelGan.max_value + 1e-3


def test_loss_fn(model_and_params):
  m, params = model_and_params
  batch = make_batch()
  loss, metrics = m.loss_fn(params, batch, jax.random.PRNGKey(0))
  assert np.isfinite(float(loss))
  assert float(metrics["n_frames"]) == B * L_TGT
  assert "context_frames" in metrics
  # Gradients flow.
  grads = jax.grad(lambda p: m.loss_fn(p, batch, jax.random.PRNGKey(0))[0])(
      params)
  leaf = jax.tree_util.tree_leaves(grads)
  assert all(np.all(np.isfinite(np.asarray(g))) for g in leaf)
  assert any(float(jnp.abs(g).max()) > 0 for g in leaf)


def test_terminal_relative_positions():
  seq = jnp.asarray([1, 1, 1, 0, 0])
  assert int(network.sequence_length_from_mask(seq)) == 3
  assert int(network.sequence_length_from_mask(jnp.zeros(5))) == 0
  assert int(network.sequence_length_from_mask(jnp.ones(5))) == 5
  rolled = network.terminal_relative_positions(jnp.arange(5), 2)
  np.testing.assert_array_equal(np.asarray(rolled), [3, 4, 0, 1, 2])


def test_notes_only_model():
  net_cfg = cfg_lib.network_config(
      "tiny", with_context=False, vocab_size=256, dropout_rate=0.0)
  module = network.Transformer(config=net_cfg)
  dcfg = dops.DiffusionConfig(sampler=dops.SamplerConfig(num_steps=2))
  m = model_lib.DiffusionModel(module, dcfg, codecs.MelGan())
  batch = {k: v for k, v in make_batch().items()
           if not k.startswith("encoder_continuous")}
  variables = m.init_variables(
      jax.random.PRNGKey(0), {k: v.shape for k, v in batch.items()})
  params = variables["params"]
  loss, _ = m.loss_fn(params, batch, jax.random.PRNGKey(0))
  assert np.isfinite(float(loss))
  out, _ = m.predict(params, batch, jax.random.PRNGKey(0))
  assert out.shape == (B, L_TGT, N_DIMS)
