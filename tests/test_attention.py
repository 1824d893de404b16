"""Pallas fused attention vs XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_spectrogram_diffusion_tpu.ops import attention


def make_qkv(b=2, q=16, kv=32, h=4, d=64, seed=0):
  r = np.random.RandomState(seed)
  return (jnp.asarray(r.randn(b, q, h, d).astype(np.float32)),
          jnp.asarray(r.randn(b, kv, h, d).astype(np.float32)),
          jnp.asarray(r.randn(b, kv, h, d).astype(np.float32)))


def test_fused_matches_reference_no_bias():
  q, k, v = make_qkv()
  got = attention.fused_attention(q, k, v, interpret=True, mxu_bf16=False)
  want = attention.attention_reference(q, k, v)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_fused_matches_reference_with_mask_bias():
  q, k, v = make_qkv(seed=1)
  b, kv_len = q.shape[0], k.shape[1]
  mask = np.ones((b, 1, q.shape[1], kv_len), np.float32)
  mask[:, :, :, kv_len // 2:] = 0  # mask the second half of keys
  bias = jnp.asarray(np.where(mask > 0, 0.0, -1e10).astype(np.float32))
  got = attention.fused_attention(q, k, v, bias, interpret=True, mxu_bf16=False)
  want = attention.attention_reference(q, k, v, bias)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_fused_per_head_bias():
  q, k, v = make_qkv(h=2, seed=2)
  r = np.random.RandomState(3)
  bias = jnp.asarray(
      r.randn(q.shape[0], 2, q.shape[1], k.shape[1]).astype(np.float32))
  got = attention.fused_attention(q, k, v, bias, interpret=True, mxu_bf16=False)
  want = attention.attention_reference(q, k, v, bias)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_all_masked_rows_uniform():
  """Fully-masked rows produce the uniform average (matches XLA path,
  which zero_if_all_masked then cleans up downstream)."""
  q, k, v = make_qkv(seed=4)
  bias = jnp.full((q.shape[0], 1, q.shape[1], k.shape[1]), -1e10)
  got = attention.fused_attention(q, k, v, bias, interpret=True, mxu_bf16=False)
  want = attention.attention_reference(q, k, v, bias)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)
  assert np.all(np.isfinite(np.asarray(got)))


def test_decoder_fused_matches_unfused(monkeypatch):
  """Model-level parity: fused attention (interpreted) == XLA path."""
  import dataclasses
  from music_spectrogram_diffusion_tpu import config as cfg_lib
  from music_spectrogram_diffusion_tpu.models import layers
  # Tiny test shapes fall below the production dispatch threshold; force
  # the kernel path so this test actually exercises it.
  monkeypatch.setattr(layers, "FLASH_MIN_SCORE_BYTES", 0)
  from music_spectrogram_diffusion_tpu.audio import codecs
  from music_spectrogram_diffusion_tpu.models.diffusion import (
      model as model_lib, network)
  from music_spectrogram_diffusion_tpu.ops import diffusion as dops

  def build(fused):
    net_cfg = cfg_lib.network_config(
        "tiny", with_context=True, vocab_size=256, dropout_rate=0.0,
        use_fused_attention=fused)
    module = network.ContextTransformer(config=net_cfg)
    return model_lib.ContextDiffusionModel(
        module, dops.DiffusionConfig(
            sampler=dops.SamplerConfig(num_steps=2)), codecs.MelGan())

  r = np.random.RandomState(0)
  batch = {
      "encoder_input_tokens": jnp.asarray(
          r.randint(1, 200, (1, 16)), jnp.int32),
      "encoder_continuous_inputs": jnp.asarray(
          r.randn(1, 8, 128).astype(np.float32)),
      "encoder_continuous_mask": jnp.asarray(
          np.array([[1, 1, 1, 1, 0, 0, 0, 0]], bool)),
      "decoder_target_tokens": jnp.zeros((1, 8, 128)),
      "decoder_target_mask": jnp.ones((1, 8), bool),
  }
  m_ref = build(False)
  variables = m_ref.init_variables(
      jax.random.PRNGKey(0), {k: v.shape for k, v in batch.items()},
      {k: v.dtype for k, v in batch.items()})
  params = variables["params"]
  m_fused = build(True)

  out_ref, _ = m_ref.predict(params, batch, jax.random.PRNGKey(3))
  out_fused, _ = m_fused.predict(params, batch, jax.random.PRNGKey(3))
  # The fused kernel uses bf16 MXU passes (as XLA does on TPU) while the
  # CPU baseline here is true f32, so compare at bf16-level tolerance;
  # wiring bugs (wrong mask/transpose/cache) blow far past this.
  a, b = np.asarray(out_fused), np.asarray(out_ref)
  np.testing.assert_allclose(a, b, rtol=0.3, atol=0.5)
  corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
  assert corr > 0.999, corr


def test_flash_multiple_kv_blocks():
  """kv longer than one block exercises the online-softmax accumulation."""
  q, k, v = make_qkv(b=2, q=16, kv=640, h=2, seed=8)
  got = attention.flash_attention(q, k, v, interpret=True, mxu_bf16=False,
                                  kv_block_size=256)
  want = attention.attention_reference(q, k, v)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_flash_kv_mask_vector():
  """[b, kv] mask vector must equal the equivalent [b, 1, q, kv] bias."""
  q, k, v = make_qkv(b=2, q=16, kv=320, h=2, seed=9)
  r = np.random.RandomState(10)
  kv_mask = jnp.asarray(r.rand(2, 320) > 0.3)
  got = attention.flash_attention(q, k, v, kv_mask=kv_mask,
                                  interpret=True, mxu_bf16=False,
                                  kv_block_size=128)
  want = attention.attention_reference(q, k, v, kv_mask=kv_mask)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_flash_kv_mask_with_padding():
  """Unaligned kv + mask: padded keys must not contribute."""
  q, k, v = make_qkv(b=1, q=12, kv=200, h=2, seed=11)
  kv_mask = jnp.asarray(np.arange(200)[None, :] < 150)
  got = attention.flash_attention(q, k, v, kv_mask=kv_mask,
                                  interpret=True, mxu_bf16=False,
                                  kv_block_size=128)
  want = attention.attention_reference(q, k, v, kv_mask=kv_mask)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_flash_bias_and_mask_combined():
  q, k, v = make_qkv(b=2, q=8, kv=256, h=2, seed=12)
  r = np.random.RandomState(13)
  bias = jnp.asarray(r.randn(2, 1, 8, 256).astype(np.float32))
  kv_mask = jnp.asarray(r.rand(2, 256) > 0.5)
  got = attention.flash_attention(q, k, v, bias, kv_mask=kv_mask,
                                  interpret=True, mxu_bf16=False,
                                  kv_block_size=128)
  want = attention.attention_reference(q, k, v, bias, kv_mask=kv_mask)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_fused_bf16_mxu_close():
  """Default (bf16 MXU passes) stays within bf16-level error of f32."""
  q, k, v = make_qkv(seed=7)
  got = attention.fused_attention(q, k, v, interpret=True)  # bf16 passes
  want = attention.attention_reference(q, k, v)
  # Scores are O(sqrt(d)) so bf16 rounding shows up at the 1e-1 level on
  # random inputs; trained nets have far smaller logit magnitudes.
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=0.2, atol=0.1)
