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
  got = attention.fused_attention(q, k, v, interpret=True)
  want = attention.attention_reference(q, k, v)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_fused_matches_reference_with_mask_bias():
  q, k, v = make_qkv(seed=1)
  b, kv_len = q.shape[0], k.shape[1]
  mask = np.ones((b, 1, q.shape[1], kv_len), np.float32)
  mask[:, :, :, kv_len // 2:] = 0  # mask the second half of keys
  bias = jnp.asarray(np.where(mask > 0, 0.0, -1e10).astype(np.float32))
  got = attention.fused_attention(q, k, v, bias, interpret=True)
  want = attention.attention_reference(q, k, v, bias)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_fused_per_head_bias():
  q, k, v = make_qkv(h=2, seed=2)
  r = np.random.RandomState(3)
  bias = jnp.asarray(
      r.randn(q.shape[0], 2, q.shape[1], k.shape[1]).astype(np.float32))
  got = attention.fused_attention(q, k, v, bias, interpret=True)
  want = attention.attention_reference(q, k, v, bias)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_all_masked_rows_uniform():
  """Fully-masked rows produce the uniform average (matches XLA path,
  which zero_if_all_masked then cleans up downstream)."""
  q, k, v = make_qkv(seed=4)
  bias = jnp.full((q.shape[0], 1, q.shape[1], k.shape[1]), -1e10)
  got = attention.fused_attention(q, k, v, bias, interpret=True)
  want = attention.attention_reference(q, k, v, bias)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-4, atol=1e-5)
  assert np.all(np.isfinite(np.asarray(got)))
