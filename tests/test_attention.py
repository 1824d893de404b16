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


def _flash_diff_grads(q, k, v, bias=None, kv_mask=None, **kw):
  def loss(q, k, v):
    out = attention.flash_attention_diff(
        q, k, v, bias, kv_mask, interpret=True, mxu_bf16=False, **kw)
    w = jnp.cos(jnp.arange(out.size).reshape(out.shape))
    return jnp.sum(out * w)
  return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


def _reference_grads(q, k, v, bias=None, kv_mask=None):
  def loss(q, k, v):
    out = attention.attention_reference(q, k, v, bias, kv_mask)
    w = jnp.cos(jnp.arange(out.size).reshape(out.shape))
    return jnp.sum(out * w)
  return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


def _assert_grads_close(got, want, tol=1e-4):
  for g, w, name in zip(got, want, "qkv"):
    np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=tol,
                               atol=tol, err_msg=f"d{name} mismatch")


def test_flash_vjp_no_bias():
  q, k, v = make_qkv(seed=20)
  _assert_grads_close(_flash_diff_grads(q, k, v),
                      _reference_grads(q, k, v))


def test_flash_vjp_kv_mask_unaligned():
  """Grad parity with a kv mask and kv not a multiple of the block."""
  q, k, v = make_qkv(b=2, q=12, kv=200, h=2, seed=21)
  kv_mask = jnp.asarray(np.arange(200)[None, :] % 3 != 0)
  _assert_grads_close(_flash_diff_grads(q, k, v, kv_mask=kv_mask,
                                        kv_block_size=128),
                      _reference_grads(q, k, v, kv_mask=kv_mask))


def test_flash_vjp_mask_bias():
  """Mask-derived bias: dq/dk/dv match (bias itself is non-diff)."""
  q, k, v = make_qkv(seed=22)
  mask = np.ones((q.shape[0], 1, q.shape[1], k.shape[1]), np.float32)
  mask[:, :, :, k.shape[1] // 2:] = 0
  bias = jnp.asarray(np.where(mask > 0, 0.0, -1e10).astype(np.float32))
  _assert_grads_close(_flash_diff_grads(q, k, v, bias=bias),
                      _reference_grads(q, k, v, bias=bias))


def test_flash_vjp_multi_kv_blocks_and_head_groups():
  """dq accumulation across kv blocks x G=2 head grouping."""
  q, k, v = make_qkv(b=2, q=16, kv=640, h=4, seed=23)
  _assert_grads_close(
      _flash_diff_grads(q, k, v, kv_block_size=256, head_block_size=2),
      _reference_grads(q, k, v))


def test_flash_vjp_value_scale_dropout_identity():
  """Per-key dropout folded as a value-row scale == weight dropout.

  T5 attention dropout broadcasts along q, so scaling value rows by
  keep/(1-rate) BEFORE attention must equal multiplying the normalized
  weights by the same factor after softmax (the layers.py train path
  relies on this)."""
  q, k, v = make_qkv(b=1, q=8, kv=32, h=2, seed=24)
  r = np.random.RandomState(25)
  keep = (r.rand(1, 32) > 0.5).astype(np.float32) / 0.5  # [b, kv]
  v_scaled = v * jnp.asarray(keep)[:, :, None, None]
  got = attention.flash_attention_diff(q, k, v_scaled, interpret=True,
                                       mxu_bf16=False)
  # Oracle: scale the normalized weights.
  wts = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", q, k))
  wts = wts * jnp.asarray(keep)[:, None, None, :]
  want = jnp.einsum("bhqk,bkhd->bqhd", wts, v)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_train_loss_grads_fused_matches_unfused(monkeypatch):
  """Model-level: d(loss)/d(params) via the fused train path == XLA."""
  from music_spectrogram_diffusion_tpu import config as cfg_lib
  from music_spectrogram_diffusion_tpu.models import layers
  monkeypatch.setattr(layers, "FLASH_MIN_SCORE_BYTES", 0)
  # f32 MXU passes so the XLA-path grads are comparable at tight
  # tolerance (the default bf16 passes round logits at the 1e-2 level).
  monkeypatch.setattr(attention, "DEFAULT_MXU_BF16", False)
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
        module, dops.DiffusionConfig(), codecs.MelGan())

  r = np.random.RandomState(0)
  batch = {
      "encoder_input_tokens": jnp.asarray(
          r.randint(1, 200, (2, 16)), jnp.int32),
      "encoder_continuous_inputs": jnp.asarray(
          r.randn(2, 8, 128).astype(np.float32)),
      "encoder_continuous_mask": jnp.asarray(
          np.array([[1] * 8, [1, 1, 1, 1, 0, 0, 0, 0]], bool)),
      "decoder_target_tokens": jnp.asarray(
          r.randn(2, 8, 128).astype(np.float32)),
      "decoder_target_mask": jnp.ones((2, 8), bool),
  }
  m_ref = build(False)
  params = m_ref.init_variables(
      jax.random.PRNGKey(0), {k: v.shape for k, v in batch.items()},
      {k: v.dtype for k, v in batch.items()})["params"]
  m_fused = build(True)

  def loss_of(m):
    return lambda p: m.loss_fn(p, batch, jax.random.PRNGKey(7))[0]

  g_ref = jax.grad(loss_of(m_ref))(params)
  g_fused = jax.grad(loss_of(m_fused))(params)
  flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
  flat_fused = dict(
      (jax.tree_util.keystr(kp), x)
      for kp, x in jax.tree_util.tree_leaves_with_path(g_fused))
  for kp, want in flat_ref:
    got = flat_fused[jax.tree_util.keystr(kp)]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-3, atol=5e-3,
        err_msg=f"grad mismatch at {jax.tree_util.keystr(kp)}")


def test_flash_keeps_mesh_shardings():
  """Under GSPMD, the kernel must shard over (batch, heads) — no
  all-gather of the batch around the pallas call (custom_partitioning
  rules in ops/attention.py). Forward AND backward."""
  from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
  mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
  q, k, v = make_qkv(b=8, q=16, kv=128, h=4, seed=30)
  sh = NamedSharding(mesh, P("data", None, "model", None))
  q, k, v = (jax.device_put(x, sh) for x in (q, k, v))

  out = jax.jit(lambda a, b, c: attention.flash_attention_diff(
      a, b, c, interpret=True, mxu_bf16=False))(q, k, v)
  assert out.sharding.spec == P("data", None, "model"), out.sharding
  np.testing.assert_allclose(
      np.asarray(out), np.asarray(attention.attention_reference(q, k, v)),
      rtol=1e-5, atol=1e-5)

  grads = jax.jit(jax.grad(
      lambda a, b, c: attention.flash_attention_diff(
          a, b, c, interpret=True, mxu_bf16=False).sum(),
      argnums=(0, 1, 2)))(q, k, v)
  want = jax.grad(
      lambda a, b, c: attention.attention_reference(a, b, c).sum(),
      argnums=(0, 1, 2))(q, k, v)
  for g, w in zip(grads, want):
    assert g.sharding.spec == P("data", None, "model"), g.sharding
    np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                               rtol=1e-4, atol=1e-4)


def test_fused_bf16_mxu_close():
  """Default (bf16 MXU passes) stays within bf16-level error of f32."""
  q, k, v = make_qkv(seed=7)
  got = attention.fused_attention(q, k, v, interpret=True)  # bf16 passes
  want = attention.attention_reference(q, k, v)
  # Scores are O(sqrt(d)) so bf16 rounding shows up at the 1e-1 level on
  # random inputs; trained nets have far smaller logit magnitudes.
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=0.2, atol=0.1)
