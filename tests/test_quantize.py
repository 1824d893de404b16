"""Int8 weight-only quantization: kernel parity, tree transform, e2e.

The Pallas path runs interpreted on CPU (Mosaic lowers on TPU only);
on-device numerics + speed are pinned by `bench.py --verify` /
`--quant int8` (BENCH.md round-3 quantization section).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_spectrogram_diffusion_tpu import config as cfg_lib
from music_spectrogram_diffusion_tpu.ops import quantize as qops


def test_quantize_roundtrip_error_small():
  w = np.random.RandomState(0).randn(256, 128).astype(np.float32)
  q, s = qops.quantize_kernel(jnp.asarray(w))
  assert q.dtype == jnp.int8 and s.shape == (128,)
  deq = np.asarray(qops.dequantize_kernel(q, s))
  # absmax/127 per column bounds the error at scale/2 per element.
  col_absmax = np.abs(w).max(axis=0)
  assert np.all(np.abs(deq - w) <= col_absmax / 127.0 * 0.5 + 1e-7)
  rel = np.linalg.norm(deq - w) / np.linalg.norm(w)
  assert rel < 1e-2


def test_quantize_zero_column():
  w = np.zeros((128, 128), np.float32)
  q, s = qops.quantize_kernel(jnp.asarray(w))
  assert np.all(np.asarray(q) == 0)
  assert np.all(np.isfinite(np.asarray(s)))


@pytest.mark.parametrize("m", [1, 7, 16, 100, 256])
def test_pallas_matches_xla(m):
  r = np.random.RandomState(m)
  x = jnp.asarray(r.randn(m, 256).astype(np.float32))
  w = jnp.asarray(r.randn(256, 128).astype(np.float32))
  q, s = qops.quantize_kernel(w)
  ref = qops.quantized_matmul(x, q, s, use_pallas=False)
  out = qops.quantized_matmul(x, q, s, use_pallas=True, interpret=True)
  assert out.shape == (m, 128) and out.dtype == ref.dtype
  # Kernel computes in bf16 on the MXU; fallback deq-dot runs f32 on CPU
  # (output std is ~sqrt(K)=16, so atol 0.1 is ~0.6% of a typical value).
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             rtol=2e-2, atol=1e-1)


def test_pallas_multi_k_blocks():
  # K=512 exercises >1 accumulation step; bf16 x path too.
  r = np.random.RandomState(7)
  x = jnp.asarray(r.randn(32, 512).astype(np.float32)).astype(jnp.bfloat16)
  w = jnp.asarray(r.randn(512, 256).astype(np.float32))
  q, s = qops.quantize_kernel(w)
  ref = qops.quantized_matmul(x, q, s, use_pallas=False,
                              out_dtype=jnp.float32)
  out = qops.quantized_matmul(x, q, s, use_pallas=True, interpret=True,
                              out_dtype=jnp.float32)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             rtol=3e-2, atol=3e-1)


def test_untileable_falls_back():
  x = jnp.ones((4, 96))
  w = jnp.ones((96, 96))
  q, s = qops.quantize_kernel(w)
  out = qops.quantized_matmul(x, q, s)  # 96 % 128 != 0 -> XLA path
  np.testing.assert_allclose(np.asarray(out),
                             np.asarray(x @ qops.dequantize_kernel(q, s)),
                             rtol=1e-5)


def _tiny128_config():
  base = cfg_lib.network_config("tiny", with_context=True, vocab_size=256,
                                dropout_rate=0.0)
  return dataclasses.replace(base, emb_dim=128, num_heads=2, head_dim=64,
                             mlp_dim=256)


def _tiny128_model():
  from music_spectrogram_diffusion_tpu.audio import codecs
  from music_spectrogram_diffusion_tpu.models.diffusion import (
      model as model_lib, network)
  from music_spectrogram_diffusion_tpu.ops import diffusion as dops
  module = network.ContextTransformer(config=_tiny128_config())
  dcfg = dops.DiffusionConfig(sampler=dops.SamplerConfig(num_steps=2))
  return model_lib.ContextDiffusionModel(module, dcfg, codecs.MelGan())


def _batch(b=2, l_in=16, l_ctx=8, l_tgt=8, n_dims=128, rng=0):
  r = np.random.RandomState(rng)
  return {
      "encoder_input_tokens": jnp.asarray(
          r.randint(0, 256, (b, l_in)), jnp.int32),
      "encoder_continuous_inputs": jnp.asarray(
          r.randn(b, l_ctx, n_dims).astype(np.float32)),
      "encoder_continuous_mask": jnp.ones((b, l_ctx), bool),
      "decoder_target_tokens": jnp.asarray(
          r.randn(b, l_tgt, n_dims).astype(np.float32)),
      "decoder_target_mask": jnp.ones((b, l_tgt), bool),
  }


@pytest.fixture(scope="module")
def quantized_model():
  m = _tiny128_model()
  batch = _batch()
  variables = m.init_variables(
      jax.random.PRNGKey(0), {k: v.shape for k, v in batch.items()},
      {k: v.dtype for k, v in batch.items()})
  params = variables["params"]
  qparams = qops.quantize_params(params, min_dim=128)
  return m, params, qparams, batch


def test_quantize_params_structure(quantized_model):
  _, params, qparams, _ = quantized_model
  flat_q = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(qparams)[0]}
  kernels = [k for k in flat_q if k.endswith("['kernel']")]
  scales = [k for k in flat_q if k.endswith("['kernel_scale']")]
  quantized = [k for k in kernels if flat_q[k].dtype == np.int8]
  assert quantized, "no kernel was quantized"
  assert len(scales) == len(quantized)
  for k in quantized:
    assert k.replace("['kernel']", "['kernel_scale']") in flat_q
  # The f32 output projection must stay float.
  spec_out = [k for k in kernels if "spec_out_dense" in k]
  assert spec_out and all(
      flat_q[k].dtype != np.int8 for k in spec_out)
  # Everything that was not rewritten is untouched.
  flat_p = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(params)[0]}
  assert set(flat_p) == set(flat_q) - set(scales)


def test_quantized_forward_close(quantized_model):
  m, params, qparams, batch = quantized_model
  rng = jax.random.PRNGKey(3)
  loss_fp, _ = m.loss_fn(params, batch, rng)
  loss_q, _ = m.loss_fn(qparams, batch, rng)
  # Same RNG -> same noise draw; only the weight rounding differs.
  assert np.abs(np.asarray(loss_q) - np.asarray(loss_fp)) < (
      0.05 * max(1.0, abs(float(loss_fp))))


def test_quantized_predict_runs(quantized_model):
  m, _, qparams, batch = quantized_model
  feats, _ = m.predict(qparams, batch, jax.random.PRNGKey(0))
  assert feats.shape == batch["decoder_target_tokens"].shape
  assert np.all(np.isfinite(np.asarray(feats)))


def _put(arr, mesh, *axes):
  from jax.sharding import NamedSharding, PartitionSpec
  return jax.device_put(arr, NamedSharding(mesh, PartitionSpec(*axes)))


@pytest.mark.parametrize("use_pallas", [False, True])
def test_partitioned_matmul_sharded(use_pallas):
  """K- and N-sharded int8 matmuls keep layouts and match unsharded."""
  from music_spectrogram_diffusion_tpu.parallel import mesh as mesh_lib

  mesh = mesh_lib.make_mesh(data=4, model=2)
  r = np.random.RandomState(0)
  x = jnp.asarray(r.randn(8, 256).astype(np.float32))
  w = jnp.asarray(r.randn(256, 512).astype(np.float32))
  q, s = qops.quantize_kernel(w)
  kwargs = dict(use_pallas=use_pallas, interpret=use_pallas)
  ref = np.asarray(qops.quantized_matmul(x, q, s, partitioned=False,
                                         use_pallas=False))
  fn = jax.jit(lambda a, b, c: qops.quantized_matmul(a, b, c, **kwargs))

  # N-sharded (wi-style): kernel columns over 'model', batch over 'data'.
  out_n = fn(_put(x, mesh, "data", None), _put(q, mesh, None, "model"),
             _put(s, mesh, "model"))
  assert out_n.sharding.spec == jax.sharding.PartitionSpec("data", "model")
  np.testing.assert_allclose(np.asarray(out_n), ref, rtol=3e-2, atol=3e-1)

  # K-sharded (wo-style): kernel rows over 'model' -> psum of partials.
  out_k = fn(_put(x, mesh, "data", "model"), _put(q, mesh, "model", None),
             _put(s, mesh))
  assert out_k.sharding.spec[:1] == ("data",)
  np.testing.assert_allclose(np.asarray(out_k), ref, rtol=3e-2, atol=3e-1)


def test_partitioned_matmul_colliding_k_axis():
  """x K-sharded on the SAME mesh axis that shards q's N must not build
  a duplicate PartitionSpec('model','model') (ADVICE round-3 medium)."""
  from music_spectrogram_diffusion_tpu.parallel import mesh as mesh_lib

  mesh = mesh_lib.make_mesh(data=4, model=2)
  r = np.random.RandomState(1)
  x = jnp.asarray(r.randn(8, 256).astype(np.float32))
  w = jnp.asarray(r.randn(256, 512).astype(np.float32))
  q, s = qops.quantize_kernel(w)
  ref = np.asarray(qops.quantized_matmul(x, q, s, partitioned=False,
                                         use_pallas=False))
  fn = jax.jit(lambda a, b, c: qops.quantized_matmul(a, b, c,
                                                     use_pallas=False))
  out = fn(_put(x, mesh, "data", "model"), _put(q, mesh, None, "model"),
           _put(s, mesh, "model"))
  np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-2, atol=3e-1)


def test_forced_pallas_untileable_warns():
  x = jnp.ones((4, 96))
  w = jnp.ones((96, 96))
  q, s = qops.quantize_kernel(w)
  with pytest.warns(UserWarning, match="untileable"):
    out = qops.quantized_matmul(x, q, s, use_pallas=True, interpret=True,
                                partitioned=False)
  np.testing.assert_allclose(np.asarray(out),
                             np.asarray(x @ qops.dequantize_kernel(q, s)),
                             rtol=1e-5)


def test_quantized_predict_sharded_matches_unsharded(quantized_model):
  """Full int8 predict on a {data:4, model:2} mesh == single-device."""
  from music_spectrogram_diffusion_tpu.parallel import mesh as mesh_lib

  m, _, qparams, batch = quantized_model
  ref, _ = jax.jit(m.predict)(qparams, batch, jax.random.PRNGKey(0))

  mesh = mesh_lib.make_mesh(data=4, model=2)
  variables = jax.eval_shape(
      lambda r: m.init_variables(
          r, {k: v.shape for k, v in batch.items()},
          {k: v.dtype for k, v in batch.items()}),
      jax.random.PRNGKey(0))
  fshard = mesh_lib.param_shardings(variables, mesh)
  qshard = qops.quantized_param_shardings(qparams, fshard, mesh)
  qp = jax.tree.map(lambda p, s: jax.device_put(np.asarray(p), s),
                    qparams, qshard)
  # At least one kernel must actually be model-sharded for this to test
  # anything (mlp 256 over model=2 -> local 128).
  assert any("model" in str(s.spec) for s in jax.tree.leaves(qshard))
  out, _ = jax.jit(m.predict)(qp, batch, jax.random.PRNGKey(0))
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             rtol=1e-4, atol=1e-4)


def test_inference_model_int8(tmp_path):
  """Checkpoint -> InferenceModel(compute_dtype='int8') end to end."""
  from music_spectrogram_diffusion_tpu.infer import inference
  from music_spectrogram_diffusion_tpu.train import checkpoints

  exp = cfg_lib.preset("context_tiny")
  exp = dataclasses.replace(
      exp, dropout_rate=0.0,
      task_lengths=dataclasses.replace(exp.task_lengths, inputs=16,
                                       targets=8, targets_context=8))
  model = inference.build_model(exp)
  tl = exp.task_lengths
  shapes = {
      "encoder_input_tokens": (1, tl.inputs),
      "encoder_continuous_inputs": (1, tl.targets_context, 128),
      "encoder_continuous_mask": (1, tl.targets_context),
      "decoder_target_tokens": (1, tl.targets, 128),
  }
  variables = model.init_variables(jax.random.PRNGKey(0), shapes)
  checkpoints.save_checkpoint(
      str(tmp_path), step=0, params=variables["params"],
      config_json=exp.to_json())
  im = inference.InferenceModel(str(tmp_path), compute_dtype="int8",
                                sampler_steps=2)
  # tiny (64d) kernels are below the 512 gate -> tree must still load
  # and predict through the float path.
  batch = {
      "encoder_input_tokens": np.zeros((1, tl.inputs), np.int32),
      "encoder_continuous_inputs": np.zeros((1, tl.targets_context, 128),
                                            np.float32),
      "encoder_continuous_mask": np.ones((1, tl.targets_context), bool),
      "decoder_target_tokens": np.zeros((1, tl.targets, 128), np.float32),
  }
  out = im.predict(batch)
  assert out.shape == (1, tl.targets, 128)
  total, int8 = qops.quantized_bytes(im.params)
  assert int8 == 0  # nothing met the 512 gate at tiny size
