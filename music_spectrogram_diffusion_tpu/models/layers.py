"""T5.1.1-style Flax layers with logical-axis sharding metadata.

Functionally equivalent to the reference layer library
(/root/reference/music_spectrogram_diffusion/layers.py) but reorganised
for TPU-first execution:

* Attention exposes a split `(project_kv, attend)` path so cross-attention
  K/V over a *fixed* encoder memory can be projected once per segment and
  reused across all ~1000 diffusion steps (the reference re-projects K/V
  inside every decoder call).
* All parameters carry flax logical axis names ('embed', 'mlp', 'heads',
  'kv', 'joined_kv', 'vocab') consumed by parallel/mesh.py to build
  NamedShardings over a ('data', 'model') mesh.
* Computation dtype is configurable; parameters are always stored float32.
"""

from __future__ import annotations

import dataclasses
import functools
import operator
import os
from typing import Any, Callable, Iterable, Optional, Sequence, Tuple, Union

import flax.linen as nn
from flax.linen import partitioning as nn_partitioning
import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

param_with_axes = nn_partitioning.param_with_axes
with_sharding_constraint = nn_partitioning.with_sharding_constraint

Array = jnp.ndarray
DType = Any
Initializer = Callable[..., Array]

default_embed_init = nn.initializers.variance_scaling(
    1.0, "fan_in", "normal", out_axis=0)


# ---------------------------------------------------------------------------
# Position encodings.
# ---------------------------------------------------------------------------


def sinusoidal(min_scale: float = 1.0,
               max_scale: float = 10000.0,
               dtype: DType = jnp.float32,
               permute_bands: bool = False,
               random_phase_offsets: bool = False) -> Initializer:
  """1D sinusoidal position-embedding initializer.

  With `permute_bands`/`random_phase_offsets` the band order / phases are
  randomised at init (used by the reference's 'fixed_permuted_offset'
  position encoding, layers.py:51-106). RNG consumption order matches the
  reference (sin offsets, cos offsets, permutation) for checkpoint parity.
  """

  def init(key, shape, dtype=dtype):
    if dtype != np.float32:
      raise ValueError("sinusoidal initializer only supports float32")
    if len(tuple(shape)) != 2:
      raise ValueError(f"expected 2D (max_len, features) shape, got {shape}")

    keys = list(jax.random.split(key, 3)) if (
        permute_bands or random_phase_offsets) else []

    max_len, features = shape
    position = np.arange(max_len)[:, None]
    scale_factor = -np.log(max_scale / min_scale) / (features // 2 - 1)
    div_term = min_scale * np.exp(np.arange(features // 2) * scale_factor)
    rads = jnp.asarray(position * div_term)
    if random_phase_offsets:
      sin_off = jax.random.uniform(keys.pop(), [features // 2],
                                   minval=0, maxval=2 * jnp.pi)
      cos_off = jax.random.uniform(keys.pop(), [features // 2],
                                   minval=0, maxval=2 * jnp.pi)
    else:
      sin_off = cos_off = 0.0
    half = features // 2
    pe = jnp.zeros((max_len, features), dtype=dtype)
    pe = pe.at[:, :half].set(jnp.sin(rads + sin_off))
    pe = pe.at[:, half:2 * half].set(jnp.cos(rads + cos_off))
    if permute_bands:
      pe = jax.random.permutation(keys.pop(), pe, axis=-1)
    return pe

  return init


# ---------------------------------------------------------------------------
# Dense / MLP.
# ---------------------------------------------------------------------------


def _normalize_axes(axes: Iterable[int], ndim: int) -> Tuple[int, ...]:
  return tuple(ax if ax >= 0 else ndim + ax for ax in axes)


def _canonical_tuple(x):
  return tuple(x) if isinstance(x, Iterable) else (x,)


class DenseGeneral(nn.Module):
  """Bias-free linear transform over arbitrary input axes.

  Parameters are stored flat (2D) with logical axis names so a 2D
  ('data','model') mesh shards them without reshapes.
  """
  features: Union[int, Sequence[int]]
  axis: Union[int, Sequence[int]] = -1
  dtype: DType = jnp.float32
  kernel_init: Initializer = nn.initializers.variance_scaling(
      1.0, "fan_in", "truncated_normal")
  kernel_axes: Tuple[str, ...] = ()

  @nn.compact
  def __call__(self, inputs: Array) -> Array:
    features = _canonical_tuple(self.features)
    axis = _normalize_axes(_canonical_tuple(self.axis), jnp.ndim(inputs))

    inputs = jnp.asarray(inputs, self.dtype)
    kernel_shape = tuple(inputs.shape[ax] for ax in axis) + features
    flat_shape = (int(np.prod([inputs.shape[ax] for ax in axis])),
                  int(np.prod(features)))
    kernel = param_with_axes("kernel", self.kernel_init, flat_shape,
                             jnp.float32, axes=self.kernel_axes)
    if kernel.dtype == jnp.int8:
      # Int8 serving tree (ops.quantize.quantize_params): the sibling
      # kernel_scale leaf exists only in quantized trees, so it is
      # declared lazily — init always produces the float tree.
      scale_axes = ((self.kernel_axes[-1],) if self.kernel_axes else None)
      scale = param_with_axes("kernel_scale", nn.initializers.ones,
                              (flat_shape[1],), jnp.float32,
                              axes=scale_axes)
      from music_spectrogram_diffusion_tpu.ops import quantize as qops
      lead = tuple(i for i in range(inputs.ndim) if i not in axis)
      x2d = jnp.transpose(inputs, lead + tuple(axis)).reshape(
          (-1, flat_shape[0]))
      out2d = qops.quantized_matmul(x2d, kernel, scale,
                                    out_dtype=self.dtype)
      return out2d.reshape(tuple(inputs.shape[i] for i in lead) + features)
    kernel = jnp.reshape(jnp.asarray(kernel, self.dtype), kernel_shape)
    contract = tuple(range(len(axis)))
    return lax.dot_general(inputs, kernel, ((axis, contract), ((), ())))


def _activation(fn_or_name: Union[str, Callable]) -> Callable:
  if fn_or_name == "linear":
    return lambda x: x
  if isinstance(fn_or_name, str):
    return getattr(nn, fn_or_name)
  if callable(fn_or_name):
    return fn_or_name
  raise ValueError(f"cannot convert {fn_or_name} to an activation")


class MlpBlock(nn.Module):
  """Feed-forward block with optional gated activations (e.g. gelu*linear)."""
  intermediate_dim: int = 2048
  activations: Sequence[Union[str, Callable]] = ("relu",)
  kernel_init: Initializer = nn.initializers.variance_scaling(
      1.0, "fan_in", "truncated_normal")
  intermediate_dropout_rate: float = 0.1
  dtype: DType = jnp.float32

  @nn.compact
  def __call__(self, inputs, deterministic: bool = False):
    branches = []
    for idx, act in enumerate(self.activations):
      name = "wi" if len(self.activations) == 1 else f"wi_{idx}"
      x = DenseGeneral(self.intermediate_dim, dtype=self.dtype,
                       kernel_init=self.kernel_init,
                       kernel_axes=("embed", "mlp"), name=name)(inputs)
      branches.append(_activation(act)(x))
    x = functools.reduce(operator.mul, branches)
    x = nn.Dropout(rate=self.intermediate_dropout_rate,
                   broadcast_dims=(-2,))(x, deterministic=deterministic)
    x = with_sharding_constraint(x, ("batch", "length", "mlp"))
    return DenseGeneral(inputs.shape[-1], dtype=self.dtype,
                        kernel_init=self.kernel_init,
                        kernel_axes=("mlp", "embed"), name="wo")(x)


# ---------------------------------------------------------------------------
# Attention.
# ---------------------------------------------------------------------------


# Route through the Pallas flash kernel only when the XLA path's
# materialized score tensor would be at least this large (bytes).
# Measured on one v5e chip (base model, 200-step sampler): below this
# XLA's batched einsums win (batch 1: 18.8x vs 14.6x realtime); above it
# score spills make XLA HBM-bound and the kernel wins (CFG batch 8
# cross-attention: 17.4x vs 12.1x aggregate). A per-platform constant —
# override with $MSD_FLASH_MIN_SCORE_BYTES when re-tuning on another
# TPU generation (re-measure with bench.py --fused_attention/
# --no-fused_attention across batch sizes).
FLASH_MIN_SCORE_BYTES = int(os.environ.get(
    "MSD_FLASH_MIN_SCORE_BYTES", 64 * 1024 * 1024))


def dot_product_attention(query: Array,
                          key: Array,
                          value: Array,
                          bias: Optional[Array] = None,
                          dropout_rng=None,
                          dropout_rate: float = 0.0,
                          deterministic: bool = False,
                          dtype: DType = jnp.float32,
                          float32_logits: bool = False,
                          kv_transposed: bool = False) -> Array:
  """Standard softmax attention; q/k/v are [batch, length, heads, head_dim].

  Kept as plain einsums: XLA fuses the bias-add/softmax/matmul chain well on
  TPU for the short sequence lengths used here (<= ~2.5k); a Pallas flash
  kernel is provided separately in ops/attention.py for the long-sequence
  path.
  """
  if float32_logits:
    query = query.astype(jnp.float32)
    key = key.astype(jnp.float32)

  # kv may arrive pre-transposed ([b, h, kv, d], the flash kernel's
  # cached-KV layout); use it natively instead of transposing back.
  k_sub = "bhkd" if kv_transposed else "bkhd"

  weights = jnp.einsum(f"bqhd,{k_sub}->bhqk", query, key)
  if bias is not None:
    weights = weights + bias.astype(weights.dtype)
  weights = jax.nn.softmax(weights).astype(dtype)

  if not deterministic and dropout_rate > 0.0:
    keep_shape = list(weights.shape)
    keep_shape[-2] = 1  # broadcast along query length like T5
    keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, keep_shape)
    keep = jnp.broadcast_to(keep, weights.shape)
    weights = weights * (
        keep.astype(weights.dtype) / jnp.asarray(1.0 - dropout_rate, dtype))

  return jnp.einsum(f"bhqk,{k_sub}->bqhd", weights, value)


def mask_to_bias(mask: Optional[Array], dtype: DType) -> Optional[Array]:
  """Boolean/0-1 mask -> additive attention bias (0 or -1e10)."""
  if mask is None:
    return None
  return lax.select(mask > 0,
                    jnp.full(mask.shape, 0.0).astype(dtype),
                    jnp.full(mask.shape, -1e10).astype(dtype))


class MultiHeadAttention(nn.Module):
  """Multi-head attention with a split KV-projection path.

  Call patterns:
    * `__call__(q, kv, mask)` — ordinary fused QKV path.
    * `project_kv(kv)` then `__call__(q, None, mask, cached_kv=(k, v))` —
      reuse K/V computed once for a fixed memory (diffusion cross-attn).

  Like T5, no explicit 1/sqrt(d) logit scaling: it is folded into the query
  kernel initializer (equivalent under Adafactor).
  """
  num_heads: int
  head_dim: int
  out_features: Optional[int] = None
  dtype: DType = jnp.float32
  dropout_rate: float = 0.0
  kernel_init: Initializer = nn.initializers.variance_scaling(
      1.0, "fan_in", "normal")
  float32_logits: bool = False
  # Use the Pallas fused-attention kernel (ops/attention.py) when the
  # score tensor is large enough to beat XLA (both inference and — via
  # its custom VJP — training; per-key broadcast dropout folds into a
  # value-row scale).
  use_fused_attention: bool = False

  def setup(self):
    depth_scaling = jnp.sqrt(self.head_dim).astype(jnp.float32)
    query_init = lambda *args: self.kernel_init(*args) / depth_scaling
    proj = functools.partial(
        DenseGeneral, axis=-1, features=(self.num_heads, self.head_dim),
        kernel_axes=("embed", "joined_kv"), dtype=self.dtype)
    self.query_proj = proj(kernel_init=query_init, name="query")
    self.key_proj = proj(kernel_init=self.kernel_init, name="key")
    self.value_proj = proj(kernel_init=self.kernel_init, name="value")
    if self.out_features is None:
      raise ValueError("MultiHeadAttention requires out_features "
                       "(setup-defined modules cannot infer it).")
    self.out_proj = DenseGeneral(
        features=self.out_features, axis=(-2, -1),
        kernel_init=self.kernel_init, kernel_axes=("joined_kv", "embed"),
        dtype=self.dtype, name="out")

  def project_kv(self, inputs_kv: Array) -> Tuple[Array, Array]:
    """Project a memory into (key, value).

    Layout is [b, l, heads, head_dim] normally; with use_fused_attention
    the fused kernel's native [b, heads, l, head_dim] — so cached K/V is
    stored pre-transposed and per-step calls skip the transpose."""
    key = self.key_proj(inputs_kv)
    value = self.value_proj(inputs_kv)
    key = with_sharding_constraint(key, ("batch", "length", "heads", "kv"))
    value = with_sharding_constraint(value, ("batch", "length", "heads", "kv"))
    if self.use_fused_attention:
      from music_spectrogram_diffusion_tpu.ops import attention as fused
      return fused.transpose_kv(key, value)
    return key, value

  def __call__(self,
               inputs_q: Array,
               inputs_kv: Optional[Array],
               mask: Optional[Array] = None,
               bias: Optional[Array] = None,
               *,
               cached_kv: Optional[Tuple[Array, Array]] = None,
               kv_mask: Optional[Array] = None,
               deterministic: bool = False) -> Array:
    """kv_mask: optional [batch, kv_len] keep-mask, equivalent to a
    row-constant `mask` but far cheaper on the fused path (the kernel
    streams kv bools instead of a q*kv bias tensor)."""
    query = self.query_proj(inputs_q)
    query = with_sharding_constraint(query,
                                     ("batch", "length", "heads", "kv"))
    if cached_kv is not None:
      key, value = cached_kv
    else:
      key, value = self.project_kv(inputs_kv)

    attention_bias = mask_to_bias(mask, self.dtype)
    if bias is not None:
      attention_bias = bias if attention_bias is None else (
          attention_bias + bias)

    dropout_active = not deterministic and self.dropout_rate > 0.0
    if self.use_fused_attention:
      batch, q_len = query.shape[0], query.shape[1]
      kv_len = key.shape[2]  # fused layout [b, h, kv, d]
      score_bytes = 4 * batch * self.num_heads * q_len * kv_len
      if score_bytes >= FLASH_MIN_SCORE_BYTES:
        from music_spectrogram_diffusion_tpu.ops import attention as fused
        if deterministic:
          x = fused.flash_attention(query, key, value, attention_bias,
                                    kv_mask=kv_mask, kv_transposed=True)
        else:
          # Train path: custom-VJP kernel (fused backward, scores never
          # in HBM). T5 attention dropout broadcasts along q (per-key),
          # so it folds into a value-row scale — the kernel's softmax
          # normalization uses the undropped probabilities either way.
          # Same keep-mask shape/rng as the XLA path below.
          val = value
          if dropout_active:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.dropout_rate,
                (batch, self.num_heads, 1, kv_len))
            scale = keep.astype(self.dtype) / (1.0 - self.dropout_rate)
            val = value * jnp.swapaxes(scale, -1, -2)  # [b, h, kv, 1]
          x = fused.flash_attention_diff(query, key, val, attention_bias,
                                         kv_mask=kv_mask,
                                         kv_transposed=True)
        return self.out_proj(x.astype(self.dtype))
    if kv_mask is not None:
      km_bias = mask_to_bias(kv_mask[:, None, None, :], self.dtype)
      attention_bias = km_bias if attention_bias is None else (
          attention_bias + km_bias)

    dropout_rng = self.make_rng("dropout") if dropout_active else None

    x = dot_product_attention(
        query, key, value, bias=attention_bias, dropout_rng=dropout_rng,
        dropout_rate=self.dropout_rate, deterministic=deterministic,
        dtype=self.dtype, float32_logits=self.float32_logits,
        kv_transposed=self.use_fused_attention)

    return self.out_proj(x)


class DecodeCacheAttention(nn.Module):
  """Self-attention with an incremental decode cache for AR generation.

  The cache is stored [batch, heads, head_dim, length] and updated with a
  one-hot broadcast scatter — the layout XLA fuses best on TPU (avoids
  gather/scatter; same trick as the reference, layers.py:273-316).
  """
  num_heads: int
  head_dim: int
  dtype: DType = jnp.float32
  dropout_rate: float = 0.0
  kernel_init: Initializer = nn.initializers.variance_scaling(
      1.0, "fan_in", "normal")
  float32_logits: bool = False

  @nn.compact
  def __call__(self,
               inputs_q: Array,
               inputs_kv: Array,
               mask: Optional[Array] = None,
               bias: Optional[Array] = None,
               *,
               decode: bool = False,
               deterministic: bool = False) -> Array:
    proj = functools.partial(
        DenseGeneral, axis=-1, features=(self.num_heads, self.head_dim),
        kernel_axes=("embed", "joined_kv"), dtype=self.dtype)
    depth_scaling = jnp.sqrt(self.head_dim).astype(self.dtype)
    query_init = lambda *args: self.kernel_init(*args) / depth_scaling

    query = proj(kernel_init=query_init, name="query")(inputs_q)
    key = proj(kernel_init=self.kernel_init, name="key")(inputs_kv)
    value = proj(kernel_init=self.kernel_init, name="value")(inputs_kv)

    query = with_sharding_constraint(query,
                                     ("batch", "length", "heads", "kv"))
    key = with_sharding_constraint(key, ("batch", "length", "heads", "kv"))
    value = with_sharding_constraint(value, ("batch", "length", "heads", "kv"))

    if decode:
      is_initialized = self.has_variable("cache", "cached_key")
      swap = lambda s: s[:-3] + (s[-2], s[-1], s[-3])
      cached_key = self.variable("cache", "cached_key", jnp.zeros,
                                 swap(key.shape), key.dtype)
      cached_value = self.variable("cache", "cached_value", jnp.zeros,
                                   swap(value.shape), value.dtype)
      cache_index = self.variable("cache", "cache_index",
                                  lambda: jnp.array(0, dtype=jnp.int32))
      if is_initialized:
        batch, num_heads, head_dim, length = cached_key.value.shape
        expected = (batch, 1, num_heads, head_dim)
        if expected != query.shape:
          raise ValueError(
              f"decode cache expects query shape {expected}, got {query.shape}")
        cur_index = cache_index.value
        one_hot = jax.nn.one_hot(cur_index, length, dtype=key.dtype)
        key_t = jnp.moveaxis(key, -3, -1)
        value_t = jnp.moveaxis(value, -3, -1)
        key_cache = cached_key.value + key_t * one_hot
        value_cache = cached_value.value + value_t * one_hot
        cached_key.value = key_cache
        cached_value.value = value_cache
        cache_index.value = cache_index.value + 1
        key = jnp.moveaxis(key_cache, -1, -3)
        value = jnp.moveaxis(value_cache, -1, -3)

        causal = jnp.broadcast_to(
            jnp.arange(length) <= cur_index, (batch, 1, 1, length))
        mask = combine_masks(mask, causal)

        if bias is not None:
          bias = jax.vmap(
              lambda b, i: lax.dynamic_slice_in_dim(b, i, 1, -2),
              in_axes=(None, 0))(
                  jnp.squeeze(bias, axis=0),
                  jnp.reshape(cur_index, (-1,)))

    attention_bias = mask_to_bias(mask, self.dtype)
    if bias is not None:
      attention_bias = bias if attention_bias is None else (
          attention_bias + bias)

    dropout_rng = None
    if not deterministic and self.dropout_rate > 0.0:
      dropout_rng = self.make_rng("dropout")

    x = dot_product_attention(
        query, key, value, bias=attention_bias, dropout_rng=dropout_rng,
        dropout_rate=self.dropout_rate, deterministic=deterministic,
        dtype=self.dtype, float32_logits=self.float32_logits)

    return DenseGeneral(
        features=inputs_q.shape[-1], axis=(-2, -1),
        kernel_init=self.kernel_init, kernel_axes=("joined_kv", "embed"),
        dtype=self.dtype, name="out")(x)


# ---------------------------------------------------------------------------
# Embeddings, LayerNorm, FiLM.
# ---------------------------------------------------------------------------


class Embed(nn.Module):
  """Integer-id embedding, optionally via one-hot matmul (SPMD-friendly)."""
  num_embeddings: int
  features: int
  cast_input_dtype: Optional[DType] = None
  dtype: DType = jnp.float32
  attend_dtype: Optional[DType] = None
  embedding_init: Initializer = default_embed_init
  one_hot: bool = False
  fixed: bool = False
  embedding: Array = dataclasses.field(init=False)

  def setup(self):
    self.embedding = param_with_axes(
        "embedding", self.embedding_init,
        (self.num_embeddings, self.features), jnp.float32,
        axes=("vocab", "embed"))

  def __call__(self, inputs: Array) -> Array:
    if self.cast_input_dtype:
      inputs = inputs.astype(self.cast_input_dtype)
    if not jnp.issubdtype(inputs.dtype, jnp.integer):
      raise ValueError("Embed inputs must be integers.")
    if self.one_hot:
      iota = lax.iota(jnp.int32, self.num_embeddings)
      one_hot = jnp.array(inputs[..., None] == iota, dtype=self.dtype)
      output = jnp.dot(one_hot, jnp.asarray(self.embedding, self.dtype))
    else:
      output = jnp.asarray(self.embedding, self.dtype)[inputs]
      output = with_sharding_constraint(output,
                                        ("batch", "length", "embed"))
    if self.fixed:
      output = lax.stop_gradient(output)
    return output

  def attend(self, query: Array) -> Array:
    dtype = self.attend_dtype if self.attend_dtype is not None else self.dtype
    return jnp.dot(query, jnp.asarray(self.embedding, dtype).T)


class FixedEmbed(nn.Module):
  """Non-learnable embedding table with a decode position counter."""
  features: int
  max_length: int = 2048
  embedding_init: Initializer = sinusoidal()
  dtype: DType = jnp.float32

  def setup(self):
    self.embedding = self.embedding_init(
        None, (self.max_length, self.features), self.dtype)

  @nn.compact
  def __call__(self, inputs, *, decode: bool = False):
    if decode:
      # Starts at uint32 -1: the cache-init pass consumes one increment,
      # so the first real decode step reads position 0.
      position_index = self.variable(
          "cache", "position_embedder_index",
          lambda: jnp.array(np.iinfo(np.uint32).max, dtype=jnp.uint32))
      i = position_index.value
      position_index.value = i + 1
      return lax.dynamic_slice(self.embedding, jnp.array((i, 0)),
                               np.array((1, self.features)))
    return jnp.take(self.embedding, inputs, axis=0)


class RMSNorm(nn.Module):
  """T5 layer norm: rms-only, no mean subtraction, no bias."""
  epsilon: float = 1e-6
  dtype: DType = jnp.float32
  scale_init: Initializer = nn.initializers.ones

  @nn.compact
  def __call__(self, x: Array) -> Array:
    x32 = jnp.asarray(x, jnp.float32)
    mean2 = jnp.mean(lax.square(x32), axis=-1, keepdims=True)
    y = jnp.asarray(x32 * lax.rsqrt(mean2 + self.epsilon), self.dtype)
    scale = param_with_axes("scale", self.scale_init, (x.shape[-1],),
                            jnp.float32, axes=("embed",))
    return y * jnp.asarray(scale, self.dtype)


class FiLM(nn.Module):
  """Feature-wise linear modulation from a conditioning embedding."""

  @nn.compact
  def __call__(self, x: Array, conditioning: Array,
               dtype: DType = jnp.float32) -> Array:
    scale_bias = DenseGeneral(
        features=x.shape[-1] * 2, dtype=dtype,
        kernel_axes=("vocab", "embed"))(conditioning)
    scale, bias = jnp.split(scale_bias, 2, axis=-1)
    return x * (scale + 1.0) + bias


# ---------------------------------------------------------------------------
# Masks.
# ---------------------------------------------------------------------------


def make_attention_mask(query_input: Array,
                        key_input: Array,
                        pairwise_fn: Callable = jnp.multiply,
                        extra_batch_dims: int = 0,
                        dtype: DType = jnp.float32) -> Array:
  """[b, len_q] x [b, len_kv] -> [b, 1, len_q, len_kv] mask."""
  mask = pairwise_fn(jnp.expand_dims(query_input, -1),
                     jnp.expand_dims(key_input, -2))
  mask = jnp.expand_dims(mask, -3)
  mask = jnp.expand_dims(mask, tuple(range(extra_batch_dims)))
  return mask.astype(dtype)


def make_causal_mask(x: Array, extra_batch_dims: int = 0,
                     dtype: DType = jnp.float32) -> Array:
  idxs = jnp.broadcast_to(jnp.arange(x.shape[-1], dtype=jnp.int32), x.shape)
  return make_attention_mask(idxs, idxs, jnp.greater_equal,
                             extra_batch_dims=extra_batch_dims, dtype=dtype)


def combine_masks(*masks: Optional[Array],
                  dtype: DType = jnp.float32) -> Optional[Array]:
  masks = [m for m in masks if m is not None]
  if not masks:
    return None
  assert all(m.ndim == masks[0].ndim for m in masks), (
      f"masks must have the same rank: {[m.ndim for m in masks]}")
  mask, *rest = masks
  for other in rest:
    mask = jnp.logical_and(mask, other)
  return mask.astype(dtype)


def combine_biases(*biases: Optional[Array]) -> Optional[Array]:
  biases = [b for b in biases if b is not None]
  if not biases:
    return None
  assert all(b.ndim == biases[0].ndim for b in biases)
  bias, *rest = biases
  for other in rest:
    bias = bias + other
  return bias


def make_decoder_mask(decoder_target_tokens: Array,
                      dtype: DType,
                      decoder_causal_attention: Optional[Array] = None,
                      decoder_segment_ids: Optional[Array] = None) -> Array:
  """Causal + padding (+ optional prefix-LM / packing) decoder self-mask."""
  masks = []
  causal = make_causal_mask(decoder_target_tokens, dtype=dtype)
  if decoder_causal_attention is not None:
    inputs_mask = make_attention_mask(
        decoder_causal_attention, decoder_causal_attention,
        jnp.logical_and, dtype=dtype)
    masks.append(jnp.logical_or(causal, inputs_mask).astype(dtype))
  else:
    masks.append(causal)
  masks.append(make_attention_mask(
      decoder_target_tokens > 0, decoder_target_tokens > 0, dtype=dtype))
  if decoder_segment_ids is not None:
    masks.append(make_attention_mask(
        decoder_segment_ids, decoder_segment_ids, jnp.equal, dtype=dtype))
  mask = combine_masks(*masks, dtype=dtype)
  assert mask is not None
  return mask


def zero_if_all_masked(y: Array, mask: Array) -> Array:
  """Zero activations where the entire kv mask row is 0.

  With every key masked the softmax degenerates to uniform weights, which is
  indistinguishable from *nothing* masked — this guard makes all-masked
  cross-attention (CFG uncond branch, empty first-segment context) return
  exactly zero instead.

  mask: [b, 1, q, kv] attention mask, or a raw [b, kv] kv keep-mask.
  """
  if mask.ndim == 2:  # [b, kv]
    is_not_empty = jnp.any(mask == 1, axis=-1)[:, None, None]
  else:
    is_not_empty = jnp.any(jnp.squeeze(mask, 1) == 1, axis=-1, keepdims=True)
  return y * is_not_empty.astype(y.dtype)
