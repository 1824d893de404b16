"""Pallas fused attention for TPU.

For this model family's geometry (q_len <= 256 decoder frames,
kv_len <= ~2.5k encoder tokens, head_dim 64) the entire per-(batch, head)
attention — scores, softmax, value combine — fits in VMEM, so one Pallas
kernel computes it without materializing the [q, kv] score matrix in HBM.
The decoder runs this twice per layer per denoise step, ~1000 steps per
segment, so the saved HBM round trips add up.

Semantics match models/layers.dot_product_attention (T5-style: NO
1/sqrt(d) scaling — it's folded into the query initializer; optional
additive bias holds the padding mask as 0 / -1e10).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
  """One (batch, head) tile: out = softmax(q k^T + bias) v, all in VMEM."""
  q = q_ref[0, :, 0, :]  # [q_len, d]
  k = k_ref[0, :, 0, :]  # [kv_len, d]
  v = v_ref[0, :, 0, :]  # [kv_len, d]

  scores = jax.lax.dot_general(
      q, k, (((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)  # [q_len, kv_len]
  if bias_ref is not None:
    scores = scores + bias_ref[0, 0, :, :].astype(jnp.float32)

  # Numerically-stable softmax in f32.
  m = jnp.max(scores, axis=-1, keepdims=True)
  p = jnp.exp(scores - m)
  denom = jnp.sum(p, axis=-1, keepdims=True)
  p = p / denom

  out = jax.lax.dot_general(
      p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  out_ref[0, :, 0, :] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(query: Array,
                    key: Array,
                    value: Array,
                    bias: Optional[Array] = None,
                    *,
                    interpret: bool = False) -> Array:
  """softmax(q k^T + bias) v with q/k/v [batch, len, heads, head_dim].

  bias: optional [batch, 1 | heads, q_len, kv_len] additive bias.
  Returns [batch, q_len, heads, head_dim] in the query dtype.
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  batch, q_len, num_heads, head_dim = query.shape
  kv_len = key.shape[1]
  assert key.shape == (batch, kv_len, num_heads, head_dim)
  assert value.shape == key.shape

  in_specs = [
      pl.BlockSpec((1, q_len, 1, head_dim),
                   lambda b, h: (b, 0, h, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, kv_len, 1, head_dim),
                   lambda b, h: (b, 0, h, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, kv_len, 1, head_dim),
                   lambda b, h: (b, 0, h, 0),
                   memory_space=pltpu.VMEM),
  ]
  operands = [query, key, value]

  if bias is not None:
    assert bias.ndim == 4 and bias.shape[0] == batch
    assert bias.shape[2:] == (q_len, kv_len), bias.shape
    bias_heads = bias.shape[1]
    in_specs.append(
        pl.BlockSpec((1, 1, q_len, kv_len),
                     (lambda b, h: (b, h, 0, 0)) if bias_heads > 1
                     else (lambda b, h: (b, 0, 0, 0)),
                     memory_space=pltpu.VMEM))
    operands.append(bias)
    kernel = _attention_kernel
  else:
    kernel = functools.partial(_attention_kernel, bias_ref=None)

  flops = 2 * batch * num_heads * q_len * kv_len * head_dim * 2
  bytes_accessed = 4 * batch * num_heads * (
      (q_len + 2 * kv_len) * head_dim + q_len * head_dim)

  return pl.pallas_call(
      kernel if bias is not None else
      (lambda q, k, v, o: _attention_kernel(q, k, v, None, o)),
      grid=(batch, num_heads),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((1, q_len, 1, head_dim),
                             lambda b, h: (b, 0, h, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct(
          (batch, q_len, num_heads, head_dim), query.dtype),
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=bytes_accessed, transcendentals=
          batch * num_heads * q_len * kv_len),
      interpret=interpret,
  )(*operands)


def attention_reference(query, key, value, bias=None):
  """Plain-XLA oracle used in tests."""
  weights = jnp.einsum("bqhd,bkhd->bhqk", query.astype(jnp.float32),
                       key.astype(jnp.float32))
  if bias is not None:
    weights = weights + bias.astype(weights.dtype)
  weights = jax.nn.softmax(weights)
  return jnp.einsum("bhqk,bkhd->bqhd", weights,
                    value.astype(jnp.float32)).astype(query.dtype)
