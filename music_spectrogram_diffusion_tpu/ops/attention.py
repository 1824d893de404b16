"""Pallas fused attention for TPU.

For this model family's geometry (q_len <= 256 decoder frames,
kv_len <= ~2.5k encoder tokens, head_dim 64) the entire per-(batch, head)
attention — scores, softmax, value combine — fits in VMEM, so one Pallas
kernel computes it without materializing the [q, kv] score matrix in HBM.

That matters more than usual here: XLA materializes the score tensor, and
at CFG-fused batch 8 that is ~226 MB per decoder layer per denoise step —
the 1000-step sampler becomes HBM-bandwidth-bound on attention scores.
This kernel keeps scores on-chip.

Semantics match models/layers.dot_product_attention (T5-style: NO
1/sqrt(d) scaling — folded into the query initializer; optional additive
bias carries the padding mask as 0 / -1e10).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _round_up(x: int, m: int) -> int:
  return (x + m - 1) // m * m


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                      mxu_bf16: bool):
  """One (batch, head) tile: out = softmax(q k^T + bias) v, in VMEM.

  Refs are [1, 1, len, d] / bias [1, 1, q_len, kv_len].

  mxu_bf16: cast matmul inputs to bf16 (f32 accumulation) — the same
  precision XLA uses for f32 matmuls on TPU by default; full-f32 MXU
  passes are several times slower. Tests use False for exact parity."""
  mm_dtype = jnp.bfloat16 if mxu_bf16 else jnp.float32
  q = q_ref[0, 0, :, :].astype(mm_dtype)  # [q_len, d]
  k = k_ref[0, 0, :, :].astype(mm_dtype)  # [kv_len, d]
  v = v_ref[0, 0, :, :].astype(mm_dtype)  # [kv_len, d]

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
      p.astype(mm_dtype), v, (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  out_ref[0, 0, :, :] = out.astype(out_ref.dtype)


def transpose_kv(key: Array, value: Array):
  """[b, l, h, d] -> [b, h, l, d]: the fused kernel's native KV layout.

  Cross-attention KV caches should be stored in this layout so the
  transpose happens once per segment instead of once per denoise step.
  """
  return (jnp.transpose(key, (0, 2, 1, 3)),
          jnp.transpose(value, (0, 2, 1, 3)))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "kv_transposed",
                                    "mxu_bf16"))
def fused_attention(query: Array,
                    key: Array,
                    value: Array,
                    bias: Optional[Array] = None,
                    *,
                    kv_transposed: bool = False,
                    mxu_bf16: bool = True,
                    interpret: bool = False) -> Array:
  """softmax(q k^T + bias) v with q/k/v [batch, len, heads, head_dim].

  bias: optional [batch, 1 | heads, q_len, kv_len] additive bias.
  kv_transposed: key/value are already [batch, heads, kv_len, head_dim]
    (see transpose_kv).
  Returns [batch, q_len, heads, head_dim] in the query dtype.

  Lengths are padded on-the-fly to TPU tile boundaries (q_len -> x8,
  kv_len -> x128); padded keys get a strictly-lower bias so results are
  unchanged.
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  if not interpret and jax.default_backend() != "tpu":
    # Mosaic only lowers on TPU; run the same kernel interpreted on CPU
    # (tests) instead of failing.
    interpret = True

  batch, q_len, num_heads, head_dim = query.shape
  kv_len = key.shape[2] if kv_transposed else key.shape[1]

  q_pad = _round_up(q_len, 8)
  kv_pad = _round_up(kv_len, 128)

  # Single-block design: everything for one (batch, head) must fit in
  # VMEM. Fall back to plain XLA when it can't (e.g. encoder
  # self-attention at 2048x2048, which runs once per segment anyway).
  vmem_bytes = 4 * (q_pad * head_dim * 2 + 2 * kv_pad * head_dim +
                    2 * q_pad * kv_pad)
  if vmem_bytes > 12 * 1024 * 1024:
    if kv_transposed:
      key, value = (jnp.transpose(key, (0, 2, 1, 3)),
                    jnp.transpose(value, (0, 2, 1, 3)))
    return attention_reference(query, key, value, bias)

  # [b, l, h, d] -> [b, h, l, d] (the layout Pallas tiles on (len, d)).
  q = jnp.transpose(query, (0, 2, 1, 3))
  if kv_transposed:
    k, v = key, value
  else:
    k, v = transpose_kv(key, value)
  if q_pad != q_len:
    q = jnp.pad(q, ((0, 0), (0, 0), (0, q_pad - q_len), (0, 0)))
  if kv_pad != kv_len:
    k = jnp.pad(k, ((0, 0), (0, 0), (0, kv_pad - kv_len), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, kv_pad - kv_len), (0, 0)))
    if bias is None:
      bias = jnp.zeros((batch, 1, q_len, kv_len), jnp.float32)

  if bias is not None:
    assert bias.shape[0] == batch and bias.shape[2:] == (q_len, kv_len)
    # Padded keys get a strictly lower bias than any masked real key
    # (-1e10), so even fully-masked rows normalize over the real keys
    # only — matching the XLA path bit-for-bit up to fp error.
    bias = jnp.pad(bias,
                   ((0, 0), (0, 0), (0, q_pad - q_len),
                    (0, kv_pad - kv_len)),
                   constant_values=-2e10)

  in_specs = [
      pl.BlockSpec((1, 1, q_pad, head_dim), lambda b, h: (b, h, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, 1, kv_pad, head_dim), lambda b, h: (b, h, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, 1, kv_pad, head_dim), lambda b, h: (b, h, 0, 0),
                   memory_space=pltpu.VMEM),
  ]
  operands = [q, k, v]
  if bias is not None:
    in_specs.append(
        pl.BlockSpec((1, 1, q_pad, kv_pad),
                     (lambda b, h: (b, h, 0, 0)) if bias.shape[1] > 1
                     else (lambda b, h: (b, 0, 0, 0)),
                     memory_space=pltpu.VMEM))
    operands.append(bias)
    kernel = functools.partial(_attention_kernel, mxu_bf16=mxu_bf16)
  else:
    kernel = lambda q_r, k_r, v_r, o_r: _attention_kernel(
        q_r, k_r, v_r, None, o_r, mxu_bf16=mxu_bf16)

  flops = 2 * batch * num_heads * q_pad * kv_pad * head_dim * 2
  bytes_accessed = 4 * batch * num_heads * (
      (q_pad + 2 * kv_pad) * head_dim + q_pad * head_dim)

  out = pl.pallas_call(
      kernel,
      grid=(batch, num_heads),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((1, 1, q_pad, head_dim),
                             lambda b, h: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct(
          (batch, num_heads, q_pad, head_dim), query.dtype),
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=bytes_accessed,
          transcendentals=batch * num_heads * q_pad * kv_pad),
      interpret=interpret,
  )(*operands)

  out = out[:, :, :q_len, :]
  return jnp.transpose(out, (0, 2, 1, 3))


def attention_reference(query, key, value, bias=None):
  """Plain-XLA oracle used in tests."""
  weights = jnp.einsum("bqhd,bkhd->bhqk", query.astype(jnp.float32),
                       key.astype(jnp.float32))
  if bias is not None:
    weights = weights + bias.astype(weights.dtype)
  weights = jax.nn.softmax(weights)
  return jnp.einsum("bhqk,bkhd->bqhd", weights,
                    value.astype(jnp.float32)).astype(query.dtype)
