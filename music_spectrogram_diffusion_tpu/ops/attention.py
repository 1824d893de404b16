"""Pallas fused attention for TPU.

Two generations of kernel live here:

* `flash_attention` (default): kv-blocked online-softmax attention.
  Scores never touch HBM at any batch size — the [q, kv] tile lives in
  VMEM per (batch, head, kv-block) grid step and is reduced into
  running (max, sum, acc) scratch. This is what fixes the batch-scaling
  cliff: XLA materializes the [2B, heads, 256, 2304] score tensor
  (~226 MB per decoder layer per denoise step at CFG batch 8) and the
  sampler becomes HBM-bound.
* `attention_reference`: plain-XLA oracle used by tests.

For cross-attention the padding mask is row-constant, so callers can
pass `kv_mask` ([batch, kv] bool) instead of a full [batch, 1, q, kv]
bias — the kernel then streams kv/128 mask bytes instead of q*kv bias
floats per block (the bias tensor is as large as the scores it guards).

Semantics match models/layers.dot_product_attention (T5-style: NO
1/sqrt(d) scaling — folded into the query initializer; additive bias
carries the padding mask as 0 / -1e10).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

_NEG_INF = -1e30  # finite "minus infinity": keeps exp() NaN-free

# Process-wide tiling overrides for experiments (bench.py flags). Read
# once at trace time — changing them does NOT invalidate jit caches, so
# set them before the first call only.
DEFAULT_KV_BLOCK_SIZE: Optional[int] = None
DEFAULT_HEAD_BLOCK_SIZE: Optional[int] = None


def _round_up(x: int, m: int) -> int:
  return (x + m - 1) // m * m


def transpose_kv(key: Array, value: Array):
  """[b, l, h, d] -> [b, h, l, d]: the fused kernel's native KV layout.

  Cross-attention KV caches should be stored in this layout so the
  transpose happens once per segment instead of once per denoise step.
  """
  return (jnp.transpose(key, (0, 2, 1, 3)),
          jnp.transpose(value, (0, 2, 1, 3)))


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref,
                  acc_ref, m_ref, l_ref, *, mxu_bf16: bool,
                  num_kv_blocks: int, kv_len: int, kv_blk: int):
  """Online-softmax attention over one (head-group, kv-block) tile.

  Grid is (batch, head_groups, kv_blocks) with kv innermost; the
  (acc, m, l) scratch carries across kv blocks of one (batch, group)
  and resets at kv block 0. G = heads per group (one batched MXU matmul
  per tile — at small batch this is what keeps the systolic array fed).
  Block shapes:
    q_ref    [1, G, q_pad, d]
    k_ref    [1, G, kv_blk, d]
    v_ref    [1, G, kv_blk, d]
    bias_ref [1, 1 | G, q_pad, kv_blk]  (optional)
    mask_ref [1, 1, kv_blk]        (optional; f32 keep-mask, row-constant)
    out_ref  [1, G, q_pad, d]
  """
  kv_i = pl.program_id(2)
  # Scratch is [G*q_pad, ...] 2D; only the MXU contractions see 3D.
  # (Mosaic's vector layouts are 2D-tiled — 3D elementwise/slice ops hit
  # lowering limits, so softmax state lives flattened.)
  g_dim = q_ref.shape[1]
  q_pad = q_ref.shape[2]

  @pl.when(kv_i == 0)
  def _init():
    acc_ref[:, :] = jnp.zeros_like(acc_ref)
    m_ref[:, :] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[:, :] = jnp.zeros_like(l_ref)

  mm_dtype = jnp.bfloat16 if mxu_bf16 else jnp.float32
  q = q_ref[0, :, :, :].astype(mm_dtype)  # [G, q_pad, d]
  k = k_ref[0, :, :, :].astype(mm_dtype)  # [G, kv_blk, d]
  v = v_ref[0, :, :, :].astype(mm_dtype)  # [G, kv_blk, d]

  s = jax.lax.dot_general(
      q, k, (((2,), (2,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)  # [G, q_pad, kv_blk]
  s = s.reshape(g_dim * q_pad, s.shape[-1])  # [G*q_pad, kv_blk]
  if bias_ref is not None:
    b = bias_ref[0, :, :, :].astype(jnp.float32)  # [1 | G, q_pad, kv_blk]
    if bias_ref.shape[1] == 1 and g_dim > 1:
      b = jnp.broadcast_to(b, (g_dim,) + b.shape[1:])
    s = s + b.reshape(-1, b.shape[-1])
  if mask_ref is not None:
    keep = mask_ref[0, 0, :]  # [kv_blk] f32
    s = s + (keep[None, :] - 1.0) * 1e10  # 0 kept, -1e10 masked
  if kv_len % kv_blk != 0:
    # Padded keys get a strictly lower bias than any masked real key
    # (-1e10), so even fully-masked rows normalize over the real keys
    # only — matching the XLA path bit-for-bit up to fp error.
    pos = (kv_i * kv_blk +
           jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[-1]), 1))
    s = jnp.where(pos >= kv_len, -2e10, s)

  m_prev = m_ref[:, 0:1]  # [G*q_pad, 1]
  l_prev = l_ref[:, 0:1]
  m_cur = jnp.max(s, axis=-1, keepdims=True)  # [G*q_pad, 1]
  m_new = jnp.maximum(m_prev, m_cur)
  alpha = jnp.exp(m_prev - m_new)
  p = jnp.exp(s - m_new)  # [G*q_pad, kv_blk]
  l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

  pv = jax.lax.dot_general(
      p.astype(mm_dtype).reshape(g_dim, q_pad, p.shape[-1]), v,
      (((2,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)  # [G, q_pad, d]
  acc_ref[:, :] = acc_ref[:, :] * alpha + pv.reshape(g_dim * q_pad, -1)
  m_ref[:, 0:1] = m_new
  l_ref[:, 0:1] = l_new

  @pl.when(kv_i == num_kv_blocks - 1)
  def _finalize():
    denom = jnp.maximum(l_ref[:, 0:1], 1e-37)
    out = (acc_ref[:, :] / denom).astype(out_ref.dtype)
    out_ref[0, :, :, :] = out.reshape(g_dim, q_pad, out.shape[-1])


# Import here (not at module top) so non-TPU environments without the
# pallas extras can still import the reference path.
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


@functools.partial(
    jax.jit, static_argnames=("kv_transposed", "mxu_bf16", "interpret",
                              "kv_block_size", "head_block_size"))
def flash_attention(query: Array,
                    key: Array,
                    value: Array,
                    bias: Optional[Array] = None,
                    kv_mask: Optional[Array] = None,
                    *,
                    kv_transposed: bool = False,
                    mxu_bf16: bool = True,
                    interpret: bool = False,
                    kv_block_size: Optional[int] = None,
                    head_block_size: Optional[int] = None) -> Array:
  """softmax(q k^T + bias) v with q [batch, q_len, heads, head_dim].

  Args:
    query: [batch, q_len, heads, head_dim].
    key/value: [batch, kv_len, heads, head_dim], or the kernel-native
      [batch, heads, kv_len, head_dim] when kv_transposed=True.
    bias: optional [batch, 1 | heads, q_len, kv_len] additive bias.
    kv_mask: optional [batch, kv_len] bool — keep (True) / drop (False)
      each key for every query row. Cheaper than an equivalent bias
      (row-constant padding masks are the common case here). May be
      combined with bias.
    kv_block_size: kv tile; scores stay in VMEM at [G, q_pad, block].
    head_block_size: heads per grid step (G; must divide num_heads).
      Grouping heads turns G small matmuls into one batched MXU call —
      the difference between starving and feeding the systolic array at
      small batch. Default (None): largest divisor of num_heads keeping
      the score tile under the VMEM budget.

  Returns [batch, q_len, heads, head_dim] in the query dtype.
  """
  if not interpret and jax.default_backend() != "tpu":
    # Mosaic only lowers on TPU; run interpreted on CPU (tests).
    interpret = True

  batch, q_len, num_heads, head_dim = query.shape
  kv_len = key.shape[2] if kv_transposed else key.shape[1]

  if kv_block_size is None:
    kv_block_size = DEFAULT_KV_BLOCK_SIZE
  if head_block_size is None:
    head_block_size = DEFAULT_HEAD_BLOCK_SIZE

  q_pad = _round_up(q_len, 8)
  kv_all = _round_up(kv_len, 128)
  if kv_block_size is None:
    # Whole-kv blocks measured fastest at this model's geometry
    # (q<=256, kv<=2.5k) as long as the score tile fits the budget.
    kv_block_size = kv_all if 4 * q_pad * kv_all <= 4 * 1024 * 1024 else 1024
  kv_blk = min(kv_block_size, kv_all)
  kv_pad = _round_up(kv_len, kv_blk)
  num_kv_blocks = kv_pad // kv_blk

  if head_block_size is None:
    # Largest head group whose full working set (f32 score tile +
    # double-buffered k/v blocks + q/out/acc/softmax state) stays under
    # ~12 MB of VMEM. Measured on v5e (base model in the sampler scan):
    # G=2 with a whole-kv block gave 847.9 ms vs 1178 ms for G=1 at CFG
    # batch 8 cross-attention.
    budget = 12 * 1024 * 1024
    head_block_size = 1
    for g in range(num_heads, 0, -1):
      if num_heads % g != 0:
        continue
      vmem = 4 * (g * q_pad * kv_blk          # score tile
                  + 4 * g * kv_blk * head_dim  # k+v, double-buffered
                  + 4 * g * q_pad * head_dim   # q + out (+buffers)
                  + g * q_pad * head_dim       # acc scratch
                  + 2 * g * q_pad * 128)       # m/l scratch
      if vmem <= budget:
        head_block_size = g
        break
  if num_heads % head_block_size != 0:
    raise ValueError(f"head_block_size {head_block_size} must divide "
                     f"num_heads {num_heads}")
  hg = head_block_size

  # [b, l, h, d] -> [b, h, l, d] (tiles on (len, d)).
  q = jnp.transpose(query, (0, 2, 1, 3))
  if kv_transposed:
    k, v = key, value
  else:
    k, v = transpose_kv(key, value)
  if q_pad != q_len:
    q = jnp.pad(q, ((0, 0), (0, 0), (0, q_pad - q_len), (0, 0)))
  if kv_pad != kv_len:
    # Padded keys are neutralized inside the kernel (static iota bias at
    # -2e10, strictly below any masked real key).
    k = jnp.pad(k, ((0, 0), (0, 0), (0, kv_pad - kv_len), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, kv_pad - kv_len), (0, 0)))
  if kv_mask is not None:
    # [b, kv] -> [b, 1, kv_pad] f32: Mosaic requires the trailing block
    # dims to tile (8, 128) or equal the array dims; the unit middle dim
    # satisfies that, and f32 avoids sub-byte bool tiling rules.
    kv_mask = jnp.pad(kv_mask.astype(jnp.float32),
                      ((0, 0), (0, kv_pad - kv_mask.shape[1])),
                      constant_values=1.0)[:, None, :]

  grid = (batch, num_heads // hg, num_kv_blocks)
  in_specs = [
      pl.BlockSpec((1, hg, q_pad, head_dim), lambda b, h, i: (b, h, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, hg, kv_blk, head_dim), lambda b, h, i: (b, h, i, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, hg, kv_blk, head_dim), lambda b, h, i: (b, h, i, 0),
                   memory_space=pltpu.VMEM),
  ]
  operands = [q, k, v]

  has_bias = bias is not None
  if has_bias:
    assert bias.shape[0] == batch and bias.shape[2:] == (q_len, kv_len), (
        f"bias {bias.shape} vs batch={batch} q={q_len} kv={kv_len}")
    bias = jnp.pad(bias, ((0, 0), (0, 0), (0, q_pad - q_len),
                          (0, kv_pad - kv_len)))
    bh = bias.shape[1]
    in_specs.append(pl.BlockSpec(
        (1, hg if bh > 1 else 1, q_pad, kv_blk),
        (lambda b, h, i: (b, h, 0, i)) if bh > 1
        else (lambda b, h, i: (b, 0, 0, i)),
        memory_space=pltpu.VMEM))
    operands.append(bias)

  has_mask = kv_mask is not None
  if has_mask:
    in_specs.append(pl.BlockSpec((1, 1, kv_blk), lambda b, h, i: (b, 0, i),
                                 memory_space=pltpu.VMEM))
    operands.append(kv_mask)

  def kernel(*refs):
    q_r, k_r, v_r = refs[:3]
    idx = 3
    b_r = refs[idx] if has_bias else None
    idx += int(has_bias)
    m_r = refs[idx] if has_mask else None
    idx += int(has_mask)
    out_r, acc_r, mm_r, ll_r = refs[idx:idx + 4]
    _flash_kernel(q_r, k_r, v_r, b_r, m_r, out_r, acc_r, mm_r, ll_r,
                  mxu_bf16=mxu_bf16, num_kv_blocks=num_kv_blocks,
                  kv_len=kv_len, kv_blk=kv_blk)

  flops = 2 * batch * num_heads * q_pad * kv_pad * head_dim * 2
  bytes_accessed = 4 * batch * num_heads * (
      (q_pad + 2 * kv_pad) * head_dim + q_pad * head_dim)
  if has_bias:
    bytes_accessed += 4 * batch * q_pad * kv_pad

  out = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=in_specs,
      out_specs=pl.BlockSpec((1, hg, q_pad, head_dim),
                             lambda b, h, i: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct(
          (batch, num_heads, q_pad, head_dim), query.dtype),
      scratch_shapes=[
          pltpu.VMEM((hg * q_pad, head_dim), jnp.float32),  # acc
          pltpu.VMEM((hg * q_pad, 128), jnp.float32),       # running max
          pltpu.VMEM((hg * q_pad, 128), jnp.float32),       # running sum
      ],
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=bytes_accessed,
          transcendentals=batch * num_heads * q_pad * kv_pad),
      interpret=interpret,
  )(*operands)

  out = out[:, :, :q_len, :]
  return jnp.transpose(out, (0, 2, 1, 3))


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
  """Back-compat wrapper: flash_attention with the original signature."""
  return flash_attention(query, key, value, bias,
                         kv_transposed=kv_transposed, mxu_bf16=mxu_bf16,
                         interpret=interpret)


def attention_reference(query, key, value, bias=None, kv_mask=None):
  """Plain-XLA oracle used in tests."""
  weights = jnp.einsum("bqhd,bkhd->bhqk", query.astype(jnp.float32),
                       key.astype(jnp.float32))
  if bias is not None:
    weights = weights + bias.astype(weights.dtype)
  if kv_mask is not None:
    keep = kv_mask.astype(jnp.float32)
    weights = weights + ((keep - 1.0) * 1e10)[:, None, None, :]
  weights = jax.nn.softmax(weights)
  return jnp.einsum("bhqk,bkhd->bqhd", weights,
                    value.astype(jnp.float32)).astype(query.dtype)
