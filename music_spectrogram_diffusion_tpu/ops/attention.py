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
# MXU input dtype when callers don't pass mxu_bf16 explicitly (tests
# force f32 to compare against the XLA oracle at tight tolerance).
DEFAULT_MXU_BF16: bool = True
# Per-tile VMEM sizing budget for tiling choices (the Mosaic scoped
# limit is raised to _VMEM_LIMIT_BYTES as headroom; v5e has 128 MB).
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024
_VMEM_LIMIT_BYTES = 48 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
  return (x + m - 1) // m * m


def transpose_kv(key: Array, value: Array):
  """[b, l, h, d] -> [b, h, l, d]: the fused kernel's native KV layout.

  Cross-attention KV caches should be stored in this layout so the
  transpose happens once per segment instead of once per denoise step.
  """
  return (jnp.transpose(key, (0, 2, 1, 3)),
          jnp.transpose(value, (0, 2, 1, 3)))


def _tiling(q_len: int, num_heads: int, head_dim: int, kv_len: int,
            kv_block_size: Optional[int], head_block_size: Optional[int]):
  """Pick (q_pad, kv_blk, kv_pad, num_kv_blocks, head group G).

  Shared by forward and backward so the saved lse layout (flattened
  [G*q_pad] rows per group) lines up between the two kernels.
  """
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
    # Large q (e.g. 2048-token encoder self-attention in training):
    # shrink the kv block until even a G=1 BACKWARD tile — ~3 score-
    # sized f32 tiles (s, ds, dp) + q/do/dq + k/v/dk/dv — fits the
    # scoped-VMEM budget. The forward needs strictly less.
    while kv_block_size > 128 and 4 * (
        3 * q_pad * kv_block_size
        + 8 * q_pad * head_dim
        + 6 * kv_block_size * head_dim) > _VMEM_BUDGET_BYTES:
      kv_block_size //= 2
  kv_blk = min(kv_block_size, kv_all)
  kv_pad = _round_up(kv_len, kv_blk)
  num_kv_blocks = kv_pad // kv_blk

  if head_block_size is None:
    # Largest head group whose full working set (f32 score tile +
    # double-buffered k/v blocks + q/out/acc/softmax state) stays under
    # ~12 MB of VMEM. Measured on v5e (base model in the sampler scan):
    # G=2 with a whole-kv block gave 847.9 ms vs 1178 ms for G=1 at CFG
    # batch 8 cross-attention.
    budget = _VMEM_BUDGET_BYTES
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
  return q_pad, kv_blk, kv_pad, num_kv_blocks, head_block_size


def _pick_head_group(num_heads: int, q_pad: int, kv_blk: int,
                     head_dim: int, requested: Optional[int],
                     backward: bool = False) -> int:
  """Head group G for a (possibly shard-local) head count.

  Under mesh partitioning the kernel sees num_heads / n_shards heads;
  a G chosen for the global count may not divide the local one, so the
  per-shard lowering re-picks here (G only affects performance — the
  saved lse layout is head-major and independent of grouping). The
  backward tile carries ~3 score-sized f32 intermediates (s, ds, dp)
  plus twice the q/kv-side tiles, so it sizes with its own formula."""
  if requested is not None and num_heads % requested == 0:
    return requested
  budget = _VMEM_BUDGET_BYTES
  score_tiles = 3 if backward else 1
  qd_tiles = 8 if backward else 5
  kvd_tiles = 6 if backward else 4
  for g in range(num_heads, 0, -1):
    if num_heads % g != 0:
      continue
    vmem = 4 * (score_tiles * g * q_pad * kv_blk
                + kvd_tiles * g * kv_blk * head_dim
                + qd_tiles * g * q_pad * head_dim
                + 2 * g * q_pad * 128)
    if vmem <= budget:
      return g
  return 1


def _masked_scores(q, k, bias_ref, mask_ref, *, kv_i, g_dim, q_pad,
                   kv_len, kv_blk):
  """q k^T + bias/mask/kv-padding for one tile -> [G*q_pad, kv_blk] f32.

  Shared verbatim by the forward and backward kernels so the recomputed
  probabilities in the backward pass match the forward bit-for-bit.
  """
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
  return s


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref,
                  lse_ref, acc_ref, m_ref, l_ref, *, mxu_bf16: bool,
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

  s = _masked_scores(q, k, bias_ref, mask_ref, kv_i=kv_i, g_dim=g_dim,
                     q_pad=q_pad, kv_len=kv_len, kv_blk=kv_blk)

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
    if lse_ref is not None:
      # log-sum-exp per row: the backward pass reconstructs the softmax
      # as p = exp(s - lse) without re-running the online reduction.
      lse_ref[0, 0, :] = (m_ref[:, 0] + jnp.log(denom[:, 0]))


# Import here (not at module top) so non-TPU environments without the
# pallas extras can still import the reference path.
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def flash_attention(query: Array,
                    key: Array,
                    value: Array,
                    bias: Optional[Array] = None,
                    kv_mask: Optional[Array] = None,
                    *,
                    kv_transposed: bool = False,
                    mxu_bf16: Optional[bool] = None,
                    interpret: bool = False,
                    kv_block_size: Optional[int] = None,
                    head_block_size: Optional[int] = None,
                    return_lse: bool = False):
  """See _flash_attention_jit; this wrapper resolves the module-global
  defaults OUTSIDE the jit boundary so the trace cache keys on the
  resolved values (a monkeypatched DEFAULT_MXU_BF16 retraces instead of
  silently reusing a stale trace)."""
  if mxu_bf16 is None:
    mxu_bf16 = DEFAULT_MXU_BF16
  if not interpret and jax.default_backend() != "tpu":
    # Mosaic only lowers on TPU; run interpreted on CPU (tests).
    interpret = True
  return _flash_attention_jit(
      query, key, value, bias, kv_mask, kv_transposed=kv_transposed,
      mxu_bf16=mxu_bf16, interpret=interpret,
      kv_block_size=kv_block_size, head_block_size=head_block_size,
      return_lse=return_lse)


@functools.partial(
    jax.jit, static_argnames=("kv_transposed", "mxu_bf16", "interpret",
                              "kv_block_size", "head_block_size",
                              "return_lse"))
def _flash_attention_jit(query: Array,
                    key: Array,
                    value: Array,
                    bias: Optional[Array] = None,
                    kv_mask: Optional[Array] = None,
                    *,
                    kv_transposed: bool = False,
                    mxu_bf16: Optional[bool] = None,
                    interpret: bool = False,
                    kv_block_size: Optional[int] = None,
                    head_block_size: Optional[int] = None,
                    return_lse: bool = False):
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
    return_lse: also return the per-row softmax log-sum-exp
      [batch, 1, heads * padded_q] float32 (the residual the backward
      kernel needs; see flash_attention_diff).

  Returns [batch, q_len, heads, head_dim] in the query dtype (plus the
  lse array when return_lse).
  """
  batch, q_len, num_heads, head_dim = query.shape
  kv_len = key.shape[2] if kv_transposed else key.shape[1]
  q_pad, kv_blk, kv_pad, num_kv_blocks, hg = _tiling(
      q_len, num_heads, head_dim, kv_len, kv_block_size, head_block_size)

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

  operands = [q, k, v]
  has_bias = bias is not None
  if has_bias:
    assert bias.shape[0] == batch and bias.shape[2:] == (q_len, kv_len), (
        f"bias {bias.shape} vs batch={batch} q={q_len} kv={kv_len}")
    bias = jnp.pad(bias, ((0, 0), (0, 0), (0, q_pad - q_len),
                          (0, kv_pad - kv_len)))
    operands.append(bias)
  has_mask = kv_mask is not None
  if has_mask:
    operands.append(kv_mask)

  fwd = _partitioned_fwd(
      has_bias=has_bias,
      bias_per_head=(bias.shape[1] > 1) if has_bias else False,
      has_mask=has_mask, return_lse=return_lse, mxu_bf16=mxu_bf16,
      interpret=interpret, kv_len=kv_len, kv_blk=kv_blk, hg=hg)
  result = fwd(*operands)

  out = result[0] if return_lse else result
  out = jnp.transpose(out[:, :, :q_len, :], (0, 2, 1, 3))
  return (out, result[1]) if return_lse else out


def _flash_fwd_pallas(*operands, has_bias, bias_per_head, has_mask,
                      return_lse, mxu_bf16, interpret, kv_len, kv_blk,
                      hg):
  """Forward pallas_call on padded internal-layout operands.

  operands: q [b, h, q_pad, d], k/v [b, h, kv_pad, d]
            [, bias [b, 1|h, q_pad, kv_pad]] [, kv_mask [b, 1, kv_pad]].
  Shard-safe: all shapes are derived from the operands, so the same
  function serves both the unpartitioned trace and the per-shard
  lowering under custom_partitioning (where b and h are local sizes).
  """
  q, k, v = operands[:3]
  batch, num_heads, q_pad, head_dim = q.shape
  kv_pad = k.shape[2]
  num_kv_blocks = kv_pad // kv_blk
  hg = _pick_head_group(num_heads, q_pad, kv_blk, head_dim, hg)

  grid = (batch, num_heads // hg, num_kv_blocks)
  in_specs = [
      pl.BlockSpec((1, hg, q_pad, head_dim), lambda b, h, i: (b, h, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, hg, kv_blk, head_dim), lambda b, h, i: (b, h, i, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, hg, kv_blk, head_dim), lambda b, h, i: (b, h, i, 0),
                   memory_space=pltpu.VMEM),
  ]
  if has_bias:
    in_specs.append(pl.BlockSpec(
        (1, hg if bias_per_head else 1, q_pad, kv_blk),
        (lambda b, h, i: (b, h, 0, i)) if bias_per_head
        else (lambda b, h, i: (b, 0, 0, i)),
        memory_space=pltpu.VMEM))
  if has_mask:
    in_specs.append(pl.BlockSpec((1, 1, kv_blk), lambda b, h, i: (b, 0, i),
                                 memory_space=pltpu.VMEM))

  def kernel(*refs):
    q_r, k_r, v_r = refs[:3]
    idx = 3
    b_r = refs[idx] if has_bias else None
    idx += int(has_bias)
    m_r = refs[idx] if has_mask else None
    idx += int(has_mask)
    out_r = refs[idx]
    idx += 1
    lse_r = refs[idx] if return_lse else None
    idx += int(return_lse)
    acc_r, mm_r, ll_r = refs[idx:idx + 3]
    _flash_kernel(q_r, k_r, v_r, b_r, m_r, out_r, lse_r, acc_r, mm_r,
                  ll_r, mxu_bf16=mxu_bf16, num_kv_blocks=num_kv_blocks,
                  kv_len=kv_len, kv_blk=kv_blk)

  flops = 2 * batch * num_heads * q_pad * kv_pad * head_dim * 2
  bytes_accessed = 4 * batch * num_heads * (
      (q_pad + 2 * kv_pad) * head_dim + q_pad * head_dim)
  if has_bias:
    bytes_accessed += 4 * batch * q_pad * kv_pad

  out_specs = [pl.BlockSpec((1, hg, q_pad, head_dim),
                            lambda b, h, i: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)]
  out_shapes = [jax.ShapeDtypeStruct(
      (batch, num_heads, q_pad, head_dim), q.dtype)]
  if return_lse:
    # [batch, 1, heads * q_pad]: head-major flattened rows; the unit
    # middle dim keeps the trailing block 2D-tilable under Mosaic (the
    # backward kernel reads the same layout).
    out_specs.append(pl.BlockSpec((1, 1, hg * q_pad),
                                  lambda b, h, i: (b, 0, h),
                                  memory_space=pltpu.VMEM))
    out_shapes.append(jax.ShapeDtypeStruct(
        (batch, 1, num_heads * q_pad), jnp.float32))

  return pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=in_specs,
      out_specs=out_specs if return_lse else out_specs[0],
      out_shape=out_shapes if return_lse else out_shapes[0],
      scratch_shapes=[
          pltpu.VMEM((hg * q_pad, head_dim), jnp.float32),  # acc
          pltpu.VMEM((hg * q_pad, 128), jnp.float32),       # running max
          pltpu.VMEM((hg * q_pad, 128), jnp.float32),       # running sum
      ],
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=bytes_accessed,
          transcendentals=batch * num_heads * q_pad * kv_pad),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=_VMEM_LIMIT_BYTES),
      interpret=interpret,
  )(*operands)


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


# ---------------------------------------------------------------------------
# Mesh partitioning: pallas_call is opaque to GSPMD/Shardy, so without
# help the partitioner all-gathers operands (replicating the batch!)
# before the kernel. The grid is embarrassingly parallel over (batch,
# heads), so we register custom_partitioning rules that shard those two
# dims over the mesh and run the kernel per-shard — multi-chip tp/dp
# serving and training keep their layouts with zero collectives around
# the kernel.
# ---------------------------------------------------------------------------


def _make_partitioned(impl, rule: str, in_dims, out_dims):
  """custom_partitioning wrapper sharding (batch, heads) dims only.

  in_dims/out_dims: per-array (batch_dim, heads_dim | None); heads_dim
  may index a head-major flattened (heads*q) axis — splitting it by the
  heads axis is the same partition because chunks stay head-aligned.
  `rule` is the Shardy einsum-like sharding rule for propagation.
  """
  from jax.experimental.custom_partitioning import custom_partitioning
  from jax.sharding import NamedSharding, PartitionSpec

  f = custom_partitioning(impl)

  def partition(mesh, arg_shapes, result_shape):
    spec = getattr(arg_shapes[0].sharding, "spec", None) or PartitionSpec()
    sb = spec[0] if len(spec) > 0 else None
    sh = spec[1] if len(spec) > 1 else None

    def nshards(ax):
      if ax is None:
        return 1
      names = (ax,) if isinstance(ax, str) else tuple(a for a in ax if a)
      n = 1
      for nm in names:
        n *= mesh.shape[nm]
      return n

    # Only shard dims that divide evenly; otherwise replicate that dim.
    if arg_shapes[0].shape[0] % nshards(sb) != 0:
      sb = None
    if arg_shapes[0].shape[1] % nshards(sh) != 0:
      sh = None

    def sharding(ndim, dims):
      bd, hd = dims
      parts = [None] * ndim
      if bd is not None:
        parts[bd] = sb
      if hd is not None:
        parts[hd] = sh
      return NamedSharding(mesh, PartitionSpec(*parts))

    arg_shardings = tuple(
        sharding(len(a.shape), d) for a, d in zip(arg_shapes, in_dims))
    results = (result_shape if isinstance(result_shape, (list, tuple))
               else [result_shape])
    outs = tuple(
        sharding(len(r.shape), d) for r, d in zip(results, out_dims))
    out_shardings = outs if len(out_dims) > 1 else outs[0]

    def lower_fn(*local_operands):
      return impl(*local_operands)

    return mesh, lower_fn, out_shardings, arg_shardings

  f.def_partition(partition=partition, sharding_rule=rule)
  return f


@functools.lru_cache(maxsize=None)
def _partitioned_fwd(*, has_bias, bias_per_head, has_mask, return_lse,
                     mxu_bf16, interpret, kv_len, kv_blk, hg):
  def impl(*operands):
    return _flash_fwd_pallas(
        *operands, has_bias=has_bias, bias_per_head=bias_per_head,
        has_mask=has_mask, return_lse=return_lse, mxu_bf16=mxu_bf16,
        interpret=interpret, kv_len=kv_len, kv_blk=kv_blk, hg=hg)
  terms = ["b h q d", "b h k d", "b h k d"]
  in_dims = [(0, 1), (0, 1), (0, 1)]
  if has_bias:
    terms.append("b h q k" if bias_per_head else "b e q k")
    in_dims.append((0, 1 if bias_per_head else None))
  if has_mask:
    terms.append("b u k")
    in_dims.append((0, None))
  res = ["b h q d"]
  out_dims = [(0, 1)]
  if return_lse:
    res.append("b u (h q)")  # head-major flatten: heads-sharding stays valid
    out_dims.append((0, 2))
  rule = ", ".join(terms) + " -> " + ", ".join(res)
  return _make_partitioned(impl, rule, in_dims, out_dims)


# ---------------------------------------------------------------------------
# Differentiable wrapper (training path).
# ---------------------------------------------------------------------------


def _flash_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, lse_ref,
                      delta_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                      mxu_bf16: bool, num_kv_blocks: int, kv_len: int,
                      kv_blk: int):
  """Flash-attention backward over one (head-group, kv-block) tile.

  Same grid as the forward: (batch, head_groups, kv_blocks), kv
  innermost. Per tile it recomputes the probabilities from the saved
  row log-sum-exp (p = exp(s - lse), exactly the forward's normalized
  softmax), writes this kv block's dk/dv, and accumulates dq into its
  revisited output block (constant index along kv, so it stays resident
  in VMEM and is flushed once at the last kv step).

  With q_len <= ~2k the whole query fits one block, which removes the
  separate dq/dkv passes a general flash backward needs.
  """
  kv_i = pl.program_id(2)
  g_dim = q_ref.shape[1]
  q_pad = q_ref.shape[2]

  mm_dtype = jnp.bfloat16 if mxu_bf16 else jnp.float32
  q = q_ref[0, :, :, :].astype(mm_dtype)   # [G, q_pad, d]
  k = k_ref[0, :, :, :].astype(mm_dtype)   # [G, kv_blk, d]
  v = v_ref[0, :, :, :].astype(mm_dtype)   # [G, kv_blk, d]
  do = do_ref[0, :, :, :].astype(mm_dtype)  # [G, q_pad, d]

  s = _masked_scores(q, k, bias_ref, mask_ref, kv_i=kv_i, g_dim=g_dim,
                     q_pad=q_pad, kv_len=kv_len, kv_blk=kv_blk)
  lse = lse_ref[0, 0, :]  # [G*q_pad]
  p = jnp.exp(s - lse[:, None])  # [G*q_pad, kv_blk] — normalized softmax

  p3 = p.astype(mm_dtype).reshape(g_dim, q_pad, p.shape[-1])
  # dv = p^T do (contract q).
  dv = jax.lax.dot_general(
      p3, do, (((1,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)  # [G, kv_blk, d]
  dv_ref[0, :, :, :] = dv.astype(dv_ref.dtype)

  # dp = do v^T (contract d); ds = p * (dp - delta).
  dp = jax.lax.dot_general(
      do, v, (((2,), (2,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)  # [G, q_pad, kv_blk]
  delta = delta_ref[0, 0, :]  # [G*q_pad] = rowsum(do * out)
  ds = p * (dp.reshape(g_dim * q_pad, -1) - delta[:, None])
  ds3 = ds.astype(mm_dtype).reshape(g_dim, q_pad, ds.shape[-1])

  # dk = ds^T q (contract q).
  dk = jax.lax.dot_general(
      ds3, q, (((1,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)  # [G, kv_blk, d]
  dk_ref[0, :, :, :] = dk.astype(dk_ref.dtype)

  # dq += ds k (contract kv), accumulated across kv blocks in the
  # revisited f32 output block.
  dq = jax.lax.dot_general(
      ds3, k, (((2,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)  # [G, q_pad, d]

  @pl.when(kv_i == 0)
  def _init():
    dq_ref[0, :, :, :] = dq

  @pl.when(kv_i > 0)
  def _accum():
    dq_ref[0, :, :, :] += dq


def _flash_bwd_pallas(*operands, has_bias, bias_per_head, has_mask,
                      mxu_bf16, interpret, kv_len, kv_blk, hg):
  """Backward pallas_call on padded internal-layout operands.

  operands: q [b, h, q_pad, d], k/v [b, h, kv_pad, d]
            [, bias [b, 1|h, q_pad, kv_pad]] [, kv_mask [b, 1, kv_pad]],
            lse [b, 1, h*q_pad], delta [b, 1, h*q_pad],
            do [b, h, q_pad, d].
  Returns (dq [b, h, q_pad, d], dk, dv [b, h, kv_pad, d]) in f32.
  Shard-safe like _flash_fwd_pallas.
  """
  q, k, v = operands[:3]
  batch, num_heads, q_pad, head_dim = q.shape
  kv_pad = k.shape[2]
  num_kv_blocks = kv_pad // kv_blk
  hg = _pick_head_group(num_heads, q_pad, kv_blk, head_dim, hg,
                        backward=True)

  grid = (batch, num_heads // hg, num_kv_blocks)
  in_specs = [
      pl.BlockSpec((1, hg, q_pad, head_dim), lambda b, h, i: (b, h, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, hg, kv_blk, head_dim), lambda b, h, i: (b, h, i, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, hg, kv_blk, head_dim), lambda b, h, i: (b, h, i, 0),
                   memory_space=pltpu.VMEM),
  ]
  if has_bias:
    in_specs.append(pl.BlockSpec(
        (1, hg if bias_per_head else 1, q_pad, kv_blk),
        (lambda b, h, i: (b, h, 0, i)) if bias_per_head
        else (lambda b, h, i: (b, 0, 0, i)),
        memory_space=pltpu.VMEM))
  if has_mask:
    in_specs.append(pl.BlockSpec((1, 1, kv_blk), lambda b, h, i: (b, 0, i),
                                 memory_space=pltpu.VMEM))
  in_specs.append(pl.BlockSpec((1, 1, hg * q_pad),
                               lambda b, h, i: (b, 0, h),
                               memory_space=pltpu.VMEM))  # lse
  in_specs.append(pl.BlockSpec((1, 1, hg * q_pad),
                               lambda b, h, i: (b, 0, h),
                               memory_space=pltpu.VMEM))  # delta
  in_specs.append(pl.BlockSpec((1, hg, q_pad, head_dim),
                               lambda b, h, i: (b, h, 0, 0),
                               memory_space=pltpu.VMEM))  # dout

  def kernel(*refs):
    q_r, k_r, v_r = refs[:3]
    idx = 3
    b_r = refs[idx] if has_bias else None
    idx += int(has_bias)
    m_r = refs[idx] if has_mask else None
    idx += int(has_mask)
    lse_r, delta_r, do_r, dq_r, dk_r, dv_r = refs[idx:idx + 6]
    _flash_bwd_kernel(q_r, k_r, v_r, b_r, m_r, lse_r, delta_r, do_r,
                      dq_r, dk_r, dv_r, mxu_bf16=mxu_bf16,
                      num_kv_blocks=num_kv_blocks, kv_len=kv_len,
                      kv_blk=kv_blk)

  flops = 5 * 2 * batch * num_heads * q_pad * kv_pad * head_dim
  bytes_accessed = 4 * batch * num_heads * (
      3 * (q_pad + kv_pad) * head_dim + 2 * q_pad)

  return pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=in_specs,
      out_specs=[
          pl.BlockSpec((1, hg, q_pad, head_dim),
                       lambda b, h, i: (b, h, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, hg, kv_blk, head_dim),
                       lambda b, h, i: (b, h, i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, hg, kv_blk, head_dim),
                       lambda b, h, i: (b, h, i, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((batch, num_heads, q_pad, head_dim),
                               jnp.float32),
          jax.ShapeDtypeStruct((batch, num_heads, kv_pad, head_dim),
                               jnp.float32),
          jax.ShapeDtypeStruct((batch, num_heads, kv_pad, head_dim),
                               jnp.float32),
      ],
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=bytes_accessed,
          transcendentals=batch * num_heads * q_pad * kv_pad),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=_VMEM_LIMIT_BYTES),
      interpret=interpret,
  )(*operands)


@functools.lru_cache(maxsize=None)
def _partitioned_bwd(*, has_bias, bias_per_head, has_mask, mxu_bf16,
                     interpret, kv_len, kv_blk, hg):
  def impl(*operands):
    return _flash_bwd_pallas(
        *operands, has_bias=has_bias, bias_per_head=bias_per_head,
        has_mask=has_mask, mxu_bf16=mxu_bf16, interpret=interpret,
        kv_len=kv_len, kv_blk=kv_blk, hg=hg)
  terms = ["b h q d", "b h k d", "b h k d"]
  in_dims = [(0, 1), (0, 1), (0, 1)]
  if has_bias:
    terms.append("b h q k" if bias_per_head else "b e q k")
    in_dims.append((0, 1 if bias_per_head else None))
  if has_mask:
    terms.append("b u k")
    in_dims.append((0, None))
  terms += ["b u (h q)", "b u (h q)", "b h q d"]
  in_dims += [(0, 2), (0, 2), (0, 1)]
  rule = (", ".join(terms) + " -> b h q d, b h k d, b h k d")
  return _make_partitioned(impl, rule, in_dims,
                           [(0, 1), (0, 1), (0, 1)])


def _flash_bwd(query, key, value, bias, kv_mask, out, lse, dout, *,
               kv_transposed, mxu_bf16, interpret, kv_block_size,
               head_block_size):
  """dq/dk/dv for flash_attention. Layouts match the primal inputs."""
  if not interpret and jax.default_backend() != "tpu":
    interpret = True  # Mosaic only lowers on TPU (tests run interpreted)
  batch, q_len, num_heads, head_dim = query.shape
  kv_len = key.shape[2] if kv_transposed else key.shape[1]
  q_pad, kv_blk, kv_pad, num_kv_blocks, hg = _tiling(
      q_len, num_heads, head_dim, kv_len, kv_block_size, head_block_size)

  # delta[b, h*q_pad] = rowsum(do * out) — the shared softmax-backward
  # correction term (= sum_j w_j dw_j; see kernel docstring).
  delta = jnp.einsum("bqhd,bqhd->bhq", dout.astype(jnp.float32),
                     out.astype(jnp.float32))
  delta = jnp.pad(delta, ((0, 0), (0, 0), (0, q_pad - q_len)))
  delta = delta.reshape(batch, 1, num_heads * q_pad)

  q = jnp.transpose(query, (0, 2, 1, 3))
  do = jnp.transpose(dout, (0, 2, 1, 3))
  if kv_transposed:
    k, v = key, value
  else:
    k, v = transpose_kv(key, value)
  if q_pad != q_len:
    q = jnp.pad(q, ((0, 0), (0, 0), (0, q_pad - q_len), (0, 0)))
    do = jnp.pad(do, ((0, 0), (0, 0), (0, q_pad - q_len), (0, 0)))
  if kv_pad != kv_len:
    k = jnp.pad(k, ((0, 0), (0, 0), (0, kv_pad - kv_len), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, kv_pad - kv_len), (0, 0)))
  if kv_mask is not None:
    kv_mask = jnp.pad(kv_mask.astype(jnp.float32),
                      ((0, 0), (0, kv_pad - kv_mask.shape[1])),
                      constant_values=1.0)[:, None, :]

  operands = [q, k, v]
  has_bias = bias is not None
  if has_bias:
    operands.append(jnp.pad(bias, ((0, 0), (0, 0), (0, q_pad - q_len),
                                   (0, kv_pad - bias.shape[3]))))
  has_mask = kv_mask is not None
  if has_mask:
    operands.append(kv_mask)
  operands += [lse, delta, do]

  bwd = _partitioned_bwd(
      has_bias=has_bias,
      bias_per_head=(bias.shape[1] > 1) if has_bias else False,
      has_mask=has_mask, mxu_bf16=mxu_bf16, interpret=interpret,
      kv_len=kv_len, kv_blk=kv_blk, hg=hg)
  dq, dk, dv = bwd(*operands)

  dq = jnp.transpose(dq[:, :, :q_len, :], (0, 2, 1, 3)).astype(query.dtype)
  dk = dk[:, :, :kv_len, :]
  dv = dv[:, :, :kv_len, :]
  if not kv_transposed:
    dk = jnp.transpose(dk, (0, 2, 1, 3))
    dv = jnp.transpose(dv, (0, 2, 1, 3))
  return dq, dk.astype(key.dtype), dv.astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_diff(cfg, query, key, value, bias, kv_mask):
  kv_transposed, mxu_bf16, interpret, kv_blk_sz, hg_sz = cfg
  return flash_attention(
      query, key, value, bias, kv_mask, kv_transposed=kv_transposed,
      mxu_bf16=mxu_bf16, interpret=interpret, kv_block_size=kv_blk_sz,
      head_block_size=hg_sz)


def _flash_diff_fwd(cfg, query, key, value, bias, kv_mask):
  kv_transposed, mxu_bf16, interpret, kv_blk_sz, hg_sz = cfg
  out, lse = flash_attention(
      query, key, value, bias, kv_mask, kv_transposed=kv_transposed,
      mxu_bf16=mxu_bf16, interpret=interpret, kv_block_size=kv_blk_sz,
      head_block_size=hg_sz, return_lse=True)
  return out, (query, key, value, bias, kv_mask, out, lse)


def _flash_diff_bwd(cfg, res, dout):
  kv_transposed, mxu_bf16, interpret, kv_blk_sz, hg_sz = cfg
  query, key, value, bias, kv_mask, out, lse = res
  dq, dk, dv = _flash_bwd(
      query, key, value, bias, kv_mask, out, lse, dout,
      kv_transposed=kv_transposed, mxu_bf16=mxu_bf16, interpret=interpret,
      kv_block_size=kv_blk_sz, head_block_size=hg_sz)
  # bias is treated as non-differentiable: its cotangent would be the
  # full score-sized ds tensor — materializing it defeats the kernel.
  # Every caller here builds bias from boolean masks (no grad path), so
  # the zero cotangent is dead code XLA removes. Do NOT route a learned
  # additive bias through this wrapper.
  dbias = None if bias is None else jnp.zeros_like(bias)
  # Masks are non-differentiable pass-throughs here, but the cotangent
  # dtype must still match JAX's convention: inexact masks (callers cast
  # bool masks to the compute dtype) get a zero of the same dtype,
  # integer/bool masks get float0.
  if kv_mask is None:
    dmask = None
  elif jnp.issubdtype(kv_mask.dtype, jnp.inexact):
    dmask = jnp.zeros_like(kv_mask)
  else:
    dmask = np.zeros(kv_mask.shape, dtype=jax.dtypes.float0)
  return dq, dk, dv, dbias, dmask


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def flash_attention_diff(query: Array,
                         key: Array,
                         value: Array,
                         bias: Optional[Array] = None,
                         kv_mask: Optional[Array] = None,
                         *,
                         kv_transposed: bool = False,
                         mxu_bf16: Optional[bool] = None,
                         interpret: bool = False,
                         kv_block_size: Optional[int] = None,
                         head_block_size: Optional[int] = None) -> Array:
  """Differentiable flash_attention (training path).

  Forward = flash_attention (plus saving the per-row log-sum-exp);
  backward = a single fused Pallas pass that recomputes probabilities
  blockwise and produces dq/dk/dv without ever materializing the
  [q, kv] score tensor in HBM — the same memory property that makes the
  forward win at large batch applies to the train step.

  Differentiable in query/key/value only. `bias` must be a mask-derived
  constant (cotangent is zero; see _flash_diff_bwd). Per-key broadcast
  attention dropout (the T5 pattern, broadcast along q) composes from
  the outside: scale `value` rows by keep/(1-rate) before calling —
  normalization uses the undropped probabilities either way, so
  pre-scaling v is exactly weight dropout.
  """
  if mxu_bf16 is None:
    mxu_bf16 = DEFAULT_MXU_BF16
  if kv_block_size is None:
    kv_block_size = DEFAULT_KV_BLOCK_SIZE
  if head_block_size is None:
    head_block_size = DEFAULT_HEAD_BLOCK_SIZE
  cfg = (kv_transposed, mxu_bf16, interpret, kv_block_size,
         head_block_size)
  return _flash_diff(cfg, query, key, value, bias, kv_mask)


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
