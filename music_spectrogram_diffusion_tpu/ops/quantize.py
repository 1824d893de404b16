"""Int8 weight-only quantization for serving.

The reference framework has no quantization story; this is a TPU-native
serving optimization. At batch 1 the CFG sampler is HBM-bandwidth-bound:
every denoising step streams the full parameter tree from HBM (BENCH.md
roofline), so after the bf16 serving cast the remaining 2 bytes/weight
ARE the step time. Symmetric per-output-channel int8 halves that again.

Two execution paths for the matmul:

* A Pallas kernel (`_qmm_pallas`): the int8 weight block is DMA'd to
  VMEM and dequantized in registers (int8 -> bf16 is exact for values
  in [-127, 127]); the MXU sees bf16 and the f32 accumulator is scaled
  by the per-column factor once, on the final K block. HBM traffic for
  the weight is 1 byte/element — the point of the exercise.
* A pure-XLA fallback (`_qmm_xla`): dequantize-then-dot. XLA
  materializes the dequantized kernel (HBM write + read back), so it
  saves nothing at batch 1, but it runs everywhere (CPU tests, meshes
  with sharded activations) and under `jax.grad`.

Quantization error: per-channel absmax int8 on T5-style kernels is a
~0.2% relative weight error; end-to-end quality is measured on the
trained round-3 teacher in BENCH.md (quantized vs bf16 eval protocol).
"""

from __future__ import annotations

import functools
import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Mosaic tiling: int8 sublane tile is 32, bf16 is 16, f32 is 8. Blocks
# below honor the strictest constraint that applies to each operand.
_LANE = 128
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def quantize_kernel(w: Array) -> Tuple[Array, Array]:
  """Symmetric per-output-channel int8 quantization of a 2D kernel.

  Returns (q, scale): q int8 [K, N], scale float32 [N] with
  w ~= q * scale[None, :]. Scales are computed in float32 regardless of
  the input dtype (bf16 checkpoints quantize from their bf16 values).
  """
  if w.ndim != 2:
    raise ValueError(f"quantize_kernel wants a 2D kernel, got {w.shape}")
  w32 = w.astype(jnp.float32)
  absmax = jnp.max(jnp.abs(w32), axis=0)
  scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
  q = jnp.clip(jnp.round(w32 / scale[None, :]), -127, 127).astype(jnp.int8)
  return q, scale.astype(jnp.float32)


def dequantize_kernel(q: Array, scale: Array,
                      dtype: jnp.dtype = jnp.float32) -> Array:
  """Inverse of quantize_kernel (used by the XLA fallback and tests)."""
  return (q.astype(jnp.float32) * scale[None, :].astype(jnp.float32)
          ).astype(dtype)


def _qmm_xla(x: Array, q: Array, scale: Array, out_dtype) -> Array:
  w = dequantize_kernel(q, scale, x.dtype)
  return jnp.dot(x, w).astype(out_dtype)


def _round_up(value: int, multiple: int) -> int:
  return ((value + multiple - 1) // multiple) * multiple


def _pick_block(dim: int, candidates=(512, 256, 128)) -> Optional[int]:
  for c in candidates:
    if dim % c == 0:
      return c
  return None


def _qmm_kernel(x_r, w_r, s_r, out_r):
  x = x_r[...].astype(jnp.bfloat16)
  w = w_r[...].astype(jnp.bfloat16)  # exact: |q| <= 127 < 2**8
  acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
  out_r[...] = (acc * s_r[...].astype(jnp.float32)).astype(out_r.dtype)


def _qmm_pallas(x: Array, q: Array, scale: Array, out_dtype,
                interpret: bool) -> Array:
  """Serving-shape matmul: x stays VMEM-resident, weights stream int8.

  The serving M is small (2 CFG rows x 256 frames = 512) and K <= a few
  thousand, so a whole (bm, K) slab of x fits VMEM. The grid tiles only
  (M, N); with j innermost the x block index is constant across the N
  sweep, so Mosaic DMAs each x slab once and every int8 weight column
  block exactly once — HBM weight traffic is the int8 size, which is
  the point. (A (m, n, k)-tiled variant was measured first: its x-block
  re-reads per (n, k) step made it SLOWER than the XLA bf16 baseline —
  15.5us vs 5.6us for 512x768@768x2048.)
  """
  m, k = x.shape
  n = q.shape[1]
  bn = _pick_block(n, candidates=(256, 128))
  assert bn is not None  # guarded by caller
  bm = min(512, _round_up(m, 16))
  m_pad = _round_up(m, bm)
  if m_pad != m:
    x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
  grid = (m_pad // bm, n // bn)
  out = pl.pallas_call(
      _qmm_kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((k, bn), lambda i, j: (0, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, bn), lambda i, j: (0, j),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
      cost_estimate=pl.CostEstimate(
          flops=2 * m_pad * n * k,
          bytes_accessed=2 * m_pad * k + k * n + 2 * m_pad * n + 4 * n,
          transcendentals=0),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=_VMEM_LIMIT_BYTES),
      interpret=interpret,
  )(x, q, scale.reshape(1, n))
  return out[:m] if m_pad != m else out


def _qmm_dispatch(x: Array, q: Array, scale: Array, out_dtype,
                  use_pallas: Optional[bool], interpret: bool) -> Array:
  """Pick Pallas vs XLA for the (possibly per-shard local) shapes."""
  tileable = (_pick_block(q.shape[0]) is not None
              and _pick_block(q.shape[1], (256, 128)) is not None)
  if use_pallas and not tileable:
    # Needed for per-shard fallback on meshes that split below the tile
    # size, but a forced-kernel benchmark must not silently measure XLA.
    warnings.warn(
        f"quantized_matmul: use_pallas=True but local shape "
        f"{q.shape} is untileable (K/N must be multiples of 128); "
        f"falling back to the XLA path.", stacklevel=2)
  if use_pallas is None:
    use_pallas = tileable and (interpret or jax.default_backend() == "tpu")
  use_pallas = use_pallas and tileable
  if use_pallas and not interpret and jax.default_backend() != "tpu":
    interpret = True  # Mosaic only lowers on TPU (tests run interpreted).
  if not use_pallas:
    return _qmm_xla(x, q, scale, out_dtype)
  return _qmm_pallas(x, q, scale, out_dtype, interpret)


@functools.lru_cache(maxsize=None)
def _qmm_partitioned(out_dtype_name: str, use_pallas: Optional[bool],
                     interpret: bool):
  """custom_partitioning wrapper so the int8 matmul keeps mesh layouts.

  `pallas_call` is opaque to GSPMD; without rules a sharded serving tree
  would be all-gathered around every quantized matmul. The einsum-like
  Shardy rule "m k, k n, n -> m n" lets shardings propagate, and the
  partition callback runs the kernel per-shard:

  * N-sharded kernel (wi / query / kv projections under the 'model'
    axis): every device multiplies against its column slice; the scale
    slice rides along; no collectives.
  * K-sharded kernel (wo / attention-out projections): each device
    computes its partial product — the per-column scale commutes with
    the K-sum, so it is applied per shard — then one psum over the
    sharded axis reduces the partials.
  * The batch (M) dim shards freely over 'data'.

  Dims that don't divide their shard count are replicated instead. The
  local-shape dispatch inside `impl` re-checks tileability, so a shard
  too small for the Pallas tiling falls back to the XLA path on that
  mesh instead of crashing.
  """
  from jax.experimental.custom_partitioning import custom_partitioning
  from jax.sharding import NamedSharding, PartitionSpec

  out_dtype = np.dtype(out_dtype_name)

  def impl(x, q, scale):
    return _qmm_dispatch(x, q, scale, out_dtype, use_pallas, interpret)

  f = custom_partitioning(impl)

  def partition(mesh, arg_shapes, result_shape):
    del result_shape
    xs, qs, _ = arg_shapes

    def spec_of(s):
      return getattr(s.sharding, "spec", None) or PartitionSpec()

    xspec, qspec = spec_of(xs), spec_of(qs)
    m_ax = xspec[0] if len(xspec) > 0 else None
    k_ax = qspec[0] if len(qspec) > 0 else None
    n_ax = qspec[1] if len(qspec) > 1 else None
    if k_ax is None and len(xspec) > 1:
      k_ax = xspec[1]

    def axis_names(ax):
      return (() if ax is None else
              (ax,) if isinstance(ax, str) else
              tuple(a for a in ax if a))

    # A K axis that shares a mesh axis with M or N would build a
    # duplicate PartitionSpec (e.g. x P('data','model') against
    # q P(None,'model') -> P('model','model')); replicate K instead.
    taken = set(axis_names(m_ax)) | set(axis_names(n_ax))
    if k_ax is not None and taken & set(axis_names(k_ax)):
      k_ax = None

    def nshards(ax):
      count = 1
      for nm in axis_names(ax):
        count *= mesh.shape[nm]
      return count

    if xs.shape[0] % nshards(m_ax) != 0:
      m_ax = None
    if qs.shape[0] % nshards(k_ax) != 0:
      k_ax = None
    if qs.shape[1] % nshards(n_ax) != 0:
      n_ax = None

    arg_shardings = (
        NamedSharding(mesh, PartitionSpec(m_ax, k_ax)),
        NamedSharding(mesh, PartitionSpec(k_ax, n_ax)),
        NamedSharding(mesh, PartitionSpec(n_ax)),
    )
    out_sharding = NamedSharding(mesh, PartitionSpec(m_ax, n_ax))

    def lower_fn(x, q, scale):
      if k_ax is not None:
        # Each shard holds a partial product; accumulate the cross-shard
        # sum in f32 (a bf16 psum would halve the reduction precision).
        part = _qmm_dispatch(x, q, scale, np.dtype(np.float32),
                             use_pallas, interpret)
        return jax.lax.psum(part, k_ax).astype(out_dtype)
      return impl(x, q, scale)

    return mesh, lower_fn, out_sharding, arg_shardings

  def infer_sharding(mesh, arg_shapes, result_shape):
    # GSPMD (jax_use_shardy_partitioner=False) ignores sharding_rule and
    # needs explicit output-sharding inference: out is [M, N] with M from
    # x's rows and N from q's columns.
    del result_shape
    xs, qs, _ = arg_shapes

    def spec_of(s):
      return getattr(s.sharding, "spec", None) or PartitionSpec()

    xspec, qspec = spec_of(xs), spec_of(qs)
    m_ax = xspec[0] if len(xspec) > 0 else None
    n_ax = qspec[1] if len(qspec) > 1 else None
    return NamedSharding(mesh, PartitionSpec(m_ax, n_ax))

  f.def_partition(partition=partition,
                  infer_sharding_from_operands=infer_sharding,
                  sharding_rule="m k, k n, n -> m n")
  return f


def quantized_matmul(x: Array, q: Array, scale: Array, *,
                     out_dtype=None,
                     use_pallas: Optional[bool] = None,
                     interpret: bool = False,
                     partitioned: bool = True) -> Array:
  """x @ (q * scale[None, :]) with the weight kept int8 in HBM.

  Args:
    x: [M, K] activations (any float dtype; MXU compute is bf16).
    q: [K, N] int8 kernel.
    scale: [N] float32 per-output-channel scales.
    out_dtype: output dtype (defaults to x.dtype).
    use_pallas: force the kernel on/off; None picks the Pallas path on
      TPU when the shape is tileable (K and N multiples of 128).
    interpret: run the Pallas kernel interpreted (CPU tests).
    partitioned: wrap in custom_partitioning so sharded serving trees
      keep their mesh layouts (no-op on one device; set False to call
      the raw dispatch, e.g. under jax.grad, which custom_partitioning
      does not support).
  """
  if x.ndim != 2 or q.ndim != 2:
    raise ValueError(f"quantized_matmul wants 2D operands, got "
                     f"{x.shape} @ {q.shape}")
  out_dtype = out_dtype or x.dtype
  if not partitioned:
    return _qmm_dispatch(x, q, scale, out_dtype, use_pallas, interpret)
  f = _qmm_partitioned(np.dtype(out_dtype).name, use_pallas, interpret)
  return f(x, q, scale)


# ---------------------------------------------------------------------------
# Checkpoint transform.
# ---------------------------------------------------------------------------

# Sub-modules whose kernels must keep full precision: the f32 output
# projection (the precision split the reference found necessary,
# network.py:452-456 — also excluded from the bf16 serving cast).
_DEFAULT_EXCLUDE = ("spec_out_dense",)


def quantize_params(params, *, min_dim: int = 512,
                    exclude=_DEFAULT_EXCLUDE):
  """Rewrite a param tree for int8 serving.

  Every 2D float "kernel" leaf with min(shape) >= min_dim and both dims
  tileable (multiples of 128) is replaced by an int8 kernel plus a
  sibling "kernel_scale" leaf; `models.layers.DenseGeneral` dispatches
  on the kernel dtype at apply time, so no module re-configuration is
  needed. Small kernels (output heads, FiLM time embeddings below
  min_dim) and anything under a path component in `exclude` stay float.
  """
  def rewrite(tree, path):
    if not isinstance(tree, (dict,)):
      return tree
    out = {}
    for name, sub in tree.items():
      if (name == "kernel" and hasattr(sub, "ndim") and sub.ndim == 2
          and jnp.issubdtype(sub.dtype, jnp.floating)
          and min(sub.shape) >= min_dim
          and sub.shape[0] % _LANE == 0 and sub.shape[1] % _LANE == 0
          and not any(e in path for e in exclude)):
        q, s = quantize_kernel(jnp.asarray(sub))
        out["kernel"] = q
        out["kernel_scale"] = s
      elif isinstance(sub, dict):
        out[name] = rewrite(sub, path + (name,))
      else:
        out[name] = sub
    return out

  return rewrite(params, ())


def quantized_param_shardings(qparams, float_shardings, mesh):
  """Sharding tree for a quantized serving tree.

  `float_shardings` is the NamedSharding tree the un-quantized params
  would take (from `parallel.mesh.param_shardings` over the init
  metadata — init always produces the float tree, so it has no
  kernel_scale leaves). Quantized kernels keep their float kernel's
  sharding (same shape, same layout); each kernel_scale takes the
  kernel's output-dim (last-axis) sharding, matching the per-column
  slice `_qmm_partitioned` expects.
  """
  from jax.sharding import NamedSharding, PartitionSpec

  def walk(p, s):
    out = {}
    for name, sub in p.items():
      if name == "kernel_scale":
        kspec = s["kernel"].spec
        n_ax = kspec[1] if len(kspec) > 1 else None
        out[name] = NamedSharding(mesh, PartitionSpec(n_ax))
      elif isinstance(sub, dict):
        out[name] = walk(sub, s[name])
      else:
        out[name] = s[name]
    return out

  return walk(qparams, float_shardings)


def quantized_bytes(params) -> Tuple[int, int]:
  """(total_bytes, int8_bytes) of a serving tree — for logging."""
  total = int8 = 0
  for leaf in jax.tree_util.tree_leaves(params):
    nbytes = int(np.prod(leaf.shape)) * np.dtype(leaf.dtype).itemsize
    total += nbytes
    if leaf.dtype == np.int8:
      int8 += nbytes
  return total, int8
