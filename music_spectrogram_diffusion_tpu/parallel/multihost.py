"""Multi-host (multi-process) training scaffolding.

The reference inherits pod-scale training from t5x
(reference gin/train.gin:110-112): each host runs the same program,
feeds its local slice of the global batch, and GSPMD spans the global
mesh across all hosts' devices. This module provides the same three
ingredients for this framework:

  * `initialize()` — jax.distributed bootstrap (TPU pods auto-discover;
    explicit coordinator args for CPU/GPU clusters).
  * `global_mesh()` — a ('data', 'model') mesh over ALL processes'
    devices.
  * `host_local_batch_to_global()` — per-host batch assembly via
    jax.make_array_from_process_local_data: every host contributes its
    local examples to the globally-sharded batch array.
  * `is_primary()` — gate checkpoint/metrics writes to process 0.

Launch procedure (one command per host; TPU pods set the env for you):

  # host 0 .. N-1, e.g. a v5e-16 pod = 4 hosts x 4 chips:
  python -m music_spectrogram_diffusion_tpu.cli.train \
      --distributed --mesh 8x2 --preset context_base --model_dir gs://...

  # CPU/GPU clusters need explicit coordination flags:
  python -m music_spectrogram_diffusion_tpu.cli.train \
      --distributed --coordinator host0:1234 \
      --num_processes 4 --process_id $RANK ...

Each host must feed a DIFFERENT data shard: pass a per-host seed or use
`shard_for_host()` to slice the example stream (the Dataset layer's
num_shards/shard idiom).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from music_spectrogram_diffusion_tpu.data import core
from music_spectrogram_diffusion_tpu.parallel import mesh as mesh_lib


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
  """Bootstrap jax.distributed. On TPU pods all args auto-detect."""
  kwargs = {}
  if coordinator_address is not None:
    kwargs["coordinator_address"] = coordinator_address
  if num_processes is not None:
    kwargs["num_processes"] = num_processes
  if process_id is not None:
    kwargs["process_id"] = process_id
  jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
  """True on the process that owns checkpoint/metrics writes."""
  return jax.process_index() == 0


def global_mesh(data: Optional[int] = None, model: int = 1):
  """('data', 'model') mesh over every process's devices."""
  return mesh_lib.make_mesh(data=data, model=model,
                            devices=jax.devices())


def process_local_batch_size(global_batch_size: int) -> int:
  """The number of examples this host must feed per step."""
  n = jax.process_count()
  if global_batch_size % n != 0:
    raise ValueError(f"global batch {global_batch_size} not divisible "
                     f"by process count {n}")
  return global_batch_size // n


def host_local_batch_to_global(local_batch: Dict[str, np.ndarray],
                               mesh) -> Dict[str, jax.Array]:
  """Assemble each host's local examples into the global sharded batch.

  Every process calls this with its own [local_batch, ...] arrays; the
  returned jax.Arrays are globally-shaped, sharded batch-over-'data'
  across all hosts (single-process: equivalent to a device_put).
  """
  sharding = mesh_lib.batch_sharding(mesh)

  def put(x):
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))
  return {k: put(v) for k, v in local_batch.items()}


def shard_for_host(ds: core.Dataset,
                   num_shards: Optional[int] = None,
                   shard_index: Optional[int] = None) -> core.Dataset:
  """Each host keeps every process_count-th example (round-robin
  sharding of the example stream, reference Beam shard semantics)."""
  n = num_shards if num_shards is not None else jax.process_count()
  i = shard_index if shard_index is not None else jax.process_index()
  if n <= 1:
    return ds

  def gen(epoch):
    for j, ex in enumerate(ds._gen_fn(epoch)):  # noqa: SLF001
      if j % n == i:
        yield ex
  return core.Dataset(gen)
