"""Mesh + NamedSharding plumbing over a ('data', 'model') device mesh.

Replaces the reference's t5x PjitPartitioner
(reference inference.py:93-94, gin/train.gin:110-112) with direct
jax.sharding. Parameters carry flax logical axis names (assigned in
models/layers.py via param_with_axes); `logical_to_mesh_*` maps them onto
mesh axes with the rule table below, and XLA/GSPMD inserts the
collectives. Data parallelism shards the batch over 'data'; tensor
parallelism shards mlp/heads over 'model'.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
from flax.linen import partitioning as nn_partitioning
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

PyTree = Any

# logical axis -> mesh axis (None = replicated). Matches the sharding
# layout t5x derives for this model family: batch over data; the MLP
# hidden, attention heads and vocab rows over model.
DEFAULT_RULES: Tuple[Tuple[str, Optional[str]], ...] = (
    ("batch", "data"),
    ("length", None),
    ("embed", None),
    ("mlp", "model"),
    ("heads", "model"),
    ("kv", None),
    ("joined_kv", "model"),
    ("vocab", "model"),
)


def make_mesh(data: Optional[int] = None,
              model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
  """Build a ('data', 'model') mesh; data defaults to n_devices // model."""
  devices = list(devices if devices is not None else jax.devices())
  if data is None:
    data = len(devices) // model
  if data * model != len(devices):
    raise ValueError(
        f"mesh {data}x{model} != {len(devices)} devices")
  dev_array = np.asarray(devices).reshape(data, model)
  return Mesh(dev_array, axis_names=("data", "model"))


def axis_rules(rules=DEFAULT_RULES):
  """Context manager activating logical->mesh rules for
  with_sharding_constraint calls inside module code."""
  return nn_partitioning.axis_rules(rules)


def param_logical_specs(variables) -> PyTree:
  """Extract the logical PartitionSpec tree from the params_axes collection
  produced by param_with_axes at init."""
  import flax
  specs = nn_partitioning.get_axis_names(variables["params_axes"])
  return flax.core.unfreeze(specs)


def logical_to_sharding(logical_specs: PyTree, mesh: Mesh,
                        rules=DEFAULT_RULES) -> PyTree:
  """Map logical axis names to NamedShardings on the mesh."""
  rule_map = dict(rules)

  def convert(spec):
    if spec is None:
      return NamedSharding(mesh, P())
    axes = tuple(rule_map.get(name, None) for name in spec)
    return NamedSharding(mesh, P(*axes))

  return jax.tree.map(
      convert, logical_specs,
      is_leaf=lambda x: isinstance(x, (P, tuple)) or x is None)


def param_shardings(variables, mesh: Mesh, rules=DEFAULT_RULES) -> PyTree:
  """NamedSharding tree for the 'params' collection."""
  return logical_to_sharding(param_logical_specs(variables), mesh, rules)


def batch_sharding(mesh: Mesh) -> NamedSharding:
  """Shard the leading (batch) dim over 'data', replicate the rest."""
  return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_pytree(tree: PyTree, shardings: PyTree) -> PyTree:
  """device_put a pytree according to a matching sharding tree."""
  return jax.tree.map(jax.device_put, tree, shardings)
