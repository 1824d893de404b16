"""Checkpointing: orbax save/restore + t5x checkpoint import.

Replaces the reference's t5x TensorStore checkpointing
(reference gin/train.gin:115-123, inference.py:159-176):

* Native format: orbax (async-capable, sharding-aware); the experiment
  config JSON is stored next to the weights so a checkpoint is
  self-describing (the reference serializes its gin config instead).
* `load_t5x_checkpoint` reads the *published* T5X checkpoints
  (msclap small/base "with context") and remaps the parameter tree into
  this framework's module layout, so pretrained reference models run
  unchanged.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np

PyTree = Any


# ---------------------------------------------------------------------------
# Orbax native checkpoints.
# ---------------------------------------------------------------------------


def save_checkpoint(ckpt_dir: str, step: int, params: PyTree,
                    opt_state: Optional[PyTree] = None,
                    config_json: Optional[str] = None) -> str:
  """Save params (+opt state) under ckpt_dir/step_<N>/."""
  import orbax.checkpoint as ocp
  path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
  ckptr = ocp.StandardCheckpointer()
  payload = {"params": params}
  if opt_state is not None:
    payload["opt_state"] = opt_state
  ckptr.save(os.path.join(path, "state"), payload)
  ckptr.wait_until_finished()
  # orbax coordinates the array save across processes; the plain-file
  # sidecars are process-0-only.
  import jax
  if jax.process_index() == 0:
    if config_json is not None:
      with open(os.path.join(path, "config.json"), "w") as f:
        f.write(config_json)
    with open(os.path.join(path, "METADATA"), "w") as f:
      json.dump({"step": step, "has_opt_state": opt_state is not None}, f)
  return path


def checkpoint_metadata(path: str) -> Dict[str, Any]:
  """Read the METADATA json of a step_<N> checkpoint dir ({} if absent)."""
  meta_path = os.path.join(path, "METADATA")
  if not os.path.exists(meta_path):
    return {}
  with open(meta_path) as f:
    return json.load(f)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
  if not os.path.isdir(ckpt_dir):
    return None
  steps = []
  for name in os.listdir(ckpt_dir):
    m = re.fullmatch(r"step_(\d+)", name)
    if not m:
      continue
    # A kill mid-save leaves step_<N>/ without the orbax payload
    # ('state' is renamed into place when the async save commits;
    # METADATA is written after that). Skip such partials so resume
    # never crash-loops on an interrupted checkpoint.
    path = os.path.join(ckpt_dir, name)
    if not (os.path.exists(os.path.join(path, "state"))
            or os.path.exists(os.path.join(path, "METADATA"))):
      continue
    steps.append(int(m.group(1)))
  if not steps:
    return None
  return os.path.join(ckpt_dir, f"step_{max(steps)}")


def restore_checkpoint(path: str,
                       target: Optional[PyTree] = None) -> Dict[str, Any]:
  """Restore a checkpoint saved by save_checkpoint.

  Args:
    path: a step_<N> directory (or a parent dir -> picks latest).
    target: optional pytree of like-shaped arrays (or ShapeDtypeStruct)
      used to restore with matching shardings.
  """
  import orbax.checkpoint as ocp
  if os.path.basename(path).startswith("step_") is False:
    latest = latest_checkpoint(path)
    if latest is None:
      raise FileNotFoundError(f"no checkpoints under {path}")
    path = latest
  ckptr = ocp.StandardCheckpointer()
  state_path = os.path.join(os.path.abspath(path), "state")
  if target is not None:
    restored = ckptr.restore(state_path, target)
  else:
    try:
      restored = ckptr.restore(state_path)
    except ValueError:
      # Target-less restore replays the shardings recorded at save time,
      # which fails when the checkpoint was written on another platform
      # (e.g. TPU-trained, restored in a CPU process). Rebuild a target
      # from the checkpoint's own metadata with local placement instead.
      import jax
      sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
      target = jax.tree_util.tree_map(
          lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                         sharding=sharding),
          ckptr.metadata(state_path).item_metadata)
      restored = ckptr.restore(state_path, target)
  meta_path = os.path.join(path, "METADATA")
  if os.path.exists(meta_path):
    restored = dict(restored)
    restored["step"] = json.load(open(meta_path))["step"]
  config_path = os.path.join(path, "config.json")
  if os.path.exists(config_path):
    restored = dict(restored)
    restored["config_json"] = open(config_path).read()
  return restored


# ---------------------------------------------------------------------------
# T5X checkpoint import (published reference checkpoints).
# ---------------------------------------------------------------------------

# Reference module tree -> this framework's module tree. The published
# checkpoints follow the reference network naming
# (models/diffusion/network.py): encoders 'token_encoder'/
# 'continuous_encoder', decoder layers with unnamed submodules that flax
# auto-numbered.
_T5X_RENAMES = [
    # Layer norms.
    (r"pre_attention_layer_norm", "pre_attention_norm"),
    (r"pre_mlp_layer_norm", "pre_mlp_norm"),
    (r"pre_self_attention_layer_norm", "pre_self_attention_norm"),
    (r"pre_cross_attention_layer_norm", "pre_cross_attention_norm"),
    # Attention modules: reference DecoderLayer creates the cross
    # attention(s) unnamed -> 'MultiHeadDotProductAttention_0' (and '_1'
    # per layer when decoder_cross_attend_style='sum_cross_attends',
    # reference network.py:199-216).
    (r"MultiHeadDotProductAttention_(\d+)", r"cross_attention_\1"),
    # FiLM layers: FiLMLayer_0 before self-attn, FiLMLayer_1 before MLP;
    # each contains an unnamed DenseGeneral -> DenseGeneral_0.
    (r"FiLMLayer_0/DenseGeneral_0", "self_attention_film/DenseGeneral_0"),
    (r"FiLMLayer_1/DenseGeneral_0", "mlp_film/DenseGeneral_0"),
    # Position encoders: created inline via position_encoding_layer ->
    # 'Embed_0' in every reference encoder/decoder.
    (r"Embed_0", "position_encoder"),
]


def _rename(path: str) -> str:
  for pattern, replacement in _T5X_RENAMES:
    path = re.sub(pattern, replacement, path)
  return path


def _flatten(tree: Mapping, prefix: str = "") -> Dict[str, np.ndarray]:
  out = {}
  for key, value in tree.items():
    path = f"{prefix}/{key}" if prefix else key
    if isinstance(value, Mapping):
      out.update(_flatten(value, path))
    else:
      out[path] = value
  return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
  tree: Dict[str, Any] = {}
  for path, value in flat.items():
    parts = path.split("/")
    node = tree
    for part in parts[:-1]:
      node = node.setdefault(part, {})
    node[parts[-1]] = value
  return tree


def remap_t5x_params(t5x_params: Mapping) -> Dict[str, Any]:
  """Remap a reference param tree into this framework's layout."""
  flat = _flatten(t5x_params)
  remapped = {_rename(k): v for k, v in flat.items()}
  return _unflatten(remapped)


def load_t5x_checkpoint(path: str) -> Dict[str, Any]:
  """Read a T5X TensorStore checkpoint directory into numpy arrays.

  Handles the T5X layout: a `checkpoint` msgpack index plus zarr/
  TensorStore parameter directories. Requires tensorstore (bundled with
  orbax). Returns the remapped parameter tree.
  """
  import tensorstore as ts
  from flax import serialization

  index_path = os.path.join(path, "checkpoint")
  with open(index_path, "rb") as f:
    ckpt_contents = serialization.msgpack_restore(f.read())

  target = ckpt_contents.get("optimizer", ckpt_contents)
  params = target.get("target", target)

  def materialize(node, node_path):
    if isinstance(node, Mapping):
      if node.get("driver") == "zarr" or "kvstore" in node:
        spec = dict(node)
        kv = spec.get("kvstore", {})
        if isinstance(kv, Mapping) and "path" in kv:
          kv = dict(kv)
          kv["path"] = os.path.join(path, kv["path"])
          spec["kvstore"] = kv
        arr = ts.open(spec).result().read().result()
        return np.asarray(arr)
      return {k: materialize(v, f"{node_path}/{k}")
              for k, v in node.items()}
    return np.asarray(node)

  params = materialize(params, "")
  return remap_t5x_params(params)
