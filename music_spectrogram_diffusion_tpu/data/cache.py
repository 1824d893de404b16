"""Offline task cache: tokenized examples -> TFRecord shards -> Dataset.

The reference pipeline only works at training scale because tokenization
runs OFFLINE (`seqio.CacheDatasetPlaceholder`, reference tasks.py:38,325
— the pre-cache chain tokenize -> rekey -> split into <=2000-frame
chunks is materialized to disk once, and training epochs read the
cache). This module is that cache for the numpy pipeline:

  * `write_cache(ds, cache_dir)` serializes any example stream into
    TFRecord shards with a self-describing feature encoding (per-feature
    shape + dtype side entries, pickle fallback for rich objects).
  * `read_cache(cache_dir)` streams them back as a Dataset, with
    examples exactly round-tripped.
  * `Task` integration lives in tasks.Task.{build_cache,tokenized}.

Wire format stays tf.train.Example inside standard TFRecord framing, so
shards are also readable by any TF-based tooling.
"""

from __future__ import annotations

import glob as globlib
import json
import os
import pickle
from typing import Any, Dict, Iterator, Optional

import numpy as np

from music_spectrogram_diffusion_tpu.data import core
from music_spectrogram_diffusion_tpu.data import datasets

_SHAPE = "__shape__"
_DTYPE = "__dtype__"
_PICKLE = "__pickle__"
SHARD_TEMPLATE = "cache-{:05d}.tfrecord"
METADATA_FILE = "CACHE_METADATA.json"


def encode_example(example: Dict[str, Any]) -> bytes:
  """Serialize one example dict to a tf.train.Example record.

  Arrays ride as RAW little-endian bytes (BytesList features) with
  dtype/shape side entries — decoding is a single np.frombuffer per
  feature. Int64List/FloatList would decode through a per-element
  Python varint loop, which measured 10x slower than the mel frontend
  itself on real cached chunks.
  """
  features: Dict[str, Any] = {}
  for key, value in example.items():
    if isinstance(value, (bytes, str)):
      features[key] = value
      features[_DTYPE + key] = "bytes"
      continue
    arr = np.asarray(value)
    if arr.dtype == object or arr.dtype.kind in "US":
      features[key] = pickle.dumps(value)
      features[_DTYPE + key] = _PICKLE
      continue
    if arr.dtype.kind not in "fiub":
      raise TypeError(f"unsupported feature {key!r}: {arr.dtype}")
    arr = arr.astype(arr.dtype.newbyteorder("<"))
    features[_DTYPE + key] = arr.dtype.str
    features[_SHAPE + key] = np.asarray(arr.shape, np.int64)
    features[key] = arr.tobytes()
  return datasets.serialize_example(features)


def decode_example(record: bytes) -> Dict[str, Any]:
  """Inverse of encode_example."""
  raw = datasets.parse_example(record)
  out: Dict[str, Any] = {}
  for key, value in raw.items():
    if key.startswith(_SHAPE) or key.startswith(_DTYPE):
      continue
    dtype_entry = raw.get(_DTYPE + key)
    dtype = (dtype_entry[0].decode() if isinstance(dtype_entry, list)
             else None)
    if dtype == "bytes" or dtype is None and isinstance(value, list):
      out[key] = value[0]
    elif dtype == _PICKLE:
      out[key] = pickle.loads(value[0])
    else:
      shape = tuple(int(x) for x in raw.get(_SHAPE + key, []))
      out[key] = np.frombuffer(
          value[0], dtype=np.dtype(dtype)).reshape(shape)
  return out


def write_cache(ds: core.Dataset, cache_dir: str,
                examples_per_shard: int = 128) -> Dict[str, Any]:
  """Materialize a dataset into TFRecord shards under cache_dir.

  Returns the metadata dict (also written to CACHE_METADATA.json:
  num_examples / num_shards — feeds example-proportional mixture rates).
  """
  os.makedirs(cache_dir, exist_ok=True)
  # Drop the metadata FIRST so an interrupted rebuild leaves a cache
  # that cache_exists() reports absent (and gets re-tokenized) instead
  # of a half-built shard set with stale example counts.
  meta_path = os.path.join(cache_dir, METADATA_FILE)
  if os.path.exists(meta_path):
    os.remove(meta_path)
  # A rebuild may need FEWER shards (bigger shards / shrunk dataset);
  # stale leftovers would be globbed back in by read_cache and silently
  # duplicate examples, so clear the old build first.
  for stale in globlib.glob(os.path.join(cache_dir, "cache-*.tfrecord")):
    os.remove(stale)
  shard: list = []
  shard_idx = 0
  n = 0
  for ex in ds:
    shard.append(encode_example(ex))
    n += 1
    if len(shard) >= examples_per_shard:
      datasets.write_tfrecord(
          os.path.join(cache_dir, SHARD_TEMPLATE.format(shard_idx)), shard)
      shard, shard_idx = [], shard_idx + 1
  if shard:
    datasets.write_tfrecord(
        os.path.join(cache_dir, SHARD_TEMPLATE.format(shard_idx)), shard)
    shard_idx += 1
  meta = {"num_examples": n, "num_shards": shard_idx}
  # Atomic publish: the metadata file is the cache's validity marker, so
  # it must only appear once every shard is fully on disk.
  tmp_path = meta_path + ".tmp"
  with open(tmp_path, "w") as f:
    json.dump(meta, f)
  os.replace(tmp_path, meta_path)
  return meta


def cache_exists(cache_dir: Optional[str]) -> bool:
  return bool(cache_dir) and os.path.exists(
      os.path.join(cache_dir, METADATA_FILE))


def cache_metadata(cache_dir: str) -> Dict[str, Any]:
  with open(os.path.join(cache_dir, METADATA_FILE)) as f:
    return json.load(f)


def read_cache(cache_dir: str) -> core.Dataset:
  """Stream a cache back; each epoch visits shards in written order
  (downstream stages shuffle)."""
  pattern = os.path.join(cache_dir, "cache-*.tfrecord")

  def gen() -> Iterator[Dict[str, Any]]:
    paths = sorted(globlib.glob(pattern))
    if not paths:
      raise FileNotFoundError(f"no cache shards under {cache_dir}")
    for path in paths:
      for record in datasets.iter_tfrecords(path):
        yield decode_example(record)
  return core.Dataset.from_generator(gen)
