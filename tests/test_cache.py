"""Offline tokenization cache: round trip + task integration."""

import numpy as np

from music_spectrogram_diffusion_tpu.audio import codecs
from music_spectrogram_diffusion_tpu.data import cache as cache_lib
from music_spectrogram_diffusion_tpu.data import core, synthetic, tasks
from music_spectrogram_diffusion_tpu.midi import vocabularies

LENGTHS = {"inputs": 512, "targets": 128, "targets_context": 128}


def test_encode_decode_example_roundtrip():
  ex = {
      "f32": np.arange(12, dtype=np.float32).reshape(3, 4),
      "f64": np.linspace(0, 1, 5),
      "i32": np.arange(6, dtype=np.int32).reshape(2, 3),
      "i64": np.asarray([-(2 ** 40), 2 ** 40]),
      "bools": np.asarray([True, False, True]),
      "scalar": np.asarray(7, np.int32),
      "empty": np.zeros((0, 320), np.float32),
      "raw": b"bytes-value",
      "text": "string-value",
      "obj": {"nested": [1, 2, "three"]},
  }
  rec = cache_lib.encode_example(ex)
  out = cache_lib.decode_example(rec)
  assert set(out) == set(ex)
  for k in ("f32", "f64", "i32", "i64", "bools", "scalar", "empty"):
    assert out[k].dtype == np.asarray(ex[k]).dtype, k
    np.testing.assert_array_equal(out[k], ex[k])
  assert out["raw"] == b"bytes-value"
  assert out["text"] == b"string-value"  # strings round-trip as bytes
  assert out["obj"] == ex["obj"]


def make_task(tmp_path=None):
  return tasks.Task(
      name="cache_test",
      source_fn=lambda: synthetic.synthetic_source(2, duration=6.0,
                                                   seed=11),
      audio_codec=codecs.MelGan(),
      vocab_config=vocabularies.VocabularyConfig(num_velocity_bins=1),
      note_rep=tasks.NoteRepresentationConfig(include_ties=True),
      cache_dir=str(tmp_path / "cache") if tmp_path else None)


def _as_comparable(ex):
  return {k: v for k, v in ex.items() if isinstance(v, np.ndarray)}


def test_task_cache_roundtrip(tmp_path):
  task = make_task(tmp_path)
  fresh = task._tokenized_fresh(split_sequences=True).as_list()

  meta = task.build_cache()
  assert meta["num_examples"] == len(fresh)
  assert cache_lib.cache_exists(task.cache_dir)

  cached = task.tokenized(split_sequences=True).as_list()
  assert len(cached) == len(fresh)
  for a, b in zip(fresh, cached):
    fa, fb = _as_comparable(a), _as_comparable(b)
    assert set(fb).issuperset(set(fa))
    for k in fa:
      assert fb[k].dtype == np.asarray(fa[k]).dtype, k
      np.testing.assert_array_equal(fb[k], fa[k])


def test_cached_train_dataset_matches_fresh(tmp_path):
  """The model-facing stream must be identical with and without cache."""
  task = make_task(tmp_path)
  fresh = task.train_dataset(LENGTHS, seed=5,
                             shuffle_buffer_size=0).as_list()
  task.build_cache()
  cached = task.train_dataset(LENGTHS, seed=5,
                              shuffle_buffer_size=0).as_list()
  assert len(cached) == len(fresh)
  for a, b in zip(fresh, cached):
    np.testing.assert_array_equal(a["inputs"], b["inputs"])
    np.testing.assert_allclose(a["targets"], b["targets"], atol=1e-6)


def test_parallel_map_preserves_order_and_speed():
  ds = core.Dataset.from_list([{"x": np.asarray(i)} for i in range(64)])
  out = ds.parallel_map(lambda e: {"x": e["x"] * 2}, num_threads=8)
  got = [int(e["x"]) for e in out]
  assert got == [2 * i for i in range(64)]


def test_threaded_train_dataset_matches_serial(tmp_path):
  task = make_task(tmp_path)
  serial = task.train_dataset(LENGTHS, seed=2,
                              shuffle_buffer_size=0).as_list()
  threaded = task.train_dataset(LENGTHS, seed=2, shuffle_buffer_size=0,
                                num_threads=4).as_list()
  assert len(serial) == len(threaded)
  for a, b in zip(serial, threaded):
    np.testing.assert_array_equal(a["inputs"], b["inputs"])
    np.testing.assert_allclose(a["targets"], b["targets"])
