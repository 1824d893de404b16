"""Regression tests pinning the round-2 review fixes."""

import numpy as np
import pytest

from music_spectrogram_diffusion_tpu.data import cache as cache_lib
from music_spectrogram_diffusion_tpu.data import core, datasets


def test_cache_rebuild_removes_stale_shards(tmp_path):
  """A rebuild that needs fewer shards must not leave old shards for
  read_cache's glob to mix back in."""
  cache_dir = str(tmp_path / "c")
  examples = [{"x": np.arange(i + 1)} for i in range(8)]
  cache_lib.write_cache(core.Dataset.from_list(examples), cache_dir,
                        examples_per_shard=2)  # 4 shards
  cache_lib.write_cache(core.Dataset.from_list(examples[:3]), cache_dir,
                        examples_per_shard=8)  # 1 shard, fewer examples
  got = cache_lib.read_cache(cache_dir).as_list()
  assert len(got) == 3
  assert cache_lib.cache_metadata(cache_dir)["num_examples"] == 3


def test_take_while_stops_pulling_upstream():
  """take_while must terminate the stream (filter keeps paying for the
  rest of the split just to discard it)."""
  pulled = []

  def gen():
    for i in range(100):
      pulled.append(i)
      yield {"i": i}

  ds = core.Dataset.from_generator(gen).take_while(lambda ex: ex["i"] < 5)
  assert [ex["i"] for ex in ds] == [0, 1, 2, 3, 4]
  assert len(pulled) == 6  # 5 passing + the first failing, nothing more


def test_mixture_dataset_is_reiterable():
  """Two iterations of a Mixture dataset must produce identical
  streams (fresh per-task iterators per epoch, same task-choice rng)."""
  from music_spectrogram_diffusion_tpu.audio import codecs
  from music_spectrogram_diffusion_tpu.data import synthetic, tasks
  from music_spectrogram_diffusion_tpu.midi import vocabularies

  for idx in range(2):
    tasks.register_task(tasks.Task(
        name=f"reiter_task_{idx}",
        source_fn=(lambda seed: (lambda: synthetic.synthetic_source(
            2, duration=4.0, seed=seed)))(idx),
        audio_codec=codecs.MelGan(),
        vocab_config=vocabularies.VocabularyConfig(num_velocity_bins=1),
        note_rep=tasks.NoteRepresentationConfig(include_ties=True)))
  mix = tasks.Mixture("reiter_mix", ["reiter_task_0", "reiter_task_1"])
  lengths = {"inputs": 256, "targets": 32, "targets_context": 32}
  ds = mix.dataset(lengths, training=True, seed=3)
  first = [next(iter(ds.take(3))) for _ in range(2)]
  a, b = first
  np.testing.assert_array_equal(a["encoder_input_tokens"],
                                b["encoder_input_tokens"])
  np.testing.assert_allclose(a["decoder_target_tokens"],
                             b["decoder_target_tokens"])


def test_native_malformed_varints(tmp_path):
  from music_spectrogram_diffusion_tpu import native
  mod = native.get()
  if mod is None:
    pytest.skip("no C++ toolchain available")
  # >= 10 continuation bytes: must error, not UB-shift.
  with pytest.raises(ValueError):
    mod.decode_varints(b"\x80" * 12 + b"\x01")
  # Truncated final varint (continuation bit set at end of buffer).
  with pytest.raises(ValueError):
    mod.decode_varints(b"\x05\x80")


def test_native_corrupt_length_field(tmp_path):
  """A corrupt 64-bit record length must raise, not wrap the bounds
  check and read out of bounds."""
  from music_spectrogram_diffusion_tpu import native
  mod = native.get()
  if mod is None:
    pytest.skip("no C++ toolchain available")
  path = str(tmp_path / "x.tfrecord")
  datasets.write_tfrecord(path, [b"payload"])
  with open(path, "rb") as f:
    data = bytearray(f.read())
  data[0:8] = (0xFFFFFFFFFFFFFFF0).to_bytes(8, "little")
  # Length CRC no longer matches -> either error is acceptable, but it
  # must not segfault / return a bogus record.
  with pytest.raises(IOError):
    mod.split_tfrecords(bytes(data), True)
  with pytest.raises(IOError):
    mod.split_tfrecords(bytes(data), False)


def test_eval_chunk_rngs_differ():
  """evaluate_songs must give identical songs in different chunks
  DIFFERENT noise (per-chunk rng fold)."""
  import jax
  from music_spectrogram_diffusion_tpu.infer import evaluation
  from tests.test_synthesize import LENGTHS, make_synth

  synth = make_synth()
  seg = np.arange(1, 20, dtype=np.int32)
  songs = {"a": [{"inputs": seg, "targets":
                  np.zeros((LENGTHS["targets"], 128), np.float32)}],
           "b": [{"inputs": seg, "targets":
                  np.zeros((LENGTHS["targets"], 128), np.float32)}]}
  results = evaluation.evaluate_songs(
      synth, songs, songs_per_batch=1, rng=jax.random.PRNGKey(0),
      vocode=False, keep_arrays=True)
  mels = [r.mel_pred for r in results]
  assert not np.allclose(mels[0], mels[1])
