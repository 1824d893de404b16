"""Dataset-registry tasks: raw TFRecords -> model batches end to end."""

import pytest
import os

import numpy as np

from music_spectrogram_diffusion_tpu.audio import wav_io
from music_spectrogram_diffusion_tpu.data import (datasets, registry,
                                                  synthetic, tasks)
from music_spectrogram_diffusion_tpu.midi import proto

LENGTHS = {"inputs": 512, "targets": 64, "targets_context": 64}


def _write_maestro_shard(path, n=2):
  records = []
  for i in range(n):
    rng = np.random.RandomState(i)
    ns = synthetic.random_note_sequence(rng, duration=4.0)
    audio = synthetic.render_note_sequence(ns, 16000, duration=4.0)
    records.append(datasets.serialize_example({
        "sequence": proto.serialize_note_sequence(ns),
        "audio": wav_io.encode_wav(audio, 16000),
        "id": f"m-{i}",
    }))
  datasets.write_tfrecord(path, records)


def test_dataset_task_from_tfrecords(tmp_path):
  import dataclasses
  shard = os.path.join(tmp_path, "maestro-test.tfrecord")
  _write_maestro_shard(shard)

  config = dataclasses.replace(
      datasets.MAESTROV3_CONFIG, paths={"train": shard})
  task = registry.make_dataset_task(
      config, "train", vocab_config=registry.VOCAB_CONFIG_NOVELOCITY,
      with_context=True)
  assert task.name.startswith("synthesis_with_context_maestrov3_notes_ties")
  assert "vb1" in task.name

  batch = task.model_dataset(LENGTHS, training=True).batch(2).first()
  assert batch["encoder_input_tokens"].shape == (2, 512)
  assert batch["decoder_target_tokens"].shape == (2, 64, 128)
  assert batch["encoder_continuous_mask"].shape == (2, 64)


def test_register_all_tasks_names():
  # Registration itself needs no data files (sources are lazy).
  names = registry.register_all_tasks(data_root="/nonexistent")
  assert any("maestrov3" in n for n in names)
  assert any("slakh" in n for n in names)
  assert any(n.endswith("_mega") for n in names)
  # 6 mixture train tasks + the ismir2021 piano train task + one eval
  # task per InferEvalSplit of each dataset.
  train_names = [n for n in names
                 if n.endswith("_train") and not n.endswith("_eval_train")]
  assert len(train_names) == 7
  # The piano family keeps velocities (no vb1 marker) and drops ties.
  piano = [n for n in train_names if "vb1" not in n]
  assert len(piano) == 1 and "ties" not in piano[0]
  assert any(n.endswith("_validation") for n in names)
  assert any(n.endswith("_validation_full") for n in names)
  for n in names:
    if n.endswith("_mega"):
      assert n in tasks.MIXTURE_REGISTRY
    else:
      assert n in tasks.TASK_REGISTRY


def _write_piano_shard(path, velocities, duration=4.0):
  """One MAESTRO-style record with one note per requested velocity."""
  ns = synthetic.sequences.NoteSequence()
  for i, vel in enumerate(velocities):
    ns.add(start_time=0.25 * i, end_time=0.25 * i + 0.2,
           pitch=60 + i, velocity=int(vel), program=0)
  synthetic.sequences.assign_instruments(ns)
  audio = synthetic.render_note_sequence(ns, 16000, duration=duration)
  record = datasets.serialize_example({
      "sequence": proto.serialize_note_sequence(ns),
      "audio": wav_io.encode_wav(audio, 16000),
      "id": "piano-0",
  })
  datasets.write_tfrecord(path, [record])


def test_ismir2021_task_velocities_roundtrip(tmp_path):
  """ismir2021 family: 127 velocity bins survive task tokenization.

  Mirrors reference gin/tasks/ismir2021.gin (NUM_VELOCITY_BINS=127,
  USE_TIES=False, PROGRAM_GRANULARITY='flat'): velocity events must
  appear in the token stream with distinct bins and decode back to the
  original note velocities.
  """
  import dataclasses

  from music_spectrogram_diffusion_tpu.midi import (run_length, sequences,
                                                    vocabularies)

  shard = os.path.join(tmp_path, "maestro-piano.tfrecord")
  velocities = [100, 80, 60, 127, 10]
  _write_piano_shard(shard, velocities)

  config = dataclasses.replace(
      datasets.MAESTROV3_CONFIG, paths={"train": shard})
  task = registry.make_dataset_task(
      config, "train", vocab_config=registry.VOCAB_CONFIG_FULL,
      note_rep=registry.ISMIR2021_NOTE_REP,
      program_granularity="flat", with_context=False)
  # Full vocab is the default config -> no vb marker; no tie section.
  assert "vb1" not in task.name and "ties" not in task.name

  lengths = {"inputs": 2048, "targets": 512, "targets_context": 512}
  ex = task.full_song_dataset(lengths).first()

  # Velocity events with >1 distinct non-zero bins are in the stream.
  codec = task.codec
  ids = task.vocabulary.decode(np.asarray(ex["inputs"]))
  ids = ids[ids >= 0]
  lo, hi = codec.event_type_range("velocity")
  vel_bins = ids[(ids >= lo) & (ids <= hi)] - lo
  assert len(set(int(b) for b in vel_bins if b > 0)) >= len(set(velocities))

  # Round-trip: decode the segment's tokens back to notes; with 127
  # bins velocity quantization is exact.
  spec = sequences.NoteEncodingSpec
  state = spec.init_decoding_state_fn()
  spec.begin_decoding_segment_fn(state)
  invalid, dropped = run_length.decode_events(
      state, ids, 0.0, None, codec, spec.decode_event_fn)
  assert invalid == 0 and dropped == 0
  decoded = spec.flush_decoding_state_fn(state)
  got = sorted((n.pitch, n.velocity) for n in decoded.notes)
  want = sorted((60 + i, v) for i, v in enumerate(velocities))
  assert got == want


def test_ismir2021_preset_geometry():
  from music_spectrogram_diffusion_tpu import config as cfg_lib

  exp = cfg_lib.preset("ismir2021_small")
  assert not exp.with_context
  assert exp.task_lengths.targets == 512
  assert exp.train.train_steps == 400_000
  assert exp.num_velocity_bins == 127
  assert not exp.include_ties
  assert exp.program_granularity == "flat"
  # The network vocab is sized for the 127-bin codec, larger than the
  # no-velocity vocab of the mt3-family presets.
  mt3_vocab = cfg_lib.preset("context_small").network().vocab_size
  assert exp.network().vocab_size > mt3_vocab
  # Config JSON round-trips the new vocabulary fields.
  back = cfg_lib.ExperimentConfig.from_json(exp.to_json())
  assert back == exp


def test_synthetic_cached_task_name_encodes_config(tmp_path):
  """Distinct vocab/note-rep/count configs get distinct cache keys, so a
  cache built under one configuration is never silently reused."""
  from music_spectrogram_diffusion_tpu.audio import codecs
  from music_spectrogram_diffusion_tpu.data import registry, tasks

  codec = codecs.MelGan()

  def make(**kw):
    kwargs = dict(audio_codec=codec,
                  vocab_config=registry.VOCAB_CONFIG_NOVELOCITY,
                  note_rep=tasks.NoteRepresentationConfig(),
                  with_context=True, program_granularity="full",
                  num_examples=8)
    kwargs.update(kw)
    return registry.synthetic_cached_task("train", **kwargs)

  base = make()
  assert "8ex" in base.name
  assert make(num_examples=16).name != base.name
  assert make(vocab_config=registry.VOCAB_CONFIG_FULL).name != base.name
  ismir = make(vocab_config=registry.VOCAB_CONFIG_FULL,
               note_rep=registry.ISMIR2021_NOTE_REP,
               program_granularity="flat")
  assert "noties" in ismir.name and "flat" in ismir.name
  assert make(duration=6.0).name != base.name

  # cache_root: builds once, then reuses (cache_dir set both times).
  t1 = make(cache_root=str(tmp_path))
  assert t1.cache_dir and (tmp_path / t1.name).exists()
  t2 = make(cache_root=str(tmp_path))
  assert t2.cache_dir == t1.cache_dir


def test_audio_source_split_defaults():
  """split=None resolves to train/train_eval without touching records."""
  from music_spectrogram_diffusion_tpu.audio import codecs
  from music_spectrogram_diffusion_tpu.data import registry

  with pytest.raises(ValueError, match="unknown dataset"):
    registry.audio_source("nope", None, codecs.MelGan())
  # Constructing the source resolves the split lazily enough that no
  # records need exist yet; iterating would fail, construction must not.
  src = registry.audio_source("maestrov3", None, codecs.MelGan(),
                              is_training=False)
  assert src is not None
