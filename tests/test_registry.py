"""Dataset-registry tasks: raw TFRecords -> model batches end to end."""

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
  # 6 train tasks + one eval task per InferEvalSplit of each dataset.
  train_names = [n for n in names
                 if n.endswith("_train") and not n.endswith("_eval_train")]
  assert len(train_names) == 6
  assert any(n.endswith("_validation") for n in names)
  assert any(n.endswith("_validation_full") for n in names)
  for n in names:
    if n.endswith("_mega"):
      assert n in tasks.MIXTURE_REGISTRY
    else:
      assert n in tasks.TASK_REGISTRY
