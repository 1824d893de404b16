"""dump_task CLI over both synthetic and real-dataset sources."""

import dataclasses
import os
import sys

import numpy as np

from music_spectrogram_diffusion_tpu.audio import wav_io
from music_spectrogram_diffusion_tpu.data import datasets, synthetic
from music_spectrogram_diffusion_tpu.midi import proto


def _write_maestro_shard(path, n=2):
  records = []
  for i in range(n):
    rng = np.random.RandomState(i)
    ns = synthetic.random_note_sequence(rng, duration=3.0)
    audio = synthetic.render_note_sequence(ns, 16000, duration=3.0)
    records.append(datasets.serialize_example({
        "sequence": proto.serialize_note_sequence(ns),
        "audio": wav_io.encode_wav(audio, 16000),
        "id": f"m-{i}",
    }))
  datasets.write_tfrecord(path, records)


def test_dump_task_synthetic(capsys, monkeypatch):
  from music_spectrogram_diffusion_tpu.cli import dump_task

  monkeypatch.setattr(sys, "argv", [
      "dump_task", "--synthetic", "--n", "1", "--decode_events",
      "--inputs_length", "512", "--targets_length", "64"])
  dump_task.main()
  out = capsys.readouterr().out
  assert "example 0" in out
  assert "decoded:" in out


def test_dump_task_dataset(capsys, tmp_path, monkeypatch):
  """--dataset dumps a registry task from TFRecords (reference
  dump_task.py:42 dumps any registered task)."""
  from music_spectrogram_diffusion_tpu.cli import dump_task

  shard = os.path.join(tmp_path, "maestro-train.tfrecord")
  _write_maestro_shard(shard)
  config = dataclasses.replace(
      datasets.MAESTROV3_CONFIG, paths={"train": shard})
  monkeypatch.setitem(datasets.ALL_DATASET_CONFIGS, "maestrov3", config)

  monkeypatch.setattr(sys, "argv", [
      "dump_task", "--dataset", "maestrov3", "--split", "train",
      "--n", "1", "--inputs_length", "512", "--targets_length", "64"])
  dump_task.main()
  out = capsys.readouterr().out
  assert "task: synthesis_with_context_maestrov3" in out
  assert "example 0" in out
  assert "inputs:" in out
