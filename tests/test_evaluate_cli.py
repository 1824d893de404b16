"""evaluate CLI end to end over a real-dataset-shaped TFRecord source.

The synthetic path is covered elsewhere; this drives the --dataset
branch (registry task -> full-song split -> take_while song limit ->
chained render -> metrics JSON) the way a user with a local MAESTRO
mirror would run it."""

import pytest

pytestmark = pytest.mark.slow

import dataclasses
import json
import os
import sys

import numpy as np

from music_spectrogram_diffusion_tpu.audio import wav_io
from music_spectrogram_diffusion_tpu.data import datasets, synthetic
from music_spectrogram_diffusion_tpu.midi import proto


def _write_maestro_shard(path, n=3):
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


def test_evaluate_cli_real_dataset_path(tmp_path, monkeypatch):
  from music_spectrogram_diffusion_tpu.cli import evaluate as evaluate_cli

  shard = os.path.join(tmp_path, "maestro-validation.tfrecord")
  _write_maestro_shard(shard)
  config = dataclasses.replace(
      datasets.MAESTROV3_CONFIG, paths={"validation": shard})
  monkeypatch.setitem(datasets.ALL_DATASET_CONFIGS, "maestrov3", config)

  out_dir = str(tmp_path / "eval_out")
  monkeypatch.setattr(sys, "argv", [
      "evaluate", "--dataset", "maestrov3", "--split", "validation",
      "--preset", "context_tiny", "--steps", "2", "--songs", "2",
      "--output_dir", out_dir, "--seed", "0"])
  evaluate_cli.main()

  with open(os.path.join(out_dir, "metrics.json")) as f:
    metrics = json.load(f)["aggregate"]
  # --songs 2 must bound the run (take_while) even though 3 songs exist.
  assert metrics["num_songs"] == 2
  assert np.isfinite(metrics["mel_l2"])
  assert metrics["timing/audio_seconds"] > 0
