"""Full-schema data rehearsal: all 7 published dataset formats, end to end.

VERDICT round-3 "Next round" #4: fabricate tiny TFRecords in each
dataset's published feature spec (reference datasets.py:34-296 —
including the Cerberus4 TrackSpecs and the URMP program-lookup path),
then run the REAL chain the production job uses:

    cli.cache_task (tokenize -> chunk -> TFRecord cache)
      -> register_all_tasks (mega mixture w/ example-proportional rates,
         reference tasks.py:594-649)
      -> cli.train --dataset mega (20 train steps)
      -> cli.dump_task on a cached dataset task

This is the first pipeline-level exercise of the URMP / Slakh /
Cerberus4 raw paths (they were previously only unit-tested per
tokenizer).
"""

import io
import json
import os
import sys

import numpy as np
import pytest

from music_spectrogram_diffusion_tpu.audio import wav_io
from music_spectrogram_diffusion_tpu.data import datasets, synthetic, tasks
from music_spectrogram_diffusion_tpu.midi import proto

pytestmark = pytest.mark.slow

_SR = 16000
_DURATION = 2.0  # seconds per fabricated example (1 chunk after split)


def _ns(seed, duration=_DURATION, program=0, is_drum=False):
  rng = np.random.RandomState(seed)
  ns = synthetic.random_note_sequence(rng, duration=duration,
                                      num_programs=1)
  for n in ns.notes:
    n.program = program
    n.is_drum = is_drum
  return ns


def _audio(seed, duration=_DURATION, sr=_SR):
  return synthetic.render_note_sequence(_ns(seed), sr, duration=duration)


def _wav_bytes(seed):
  return wav_io.encode_wav(_audio(seed), _SR)


def _maestro_record(seed):
  # maestrov1/maestrov3 schema (reference datasets.py:34-69): WAV bytes +
  # NoteSequence proto + id.
  return {
      "sequence": proto.serialize_note_sequence(_ns(seed)),
      "audio": _wav_bytes(seed),
      "id": f"maestro-{seed}".encode(),
  }


def _guitarset_record(seed):
  # guitarset adds velocity_range (proto bytes; unused by the tokenizer).
  return {
      "sequence": proto.serialize_note_sequence(_ns(seed, program=24)),
      "audio": _wav_bytes(seed),
      "velocity_range": b"\x08\x01\x10\x7f",
      "id": f"guitarset-{seed}".encode(),
  }


def _urmp_record(seed):
  # urmp: per-instrument NoteSequences + inst-name program lookup
  # (reference datasets.py:131-155, tokenizers URMP table).
  insts = ["vn", "fl"]
  return {
      "id": f"urmp-{seed}".encode(),
      "tracks": np.asarray([1, 2], np.int64),
      "inst_names": [i.encode() for i in insts],
      "audio": _wav_bytes(seed),
      "sequence": proto.serialize_note_sequence(_ns(seed)),
      "instrument_sequences": [
          proto.serialize_note_sequence(_ns(seed * 10 + k))
          for k in range(len(insts))],
  }


def _musicnet_record(seed):
  # musicnet: float samples + explicit sample_rate (reference
  # datasets.py:156-178); audio_is_samples=True in the tokenizer.
  return {
      "id": f"musicnet-{seed}".encode(),
      "sample_rate": np.asarray([float(_SR)], np.float32),
      "audio": _audio(seed).astype(np.float32),
      "sequence": proto.serialize_note_sequence(_ns(seed)),
  }


def _slakh_record(seed, cerberus=False):
  # slakh/cerberus4 multitrack schema (reference datasets.py:179-296):
  # mix samples + per-track NoteSequences. Cerberus4's track names must
  # match its TrackSpecs in order (bass, drums, guitar, piano).
  if cerberus:
    names = ["bass", "drums", "guitar", "piano"]
    seqs = [_ns(seed * 10 + k) for k in range(4)]
  else:
    names = ["Acoustic Piano", "Electric Bass", "Drums"]
    seqs = [_ns(seed * 10 + k) for k in range(3)]
  return {
      "audio_sample_rate": np.asarray([_SR], np.int64),
      "inst_names": [n.encode() for n in names],
      "mix": _audio(seed).astype(np.float32),
      "note_sequences": [proto.serialize_note_sequence(s) for s in seqs],
      "track_id": f"slakh-{seed}".encode(),
  }


_FABRICATORS = {
    "maestrov1": _maestro_record,
    "maestrov3": _maestro_record,
    "guitarset": _guitarset_record,
    "urmp": _urmp_record,
    "musicnet": _musicnet_record,
    "cerberus4": lambda seed: _slakh_record(seed, cerberus=True),
    "slakh": _slakh_record,
}


def _local_train_path(config, data_root):
  gs_path = config.paths[config.train_split]
  assert gs_path.startswith("gs://")
  rel = gs_path[len("gs://"):]
  # One physical shard stands in for the published shard set.
  rel = rel.replace("?????", "00000")
  path = os.path.join(data_root, rel)
  os.makedirs(os.path.dirname(path), exist_ok=True)
  return path


def _write_all_datasets(data_root, examples_per_dataset):
  for name, config in datasets.ALL_DATASET_CONFIGS.items():
    fab = _FABRICATORS[name]
    n = examples_per_dataset[name]
    records = [datasets.serialize_example(fab(seed))
               for seed in range(1, n + 1)]
    datasets.write_tfrecord(_local_train_path(config, data_root), records)


def test_all_seven_datasets_cache_mix_train_dump(tmp_path, monkeypatch,
                                                 capsys):
  data_root = str(tmp_path / "mirror")
  cache_root = str(tmp_path / "cache")
  model_dir = str(tmp_path / "run")
  # Distinct counts so example-proportional mixing rates are observable.
  counts = {"maestrov1": 2, "maestrov3": 4, "guitarset": 2, "urmp": 2,
            "musicnet": 2, "cerberus4": 2, "slakh": 3}
  _write_all_datasets(data_root, counts)

  # 1. Offline tokenization cache for the 6 mega-mixture datasets + the
  #    out-of-mixture maestrov1, via the real CLI.
  from music_spectrogram_diffusion_tpu.cli import cache_task
  for dataset in ("all", "maestrov1"):
    monkeypatch.setattr(sys, "argv", [
        "cache_task", "--dataset", dataset, "--data_root", data_root,
        "--cache_root", cache_root, "--examples_per_shard", "4"])
    cache_task.main()
  cached = sorted(os.listdir(cache_root))
  assert len(cached) == 7, cached
  per_dataset_examples = {}
  for d in cached:
    meta = json.load(open(os.path.join(cache_root, d,
                                       "CACHE_METADATA.json")))
    name = next(n for n in counts if n in d)
    per_dataset_examples[name] = meta["num_examples"]
    # 2s of audio -> a single <=2000-frame chunk per source example.
    assert meta["num_examples"] >= counts[name], (d, meta)

  # 2. Mega mixture registration reads exact cached counts for its
  #    example-proportional (temperature-10/3) rates.
  tasks.TASK_REGISTRY.clear()
  tasks.MIXTURE_REGISTRY.clear()
  from music_spectrogram_diffusion_tpu.data import registry
  registry.register_all_tasks(data_root=data_root,
                              include_eval_splits=False,
                              cache_root=cache_root)
  mixture = tasks.MIXTURE_REGISTRY["synthesis_with_context_mega"]
  assert len(mixture.task_names) == 6  # maestrov1 is not in the mixture
  rates = dict(zip(mixture.task_names, mixture.rates))
  m3 = next(k for k in rates if "maestrov3" in k)
  gs = next(k for k in rates if "guitarset" in k)
  # 4 maestrov3 vs 2 guitarset chunks at temperature 10/3:
  # rate ratio = (4/2)**(3/10).
  np.testing.assert_allclose(rates[m3] / rates[gs],
                             (per_dataset_examples["maestrov3"]
                              / per_dataset_examples["guitarset"]) ** 0.3,
                             rtol=1e-6)

  # 3. 20 real train steps on the mega mixture through the train CLI.
  tasks.TASK_REGISTRY.clear()
  tasks.MIXTURE_REGISTRY.clear()
  from music_spectrogram_diffusion_tpu.cli import train
  monkeypatch.setattr(sys, "argv", [
      "train", "--preset", "context_tiny", "--model_dir", model_dir,
      "--dataset", "mega", "--data_root", data_root,
      "--cache_root", cache_root, "--steps", "20", "--batch", "8",
      "--shuffle_buffer", "16", "--log_period", "10"])
  train.main()
  lines = [json.loads(l) for l in
           open(f"{model_dir}/metrics.jsonl").read().splitlines()]
  assert lines[-1]["step"] == 20
  assert np.isfinite(lines[-1]["loss"])

  # 4. dump_task renders examples from a cached dataset task.
  tasks.TASK_REGISTRY.clear()
  tasks.MIXTURE_REGISTRY.clear()
  from music_spectrogram_diffusion_tpu.cli import dump_task
  monkeypatch.setattr(sys, "argv", [
      "dump_task", "--dataset", "urmp", "--split", "train",
      "--data_root", data_root, "--n", "1", "--decode_events"])
  dump_task.main()
  out = capsys.readouterr().out
  assert "inputs" in out and "targets" in out
