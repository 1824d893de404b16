"""Train CLI end-to-end: synthetic cache + periodic held-out eval."""

import json
import sys

import pytest

pytestmark = pytest.mark.slow


def test_train_cli_synthetic_with_eval(tmp_path, monkeypatch):
  from music_spectrogram_diffusion_tpu.cli import train

  model_dir = str(tmp_path / "run")
  monkeypatch.setattr(sys, "argv", [
      "train", "--preset", "context_tiny", "--model_dir", model_dir,
      "--synthetic", "--synthetic_examples", "4", "--steps", "2",
      "--batch", "8", "--cache_root", str(tmp_path / "cache"),
      "--log_period", "1", "--eval_batches", "1", "--eval_period", "2"])
  train.main()

  lines = [json.loads(l) for l in
           open(f"{model_dir}/metrics.jsonl").read().splitlines()]
  eval_lines = [l for l in lines if any(k.startswith("eval/")
                                        for k in l)]
  assert eval_lines, "no eval/ metrics logged"
  assert any(k.startswith("eval/loss") for k in eval_lines[-1])
  # Train + held-out eval caches are distinct (disjoint seed + count).
  cache_dirs = sorted(p.name for p in (tmp_path / "cache").iterdir())
  assert any(d.startswith("train_") for d in cache_dirs)
  assert any(d.startswith("eval_") and "s1000" in d for d in cache_dirs)
