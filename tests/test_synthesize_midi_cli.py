"""synthesize_midi CLI end to end: MIDI file -> rendered WAV.

Drives the demo chain the reference ships as a Colab notebook
(/root/reference/notebooks/synthesize_midi.ipynb): SMF parse ->
segmentation -> chained render -> vocode -> WAV, on random tiny weights
with a 2-step sampler (shape/finiteness smoke, not quality)."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_synthesize_midi_cli(tmp_path, monkeypatch):
  from music_spectrogram_diffusion_tpu.audio import wav_io
  from music_spectrogram_diffusion_tpu.cli import synthesize_midi
  from music_spectrogram_diffusion_tpu.data import synthetic
  from music_spectrogram_diffusion_tpu.midi import midi_io

  rng = np.random.RandomState(0)
  ns = synthetic.random_note_sequence(rng, duration=3.0)
  midi_path = str(tmp_path / "song.mid")
  midi_io.write_midi_file(ns, midi_path)

  out_path = str(tmp_path / "song.wav")
  monkeypatch.setattr(sys, "argv", [
      "synthesize_midi", "--midi", midi_path, "--output", out_path,
      "--size", "tiny", "--steps", "2", "--sampler", "sde-dpm++",
      "--guidance_interval", "0.1,0.8", "--seed", "0"])
  synthesize_midi.main()

  assert os.path.exists(out_path)
  with open(out_path, "rb") as f:
    sample_rate, audio = wav_io.decode_wav(f.read())
  assert sample_rate == 16000
  assert audio.size > sample_rate  # at least one 5.12 s segment written
  assert np.isfinite(audio).all()
