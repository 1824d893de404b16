"""Synthetic (NoteSequence, audio) source for tests and benchmarks.

Generates random note sequences and renders them with a cheap additive
sine synthesizer so the full task pipeline (tokenize -> chunk -> mel ->
model) can run end-to-end without any real dataset on disk.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from music_spectrogram_diffusion_tpu.data import core
from music_spectrogram_diffusion_tpu.midi import sequences


def midi_to_hz(pitch: np.ndarray) -> np.ndarray:
  return 440.0 * 2.0 ** ((np.asarray(pitch, np.float64) - 69.0) / 12.0)


def render_note_sequence(ns: sequences.NoteSequence,
                         sample_rate: int,
                         duration: Optional[float] = None) -> np.ndarray:
  """Additive-sine render of a NoteSequence (test fixture, not a product)."""
  total = duration if duration is not None else ns.total_time
  n = int(round(total * sample_rate)) + 1
  audio = np.zeros(n, np.float32)
  for note in ns.notes:
    start = int(round(note.start_time * sample_rate))
    end = min(int(round(note.end_time * sample_rate)), n)
    if end <= start:
      continue
    t = np.arange(end - start) / sample_rate
    freq = float(midi_to_hz(note.pitch))
    env = np.minimum(1.0, (end - start - np.arange(end - start)) / 1000.0)
    audio[start:end] += (note.velocity / 127.0) * 0.2 * env * np.sin(
        2 * np.pi * freq * t).astype(np.float32)
  return np.clip(audio, -1.0, 1.0)


def random_note_sequence(rng: np.random.RandomState,
                         duration: float = 10.0,
                         notes_per_second: float = 3.0,
                         num_programs: int = 2) -> sequences.NoteSequence:
  ns = sequences.NoteSequence()
  n_notes = max(1, int(duration * notes_per_second))
  programs = rng.choice(128, size=num_programs, replace=False)
  for _ in range(n_notes):
    start = float(rng.uniform(0, duration - 0.2))
    length = float(rng.uniform(0.1, min(2.0, duration - start)))
    ns.add(start_time=start,
           end_time=start + length,
           pitch=int(rng.randint(36, 96)),
           velocity=int(rng.randint(1, 128)),
           program=int(rng.choice(programs)),
           is_drum=False)
  sequences.assign_instruments(ns)
  return ns


def synthetic_source(num_examples: int,
                     sample_rate: int = 16000,
                     duration: float = 10.0,
                     seed: int = 0) -> core.Dataset:
  """Dataset of {'sequence': NoteSequence, 'audio': samples, 'id': str}."""
  def gen() -> Iterator[core.Example]:
    for i in range(num_examples):
      rng = np.random.RandomState(seed + i)
      ns = random_note_sequence(rng, duration=duration)
      audio = render_note_sequence(ns, sample_rate, duration=duration)
      yield {"sequence": ns, "audio": audio, "id": f"synthetic-{i}"}
  return core.Dataset.from_generator(gen)
