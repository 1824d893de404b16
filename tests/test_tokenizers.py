"""Dataset tokenizers + MIDI/proto/WAV I/O round trips."""

import os

import numpy as np
import pytest

from music_spectrogram_diffusion_tpu.audio import codecs
from music_spectrogram_diffusion_tpu.audio import wav_io
from music_spectrogram_diffusion_tpu.data import datasets
from music_spectrogram_diffusion_tpu.data import synthetic
from music_spectrogram_diffusion_tpu.data import tokenizers
from music_spectrogram_diffusion_tpu.midi import midi_io
from music_spectrogram_diffusion_tpu.midi import proto
from music_spectrogram_diffusion_tpu.midi import sequences
from music_spectrogram_diffusion_tpu.midi import vocabularies


def make_ns():
  ns = sequences.NoteSequence()
  ns.add(start_time=0.1, end_time=0.5, pitch=60, velocity=100, program=0)
  ns.add(start_time=0.3, end_time=0.9, pitch=64, velocity=80, program=32)
  ns.add(start_time=0.4, end_time=0.41, pitch=38, velocity=90,
         program=0, is_drum=True)
  sequences.assign_instruments(ns)
  return ns


def test_proto_roundtrip():
  ns = make_ns()
  ccs = [{"time": 0.2, "control_number": 64, "control_value": 100},
         {"time": 0.7, "control_number": 64, "control_value": 0}]
  data = proto.serialize_note_sequence(ns, ccs)
  ns2, ccs2, n_pb = proto.parse_note_sequence(data)
  assert n_pb == 0
  assert len(ns2.notes) == 3
  got = [(n.pitch, n.velocity, round(n.start_time, 3),
          round(n.end_time, 3), n.program, n.is_drum) for n in ns2.notes]
  want = [(n.pitch, n.velocity, round(n.start_time, 3),
           round(n.end_time, 3), n.program, n.is_drum) for n in ns.notes]
  assert got == want
  assert len(ccs2) == 2 and ccs2[0]["control_number"] == 64


def test_apply_sustain():
  ns = sequences.NoteSequence()
  ns.add(start_time=0.1, end_time=0.3, pitch=60, velocity=100)
  ns.add(start_time=0.1, end_time=0.9, pitch=62, velocity=100)
  ccs = [{"time": 0.0, "control_number": 64, "control_value": 127},
         {"time": 0.6, "control_number": 64, "control_value": 0}]
  out = proto.apply_sustain_control_changes(ns, ccs)
  spans = sorted((n.pitch, round(n.end_time, 2)) for n in out.notes)
  # Note ending at 0.3 inside the pedal span extends to 0.6; the other
  # ends past the release and is untouched.
  assert spans == [(60, 0.6), (62, 0.9)]


def test_midi_file_roundtrip(tmp_path):
  ns = make_ns()
  path = os.path.join(tmp_path, "test.mid")
  midi_io.write_midi_file(ns, path)
  ns2 = midi_io.read_midi_file(path)
  assert len(ns2.notes) == 3
  by_pitch = {n.pitch: n for n in ns2.notes}
  assert abs(by_pitch[60].start_time - 0.1) < 0.01
  assert abs(by_pitch[60].end_time - 0.5) < 0.01
  assert by_pitch[64].program == 32
  assert by_pitch[38].is_drum
  assert by_pitch[60].velocity == 100


def test_wav_roundtrip():
  sr = 16000
  t = np.arange(sr) / sr
  audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
  data = wav_io.encode_wav(audio, sr)
  rate, decoded = wav_io.decode_wav(data)
  assert rate == sr
  np.testing.assert_allclose(decoded, audio, atol=1e-3)


def test_resample():
  sr_in, sr_out = 44100, 16000
  t = np.arange(sr_in) / sr_in
  audio = np.sin(2 * np.pi * 440 * t).astype(np.float32)
  out = wav_io.resample(audio, sr_in, sr_out)
  assert abs(len(out) - sr_out) <= 2
  # Frequency preserved: count zero crossings ~ 2*440.
  zc = np.sum(np.abs(np.diff(np.sign(out))) > 0)
  assert abs(zc - 880) < 20


def _maestro_style_record(seed=0):
  rng = np.random.RandomState(seed)
  ns = synthetic.random_note_sequence(rng, duration=3.0)
  audio = synthetic.render_note_sequence(ns, 16000, duration=3.0)
  return {
      "sequence": proto.serialize_note_sequence(ns),
      "audio": wav_io.encode_wav(audio, 16000),
      "id": f"fake-{seed}".encode(),
  }


def test_maestro_tokenizer_via_tfrecord(tmp_path):
  """Full raw path: TFRecord on disk -> parse -> tokenize -> schema."""
  path = os.path.join(tmp_path, "fake.tfrecord")
  datasets.write_tfrecord(
      path, [datasets.serialize_example(_maestro_style_record(i))
             for i in range(2)])
  src = datasets.tfrecord_source(
      path, datasets.MAESTROV3_CONFIG.features)
  codec = vocabularies.build_codec(
      vocabularies.VocabularyConfig(num_velocity_bins=1))
  examples = list(src.flat_map(
      lambda ex: tokenizers.tokenize_transcription_example(
          ex, audio_codec=codecs.MelGan(), codec=codec,
          is_training_data=True, onsets_only=False, include_ties=True)))
  assert len(examples) == 2
  for ex in examples:
    assert ex["inputs"].shape[1] == 320
    assert ex["targets"].dtype == np.int32
    assert len(ex["event_start_indices"]) == ex["inputs"].shape[0]
    assert ex["id"].startswith("fake-")


def test_slakh_tokenizer():
  rng = np.random.RandomState(1)
  tracks, names = [], []
  for cls in ["Acoustic Piano", "Electric Bass", "Drums"]:
    ns = synthetic.random_note_sequence(rng, duration=2.0,
                                        num_programs=1)
    for n in ns.notes:
      n.program = 0
      n.is_drum = False
    tracks.append(proto.serialize_note_sequence(ns))
    names.append(cls.encode())
  audio = rng.randn(32000).astype(np.float32) * 0.1
  ex = {
      "note_sequences": tracks,
      "inst_names": names,
      "mix": audio,
      "audio_sample_rate": np.asarray(16000, np.int64),
      "track_id": b"slakh-test",
  }
  codec = vocabularies.build_codec(
      vocabularies.VocabularyConfig(num_velocity_bins=1))
  out = list(tokenizers.tokenize_slakh_example(
      ex, audio_codec=codecs.MelGan(), codec=codec,
      is_training_data=True, onsets_only=False, include_ties=True))
  assert len(out) == 1
  ns = out[0]["sequence"]
  programs = {(n.program, n.is_drum) for n in ns.notes}
  assert (0, False) in programs   # piano
  assert (33, False) in programs  # electric bass
  assert (0, True) in programs    # drums


def test_guitarset_and_urmp_program_maps():
  assert tokenizers.guitarset_instrument_to_program("Clean Guitar") == 24
  assert tokenizers.urmp_instrument_to_program("vn") == 40
  assert tokenizers.urmp_instrument_to_program("fl") == 73
  with pytest.raises(ValueError):
    tokenizers.urmp_instrument_to_program("xx")
  assert tokenizers.slakh_class_to_program_and_is_drum("Drums") == (0, True)
  assert tokenizers.slakh_class_to_program_and_is_drum(
      "Synth Pad") == (88, False)
