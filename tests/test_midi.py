"""MIDI front-end tests: event codec, vocabulary, RLE, note sequences."""

import os

import numpy as np
import pytest

from music_spectrogram_diffusion_tpu.midi import event_codec
from music_spectrogram_diffusion_tpu.midi import run_length
from music_spectrogram_diffusion_tpu.midi import sequences
from music_spectrogram_diffusion_tpu.midi import vocabularies

Event = event_codec.Event


@pytest.fixture
def codec():
  return vocabularies.build_codec(
      vocabularies.VocabularyConfig(num_velocity_bins=127))


# -- event codec -------------------------------------------------------------


def test_codec_roundtrip(codec):
  for ev in [Event("pitch", 60), Event("velocity", 0),
             Event("velocity", 127), Event("tie", 0),
             Event("program", 10), Event("drum", 38),
             Event("shift", 0), Event("shift", 1000)]:
    idx = codec.encode_event(ev)
    back = codec.decode_event_index(idx)
    assert back == ev, (ev, idx, back)


def test_codec_layout(codec):
  # Shift block first, starting at 0 (reference event_codec.py:56-59).
  assert codec.encode_event(Event("shift", 0)) == 0
  assert codec.encode_event(Event("shift", 1000)) == 1000
  assert codec.encode_event(Event("pitch", 0)) == 1001
  assert codec.is_shift_event_index(0)
  assert codec.is_shift_event_index(1000)
  assert not codec.is_shift_event_index(1001)
  # num_classes: 1001 shifts + 128 pitch + 128 vel + 1 tie + 128 prog
  # + 128 drum.
  assert codec.num_classes == 1001 + 128 + 128 + 1 + 128 + 128


def test_codec_vectorized_matches_scalar(codec):
  rng = np.random.RandomState(0)
  ids = rng.randint(0, codec.num_classes, 100)
  type_idx, values = codec.decode(ids)
  for i, idx in enumerate(ids):
    ev = codec.decode_event_index(int(idx))
    assert codec.event_types[type_idx[i]] == ev.type
    assert values[i] == ev.value


def test_codec_errors(codec):
  with pytest.raises(ValueError):
    codec.encode_event(Event("pitch", 128))
  with pytest.raises(ValueError):
    codec.encode_event(Event("bogus", 0))
  with pytest.raises(ValueError):
    codec.decode_event_index(codec.num_classes)


# -- vocabulary --------------------------------------------------------------


def test_velocity_bins():
  for nbins in [1, 127]:
    for v in [0, 1, 64, 127]:
      b = int(vocabularies.velocity_to_bin(v, nbins))
      v2 = int(vocabularies.bin_to_velocity(b, nbins))
      if v == 0:
        assert b == 0 and v2 == 0
      else:
        assert 1 <= b <= nbins
        # Round trip through a bin is idempotent.
        assert int(vocabularies.velocity_to_bin(v2, nbins)) == b


def test_vocabulary_encode_decode(codec):
  vocab = vocabularies.vocabulary_from_codec(codec)
  ids = np.asarray([0, 5, codec.num_classes - 1])
  enc = vocab.encode(ids)
  np.testing.assert_array_equal(enc, ids + 3)
  dec = vocab.decode(enc)
  np.testing.assert_array_equal(dec, ids)
  # EOS and after -> -1; specials -> -2.
  got = vocab.decode(np.asarray([5, 1, 8, 0]))
  np.testing.assert_array_equal(got, [2, -1, -1, -1])
  got = vocab.decode(np.asarray([0, 2, 5]))
  np.testing.assert_array_equal(got, [-2, -2, 2])
  # Out-of-range encode raises.
  with pytest.raises(ValueError):
    vocab.encode(np.asarray([codec.num_classes]))


def test_num_embeddings(codec):
  vocab = vocabularies.vocabulary_from_codec(codec)
  n = vocabularies.num_embeddings(vocab)
  assert n % 128 == 0 and n >= vocab.vocab_size


def test_program_granularities(codec):
  lo, _ = codec.event_type_range("program")
  tokens = np.asarray([5, lo + 9, lo + 17, 30])
  flat = vocabularies.PROGRAM_GRANULARITIES["flat"].tokens_map_fn(
      tokens, codec)
  np.testing.assert_array_equal(flat, [5, 30])
  mc = vocabularies.PROGRAM_GRANULARITIES["midi_class"].tokens_map_fn(
      tokens, codec)
  np.testing.assert_array_equal(mc, [5, lo + 8, lo + 16, 30])
  full = vocabularies.PROGRAM_GRANULARITIES["full"].tokens_map_fn(
      tokens, codec)
  np.testing.assert_array_equal(full, tokens)


# -- encode_and_index_events golden parity -----------------------------------


@pytest.fixture(scope="module")
def rle_goldens():
  path = os.path.join(os.path.dirname(__file__), "goldens", "rle.npz")
  assert os.path.exists(path), "run tests/make_goldens.py"
  return dict(np.load(path))


def _small_codec():
  return event_codec.Codec(
      max_shift_steps=100, steps_per_second=100,
      event_ranges=[
          event_codec.EventRange("pitch", 0, 127),
          event_codec.EventRange("velocity", 0, 1),
          event_codec.EventRange("tie", 0, 0),
      ])


def _encode_event_fn(state, value, codec_):
  pitch, vel = value
  if state is not None:
    state[pitch] = vel
  return [Event("velocity", vel), Event("pitch", pitch)]


def _state_to_events_fn(state):
  evs = [Event("pitch", p) for p in sorted(state) if state[p]]
  return evs + [Event("tie", 0)]


@pytest.mark.parametrize("with_state", [False, True])
def test_encode_and_index_events_matches_reference(rle_goldens, with_state):
  codec = _small_codec()
  event_times = [0.0, 0.032, 0.032, 0.05, 0.11, 0.113]
  event_values = [(60, 1), (62, 1), (60, 0), (65, 1), (62, 0), (65, 0)]
  frame_times = [i * 0.02 for i in range(8)]
  state = {} if with_state else None
  res = run_length.encode_and_index_events(
      state=state, event_times=event_times, event_values=event_values,
      encode_event_fn=_encode_event_fn, codec=codec,
      frame_times=frame_times,
      encoding_state_to_events_fn=(
          _state_to_events_fn if with_state else None))
  tag = "state" if with_state else "plain"
  for name, arr in zip(["events", "start", "end", "state_events",
                        "state_idx"], res):
    np.testing.assert_array_equal(
        arr, rle_goldens[f"{tag}_{name}"], err_msg=f"{tag}_{name}")


def test_encode_and_index_invariants():
  """end[i] == start[i+1] always (reference docstring invariant)."""
  codec = _small_codec()
  rng = np.random.RandomState(3)
  times = np.sort(rng.uniform(0, 2.0, 20))
  values = [(int(rng.randint(0, 127)), int(rng.randint(0, 2)))
            for _ in range(20)]
  frame_times = np.arange(0, 2.0, 0.02)
  events, start, end, _, _ = run_length.encode_and_index_events(
      None, times, values, _encode_event_fn, codec, frame_times)
  np.testing.assert_array_equal(end[:-1], start[1:])
  assert end[-1] == len(events)
  assert np.all(np.diff(start) >= 0)


# -- run-length encoding of shifts (reference test goldens) ------------------


def _rle_test_codec():
  # Layout from reference run_length_encoding_test.py:24-36.
  return event_codec.Codec(
      max_shift_steps=100, steps_per_second=100,
      event_ranges=[
          event_codec.EventRange("pitch", 0, 127),
          event_codec.EventRange("velocity", 0, 127),
          event_codec.EventRange("drum", 0, 127),
          event_codec.EventRange("program", 0, 127),
          event_codec.EventRange("tie", 0, 0),
      ])


def test_rle_shifts_basic():
  got = run_length.run_length_encode_shifts(
      [1, 1, 1, 161, 1, 1, 1, 162, 1, 1, 1], _rle_test_codec())
  np.testing.assert_array_equal(got, [3, 161, 6, 162])


def test_rle_shifts_beyond_max_length():
  got = run_length.run_length_encode_shifts(
      [1] * 202 + [161, 1, 1, 1], _rle_test_codec())
  np.testing.assert_array_equal(got, [100, 100, 2, 161])


def test_rle_shifts_simultaneous():
  got = run_length.run_length_encode_shifts(
      [1, 1, 1, 161, 162, 1, 1, 1], _rle_test_codec())
  np.testing.assert_array_equal(got, [3, 161, 162])


def test_rle_shifts_drop_redundant():
  got = run_length.run_length_encode_shifts(
      [1, 1, 1, 525, 356, 161, 1, 1, 525, 356, 161, 355, 394],
      _rle_test_codec(), state_change_event_types=["velocity", "program"])
  np.testing.assert_array_equal(got, [3, 525, 356, 161, 5, 161, 355, 394])


# -- note sequences: encode -> tokens -> decode round trip -------------------


def test_note_sequence_roundtrip_with_ties():
  vocab_cfg = vocabularies.VocabularyConfig(num_velocity_bins=127)
  codec = vocabularies.build_codec(vocab_cfg)
  spec = sequences.NoteEncodingWithTiesSpec

  ns = sequences.NoteSequence()
  ns.add(start_time=0.1, end_time=0.5, pitch=60, velocity=100, program=0)
  ns.add(start_time=0.3, end_time=0.8, pitch=64, velocity=80, program=0)
  ns.add(start_time=0.5, end_time=1.1, pitch=67, velocity=60, program=32)

  times, values = (
      sequences.note_sequence_to_onsets_and_offsets_and_programs(ns))
  frame_times = np.arange(0, 1.3, 0.02)
  state = spec.init_encoding_state_fn()
  events, start, end, state_events, state_idx = (
      run_length.encode_and_index_events(
          state, times, values, spec.encode_event_fn, codec, frame_times,
          spec.encoding_state_to_events_fn))

  # RLE (as the task pipeline does) then decode back to notes.
  rle_events = run_length.run_length_encode_shifts(
      events, codec, state_change_event_types=["velocity", "program"])
  dstate = spec.init_decoding_state_fn()
  invalid, dropped = run_length.decode_events(
      dstate, rle_events, start_time=0.0, max_time=None, codec=codec,
      decode_event_fn=spec.decode_event_fn)
  assert invalid == 0 and dropped == 0
  decoded = spec.flush_decoding_state_fn(dstate)

  got = sorted((n.pitch, round(n.start_time, 2), round(n.end_time, 2),
                n.program) for n in decoded.notes)
  want = sorted((n.pitch, round(n.start_time, 2), round(n.end_time, 2),
                 n.program) for n in ns.notes)
  assert got == want


def test_segment_decode_with_tie_section():
  """Slicing a middle segment and decoding with ties keeps held notes."""
  vocab_cfg = vocabularies.VocabularyConfig(num_velocity_bins=127)
  codec = vocabularies.build_codec(vocab_cfg)
  spec = sequences.NoteEncodingWithTiesSpec

  ns = sequences.NoteSequence()
  # A note held across the 1.0s segment boundary.
  ns.add(start_time=0.5, end_time=1.5, pitch=60, velocity=100, program=5)
  ns.add(start_time=1.2, end_time=1.4, pitch=72, velocity=90, program=5)

  times, values = (
      sequences.note_sequence_to_onsets_and_offsets_and_programs(ns))
  frame_times = np.arange(0, 2.0, 0.02)
  state = spec.init_encoding_state_fn()
  events, start, end, state_events, state_idx = (
      run_length.encode_and_index_events(
          state, times, values, spec.encode_event_fn, codec, frame_times,
          spec.encoding_state_to_events_fn))

  # Segment = frames covering [1.0, 2.0).
  seg = slice(50, 100)
  features = {
      "targets": events,
      "event_start_indices": start[seg],
      "event_end_indices": end[seg],
      "state_events": state_events,
      "state_event_indices": state_idx[seg],
  }
  tie_token = codec.encode_event(Event("tie", 0))
  features = run_length.extract_sequence_with_indices(
      features, state_events_end_token=tie_token)
  tokens = run_length.run_length_encode_shifts(
      features["targets"], codec,
      state_change_event_types=["velocity", "program"])
  # The tie-section prefix must declare the held pitch 60 before the tie.
  tie_pos = int(np.where(tokens == tie_token)[0][0])
  prefix = tokens[:tie_pos]
  type_idx, vals = codec.decode(prefix)
  types = [codec.event_types[t] for t in type_idx]
  assert ("pitch" in types) and (60 in vals[np.asarray(types) == "pitch"])

  # Decoding the segment yields the held note (from 1.0) + the short note.
  dstate = spec.init_decoding_state_fn()
  spec.begin_decoding_segment_fn(dstate)
  # Seed active pitches as if continuing from the previous segment.
  dstate.active_pitches[(60, 5)] = (0.5, 100)
  invalid, dropped = run_length.decode_events(
      dstate, tokens, start_time=1.0, max_time=None, codec=codec,
      decode_event_fn=spec.decode_event_fn)
  assert invalid == 0
  decoded = spec.flush_decoding_state_fn(dstate)
  got = sorted((n.pitch, round(n.start_time, 2), round(n.end_time, 2))
               for n in decoded.notes)
  assert got == [(60, 0.5, 1.5), (72, 1.2, 1.4)]


def test_trim_overlapping_notes():
  ns = sequences.NoteSequence()
  ns.add(start_time=0.0, end_time=1.0, pitch=60, velocity=100)
  ns.add(start_time=0.5, end_time=1.5, pitch=60, velocity=100)
  trimmed = sequences.trim_overlapping_notes(ns)
  spans = sorted((n.start_time, n.end_time) for n in trimmed.notes)
  assert spans == [(0.0, 0.5), (0.5, 1.5)]


def test_assign_instruments():
  ns = sequences.NoteSequence()
  for program, is_drum in [(0, False), (32, False), (0, True)]:
    ns.add(start_time=0, end_time=1, pitch=60, velocity=100,
           program=program, is_drum=is_drum)
  sequences.assign_instruments(ns)
  assert [n.instrument for n in ns.notes] == [0, 1, 9]


def test_decode_events_max_time_drops():
  """Events past max_time are dropped and counted (reference
  run_length_encoding.py:309-314)."""
  codec = vocabularies.build_codec(
      vocabularies.VocabularyConfig(num_velocity_bins=127))
  spec = sequences.NoteEncodingSpec
  # shift(50) pitch-on, shift(200) pitch-on beyond max_time=1.0s
  vel_on = codec.encode_event(Event("velocity", 100))
  p60 = codec.encode_event(Event("pitch", 60))
  p62 = codec.encode_event(Event("pitch", 62))
  tokens = np.asarray([50, vel_on, p60, 200, vel_on, p62])
  state = spec.init_decoding_state_fn()
  invalid, dropped = run_length.decode_events(
      state, tokens, start_time=0.0, max_time=1.0, codec=codec,
      decode_event_fn=spec.decode_event_fn)
  assert invalid == 0
  assert dropped == 3  # the shift(200) and everything after
  ns = spec.flush_decoding_state_fn(state)
  assert [n.pitch for n in ns.notes] == [60]


def test_decode_events_invalid_tokens():
  codec = vocabularies.build_codec(
      vocabularies.VocabularyConfig(num_velocity_bins=127))
  spec = sequences.NoteEncodingSpec
  vel_on = codec.encode_event(Event("velocity", 100))
  p60 = codec.encode_event(Event("pitch", 60))
  bad = codec.num_classes + 5  # out of vocabulary
  # note-off for inactive pitch is also invalid (ValueError path).
  vel_off = codec.encode_event(Event("velocity", 0))
  p70 = codec.encode_event(Event("pitch", 70))
  tokens = np.asarray([bad, vel_on, p60, vel_off, p70])
  state = spec.init_decoding_state_fn()
  invalid, dropped = run_length.decode_events(
      state, tokens, start_time=0.0, max_time=None, codec=codec,
      decode_event_fn=spec.decode_event_fn)
  assert invalid == 2  # out-of-vocab token + inactive note-off
  assert dropped == 0
