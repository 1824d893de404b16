"""MT3 transcription model: frontend, network shapes, greedy decode."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from music_spectrogram_diffusion_tpu.infer import mt3, transcription
from music_spectrogram_diffusion_tpu.midi import sequences


def test_spectrogram_frontend_geometry():
  audio = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
  spec = mt3.spectrogram(audio)
  # ceil(16000 / 128) = 125 frames at 125 fps, 512 mel bins.
  assert spec.shape == (125, 512)
  assert np.all(np.isfinite(spec))


def _tiny_transcriber():
  """MT3Transcriber with a tiny random-weight network."""
  t = mt3.MT3Transcriber.__new__(mt3.MT3Transcriber)
  from music_spectrogram_diffusion_tpu.midi import vocabularies
  t.vocab_config = vocabularies.VocabularyConfig(num_velocity_bins=1)
  t.codec = vocabularies.build_codec(t.vocab_config)
  t.vocabulary = vocabularies.vocabulary_from_codec(t.codec)
  vocab_size = 128 * -(-t.vocabulary.vocab_size // 128)
  t.module = mt3.MT3Transformer(config=mt3.MT3Config(
      vocab_size=vocab_size, emb_dim=32, num_heads=2,
      num_encoder_layers=2, num_decoder_layers=2, head_dim=16,
      mlp_dim=64))
  t.max_tokens = 16
  spec = jnp.zeros((1, 8, mt3.NUM_MEL_BINS))
  mask = jnp.ones((1, 8), bool)
  tokens = jnp.zeros((1, 4), jnp.int32)
  t.params = t.module.init(jax.random.PRNGKey(0), spec, mask, tokens,
                           tokens)["params"]
  import functools
  t._decode = jax.jit(functools.partial(
      mt3.greedy_decode, t.module, max_tokens=t.max_tokens))
  return t


def test_teacher_forced_logits_shape():
  t = _tiny_transcriber()
  spec = jnp.zeros((2, 8, mt3.NUM_MEL_BINS))
  mask = jnp.ones((2, 8), bool)
  tokens = jnp.asarray(np.random.RandomState(0).randint(0, 100, (2, 6)),
                       jnp.int32)
  logits = t.module.apply({"params": t.params}, spec, mask, tokens,
                          tokens)
  assert logits.shape == (2, 6, t.module.config.vocab_size)


def test_greedy_decode_stops_after_eos():
  t = _tiny_transcriber()
  spec = jnp.zeros((1, 8, mt3.NUM_MEL_BINS))
  mask = jnp.ones((1, 8), bool)
  tokens = np.asarray(t._decode(t.params, spec, mask))
  assert tokens.shape == (1, t.max_tokens)
  # Everything after the first EOS (if any) must be zeroed.
  (row,) = tokens
  if (row == 1).any():
    first = int(np.argmax(row == 1))
    assert np.all(row[first + 1:] == 0)


def test_transcriber_end_to_end_random_weights():
  """Random weights won't transcribe anything meaningful, but the full
  chain (audio -> spectrogram -> segments -> tokens -> NoteSequence)
  must run and produce a valid NoteSequence."""
  t = _tiny_transcriber()
  audio = np.random.RandomState(1).randn(2 * 16000).astype(
      np.float32) * 0.1
  ns = t(audio)
  assert isinstance(ns, sequences.NoteSequence)
  for note in ns.notes:
    assert note.end_time >= note.start_time >= 0

  # The plug-in hook accepts it.
  transcription.register_transcriber(t)
  try:
    assert transcription.get_transcriber() is t
  finally:
    transcription.register_transcriber(None)
