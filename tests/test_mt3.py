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


def test_beam_decode_shape_and_eos_invariant():
  t = _tiny_transcriber()
  spec = jnp.asarray(np.random.RandomState(0).randn(
      2, 8, mt3.NUM_MEL_BINS).astype(np.float32) * 0.1)
  mask = jnp.ones((2, 8), bool)
  import functools
  beam = jax.jit(functools.partial(
      mt3.beam_decode, t.module, max_tokens=t.max_tokens, beam_size=3))
  tokens = np.asarray(beam(t.params, spec, mask))
  assert tokens.shape == (2, t.max_tokens)
  for row in tokens:
    if (row == 1).any():
      first = int(np.argmax(row == 1))
      assert np.all(row[first + 1:] == 0)
  # Deterministic.
  np.testing.assert_array_equal(tokens, np.asarray(beam(t.params, spec,
                                                        mask)))


def test_beam_decode_score_not_worse_than_greedy():
  """With alpha=0 (no brevity penalty) the beam-search sequence
  log-probability must be >= the greedy sequence's — beam explores a
  superset of greedy's single path."""
  t = _tiny_transcriber()
  rng = np.random.RandomState(3)
  spec = jnp.asarray(rng.randn(1, 8, mt3.NUM_MEL_BINS).astype(
      np.float32) * 0.5)
  mask = jnp.ones((1, 8), bool)
  import functools
  greedy_toks = np.asarray(t._decode(t.params, spec, mask))
  beam = jax.jit(functools.partial(
      mt3.beam_decode, t.module, max_tokens=t.max_tokens, beam_size=4,
      alpha=0.0))
  beam_toks = np.asarray(beam(t.params, spec, mask))

  def seq_logprob(tokens):
    # Teacher-forced score of [BOS] + tokens[:-1] -> tokens, up to and
    # including the first EOS (or the full length without one).
    inputs = np.concatenate([[0], tokens[:-1]])[None].astype(np.int32)
    logits = t.module.apply({"params": t.params}, spec, mask,
                            jnp.asarray(inputs),
                            jnp.asarray(tokens[None].astype(np.int32)))
    logp = jax.nn.log_softmax(np.asarray(logits, np.float64), axis=-1)[0]
    end = (int(np.argmax(tokens == 1)) + 1 if (tokens == 1).any()
           else len(tokens))
    return float(sum(logp[i, tokens[i]] for i in range(end)))

  assert seq_logprob(beam_toks[0]) >= seq_logprob(greedy_toks[0]) - 1e-4


def test_mt3_remap_matches_module_tree():
  """Structural identity: a t5x/mt3-shaped checkpoint tree remaps onto
  EXACTLY the module.init tree (same flat names, same shapes). Pins
  load_mt3_checkpoint's rename table against the real t5x naming
  (t5x network.py: *_layer_norm, top-level token_embedder,
  continuous_inputs_projection; mt3 has no relpos_bias — fixed
  sinusoidal positions)."""
  from music_spectrogram_diffusion_tpu.train import checkpoints

  t = _tiny_transcriber()
  d, mlp, heads = 32, 64, 32  # emb_dim, mlp_dim, heads*head_dim
  vocab = t.module.config.vocab_size

  def attn():
    return {n: {"kernel": np.zeros((d, heads), np.float32)}
            for n in ("query", "key", "value")} | {
                "out": {"kernel": np.zeros((heads, d), np.float32)}}

  def mlp_block():
    return {"wi_0": {"kernel": np.zeros((d, mlp), np.float32)},
            "wi_1": {"kernel": np.zeros((d, mlp), np.float32)},
            "wo": {"kernel": np.zeros((mlp, d), np.float32)}}

  def enc_layer():
    return {
        "pre_attention_layer_norm": {"scale": np.zeros(d, np.float32)},
        "attention": attn(),
        "pre_mlp_layer_norm": {"scale": np.zeros(d, np.float32)},
        "mlp": mlp_block(),
    }

  def dec_layer():
    return {
        "pre_self_attention_layer_norm":
            {"scale": np.zeros(d, np.float32)},
        "self_attention": attn(),
        "pre_cross_attention_layer_norm":
            {"scale": np.zeros(d, np.float32)},
        "encoder_decoder_attention": attn(),
        "pre_mlp_layer_norm": {"scale": np.zeros(d, np.float32)},
        "mlp": mlp_block(),
    }

  t5x_tree = {
      "token_embedder": {
          "embedding": np.zeros((vocab, d), np.float32)},
      "encoder": {
          "continuous_inputs_projection": {
              "kernel": np.zeros((mt3.NUM_MEL_BINS, d), np.float32)},
          "layers_0": enc_layer(),
          "layers_1": enc_layer(),
          "encoder_norm": {"scale": np.zeros(d, np.float32)},
      },
      "decoder": {
          "layers_0": dec_layer(),
          "layers_1": dec_layer(),
          "decoder_norm": {"scale": np.zeros(d, np.float32)},
          "logits_dense": {"kernel": np.zeros((d, vocab), np.float32)},
      },
  }
  remapped = mt3.remap_mt3_params(t5x_tree)
  got = {k: v.shape for k, v in checkpoints._flatten(remapped).items()}
  want = {k: v.shape for k, v in checkpoints._flatten(t.params).items()}
  assert got == want


@pytest.mark.slow
def test_train_transcriber_cli_and_loader(tmp_path, monkeypatch):
  """cli.train_transcriber -> load_trained_transcriber -> NoteSequence.

  The round-4 'light up the transcription metric' loop (VERDICT #3):
  train a compact MT3Transformer on synthetic pairs, restore it via the
  sidecar config, and transcribe audio end to end (greedy decode through
  the tie-aware state machine).
  """
  import sys

  from music_spectrogram_diffusion_tpu.cli import train_transcriber
  from music_spectrogram_diffusion_tpu.data import synthetic

  model_dir = str(tmp_path / "transcriber")
  monkeypatch.setattr(sys, "argv", [
      "train_transcriber", "--model_dir", model_dir,
      "--synthetic_examples", "6", "--song_seconds", "4.0",
      "--steps", "4", "--batch", "4", "--log_period", "2",
      "--checkpoint_period", "4", "--emb_dim", "64", "--num_layers", "2",
      "--num_heads", "2", "--mlp_dim", "128", "--max_tokens", "256"])
  train_transcriber.main()

  tr = mt3.load_trained_transcriber(model_dir, max_tokens=32)
  assert tr.module.config.emb_dim == 64  # sidecar geometry, not default
  rng = np.random.RandomState(0)
  ns_in = synthetic.random_note_sequence(rng, duration=3.0)
  audio = synthetic.render_note_sequence(ns_in, 16000, duration=3.0)
  ns_out = tr(audio)
  # 4 steps of training transcribes garbage — the contract here is the
  # full pipeline executing and producing a valid NoteSequence.
  assert ns_out.total_time >= 0.0
  for n in ns_out.notes:
    assert 0 <= n.pitch < 128


def test_spectrogram_numpy_matches_jax_stft():
  """The numpy MT3 frontend must equal stft_ops.stft_magnitude + mel."""
  from music_spectrogram_diffusion_tpu.ops import stft as stft_ops

  audio = np.random.RandomState(0).randn(40000).astype(np.float32) * 0.1
  got = mt3.spectrogram(audio)
  mag = np.asarray(stft_ops.stft_magnitude(
      jnp.asarray(audio)[None], frame_length=mt3.FFT_SIZE,
      frame_step=mt3.HOP_WIDTH, fft_length=mt3.FFT_SIZE, pad_end=True))[0]
  mel_mat = stft_ops.linear_to_mel_matrix(
      num_mel_bins=mt3.NUM_MEL_BINS,
      num_spectrogram_bins=mt3.FFT_SIZE // 2 + 1,
      sample_rate=mt3.SAMPLE_RATE, lower_edge_hertz=mt3.MEL_LO_HZ,
      upper_edge_hertz=mt3.SAMPLE_RATE / 2.0)
  want = np.log(mag @ mel_mat + mt3.SPEC_LOG_EPS)
  assert got.shape == want.shape
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
