"""Full-song renderer + vocoder tests (tiny model, CPU)."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from music_spectrogram_diffusion_tpu import config as cfg_lib
from music_spectrogram_diffusion_tpu.audio import codecs
from music_spectrogram_diffusion_tpu.audio import vocoder as vocoder_lib
from music_spectrogram_diffusion_tpu.infer import synthesize
from music_spectrogram_diffusion_tpu.models.diffusion import model as model_lib
from music_spectrogram_diffusion_tpu.models.diffusion import network
from music_spectrogram_diffusion_tpu.ops import diffusion as dops
from music_spectrogram_diffusion_tpu.ops import stft as stft_ops

LENGTHS = {"inputs": 32, "targets": 16, "targets_context": 16}


def make_synth(vocoder=None):
  net_cfg = cfg_lib.network_config("tiny", with_context=True,
                                   vocab_size=256, dropout_rate=0.0)
  module = network.ContextTransformer(config=net_cfg)
  dcfg = dops.DiffusionConfig(sampler=dops.SamplerConfig(num_steps=2))
  m = model_lib.ContextDiffusionModel(module, dcfg, codecs.MelGan())
  shapes = {
      "encoder_input_tokens": (1, LENGTHS["inputs"]),
      "encoder_continuous_inputs": (1, LENGTHS["targets_context"], 128),
      "encoder_continuous_mask": (1, LENGTHS["targets_context"]),
      "decoder_target_tokens": (1, LENGTHS["targets"], 128),
  }
  types = {"encoder_input_tokens": jnp.int32,
           "encoder_continuous_mask": jnp.bool_}
  params = m.init_variables(jax.random.PRNGKey(0), shapes, types)["params"]
  return synthesize.Synthesizer(m, params, LENGTHS, vocoder=vocoder)


def test_stream_song_matches_batch_renderer():
  """Streamed per-segment mel must equal the batch renderer exactly
  (same per-(song, segment) RNG structure), and audio chunks must have
  hop-aligned lengths with the vocoder-warmup context dropped."""
  voc = vocoder_lib.GriffinLimVocoder(num_iters=2)
  synth = make_synth(vocoder=voc)
  segs = [np.arange(1, 20, dtype=np.int32),
          np.arange(5, 30, dtype=np.int32),
          np.arange(1, 10, dtype=np.int32)]
  rng = jax.random.PRNGKey(3)
  want = synth.render_song(segs, rng=rng, vocode=False)

  hop = synth.model.audio_codec.hop_size
  got_mel, got_audio = [], []
  for gi, mel, audio in synth.stream_song(segs, rng=rng,
                                          vocoder_context_frames=4):
    assert mel.shape == (LENGTHS["targets"], 128)
    got_mel.append(mel)
    assert audio is not None and audio.shape == (LENGTHS["targets"] * hop,)
    got_audio.append(audio)
  np.testing.assert_allclose(np.concatenate(got_mel), want.mel,
                             rtol=1e-5, atol=1e-6)
  assert len(got_audio) == len(segs)


def test_render_song_chained():
  synth = make_synth()
  segs = [np.arange(1, 20, dtype=np.int32),
          np.arange(5, 30, dtype=np.int32),
          np.arange(1, 10, dtype=np.int32)]
  out = synth.render_song(segs, rng=jax.random.PRNGKey(3), vocode=False)
  assert out.mel.shape == (3 * LENGTHS["targets"], 128)
  assert np.all(np.isfinite(out.mel))
  assert out.audio is None
  assert out.timings["prediction_seconds"] > 0


def test_render_songs_batched_matches_single():
  """Batched multi-song rendering must equal one-at-a-time rendering.

  The renderer gives each song its own PRNG key (per-example sampler
  keys), so a song's output is independent of its batch neighbours."""
  synth = make_synth()
  song_a = [np.arange(1, 20, dtype=np.int32)] * 2
  song_b = [np.arange(3, 28, dtype=np.int32)] * 2
  both = synth.render_songs([song_a, song_b], rng=jax.random.PRNGKey(5),
                            vocode=False)
  # Keys fold in the song's batch position, so a solo render at position
  # 0 must reproduce batch row 0 (up to fp reassociation: XLA reduces
  # batched matmuls in a different order; measured ~6e-5 on mel features
  # spanning [-12, 4] — a wiring bug would diverge by O(1)).
  solo_a = synth.render_songs([song_a], rng=jax.random.PRNGKey(5),
                              vocode=False)[0]
  solo_b_first = synth.render_songs([song_b], rng=jax.random.PRNGKey(5),
                                    vocode=False)[0]
  np.testing.assert_allclose(both[0].mel, solo_a.mel, atol=5e-4)
  # Row 1 used a different key than a solo row-0 render (by design), but
  # the same song still renders deterministically in either setting.
  assert both[1].mel.shape == solo_b_first.mel.shape
  assert both[0].mel.shape[0] == 2 * LENGTHS["targets"]
  # Row 1's render must be independent of its batch neighbour: keys fold
  # in the song POSITION, so song_b at position 1 renders identically
  # whatever occupies position 0.
  song_c = [np.arange(7, 31, dtype=np.int32)] * 2
  swapped = synth.render_songs([song_c, song_b],
                               rng=jax.random.PRNGKey(5), vocode=False)
  np.testing.assert_allclose(swapped[1].mel, both[1].mel, atol=5e-4)
  # And it must differ from the row-0 keyed render of the same song.
  assert not np.allclose(both[1].mel, solo_b_first.mel, atol=5e-4)


def test_render_with_griffin_lim_vocoder():
  gl = vocoder_lib.GriffinLimVocoder(num_iters=2)
  synth = make_synth(vocoder=gl)
  segs = [np.arange(1, 20, dtype=np.int32)]
  out = synth.render_song(segs, rng=jax.random.PRNGKey(0), vocode=True)
  n_frames = LENGTHS["targets"]
  assert out.audio is not None
  assert out.audio.shape == (n_frames * 320,)
  assert np.all(np.isfinite(out.audio))
  assert out.timings["audio_decode_seconds"] > 0


def test_soundstream_decoder_shapes():
  cfg = vocoder_lib.SoundStreamConfig(base_channels=64)
  assert cfg.hop_size == 320
  dec = vocoder_lib.SoundStreamDecoder(config=cfg)
  mel = jnp.zeros((2, 10, 128))
  params = dec.init(jax.random.PRNGKey(0), mel)
  audio = dec.apply(params, mel)
  assert audio.shape == (2, 10 * 320)
  assert float(jnp.max(jnp.abs(audio))) <= 1.0


def test_stft_istft_roundtrip():
  rng = np.random.RandomState(0)
  audio = rng.randn(2, 3200).astype(np.float32) * 0.1
  mag_params = dict(frame_length=640, frame_step=320, fft_length=1024)
  frames = stft_ops.frame_signal(jnp.asarray(audio), 640, 320, True)
  window = jnp.asarray(stft_ops.hann_window(640))
  stft_c = jnp.fft.rfft(frames * window, n=1024, axis=-1)
  rec = stft_ops.istft(stft_c, num_samples=3200, **mag_params)
  # Interior samples reconstruct well (edges lose window overlap).
  np.testing.assert_allclose(np.asarray(rec)[:, 640:-640],
                             audio[:, 640:-640], atol=1e-3)


def test_griffin_lim_reduces_error():
  """GL output's |STFT| should approximate the target magnitude."""
  rng = np.random.RandomState(1)
  t = np.arange(6400) / 16000.0
  audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
  mag = stft_ops.stft_magnitude(
      jnp.asarray(audio), frame_length=640, frame_step=320,
      fft_length=1024)
  rec = stft_ops.griffin_lim(mag, frame_length=640, frame_step=320,
                             fft_length=1024, num_iters=16)
  mag_rec = stft_ops.stft_magnitude(
      rec, frame_length=640, frame_step=320, fft_length=1024)
  rel_err = (np.linalg.norm(np.asarray(mag_rec - mag)) /
             np.linalg.norm(np.asarray(mag)))
  assert rel_err < 0.35, rel_err


def test_input_bucketing_identical_output():
  """Bucketed (short) encoder padding must give identical predictions."""
  synth = make_synth()
  segs = [np.arange(1, 12, dtype=np.int32)]
  full = synthesize.Synthesizer(
      synth.model, synth.params, LENGTHS, bucket_inputs=False)
  out_bucketed = synth.render_song(segs, rng=jax.random.PRNGKey(2),
                                   vocode=False)
  out_full = full.render_song(segs, rng=jax.random.PRNGKey(2),
                              vocode=False)
  np.testing.assert_allclose(out_bucketed.mel, out_full.mel,
                             rtol=1e-5, atol=1e-5)


def test_input_bucket_selection():
  synth = make_synth()
  assert synth._input_length(10) == 32  # capped at task inputs length
  big = synthesize.Synthesizer(
      synth.model, synth.params,
      {"inputs": 2048, "targets": 16, "targets_context": 16})
  assert big._input_length(100) == 256
  assert big._input_length(600) == 1024
  assert big._input_length(2048) == 2048


def test_render_notes_only_model():
  """Notes-only diffusion model renders segments without context."""
  from music_spectrogram_diffusion_tpu.models.diffusion import (
      model as dmodel)
  net_cfg = cfg_lib.network_config("tiny", with_context=False,
                                   vocab_size=256, dropout_rate=0.0)
  module = network.Transformer(config=net_cfg)
  m = dmodel.DiffusionModel(
      module, dops.DiffusionConfig(sampler=dops.SamplerConfig(num_steps=2)),
      codecs.MelGan())
  shapes = {"encoder_input_tokens": (1, LENGTHS["inputs"]),
            "decoder_target_tokens": (1, LENGTHS["targets"], 128)}
  params = m.init_variables(jax.random.PRNGKey(0), shapes)["params"]
  synth = synthesize.Synthesizer(
      m, params, {"inputs": LENGTHS["inputs"],
                  "targets": LENGTHS["targets"]})
  out = synth.render_song([np.arange(1, 9, dtype=np.int32)] * 2,
                          rng=jax.random.PRNGKey(0), vocode=False)
  assert out.mel.shape == (2 * LENGTHS["targets"], 128)
  assert np.all(np.isfinite(out.mel))


def test_render_autoregressive_model():
  """AR baseline renders segments through the same interface."""
  from music_spectrogram_diffusion_tpu import config as cfg
  from music_spectrogram_diffusion_tpu.infer import inference
  import dataclasses
  exp = cfg.preset("ar_tiny")
  exp = dataclasses.replace(exp, vocab_size=256, dropout_rate=0.0)
  m = inference.build_model(exp)
  shapes = {"encoder_input_tokens": (1, LENGTHS["inputs"]),
            "decoder_target_tokens": (1, LENGTHS["targets"], 128)}
  params = m.init_variables(jax.random.PRNGKey(0), shapes)["params"]
  synth = synthesize.Synthesizer(
      m, params, {"inputs": LENGTHS["inputs"],
                  "targets": LENGTHS["targets"]})
  out = synth.render_song([np.arange(1, 9, dtype=np.int32)],
                          rng=jax.random.PRNGKey(0), vocode=False)
  assert out.mel.shape == (LENGTHS["targets"], 128)
  assert np.all(np.isfinite(out.mel))
