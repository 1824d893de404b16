"""Pin the mel frontend to committed golden vectors.

Goldens (tests/goldens/stft.npz, regenerate with make_stft_goldens.py)
come from torch.stft framing/FFT and a float64 transcription of the
tf.signal.linear_to_mel_weight_matrix algorithm — two implementations
independent of ops/stft.py. Any featurization drift (pad_end semantics,
window, mel band edges) breaks these before it becomes an audible pop /
FAD regression (reference audio_codecs.py:108-143).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from music_spectrogram_diffusion_tpu.ops import stft as stft_ops

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "stft.npz")


@pytest.fixture(scope="module")
def goldens():
  return np.load(GOLDENS)


@pytest.mark.parametrize("case", ["exact", "overhang", "short", "segment"])
def test_stft_magnitude_matches_goldens(goldens, case):
  audio = goldens[f"audio_{case}"]
  want = goldens[f"stft_{case}"]
  got = np.asarray(stft_ops.stft_magnitude(
      jnp.asarray(audio), frame_length=640, frame_step=320,
      fft_length=1024, pad_end=True))
  assert got.shape == want.shape, (got.shape, want.shape)
  np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_frame_counts_are_ceil_n_over_hop(goldens):
  # tf.signal.frame(pad_end=True): n_frames == ceil(n / frame_step).
  for case, n in [("exact", 3200), ("overhang", 3201), ("short", 500)]:
    want_frames = -(-n // 320)
    assert goldens[f"stft_{case}"].shape[0] == want_frames


def test_mel_matrix_melgan_matches_tf_formula(goldens):
  got = stft_ops.linear_to_mel_matrix(
      num_mel_bins=128, num_spectrogram_bins=513, sample_rate=16000.0,
      lower_edge_hertz=0.0, upper_edge_hertz=8000.0)
  want = goldens["mel_matrix_melgan"]
  assert got.shape == want.shape
  np.testing.assert_allclose(got, want, atol=1e-6)
  # DC row is zero, columns are triangles summing to ~1 frame width.
  assert np.all(got[0] == 0)


def test_mel_matrix_vggish_matches_tf_formula(goldens):
  got = stft_ops.linear_to_mel_matrix(
      num_mel_bins=64, num_spectrogram_bins=257, sample_rate=16000.0,
      lower_edge_hertz=125.0, upper_edge_hertz=7500.0)
  np.testing.assert_allclose(got, goldens["mel_matrix_vggish"], atol=1e-6)


def test_mel_spectrogram_composition(goldens):
  """mel_spectrogram == clip(log(max(|STFT| @ mel_matrix, 1e-5)))
  composed from the pinned pieces (MelGAN constants,
  reference audio_codecs.py:108-143)."""
  audio = goldens["audio_segment"]
  mel = np.asarray(stft_ops.mel_spectrogram(
      jnp.asarray(audio)[None], sample_rate=16000, n_fft=1024,
      hop_length=320, win_length=640, n_mel_channels=128, mel_fmin=0.0,
      mel_fmax=8000.0))[0]
  want = np.log(np.maximum(
      goldens["stft_segment"] @ goldens["mel_matrix_melgan"], 1e-5))
  np.testing.assert_allclose(mel, want, rtol=2e-3, atol=2e-3)


def test_mel_spectrogram_np_matches_jax(goldens):
  """The numpy pipeline path (mel_spectrogram_np / MelGan.encode_np)
  must track the jax path to float tolerance on every golden case plus
  random audio — the data pipeline and the model otherwise drift."""
  from music_spectrogram_diffusion_tpu.audio import codecs
  rng = np.random.RandomState(5)
  cases = [goldens["audio_segment"],
           rng.randn(16000).astype(np.float32) * 0.3,
           rng.randn(641).astype(np.float32)]
  for audio in cases:
    got = stft_ops.mel_spectrogram_np(
        audio[None], sample_rate=16000, n_fft=1024, hop_length=320,
        win_length=640, n_mel_channels=128, mel_fmin=0.0, mel_fmax=8000.0)
    want = np.asarray(stft_ops.mel_spectrogram(
        jnp.asarray(audio)[None], sample_rate=16000, n_fft=1024,
        hop_length=320, win_length=640, n_mel_channels=128, mel_fmin=0.0,
        mel_fmax=8000.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

  codec = codecs.MelGan()
  audio = rng.randn(2, 32000).astype(np.float32) * 0.2
  np.testing.assert_allclose(codec.encode_np(audio),
                             np.asarray(codec.encode(jnp.asarray(audio))),
                             rtol=1e-4, atol=1e-4)
