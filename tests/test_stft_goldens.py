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


def test_pghi_beats_zero_init_gl():
  """PGHI-init GL at 8 iters reconstructs better than zero-init at 32.

  Quality floor-raiser for the weights-free vocoder path (the reference
  ships a trained GAN inverter; PGHI narrows the phase gap with no
  weights): spectral convergence of |STFT(reconstruction)| vs the true
  magnitude.
  """
  import jax.numpy as jnp

  from music_spectrogram_diffusion_tpu.ops import stft as stft_ops

  sr, a, w, m = 16000, 320, 640, 1024
  t = np.arange(sr) / sr
  sig = sum(amp * np.sin(2 * np.pi * f0 * t)
            for f0, amp in [(220, .5), (440, .3), (660, .2)])
  sig = (sig * (0.3 + 0.7 * (np.sin(2 * np.pi * 3 * t) > 0))
         ).astype(np.float32)
  mag = stft_ops.stft_magnitude(jnp.asarray(sig), frame_length=w,
                                frame_step=a, fft_length=m)

  def sc(audio):
    m2 = np.asarray(stft_ops.stft_magnitude(
        audio, frame_length=w, frame_step=a, fft_length=m))
    k = min(len(mag), len(m2))
    ref = np.asarray(mag)
    return (np.linalg.norm(ref[:k] - m2[:k]) / np.linalg.norm(ref[:k]))

  kw = dict(frame_length=w, frame_step=a, fft_length=m)
  zero32 = sc(stft_ops.griffin_lim(mag, num_iters=32, **kw))
  init = stft_ops.pghi_phase(np.asarray(mag), **kw)
  pghi0 = sc(stft_ops.griffin_lim(mag, num_iters=0, init_phase=init, **kw))
  pghi8 = sc(stft_ops.griffin_lim(mag, num_iters=8, init_phase=init, **kw))
  assert pghi0 < zero32 * 1.5          # even 0 iters is competitive
  assert pghi8 < zero32 * 0.6          # 8 iters clearly beats 32
  assert pghi8 < 0.1


def test_pghi_native_matches_python():
  """The C heap integration must match the Python fallback exactly."""
  from music_spectrogram_diffusion_tpu import native
  from music_spectrogram_diffusion_tpu.ops import stft as stft_ops

  mod = native.get()
  if mod is None or not hasattr(mod, "pghi_heap"):
    import pytest
    pytest.skip("native extension unavailable")
  rng = np.random.RandomState(0)
  S = np.abs(rng.randn(20, 33)).astype(np.float32)
  S[5:8, 10:14] *= 20  # a dominant region
  S[15, 5] = 0.0
  log_mag = np.log(np.maximum(S, 1e-12))
  tgrad, fgrad = stft_ops._pghi_gradients(log_mag, 640, 320, 1024)
  py = stft_ops._pghi_heap_py(S, tgrad, fgrad, 1e-6)
  raw = mod.pghi_heap(np.ascontiguousarray(S).tobytes(), tgrad.tobytes(),
                      fgrad.tobytes(), S.shape[0], S.shape[1], 1e-6)
  cc = np.frombuffer(raw, np.float32).reshape(S.shape)
  np.testing.assert_allclose(cc, py, rtol=1e-5, atol=1e-5)


def test_fgla_momentum_beats_classic_gl():
  """Fast Griffin-Lim (FGLA extrapolation) beats classic alternating
  projections at equal iterations, and stacks with the PGHI init.

  Same probe signal as the PGHI test; spectral convergence of the
  reconstruction vs the true magnitude.
  """
  import jax.numpy as jnp

  from music_spectrogram_diffusion_tpu.ops import stft as stft_ops

  sr, a, w, m = 16000, 320, 640, 1024
  t = np.arange(sr) / sr
  sig = sum(amp * np.sin(2 * np.pi * f0 * t)
            for f0, amp in [(220, .5), (440, .3), (660, .2)])
  sig = (sig * (0.3 + 0.7 * (np.sin(2 * np.pi * 3 * t) > 0))
         ).astype(np.float32)
  mag = stft_ops.stft_magnitude(jnp.asarray(sig), frame_length=w,
                                frame_step=a, fft_length=m)

  def sc(audio):
    m2 = np.asarray(stft_ops.stft_magnitude(
        audio, frame_length=w, frame_step=a, fft_length=m))
    k = min(len(mag), len(m2))
    ref = np.asarray(mag)
    return (np.linalg.norm(ref[:k] - m2[:k]) / np.linalg.norm(ref[:k]))

  kw = dict(frame_length=w, frame_step=a, fft_length=m)
  init = stft_ops.pghi_phase(np.asarray(mag), **kw)
  classic = sc(stft_ops.griffin_lim(mag, num_iters=32, init_phase=init,
                                    **kw))
  fgla = sc(stft_ops.griffin_lim(mag, num_iters=32, init_phase=init,
                                 momentum=0.99, **kw))
  # momentum=0 must be bit-identical to the classic code path.
  classic2 = sc(stft_ops.griffin_lim(mag, num_iters=32, init_phase=init,
                                     momentum=0.0, **kw))
  assert classic2 == classic
  assert fgla < classic


def test_pghi_gradient_constants_golden():
  """Pin the Hann-gamma-derived PGHI constants at MelGAN geometry.

  The behavioural tests above tolerate a mistuned c_t (reconstruction
  degrades gradually); this golden catches any silent change to
  _PGHI_HANN_GAMMA or to the gradient formulas (VERDICT round-4 #8b).
  Values: c_t = pi^2 * gamma / (a*M) with gamma = 0.25645 * W^2 at
  W=640, a=320, M=1024; linear terms are the per-frame phase advance
  2*pi*a*m/M and the Hann group delay -2*pi*(W/2)/M.
  """
  from music_spectrogram_diffusion_tpu.ops import stft as stft_ops

  gamma = stft_ops._PGHI_HANN_GAMMA * 640 * 640
  c_t = np.pi ** 2 * gamma / (320 * 1024)
  assert abs(c_t - 3.1638250608) < 1e-6
  assert abs((-1.0 / c_t) - (-0.3160731016)) < 1e-6

  # Log-mag ramp probe: interior tgrad = c_t * d(logmag)/dm + linear
  # phase advance; interior fgrad = -1/c_t * d(logmag)/dn + group delay.
  lm = (0.1 * np.arange(6)[:, None]
        + 0.01 * np.arange(5)[None, :]).astype(np.float32)[None]
  tgrad, fgrad = stft_ops._pghi_gradients(lm, 640, 320, 1024)
  np.testing.assert_allclose(
      tgrad[0, 2, :],
      [0.0, 1.9951336, 3.9586291, 5.9221244, 7.8539815], rtol=1e-5)
  np.testing.assert_allclose(
      fgrad[0, :, 2],
      [-1.9634954, -1.9951026, -1.9951026, -1.9951026, -1.9951026,
       -1.9634954], rtol=1e-5)
