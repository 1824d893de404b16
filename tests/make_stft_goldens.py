"""Generate golden vectors for the mel frontend (tests/goldens/stft.npz).

TF is not installable in this environment, so the goldens come from two
independent implementations:

  * torch.stft (center=False, periodic Hann) — an independent FFT/
    framing lineage cross-checking our stft_magnitude, with pad_end
    emulated exactly as tf.signal does (right-pad so every hop yields a
    frame: n_frames = ceil(n / hop)).
  * a literal transcription of the tf.signal.linear_to_mel_weight_matrix
    formula evaluated in float64 (the docstring algorithm: HTK mel scale,
    linear-in-mel triangular bands, zeroed DC row).

The cases cover the MelGAN geometry (win 640, hop 320, fft 1024) at
pad-end edge cases (exact multiple, one-sample-over, shorter-than-one-
window) and the 16-extra-frames slice geometry used by encode_audio
(reference audio_codecs.py:214-218, preprocessors.py:677-692).

Run: python tests/make_stft_goldens.py  (commits tests/goldens/stft.npz)
"""

import os

import numpy as np
import torch


def tf_signal_pad_end(x: np.ndarray, frame_length: int,
                      frame_step: int) -> np.ndarray:
  """Right-pad like tf.signal.frame(pad_end=True)."""
  n = len(x)
  n_frames = -(-n // frame_step)
  pad = max(0, (n_frames - 1) * frame_step + frame_length - n)
  return np.pad(x, (0, pad))


def torch_stft_magnitude(x: np.ndarray, frame_length: int,
                         frame_step: int, fft_length: int) -> np.ndarray:
  padded = tf_signal_pad_end(x, frame_length, frame_step)
  # torch.stft(center=False) frames [0, hop, ...] while the window is
  # zero-padded UP FRONT to n_fft; tf.signal zero-pads frames at the
  # END. Use explicit framing + rfft for exact tf.signal semantics,
  # with torch ops end-to-end (independent of our numpy/jax path).
  t = torch.from_numpy(padded.astype(np.float64))
  frames = t.unfold(0, frame_length, frame_step)
  window = torch.hann_window(frame_length, periodic=True,
                             dtype=torch.float64)
  spec = torch.fft.rfft(frames * window, n=fft_length, dim=-1)
  return spec.abs().numpy()


def hertz_to_mel(f):
  return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def tf_linear_to_mel_weight_matrix(num_mel_bins, num_spectrogram_bins,
                                   sample_rate, lower_edge_hertz,
                                   upper_edge_hertz):
  """Literal float64 transcription of the tf.signal docstring algorithm
  (written against the documented band-edge formulation, independently
  of ops/stft.linear_to_mel_matrix)."""
  bands_to_zero = 1
  nyquist = sample_rate / 2.0
  linear_frequencies = np.linspace(
      0.0, nyquist, num_spectrogram_bins)[bands_to_zero:]
  spectrogram_bins_mel = hertz_to_mel(linear_frequencies)[:, None]

  band_edges_mel = np.linspace(hertz_to_mel(lower_edge_hertz),
                               hertz_to_mel(upper_edge_hertz),
                               num_mel_bins + 2)
  lower_edge_mel = band_edges_mel[0:-2][None, :]
  center_mel = band_edges_mel[1:-1][None, :]
  upper_edge_mel = band_edges_mel[2:][None, :]

  lower_slopes = ((spectrogram_bins_mel - lower_edge_mel) /
                  (center_mel - lower_edge_mel))
  upper_slopes = ((upper_edge_mel - spectrogram_bins_mel) /
                  (upper_edge_mel - center_mel))
  mel_weights = np.maximum(0.0, np.minimum(lower_slopes, upper_slopes))
  return np.pad(mel_weights, [[bands_to_zero, 0], [0, 0]])


def main():
  rng = np.random.RandomState(20260816)
  out = {}

  # MelGAN geometry: win 640, hop 320, fft 1024 (audio_codecs.py:204-218).
  cases = {
      # exact hop multiple (pad fills one window tail)
      "exact": rng.randn(3200).astype(np.float32) * 0.3,
      # one sample over a hop boundary -> extra frame + heavy padding
      "overhang": rng.randn(3201).astype(np.float32) * 0.3,
      # shorter than one window
      "short": rng.randn(500).astype(np.float32) * 0.3,
      # the encode_audio slice geometry: 256-frame segment + 16 extra
      # frames of lookahead samples (reference preprocessors.py:677-692)
      "segment": rng.randn((256 + 16) * 320).astype(np.float32) * 0.3,
  }
  for name, audio in cases.items():
    out[f"audio_{name}"] = audio
    out[f"stft_{name}"] = torch_stft_magnitude(
        audio, 640, 320, 1024).astype(np.float64)

  out["mel_matrix_melgan"] = tf_linear_to_mel_weight_matrix(
      128, 513, 16000.0, 0.0, 8000.0)
  out["mel_matrix_vggish"] = tf_linear_to_mel_weight_matrix(
      64, 257, 16000.0, 125.0, 7500.0)

  path = os.path.join(os.path.dirname(__file__), "goldens", "stft.npz")
  np.savez_compressed(path, **out)
  print(f"wrote {path}: {sorted(out)}")


if __name__ == "__main__":
  main()
