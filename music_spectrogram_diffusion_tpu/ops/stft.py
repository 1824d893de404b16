"""JAX STFT + mel filterbank matching tf.signal semantics.

The reference computes features with tf.signal.stft(..., pad_end=True) and
tf.signal.linear_to_mel_weight_matrix inside the tf.data pipeline
(/root/reference/music_spectrogram_diffusion/audio_codecs.py:108-143).
This module reproduces those numerics in pure JAX so featurization runs
jit-compiled on device (and is differentiable, which the TF path is not
from JAX's perspective).

Key tf.signal behaviours reproduced exactly:
  * pad_end=True framing: n_frames = ceil(n_samples / hop); frames that
    overrun are zero-padded on the right.
  * Periodic Hann window of `win_length`, zero-padded to `n_fft` on the
    right before the FFT.
  * HTK mel scale (2595 * log10(1 + f/700)) with triangular weights
    computed on the *bin frequencies excluding DC* (tf drops the first
    spectrogram bin when building the weight matrix).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
  """Periodic Hann window (matches tf.signal.hann_window default)."""
  return (0.5 - 0.5 * np.cos(
      2.0 * np.pi * np.arange(win_length) / win_length)).astype(dtype)


def _hertz_to_mel(f):
  return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def linear_to_mel_matrix(num_mel_bins: int,
                         num_spectrogram_bins: int,
                         sample_rate: float,
                         lower_edge_hertz: float,
                         upper_edge_hertz: float,
                         dtype=np.float32) -> np.ndarray:
  """Mel filterbank identical to tf.signal.linear_to_mel_weight_matrix.

  Returns [num_spectrogram_bins, num_mel_bins]; the DC row is all zeros.
  """
  nyquist = sample_rate / 2.0
  freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)[1:]  # drop DC
  spectrogram_mels = _hertz_to_mel(freqs)[:, None]

  edges = np.linspace(_hertz_to_mel(lower_edge_hertz),
                      _hertz_to_mel(upper_edge_hertz),
                      num_mel_bins + 2)
  lower = edges[:-2][None, :]
  center = edges[1:-1][None, :]
  upper = edges[2:][None, :]

  lower_slopes = (spectrogram_mels - lower) / (center - lower)
  upper_slopes = (upper - spectrogram_mels) / (upper - center)
  weights = np.maximum(0.0, np.minimum(lower_slopes, upper_slopes))
  # Re-add the DC row of zeros.
  return np.pad(weights, [[1, 0], [0, 0]]).astype(dtype)


def frame_signal(audio: Array, frame_length: int, frame_step: int,
                 pad_end: bool = True) -> Array:
  """Slice audio [..., n] into frames [..., n_frames, frame_length]."""
  n = audio.shape[-1]
  if pad_end:
    n_frames = -(-n // frame_step)  # ceil
    pad = max(0, (n_frames - 1) * frame_step + frame_length - n)
    audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])
  else:
    n_frames = max(0, (n - frame_length) // frame_step + 1)
  idx = (np.arange(frame_length)[None, :] +
         frame_step * np.arange(n_frames)[:, None])
  return audio[..., idx]


@functools.partial(jax.jit, static_argnames=(
    "frame_length", "frame_step", "fft_length", "pad_end"))
def stft_magnitude(audio: Array, *, frame_length: int, frame_step: int,
                   fft_length: int, pad_end: bool = True) -> Array:
  """|STFT| with a periodic Hann window, [..., n_frames, fft//2+1]."""
  frames = frame_signal(audio, frame_length, frame_step, pad_end=pad_end)
  window = jnp.asarray(hann_window(frame_length))
  frames = frames * window
  if fft_length > frame_length:
    frames = jnp.pad(
        frames,
        [(0, 0)] * (frames.ndim - 1) + [(0, fft_length - frame_length)])
  return jnp.abs(jnp.fft.rfft(frames, n=fft_length, axis=-1))


def _overlap_add(frames: Array, frame_step: int) -> Array:
  """Overlap-add [..., n_frames, frame_length] -> [..., total].

  Fast path (frame_length % frame_step == 0, e.g. 640/320): each frame
  splits into k hop-sized pieces and OLA becomes k shifted adds — no
  scatter, fully vectorized on the VPU. Falls back to scatter-add for
  irregular geometries.
  """
  *batch, n_frames, frame_length = frames.shape
  total = (n_frames - 1) * frame_step + frame_length
  if frame_length % frame_step == 0:
    k = frame_length // frame_step
    pieces = frames.reshape(tuple(batch) + (n_frames, k, frame_step))
    out = jnp.zeros(tuple(batch) + (n_frames + k - 1, frame_step),
                    frames.dtype)
    for j in range(k):
      pad = [(0, 0)] * len(batch) + [(j, k - 1 - j), (0, 0)]
      out = out + jnp.pad(pieces[..., :, j, :], pad)
    return out.reshape(tuple(batch) + (-1,))[..., :total]
  idx = (np.arange(frame_length)[None, :] +
         frame_step * np.arange(n_frames)[:, None]).reshape(-1)
  flat = frames.reshape(tuple(batch) + (-1,))
  out = jnp.zeros(tuple(batch) + (total,), flat.dtype)
  return out.at[..., idx].add(flat)


def istft(stft_matrix: Array, *, frame_length: int, frame_step: int,
          fft_length: int, num_samples: int) -> Array:
  """Inverse STFT with Hann synthesis window + overlap-add (jit-able)."""
  frames = jnp.fft.irfft(stft_matrix, n=fft_length, axis=-1)
  frames = frames[..., :frame_length]
  window = jnp.asarray(hann_window(frame_length))
  frames = frames * window

  n_frames = frames.shape[-2]
  out = _overlap_add(frames, frame_step)

  # Window-envelope normalization.
  env_frames = jnp.broadcast_to(window * window, (n_frames, frame_length))
  env = _overlap_add(env_frames, frame_step)
  out = out / jnp.maximum(env, 1e-8)
  return out[..., :num_samples]


# PGHI phase-gradient constants for the Hann window, empirically
# validated against this module's exact STFT convention (window aligned
# to the frame START, phase per-frame): on harmonic+chirp probes the
# reconstruction quality is flat within a few percent across c_t in
# [0.8x, 1.2x] of these values, and PGHI+GL8 beats zero-init GL64.
_PGHI_HANN_GAMMA = 0.25645  # Hann window time-frequency ratio / W^2


def _pghi_gradients(log_mag: np.ndarray, frame_length: int,
                    frame_step: int, fft_length: int):
  """Phase-gradient estimates from log|STFT| (vectorized numpy).

  tgrad (rad/hop) pairs the log-magnitude FREQUENCY derivative with the
  per-frame linear phase advance 2*pi*a*m/M of this STFT convention;
  fgrad (rad/bin) pairs the TIME derivative with the window group delay
  -2*pi*(W/2)/M (Hann centered mid-frame). Gaussian-equivalence
  constants: c_t = pi^2 * gamma / (a*M), c_f = -1/c_t.
  """
  gamma = _PGHI_HANN_GAMMA * frame_length * frame_length
  c_t = np.pi ** 2 * gamma / (frame_step * fft_length)
  n_bins = log_mag.shape[-1]
  dldm = np.zeros_like(log_mag)
  dldm[..., 1:-1] = (log_mag[..., 2:] - log_mag[..., :-2]) / 2
  dldn = np.zeros_like(log_mag)
  dldn[..., 1:-1, :] = (log_mag[..., 2:, :] - log_mag[..., :-2, :]) / 2
  m = np.arange(n_bins, dtype=log_mag.dtype)
  tgrad = c_t * dldm + 2 * np.pi * frame_step * m / fft_length
  fgrad = (-1.0 / c_t) * dldn - 2 * np.pi * (frame_length / 2) / fft_length
  return tgrad.astype(np.float32), fgrad.astype(np.float32)


def _pghi_heap_py(S: np.ndarray, tgrad: np.ndarray, fgrad: np.ndarray,
                  tol: float) -> np.ndarray:
  """Pure-Python heap integration (fallback when the C extension is
  unavailable); same algorithm as native pghi_heap."""
  import heapq
  n, nb = S.shape
  phase = np.zeros_like(S)
  done = S <= tol * S.max()
  order = np.argsort(S, axis=None)[::-1]
  seed_pos = 0
  flat_done = done.reshape(-1)
  heap = []
  while True:
    while seed_pos < order.size and flat_done[order[seed_pos]]:
      seed_pos += 1
    if seed_pos >= order.size:
      break
    si, sj = divmod(int(order[seed_pos]), nb)
    flat_done[order[seed_pos]] = True
    heapq.heappush(heap, (-S[si, sj], si, sj))
    while heap:
      _, i, j = heapq.heappop(heap)
      for di, dj, grad, sign in ((1, 0, tgrad, 1), (-1, 0, tgrad, -1),
                                 (0, 1, fgrad, 1), (0, -1, fgrad, -1)):
        ni, nj = i + di, j + dj
        if 0 <= ni < n and 0 <= nj < nb and not done[ni, nj]:
          phase[ni, nj] = phase[i, j] + sign * 0.5 * (
              grad[i, j] + grad[ni, nj])
          done[ni, nj] = True
          flat_done[ni * nb + nj] = True
          heapq.heappush(heap, (-S[ni, nj], ni, nj))
  return phase


def pghi_phase(magnitude, *, frame_length: int, frame_step: int,
               fft_length: int, tol: float = 1e-6) -> np.ndarray:
  """Phase Gradient Heap Integration (Prusa et al. 2017) on the host.

  [..., n_frames, n_bins] |STFT| -> phase angles of the same shape.
  Non-iterative phase reconstruction: integrate the phase gradients
  (estimated from the log magnitude via the Gaussian-window identities)
  outward from the largest-magnitude bins. Used as the INITIALIZER for
  `griffin_lim` — PGHI + 8 GL iterations reconstructs better than 64
  zero-init iterations on harmonic material (the reference's shipped
  audio comes from a trained GAN vocoder, audio_codecs.py:249-264; this
  narrows that gap with no weights at all). The sequential heap runs in
  the C extension when available (native/msd_native.cc pghi_heap).
  """
  from music_spectrogram_diffusion_tpu import native

  S = np.asarray(magnitude, np.float32)
  batch_shape = S.shape[:-2]
  S2 = S.reshape((-1,) + S.shape[-2:])
  log_mag = np.log(np.maximum(S2, 1e-12))
  tgrad, fgrad = _pghi_gradients(log_mag, frame_length, frame_step,
                                 fft_length)
  mod = native.get()
  out = np.empty_like(S2)
  for b in range(S2.shape[0]):
    n, nb = S2.shape[-2:]
    if mod is not None and hasattr(mod, "pghi_heap"):
      sb = np.ascontiguousarray(S2[b])
      raw = mod.pghi_heap(sb.tobytes(), tgrad[b].tobytes(),
                          fgrad[b].tobytes(), n, nb, float(tol))
      out[b] = np.frombuffer(raw, np.float32).reshape(n, nb)
    else:
      out[b] = _pghi_heap_py(S2[b], tgrad[b], fgrad[b], tol)
  return out.reshape(batch_shape + S.shape[-2:])


def griffin_lim(magnitude: Array, *, frame_length: int, frame_step: int,
                fft_length: int, num_iters: int = 32,
                rng: Optional[Array] = None,
                init_phase: Optional[Array] = None,
                momentum: float = 0.0) -> Array:
  """Griffin-Lim phase reconstruction from |STFT| (fully on device).

  Used as the weights-free fallback vocoder path: mel -> approximate
  linear magnitude -> GL -> audio. Each iteration is one iSTFT + STFT
  round trip inside a lax.scan. `init_phase` (e.g. from `pghi_phase`)
  overrides the zero/random start; PGHI init reaches a given quality in
  ~8x fewer iterations.

  `momentum` > 0 selects the fast Griffin-Lim accelerated update (FGLA,
  Perraudin et al. 2013): the next iterate extrapolates along the last
  projection step, c_{n+1} = t_n + momentum * (t_n - t_{n-1}), which
  converges to a lower-inconsistency fixed point at the same per-
  iteration cost. 0 recovers the classic alternating projections.
  """
  n_frames = magnitude.shape[-2]
  num_samples = n_frames * frame_step

  if init_phase is not None:
    angles = jnp.asarray(init_phase)
  elif rng is not None:
    angles = jax.random.uniform(
        rng, magnitude.shape, minval=-np.pi, maxval=np.pi)
  else:
    angles = jnp.zeros(magnitude.shape)
  stft_c = magnitude * jnp.exp(1j * angles.astype(jnp.complex64))

  def project(stft_c):
    """One alternating-projection step: consistency, then magnitude."""
    audio = istft(stft_c, frame_length=frame_length,
                  frame_step=frame_step, fft_length=fft_length,
                  num_samples=num_samples)
    frames = frame_signal(audio, frame_length, frame_step, pad_end=True)
    frames = frames * jnp.asarray(hann_window(frame_length))
    reconstructed = jnp.fft.rfft(frames, n=fft_length, axis=-1)
    phase = reconstructed / jnp.maximum(jnp.abs(reconstructed), 1e-8)
    return magnitude * phase

  if momentum:
    def body(carry, _):
      c, t_prev = carry
      t = project(c)
      return (t + momentum * (t - t_prev), t), None

    (_, stft_c), _ = jax.lax.scan(
        body, (stft_c, stft_c), None, length=num_iters)
  else:
    def body(stft_c, _):
      return project(stft_c), None

    stft_c, _ = jax.lax.scan(body, stft_c, None, length=num_iters)
  return istft(stft_c, frame_length=frame_length, frame_step=frame_step,
               fft_length=fft_length, num_samples=num_samples)


def mel_to_linear(mel: Array, mel_basis: Array) -> Array:
  """Approximate |STFT| from mel via the filterbank pseudo-inverse."""
  pinv = jnp.asarray(np.linalg.pinv(np.asarray(mel_basis)))
  return jnp.maximum(mel @ pinv, 0.0)


def mel_spectrogram_np(audio: np.ndarray,
                       *,
                       sample_rate: int = 16000,
                       n_fft: int = 1024,
                       hop_length: int = 160,
                       win_length: int = 400,
                       n_mel_channels: Optional[int] = 64,
                       drop_dc: bool = True,
                       mel_fmin: float = 60.0,
                       mel_fmax: Optional[float] = 7800.0,
                       clip_value_min: float = 1e-5,
                       clip_value_max: float = 1e8,
                       log_amplitude: bool = True) -> np.ndarray:
  """Pure-numpy mirror of mel_spectrogram (same math, same constants).

  The HOST-side data pipeline must not dispatch per-example jax calls —
  on the live TPU platform each one is a tunnel round trip serialized
  against training, and even on CPU the dispatch overhead dominates the
  FFT (measured: the pipeline fed 15 ex/s through the jitted path vs
  the chip's ~24 seqs/s consumption). numpy releases the GIL in rfft/
  matmul, so the thread-parallel pipeline scales too. Parity with the
  jax version is pinned by tests/test_stft_goldens.py.
  """
  if mel_fmax is None:
    mel_fmax = sample_rate // 2
  audio = np.asarray(audio, np.float32)
  n = audio.shape[-1]
  n_frames = -(-n // hop_length)  # ceil (tf.signal pad_end)
  pad = max(0, (n_frames - 1) * hop_length + win_length - n)
  audio = np.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])
  idx = (np.arange(win_length)[None, :] +
         hop_length * np.arange(n_frames)[:, None])
  frames = audio[..., idx] * hann_window(win_length)
  mag = np.abs(np.fft.rfft(frames, n=n_fft, axis=-1))
  if n_mel_channels is not None:
    basis = linear_to_mel_matrix(
        num_mel_bins=n_mel_channels,
        num_spectrogram_bins=n_fft // 2 + 1,
        sample_rate=sample_rate,
        lower_edge_hertz=mel_fmin,
        upper_edge_hertz=mel_fmax)
    out = mag @ basis
  else:
    out = mag[..., 1:] if drop_dc else mag
  if log_amplitude:
    out = np.log(np.clip(out, clip_value_min, clip_value_max))
  return out.astype(np.float32)


def mel_spectrogram(audio: Array,
                    *,
                    sample_rate: int = 16000,
                    n_fft: int = 1024,
                    hop_length: int = 160,
                    win_length: int = 400,
                    n_mel_channels: Optional[int] = 64,
                    drop_dc: bool = True,
                    mel_fmin: float = 60.0,
                    mel_fmax: Optional[float] = 7800.0,
                    clip_value_min: float = 1e-5,
                    clip_value_max: float = 1e8,
                    log_amplitude: bool = True) -> Array:
  """Log-mel spectrogram of [batch, n_samples] -> [batch, frames, mels].

  Defaults and semantics track the reference Audio2Mel frontend
  (audio_codecs.py:43-143).
  """
  if mel_fmax is None:
    mel_fmax = sample_rate // 2
  mag = stft_magnitude(audio, frame_length=win_length, frame_step=hop_length,
                       fft_length=n_fft, pad_end=True)
  if n_mel_channels is not None:
    basis = jnp.asarray(linear_to_mel_matrix(
        num_mel_bins=n_mel_channels,
        num_spectrogram_bins=n_fft // 2 + 1,
        sample_rate=sample_rate,
        lower_edge_hertz=mel_fmin,
        upper_edge_hertz=mel_fmax))
    out = mag @ basis
  else:
    out = mag[..., 1:] if drop_dc else mag
  if log_amplitude:
    out = jnp.log(jnp.clip(out, clip_value_min, clip_value_max))
  return out
