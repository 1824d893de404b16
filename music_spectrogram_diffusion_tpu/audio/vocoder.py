"""On-device vocoders: mel spectrogram -> 16 kHz audio.

The reference inverts mels with a TF-Hub SoundStream SavedModel executed
on the HOST (reference audio_codecs.py:249-264) — a device round trip per
song. Here vocoding is a jit-compiled JAX function so the whole synthesis
chain (denoise -> vocode) stays on the TPU:

* `SoundStreamDecoder`: the GAN mel-inverter architecture (Flax), for
  converted or newly-trained weights.
* `GriffinLimVocoder`: weights-free fallback using the mel pseudo-inverse
  + Griffin-Lim phase recovery (ops/stft.py), so the framework produces
  audible output with no checkpoint at all.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from music_spectrogram_diffusion_tpu.ops import stft as stft_ops

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class SoundStreamConfig:
  """SoundStream-style mel decoder (Zeghidour et al. 2021, fig. 4).

  Upsample strides multiply to the codec hop (8*5*4*2 = 320 for MelGAN's
  16 kHz / 50 fps geometry).
  """
  mel_bins: int = 128
  base_channels: int = 512
  strides: Tuple[int, ...] = (8, 5, 4, 2)
  dilations: Tuple[int, ...] = (1, 3, 9)
  kernel_size: int = 7

  @property
  def hop_size(self) -> int:
    return int(np.prod(self.strides))


class ResidualUnit(nn.Module):
  channels: int
  dilation: int
  kernel_size: int = 7

  @nn.compact
  def __call__(self, x: Array) -> Array:
    y = nn.elu(x)
    y = nn.Conv(self.channels, (self.kernel_size,),
                kernel_dilation=(self.dilation,), padding="SAME",
                name="dilated_conv")(y)
    y = nn.elu(y)
    y = nn.Conv(self.channels, (1,), name="pointwise_conv")(y)
    return x + y


class DecoderBlock(nn.Module):
  channels: int
  stride: int
  dilations: Sequence[int]
  kernel_size: int

  @nn.compact
  def __call__(self, x: Array) -> Array:
    x = nn.elu(x)
    x = nn.ConvTranspose(self.channels, (2 * self.stride,),
                         strides=(self.stride,), padding="SAME",
                         name="upsample")(x)
    for i, d in enumerate(self.dilations):
      x = ResidualUnit(self.channels, d, self.kernel_size,
                       name=f"residual_{i}")(x)
    return x


class SoundStreamDecoder(nn.Module):
  """Mel [B, T, mel_bins] -> audio [B, T * hop]."""
  config: SoundStreamConfig = SoundStreamConfig()

  @nn.compact
  def __call__(self, mel: Array) -> Array:
    cfg = self.config
    x = nn.Conv(cfg.base_channels, (cfg.kernel_size,), padding="SAME",
                name="input_conv")(mel)
    channels = cfg.base_channels
    for i, stride in enumerate(cfg.strides):
      channels = max(channels // 2, 32)
      x = DecoderBlock(channels, stride, cfg.dilations, cfg.kernel_size,
                       name=f"block_{i}")(x)
    x = nn.elu(x)
    x = nn.Conv(1, (cfg.kernel_size,), padding="SAME",
                name="output_conv")(x)
    return jnp.tanh(x)[..., 0]


class MagnitudeNet(nn.Module):
  """Trained mel inversion: log-mel [B, T, mel] -> linear STFT magnitude
  [B, T, fft//2+1] at the same frame rate.

  Residual design: the output is the mel pseudo-inverse baseline (the
  same fixed filterbank inversion Griffin-Lim starts from, ~0.10
  spectral convergence on harmonic audio) times a learned bounded
  log-space correction, so training STARTS at pinv quality and can only
  refine it — a raw spectrogram regression head was measured unstable
  (exp output makes peak bins twitchy; linear-space correlation ~0 after
  500 steps). Phase recovery stays Griffin-Lim (HybridGLVocoder).
  Frame-aligned convs are the right inductive bias: magnitude is
  translation-equivariant at hop granularity, unlike sample-level phase.
  """
  hidden: int = 512
  out_bins: int = 513
  kernel_size: int = 5
  mel_bins: int = 128
  sample_rate: int = 16000
  max_log_correction: float = 4.0

  @nn.compact
  def __call__(self, log_mel: Array) -> Array:
    basis = stft_ops.linear_to_mel_matrix(
        num_mel_bins=self.mel_bins,
        num_spectrogram_bins=self.out_bins,
        sample_rate=self.sample_rate,
        lower_edge_hertz=0.0,
        upper_edge_hertz=self.sample_rate / 2)
    base = stft_ops.mel_to_linear(jnp.exp(log_mel), basis)
    x = nn.Conv(self.hidden, (self.kernel_size,), padding="SAME",
                name="conv_in")(log_mel)
    x = nn.elu(x)
    x = nn.Conv(self.hidden, (self.kernel_size,), padding="SAME",
                name="conv_mid")(x)
    x = nn.elu(x)
    x = nn.Conv(self.out_bins, (1,), name="conv_out",
                kernel_init=nn.initializers.zeros)(x)
    # Bounded multiplicative correction in log space: identity at init.
    correction = jnp.exp(self.max_log_correction * jnp.tanh(x))
    return base * correction


class _StagedGriffinLim:
  """Shared staging for the Griffin-Lim vocoders: jitted magnitude
  prediction -> host PGHI phase init -> jitted GL refinement.

  The phase heap integration is inherently sequential host code and the
  axon TPU attachment rejects host callbacks inside jit
  (jax.pure_callback is UNIMPLEMENTED there), so the vocoder manages its
  own jit boundaries instead of being wrapped in one jit by callers —
  the vocoder callables advertise `self_jitting = True` and
  `Synthesizer` / `as_codec_decoder` call them directly.
  """
  self_jitting = True

  def _init_gl(self, stft_params, num_iters, phase_init, momentum=0.0):
    self._params = stft_params
    self._num_iters = num_iters
    self._phase_init = phase_init
    self._gl = jax.jit(functools.partial(
        stft_ops.griffin_lim, num_iters=num_iters, momentum=momentum,
        **stft_params))

  def _gl_with_init(self, magnitude: Array, rng) -> Array:
    if self._phase_init == "pghi":
      init = stft_ops.pghi_phase(
          np.asarray(jax.device_get(magnitude), np.float32),
          **self._params)
      return self._gl(magnitude, init_phase=jnp.asarray(init))
    return self._gl(magnitude, rng=rng)

  def as_codec_decoder(self):
    """(params, features) -> audio adapter for AudioCodec.set_vocoder.

    NOT jit-wrapped: the callable stages its own jits around the host
    phase-init step.
    """
    fn = lambda params, feats: self(feats)  # noqa: E731
    fn.self_jitting = True
    return fn, None


class HybridGLVocoder(_StagedGriffinLim):
  """Trained magnitude (MagnitudeNet) + Griffin-Lim phase recovery.

  Same call contract as GriffinLimVocoder; `num_iters` trades phase
  quality for speed (the trained magnitudes keep spectral metrics ahead
  of the pinv baseline at equal iterations).
  """

  def __init__(self, params, *, n_fft: int = 1024, hop_length: int = 320,
               win_length: int = 640, hidden: int = 512,
               num_iters: int = 32, mel_consistency: bool = True,
               phase_init: str = "pghi", momentum: float = 0.9):
    # momentum default: FGLA extrapolation improves every end-to-end
    # metric of the trained chain on the 16-clip set (SC 0.163->0.158,
    # SNR -4.2->-3.6 dB, results/round4/eval_vocoder_fgla*.json); the
    # weights-free pinv chain keeps classic GL (FGLA's lower-
    # inconsistency fixed point is slightly WORSE in SC when the target
    # magnitude is itself inconsistent pinv output).
    self.hop_length = hop_length
    self._init_gl(dict(frame_length=win_length, frame_step=hop_length,
                       fft_length=n_fft), num_iters, phase_init, momentum)
    self.net = MagnitudeNet(hidden=hidden, out_bins=n_fft // 2 + 1)
    self.params = params
    self._mel_consistency = mel_consistency
    basis = stft_ops.linear_to_mel_matrix(
        num_mel_bins=self.net.mel_bins,
        num_spectrogram_bins=n_fft // 2 + 1,
        sample_rate=self.net.sample_rate,
        lower_edge_hertz=0.0,
        upper_edge_hertz=self.net.sample_rate / 2)
    self._basis = jnp.asarray(basis)
    self._pinv = jnp.asarray(np.linalg.pinv(np.asarray(basis)))
    self._apply = jax.jit(self._predict_magnitude)

  def _predict_magnitude(self, params, log_mel: Array) -> Array:
    magnitude = self.net.apply(params, log_mel)
    if self._mel_consistency:
      # Project back onto the mel-consistency manifold: the pinv baseline
      # is near-exact at mel roundtrip *by construction* (pinv is the
      # least-squares right inverse of the filterbank), and a free-form
      # correction trades that away even as it improves |STFT| accuracy.
      # Adding the pinv-lifted mel residual restores mel(pred) ~= mel
      # while keeping the learned inter-bin detail in the filterbank
      # null space, where mel carries no information anyway.
      residual = jnp.exp(log_mel) - magnitude @ self._basis
      magnitude = jnp.maximum(magnitude + residual @ self._pinv, 0.0)
    return magnitude

  def __call__(self, log_mel: Array, rng=None) -> Array:
    magnitude = self._apply(self.params, jnp.asarray(log_mel))
    return self._gl_with_init(magnitude, rng)


def load_soundstream(npz_path: str,
                     base_channels: int = 512):
  """Converted SoundStream weights (tools/convert_soundstream.py) ->
  a jitted `[B, T, mel] log-mel -> [B, T*hop] audio` callable.

  The npz holds '<module/path>/<leaf>' arrays matching
  SoundStreamDecoder's parameter tree.
  """
  raw = np.load(npz_path)
  params: dict = {}
  for key in raw.files:
    node = params
    parts = key.split("/")
    for part in parts[:-1]:
      node = node.setdefault(part, {})
    node[parts[-1]] = jnp.asarray(raw[key])
  decoder = SoundStreamDecoder(
      config=SoundStreamConfig(base_channels=base_channels))
  apply_fn = jax.jit(decoder.apply)

  def vocode(log_mel: Array, rng=None) -> Array:
    del rng
    return apply_fn({"params": params}, log_mel)

  vocode.self_jitting = True  # apply_fn is already jitted

  def as_codec_decoder():
    """(apply_fn, params) pair for AudioCodec.set_vocoder — the same
    shape GriffinLimVocoder.as_codec_decoder returns, so either plugs
    in as set_vocoder(*voc.as_codec_decoder()). The converted weights
    are closed over; the params slot is unused."""
    return (lambda _params, log_mel: vocode(log_mel)), None

  vocode.as_codec_decoder = as_codec_decoder
  return vocode


def load_trained(model_dir: str, base_channels: int = 512,
                 num_iters: int = 32, phase_init: str = "pghi",
                 momentum: float = 0.9):
  """Trained vocoder checkpoint (cli/train_vocoder.py) -> a jitted
  `[B, T, mel] log-mel -> [B, T*hop] audio` callable.

  `model_dir` is either a step_<N> directory or the training model_dir
  (picks the latest step). The checkpoint's config.json sidecar selects
  the architecture ('soundstream' end-to-end decoder, or 'magnitude_gl'
  = MagnitudeNet + Griffin-Lim phase); checkpoints older than the
  sidecar are SoundStreamDecoder. Mirrors the role of the reference's
  TF-Hub inverter load (reference audio_codecs.py:249-264) for weights
  trained in-repo rather than converted.
  """
  import json as json_lib

  from music_spectrogram_diffusion_tpu.train import checkpoints

  path = model_dir
  if not os.path.basename(os.path.normpath(path)).startswith("step_"):
    latest = checkpoints.latest_checkpoint(model_dir)
    if latest is None:
      raise FileNotFoundError(f"no step_<N> checkpoint under {model_dir}")
    path = latest
  cfg_path = os.path.join(path, "config.json")
  cfg = {}
  if os.path.exists(cfg_path):
    with open(cfg_path) as f:
      cfg = json_lib.load(f)
  # No target: the checkpoint may or may not carry an opt_state
  # (reconstruction vs adversarial training); take params as stored.
  params = checkpoints.restore_checkpoint(path)["params"]

  if cfg.get("arch") == "magnitude_gl":
    return HybridGLVocoder(params, hidden=cfg.get("hidden", 512),
                           num_iters=num_iters, phase_init=phase_init,
                           momentum=momentum)

  decoder = SoundStreamDecoder(
      config=SoundStreamConfig(
          base_channels=cfg.get("base_channels", base_channels)))
  apply_fn = jax.jit(decoder.apply)

  def vocode(log_mel: Array, rng=None) -> Array:
    del rng
    return apply_fn(params, log_mel)

  vocode.self_jitting = True  # apply_fn is already jitted

  def as_codec_decoder():
    """(apply_fn, params) adapter for AudioCodec.set_vocoder (same shape
    as GriffinLimVocoder.as_codec_decoder; weights closed over)."""
    return (lambda _params, log_mel: vocode(log_mel)), None

  vocode.as_codec_decoder = as_codec_decoder
  return vocode


class GriffinLimVocoder(_StagedGriffinLim):
  """Weights-free mel inversion: pinv filterbank + Griffin-Lim phase."""

  def __init__(self, *, sample_rate: int = 16000, n_fft: int = 1024,
               hop_length: int = 320, win_length: int = 640,
               n_mel_channels: int = 128, mel_fmin: float = 0.0,
               num_iters: int = 32, phase_init: str = "pghi",
               momentum: float = 0.0):
    self.hop_length = hop_length
    self._init_gl(dict(frame_length=win_length, frame_step=hop_length,
                       fft_length=n_fft), num_iters, phase_init, momentum)
    mel_basis = stft_ops.linear_to_mel_matrix(
        num_mel_bins=n_mel_channels,
        num_spectrogram_bins=n_fft // 2 + 1,
        sample_rate=sample_rate,
        lower_edge_hertz=mel_fmin,
        upper_edge_hertz=sample_rate // 2)
    self._mag_fn = jax.jit(lambda log_mel: stft_ops.mel_to_linear(
        jnp.exp(log_mel), mel_basis))

  def __call__(self, log_mel: Array, rng=None) -> Array:
    """[B, T, mel] log-mel -> [B, T * hop] audio."""
    magnitude = self._mag_fn(jnp.asarray(log_mel))
    return self._gl_with_init(magnitude, rng)
