"""Audio codecs: mel-feature encode + (on-device) decode back to audio.

Mirrors the reference codec API
(/root/reference/music_spectrogram_diffusion/audio_codecs.py:146-264) but
with the encode path in pure JAX (ops/stft.py) so featurization jits onto
the TPU, and the decode path served by the Flax vocoder in
audio/vocoder.py instead of a host-side TF-Hub SavedModel call.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from music_spectrogram_diffusion_tpu.ops import stft

Array = jnp.ndarray


class AudioCodec:
  """Base codec: feature <-> network-range scaling plus encode/decode."""

  name: str
  n_dims: int
  sample_rate: int
  hop_size: int
  min_value: float
  max_value: float
  pad_value: float
  # Extra STFT frames computed then sliced off during encoding, to keep the
  # final frames numerically clean (see MelGan below).
  additional_frames_for_encoding: int = 0

  @property
  def abbrev_str(self) -> str:
    return self.name

  @property
  def frame_rate(self) -> int:
    return int(self.sample_rate // self.hop_size)

  def scale_features(self, features: Array,
                     output_range: Tuple[float, float] = (-1.0, 1.0),
                     clip: bool = False) -> Array:
    """Linearly map [min_value, max_value] -> output_range."""
    min_out, max_out = output_range
    if clip:
      features = jnp.clip(features, self.min_value, self.max_value)
    zero_one = (features - self.min_value) / (self.max_value - self.min_value)
    return zero_one * (max_out - min_out) + min_out

  def scale_to_features(self, outputs: Array,
                        input_range: Tuple[float, float] = (-1.0, 1.0),
                        clip: bool = False) -> Array:
    """Inverse of scale_features."""
    min_out, max_out = input_range
    if clip:
      outputs = jnp.clip(outputs, min_out, max_out)
    zero_one = (outputs - min_out) / (max_out - min_out)
    return zero_one * (self.max_value - self.min_value) + self.min_value

  def encode(self, audio: Array) -> Array:
    raise NotImplementedError

  def encode_np(self, audio) -> "np.ndarray":
    """Host-side (numpy) encode for the data pipeline.

    The pipeline must not issue per-example jax dispatches (on the live
    TPU platform each is a tunnel round trip serialized with training);
    codecs with a jax-only encode inherit this slow fallback."""
    import numpy as np
    return np.asarray(self.encode(audio))

  def decode(self, features: Array) -> Array:
    raise NotImplementedError

  def to_images(self, features: Array) -> Array:
    assert features.ndim == 3
    return self.scale_features(features, output_range=(0.0, 1.0))

  @property
  def context_codec(self) -> "AudioCodec":
    return self


class MelGan(AudioCodec):
  """128-bin log-mel at 16 kHz / hop 320 (50 frames/s), GAN-invertible.

  Constants match the reference MelGAN codec (audio_codecs.py:204-247);
  min/max/pad values are tied to how the SoundStream mel inverter was
  trained and must not drift.
  """

  name = "melgan"
  n_dims = 128
  sample_rate = 16000
  hop_size = 320
  min_value = float(np.log(1e-5))
  max_value = 4.0
  pad_value = float(np.log(1e-5))
  # 16 extra frames: the tail frames of a pad_end STFT see zero-padding and
  # produce subtly-wrong mel values that pop audibly after GAN inversion,
  # so encode 16 frames past the end and slice them off.
  additional_frames_for_encoding = 16

  def __init__(self, decode_dither_amount: float = 0.0,
               vocoder_apply_fn=None, vocoder_params=None):
    self._frame_length = 640
    self._fft_size = 1024
    self._lo_hz = 0.0
    self._decode_dither_amount = decode_dither_amount
    # Injected by infer/ once a vocoder checkpoint is loaded.
    self._vocoder_apply_fn = vocoder_apply_fn
    self._vocoder_params = vocoder_params

  def encode(self, audio: Array) -> Array:
    """[batch, n_samples] -> [batch, n_samples // hop_size, 128] log-mel."""
    if audio.shape[0] == 0:
      return jnp.zeros((0, self.n_dims), dtype=jnp.float32)
    return stft.mel_spectrogram(
        audio,
        sample_rate=self.sample_rate,
        n_fft=self._fft_size,
        hop_length=self.hop_size,
        win_length=self._frame_length,
        n_mel_channels=self.n_dims,
        drop_dc=True,
        mel_fmin=self._lo_hz,
        mel_fmax=int(self.sample_rate // 2))

  def encode_np(self, audio) -> "np.ndarray":
    """numpy mirror of encode() for the host-side pipeline (same math;
    parity pinned by tests/test_stft_goldens.py)."""
    import numpy as np
    audio = np.asarray(audio, np.float32)
    if audio.shape[0] == 0:
      return np.zeros((0, self.n_dims), dtype=np.float32)
    return stft.mel_spectrogram_np(
        audio,
        sample_rate=self.sample_rate,
        n_fft=self._fft_size,
        hop_length=self.hop_size,
        win_length=self._frame_length,
        n_mel_channels=self.n_dims,
        drop_dc=True,
        mel_fmin=self._lo_hz,
        mel_fmax=int(self.sample_rate // 2))

  def set_vocoder(self, apply_fn, params) -> None:
    self._vocoder_apply_fn = apply_fn
    self._vocoder_params = params

  def decode(self, features: Array, rng=None) -> Array:
    """[batch, n_frames, 128] -> [batch, n_frames * hop_size] audio."""
    if self._vocoder_apply_fn is None:
      raise ValueError(
          "No vocoder attached; call "
          "set_vocoder(*voc.as_codec_decoder()) with voc from "
          "vocoder.load_soundstream(path) (converted weights) or "
          "vocoder.GriffinLimVocoder() (weights-free).")
    if self._decode_dither_amount > 0:
      if rng is None:
        raise ValueError("decode dither requires an rng key")
      import jax
      features = features + jax.random.normal(
          rng, features.shape) * self._decode_dither_amount
    return self._vocoder_apply_fn(self._vocoder_params, features)


_CODEC_REGISTRY = {
    "melgan": MelGan,
}


def get_codec(name: str, **kwargs) -> AudioCodec:
  if name not in _CODEC_REGISTRY:
    raise ValueError(
        f"Unknown codec {name!r}; have {sorted(_CODEC_REGISTRY)}")
  return _CODEC_REGISTRY[name](**kwargs)
