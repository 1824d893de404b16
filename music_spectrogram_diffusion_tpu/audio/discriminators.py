"""GAN discriminators for vocoder training (SoundStream/MelGAN style).

Two ensembles, as in SoundStream (Zeghidour et al. 2021):
  * multi-scale waveform discriminators at 1x/2x/4x downsampling
    (MelGAN-style grouped strided convs),
  * an STFT discriminator over the complex spectrogram.
Hinge adversarial losses + feature matching, used by
audio/vocoder_train.AdversarialVocoderTrainer.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class WaveDiscriminator(nn.Module):
  """Single-scale MelGAN discriminator over raw waveform [B, T]."""
  base_channels: int = 16
  max_channels: int = 512

  @nn.compact
  def __call__(self, audio: Array) -> Tuple[Array, List[Array]]:
    x = audio[..., None]  # [B, T, 1]
    features = []
    x = nn.Conv(self.base_channels, (15,), padding="SAME")(x)
    x = nn.leaky_relu(x, 0.2)
    features.append(x)
    channels = self.base_channels
    for _ in range(4):
      out_ch = min(channels * 4, self.max_channels)
      groups = max(out_ch // 16, 1)
      x = nn.Conv(out_ch, (41,), strides=(4,), padding="SAME",
                  feature_group_count=groups)(x)
      x = nn.leaky_relu(x, 0.2)
      features.append(x)
      channels = out_ch
    x = nn.Conv(min(channels, self.max_channels), (5,), padding="SAME")(x)
    x = nn.leaky_relu(x, 0.2)
    features.append(x)
    logits = nn.Conv(1, (3,), padding="SAME")(x)[..., 0]
    return logits, features


class MultiScaleWaveDiscriminator(nn.Module):
  """Discriminators at 1x/2x/4x average-pooled scales."""
  num_scales: int = 3

  @nn.compact
  def __call__(self, audio: Array):
    outputs = []
    x = audio
    for i in range(self.num_scales):
      logits, feats = WaveDiscriminator(name=f"scale_{i}")(x)
      outputs.append((logits, feats))
      if i + 1 < self.num_scales:
        x = nn.avg_pool(x[..., None], (4,), strides=(2,),
                        padding="SAME")[..., 0]
    return outputs


class STFTDiscriminator(nn.Module):
  """2D-conv discriminator over the STFT (real/imag as channels)."""
  n_fft: int = 1024
  hop: int = 256
  channels: Sequence[int] = (32, 64, 128, 256)

  @nn.compact
  def __call__(self, audio: Array):
    from music_spectrogram_diffusion_tpu.ops import stft as stft_ops
    frames = stft_ops.frame_signal(audio, self.n_fft, self.hop, True)
    window = jnp.asarray(stft_ops.hann_window(self.n_fft))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    x = jnp.stack([spec.real, spec.imag], axis=-1)  # [B, T, F, 2]
    features = []
    for i, ch in enumerate(self.channels):
      x = nn.Conv(ch, (3, 3), strides=(1, 2) if i else (1, 1),
                  padding="SAME")(x)
      x = nn.leaky_relu(x, 0.2)
      features.append(x)
    logits = nn.Conv(1, (3, 3), padding="SAME")(x)[..., 0]
    return [(logits.reshape(logits.shape[0], -1), features)]


class VocoderDiscriminators(nn.Module):
  """The full ensemble used for adversarial vocoder training."""

  @nn.compact
  def __call__(self, audio: Array):
    return (MultiScaleWaveDiscriminator(name="waves")(audio) +
            STFTDiscriminator(name="stft")(audio))


def hinge_d_loss(real_outputs, fake_outputs) -> Array:
  """Discriminator hinge loss over the ensemble."""
  loss = 0.0
  for (real_logits, _), (fake_logits, _) in zip(real_outputs,
                                                fake_outputs):
    loss = loss + jnp.mean(nn.relu(1.0 - real_logits))
    loss = loss + jnp.mean(nn.relu(1.0 + fake_logits))
  return loss / len(real_outputs)


def hinge_g_loss(fake_outputs) -> Array:
  """Generator hinge loss."""
  loss = 0.0
  for fake_logits, _ in fake_outputs:
    loss = loss - jnp.mean(fake_logits)
  return loss / len(fake_outputs)


def feature_matching_loss(real_outputs, fake_outputs) -> Array:
  """L1 between discriminator features of real and generated audio."""
  loss = 0.0
  count = 0
  for (_, real_feats), (_, fake_feats) in zip(real_outputs, fake_outputs):
    for rf, ff in zip(real_feats, fake_feats):
      loss = loss + jnp.mean(jnp.abs(rf - ff))
      count += 1
  return loss / max(count, 1)
