"""Vocoder training: mel -> audio with multi-resolution spectral losses.

The reference consumes a frozen TF-Hub SoundStream inverter and cannot
train one. This module trains audio/vocoder.SoundStreamDecoder from
(audio, mel) pairs with the standard neural-vocoder reconstruction
objective (multi-resolution STFT loss: spectral convergence + log-mag L1,
plus waveform L1). Adversarial fine-tuning (the GAN half of SoundStream)
can be layered on top; reconstruction-only training already yields a
usable inverter.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from music_spectrogram_diffusion_tpu.audio import codecs
from music_spectrogram_diffusion_tpu.audio import vocoder as vocoder_lib
from music_spectrogram_diffusion_tpu.ops import stft as stft_ops

Array = jnp.ndarray

# (fft_length, hop, win) triples for the multi-resolution loss.
DEFAULT_RESOLUTIONS: Tuple[Tuple[int, int, int], ...] = (
    (2048, 512, 1200), (1024, 256, 600), (512, 128, 240),
)


def stft_loss(pred: Array, target: Array,
              resolutions=DEFAULT_RESOLUTIONS) -> Dict[str, Array]:
  """Multi-resolution STFT loss (Yamamoto et al. 2020)."""
  sc_total = 0.0
  mag_total = 0.0
  for n_fft, hop, win in resolutions:
    p = stft_ops.stft_magnitude(pred, frame_length=win, frame_step=hop,
                                fft_length=n_fft)
    t = stft_ops.stft_magnitude(target, frame_length=win, frame_step=hop,
                                fft_length=n_fft)
    sc = jnp.linalg.norm(t - p) / jnp.maximum(jnp.linalg.norm(t), 1e-6)
    mag = jnp.mean(jnp.abs(jnp.log(jnp.maximum(t, 1e-5)) -
                           jnp.log(jnp.maximum(p, 1e-5))))
    sc_total = sc_total + sc
    mag_total = mag_total + mag
  n = len(resolutions)
  return {"spectral_convergence": sc_total / n,
          "log_magnitude": mag_total / n}


@flax.struct.dataclass
class VocoderTrainState:
  step: Array
  params: flax.core.FrozenDict
  opt_state: optax.OptState


@dataclasses.dataclass
class VocoderTrainer:
  """Reconstruction trainer for the SoundStream-style mel inverter."""
  decoder: vocoder_lib.SoundStreamDecoder
  audio_codec: codecs.AudioCodec
  learning_rate: float = 1e-4
  waveform_weight: float = 10.0

  def __post_init__(self):
    self.optimizer = optax.adamw(self.learning_rate)
    self._step_fn = None

  def create_state(self, rng: jax.Array, mel_frames: int = 64
                   ) -> VocoderTrainState:
    mel = jnp.zeros((1, mel_frames, self.audio_codec.n_dims))
    params = self.decoder.init(rng, mel)
    return VocoderTrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=self.optimizer.init(params))

  def loss_fn(self, params, mel: Array, audio: Array
              ) -> Tuple[Array, Dict[str, Array]]:
    pred = self.decoder.apply(params, mel)
    n = min(pred.shape[-1], audio.shape[-1])
    pred, audio = pred[..., :n], audio[..., :n]
    losses = stft_loss(pred, audio)
    wav_l1 = jnp.mean(jnp.abs(pred - audio))
    total = (losses["spectral_convergence"] + losses["log_magnitude"] +
             self.waveform_weight * wav_l1)
    metrics = dict(losses)
    metrics["waveform_l1"] = wav_l1
    metrics["loss"] = total
    return total, metrics

  def train_step(self, state: VocoderTrainState, mel: Array,
                 audio: Array) -> Tuple[VocoderTrainState, Dict]:
    if self._step_fn is None:
      def step(state, mel, audio):
        (_, metrics), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True)(state.params, mel, audio)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return VocoderTrainState(
            step=state.step + 1, params=params,
            opt_state=opt_state), metrics
      self._step_fn = jax.jit(step, donate_argnums=(0,))
    return self._step_fn(state, mel, audio)

  def as_codec_decoder(self, state: VocoderTrainState):
    """(apply_fn, params) pair for AudioCodec.set_vocoder."""
    fn = jax.jit(lambda params, feats: self.decoder.apply(params, feats))
    return fn, state.params


@dataclasses.dataclass
class MagnitudeTrainer:
  """Trainer for the MagnitudeNet mel-inversion (HybridGLVocoder).

  Supervised per-frame regression: the target linear STFT magnitude is
  computed from the paired audio with the SAME frame geometry Griffin-Lim
  inverts (640/320/1024), so train and inference operate on identical
  frames. Loss = spectral convergence + log-magnitude L1 on the
  PREDICTED magnitudes directly (no audio reconstruction in the loop —
  phase recovery is not trained)."""
  net: "vocoder_lib.MagnitudeNet"
  audio_codec: codecs.AudioCodec
  learning_rate: float = 1e-3
  frame_length: int = 640
  fft_length: int = 1024

  def __post_init__(self):
    self.optimizer = optax.adamw(self.learning_rate)
    self._step_fn = None

  def create_state(self, rng: jax.Array, mel_frames: int = 64
                   ) -> VocoderTrainState:
    mel = jnp.zeros((1, mel_frames, self.audio_codec.n_dims))
    params = self.net.init(rng, mel)
    return VocoderTrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=self.optimizer.init(params))

  def loss_fn(self, params, mel: Array, audio: Array
              ) -> Tuple[Array, Dict[str, Array]]:
    pred = self.net.apply(params, mel)
    true = stft_ops.stft_magnitude(
        audio, frame_length=self.frame_length,
        frame_step=self.audio_codec.hop_size,
        fft_length=self.fft_length)
    n = min(pred.shape[1], true.shape[1])
    pred, true = pred[:, :n], true[:, :n]
    sc = jnp.linalg.norm(true - pred) / jnp.maximum(
        jnp.linalg.norm(true), 1e-6)
    mag = jnp.mean(jnp.abs(jnp.log(jnp.maximum(true, 1e-5)) -
                           jnp.log(jnp.maximum(pred, 1e-5))))
    total = sc + mag
    return total, {"spectral_convergence": sc, "log_magnitude": mag,
                   "loss": total}

  def train_step(self, state: VocoderTrainState, mel: Array,
                 audio: Array) -> Tuple[VocoderTrainState, Dict]:
    if self._step_fn is None:
      def step(state, mel, audio):
        (_, metrics), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True)(state.params, mel, audio)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return VocoderTrainState(
            step=state.step + 1, params=params,
            opt_state=opt_state), metrics
      self._step_fn = jax.jit(step, donate_argnums=(0,))
    return self._step_fn(state, mel, audio)


@flax.struct.dataclass
class AdversarialTrainState:
  step: Array
  g_params: flax.core.FrozenDict
  g_opt_state: optax.OptState
  d_params: flax.core.FrozenDict
  d_opt_state: optax.OptState


@dataclasses.dataclass
class AdversarialVocoderTrainer:
  """SoundStream-style GAN fine-tuning: reconstruction + hinge
  adversarial + feature-matching losses over the discriminator ensemble
  (audio/discriminators.py)."""
  decoder: vocoder_lib.SoundStreamDecoder
  audio_codec: codecs.AudioCodec
  g_learning_rate: float = 1e-4
  d_learning_rate: float = 1e-4
  waveform_weight: float = 10.0
  adversarial_weight: float = 1.0
  feature_matching_weight: float = 10.0

  def __post_init__(self):
    from music_spectrogram_diffusion_tpu.audio import discriminators
    self.disc = discriminators.VocoderDiscriminators()
    self._d_lib = discriminators
    self.g_optimizer = optax.adamw(self.g_learning_rate, b1=0.5, b2=0.9)
    self.d_optimizer = optax.adamw(self.d_learning_rate, b1=0.5, b2=0.9)
    self._step_fn = None

  def create_state(self, rng: jax.Array, mel_frames: int = 64
                   ) -> AdversarialTrainState:
    g_rng, d_rng = jax.random.split(rng)
    mel = jnp.zeros((1, mel_frames, self.audio_codec.n_dims))
    g_params = self.decoder.init(g_rng, mel)
    audio = jnp.zeros((1, mel_frames * self.audio_codec.hop_size))
    d_params = self.disc.init(d_rng, audio)
    return AdversarialTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params, g_opt_state=self.g_optimizer.init(g_params),
        d_params=d_params, d_opt_state=self.d_optimizer.init(d_params))

  def train_step(self, state: AdversarialTrainState, mel: Array,
                 audio: Array) -> Tuple[AdversarialTrainState, Dict]:
    if self._step_fn is None:
      d_lib = self._d_lib

      def g_loss_fn(g_params, d_params, mel, audio):
        pred = self.decoder.apply(g_params, mel)
        n = min(pred.shape[-1], audio.shape[-1])
        pred, target = pred[..., :n], audio[..., :n]
        rec = stft_loss(pred, target)
        wav_l1 = jnp.mean(jnp.abs(pred - target))
        fake_out = self.disc.apply(d_params, pred)
        real_out = self.disc.apply(d_params, target)
        adv = d_lib.hinge_g_loss(fake_out)
        fm = d_lib.feature_matching_loss(real_out, fake_out)
        total = (rec["spectral_convergence"] + rec["log_magnitude"] +
                 self.waveform_weight * wav_l1 +
                 self.adversarial_weight * adv +
                 self.feature_matching_weight * fm)
        return total, {"g_loss": total, "adv": adv,
                       "feature_matching": fm, "waveform_l1": wav_l1,
                       **rec}

      def d_loss_fn(d_params, g_params, mel, audio):
        pred = self.decoder.apply(g_params, mel)
        n = min(pred.shape[-1], audio.shape[-1])
        pred, target = pred[..., :n], audio[..., :n]
        fake_out = self.disc.apply(d_params, jax.lax.stop_gradient(pred))
        real_out = self.disc.apply(d_params, target)
        return d_lib.hinge_d_loss(real_out, fake_out)

      def step(state, mel, audio):
        (_, g_metrics), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(
                state.g_params, state.d_params, mel, audio)
        g_updates, g_opt = self.g_optimizer.update(
            g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            state.d_params, g_params, mel, audio)
        d_updates, d_opt = self.d_optimizer.update(
            d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        metrics = dict(g_metrics)
        metrics["d_loss"] = d_loss
        return AdversarialTrainState(
            step=state.step + 1, g_params=g_params, g_opt_state=g_opt,
            d_params=d_params, d_opt_state=d_opt), metrics

      self._step_fn = jax.jit(step, donate_argnums=(0,))
    return self._step_fn(state, mel, audio)


def prefetch(iterator: Iterator, depth: int = 4) -> Iterator:
  """Run an iterator in a daemon thread, buffering `depth` items.

  Overlaps host-side batch assembly with device compute. Exceptions from
  the producer re-raise at the consumer's next __next__.
  """
  import queue
  import threading

  q: "queue.Queue" = queue.Queue(maxsize=depth)
  done = object()

  def worker():
    try:
      for item in iterator:
        q.put(item)
      q.put(done)
    except BaseException as e:  # surface producer errors downstream
      q.put(e)

  threading.Thread(target=worker, daemon=True).start()
  while True:
    item = q.get()
    if item is done:
      return
    if isinstance(item, BaseException):
      raise item
    yield item


def vocoder_batches(audio_source: Iterator[np.ndarray],
                    audio_codec: codecs.AudioCodec,
                    *,
                    segment_frames: int = 64,
                    batch_size: int = 8,
                    seed: int = 0) -> Iterator[Tuple[Array, Array]]:
  """(mel, audio) training pairs from raw audio clips."""
  rng = np.random.RandomState(seed)
  hop = audio_codec.hop_size
  seg_samples = segment_frames * hop
  mels, audios = [], []
  for clip in audio_source:
    clip = np.asarray(clip, np.float32)
    if len(clip) < seg_samples:
      continue
    start = rng.randint(0, len(clip) - seg_samples + 1)
    seg = clip[start:start + seg_samples]
    mel = np.asarray(audio_codec.encode(seg[None]))[0][:segment_frames]
    mels.append(mel)
    audios.append(seg)
    if len(mels) == batch_size:
      yield jnp.asarray(np.stack(mels)), jnp.asarray(np.stack(audios))
      mels, audios = [], []
