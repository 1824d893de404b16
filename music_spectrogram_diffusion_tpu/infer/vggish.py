"""VGGish audio-embedding model (Flax) for Fréchet Audio Distance.

The reference computes its primary quality metric (FAD) over VGGish
embeddings pulled from TF-Hub (reference postprocessors.py:82-98,
metrics.py:383-419). This is a faithful JAX port of the public VGGish
architecture (github.com/tensorflow/models/research/audioset/vggish):

  input:   96x64 log-mel patches (0.96 s @ 16 kHz)
  convs:   64 - 128 - 256x2 - 512x2 (3x3, ReLU, 2x2 max-pool after each
           group)
  fcs:     4096 - 4096 - 128 (all ReLU, matching vggish_slim's arg scope
           — VGGish embeddings are famously non-negative)

Feature frontend reproduces audioset/mel_features.py exactly:
  * frames of 400 samples, hop 160, SYMMETRIC Hann (np.hanning), no
    end padding (trailing partial frame dropped)
  * |rfft| at fft_length 512 (next pow2 of window)
  * 64 HTK mel bands over 125-7500 Hz, log(mel + 0.01)
  * examples: non-overlapping 96-frame patches

Weights: convert the public checkpoint with tools/convert_vggish.py
(needs TF; run wherever the checkpoint + TF exist) -> an .npz consumed
by `load_params`. Then `register(path)` plugs the model into
infer/postprocessors.EMBEDDING_MODELS as 'vggish' so evaluation emits
VGGish-space FAD (reference metric parity).
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from music_spectrogram_diffusion_tpu.ops import stft as stft_ops

SAMPLE_RATE = 16000
STFT_WINDOW = 400  # 25 ms
STFT_HOP = 160  # 10 ms
FFT_LENGTH = 512
NUM_MEL_BINS = 64
MEL_MIN_HZ = 125.0
MEL_MAX_HZ = 7500.0
LOG_OFFSET = 0.01
PATCH_FRAMES = 96  # 0.96 s
EMBEDDING_SIZE = 128


def log_mel_frames(audio: np.ndarray) -> np.ndarray:
  """[n_samples] @16 kHz -> [n_frames, 64] audioset log-mel frames.

  Matches audioset/mel_features.py (symmetric Hann, no padding,
  magnitude spectrogram, HTK mel, log(x + 0.01)). Shared by the VGGish
  and TRILL frontends, which window these frames differently.
  """
  audio = np.asarray(audio, np.float32)
  n = len(audio)
  n_frames = max(0, (n - STFT_WINDOW) // STFT_HOP + 1)
  if n_frames <= 0:
    return np.zeros((0, NUM_MEL_BINS), np.float32)
  idx = (np.arange(STFT_WINDOW)[None, :] +
         STFT_HOP * np.arange(n_frames)[:, None])
  frames = audio[idx] * np.hanning(STFT_WINDOW).astype(np.float32)
  mag = np.abs(np.fft.rfft(frames, n=FFT_LENGTH, axis=-1))
  # audioset's spectrogram_to_mel_matrix == tf.signal's (HTK formula,
  # zero DC row) — reuse the shared implementation.
  mel_mat = stft_ops.linear_to_mel_matrix(
      num_mel_bins=NUM_MEL_BINS, num_spectrogram_bins=FFT_LENGTH // 2 + 1,
      sample_rate=SAMPLE_RATE, lower_edge_hertz=MEL_MIN_HZ,
      upper_edge_hertz=MEL_MAX_HZ)
  return np.log(mag @ mel_mat + LOG_OFFSET).astype(np.float32)


def log_mel_patches(audio: np.ndarray) -> np.ndarray:
  """[n_samples] float audio @16 kHz -> [n_patches, 96, 64] log-mel.

  Non-overlapping 96-frame patches; a tail shorter than one patch is
  dropped (audioset example windowing).
  """
  log_mel = log_mel_frames(audio)
  n_patches = len(log_mel) // PATCH_FRAMES
  if n_patches == 0:
    return np.zeros((0, PATCH_FRAMES, NUM_MEL_BINS), np.float32)
  return log_mel[:n_patches * PATCH_FRAMES].reshape(
      n_patches, PATCH_FRAMES, NUM_MEL_BINS)


class VGGish(nn.Module):
  """The VGGish trunk; input [batch, 96, 64] -> [batch, 128]."""
  embedding_size: int = EMBEDDING_SIZE

  @nn.compact
  def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
    x = patches[..., None]  # NHWC with one channel

    def conv(x, features, name):
      x = nn.Conv(features, (3, 3), padding="SAME", name=name)(x)
      return nn.relu(x)

    def pool(x):
      return nn.max_pool(x, (2, 2), strides=(2, 2))

    x = pool(conv(x, 64, "conv1"))
    x = pool(conv(x, 128, "conv2"))
    x = pool(conv(conv(x, 256, "conv3_1"), 256, "conv3_2"))
    x = pool(conv(conv(x, 512, "conv4_1"), 512, "conv4_2"))
    # [batch, 6, 4, 512] -> row-major flatten (matches TF slim).
    x = x.reshape((x.shape[0], -1))
    x = nn.relu(nn.Dense(4096, name="fc1_1")(x))
    x = nn.relu(nn.Dense(4096, name="fc1_2")(x))
    # vggish_slim applies the arg-scope ReLU to fc2 as well: embeddings
    # are non-negative.
    x = nn.relu(nn.Dense(self.embedding_size, name="fc2")(x))
    return x


def load_params(npz_path: str):
  """Load converted weights (tools/convert_vggish.py output).

  The npz holds one array per parameter named '<layer>/kernel' and
  '<layer>/bias' with layers conv1, conv2, conv3_1, conv3_2, conv4_1,
  conv4_2, fc1_1, fc1_2, fc2 (TF layout: conv kernels HWIO, dense
  kernels [in, out] — identical to Flax, no transposition needed).
  """
  raw = np.load(npz_path)
  params = {}
  for key in raw.files:
    layer, leaf = key.split("/")
    params.setdefault(layer, {})[leaf] = jnp.asarray(raw[key])
  return {"params": params}


class VGGishEmbedder:
  """audio [n_samples] @16 kHz -> [n_patches, 128] embeddings."""

  def __init__(self, npz_path: str):
    self.module = VGGish()
    self.variables = load_params(npz_path)
    self._apply = jax.jit(self.module.apply)

  def __call__(self, audio: np.ndarray) -> np.ndarray:
    patches = log_mel_patches(audio)
    if patches.shape[0] == 0:
      return np.zeros((0, EMBEDDING_SIZE), np.float32)
    return np.asarray(self._apply(self.variables, jnp.asarray(patches)))


def register(npz_path: Optional[str] = None) -> bool:
  """Register VGGish in postprocessors.EMBEDDING_MODELS.

  Uses `npz_path` or $MSD_VGGISH_WEIGHTS. Returns True when registered
  (weights found); False otherwise (evaluation falls back to mel-FAD).
  """
  from music_spectrogram_diffusion_tpu.infer import postprocessors
  path = npz_path or os.environ.get("MSD_VGGISH_WEIGHTS")
  if not path or not os.path.exists(path):
    return False
  postprocessors.register_embedding_model("vggish", VGGishEmbedder(path))
  return True
