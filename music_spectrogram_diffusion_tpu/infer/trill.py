"""TRILL audio-embedding model (Flax) for Fréchet Audio Distance.

The reference attaches TRILL embeddings alongside VGGish for its FAD /
reconstruction metrics (reference postprocessors.py:90-98 — TF-Hub
`nonsemantic-speech-benchmark/trill/3`, output key 'embedding', 512-d).
This module re-implements the TRILL architecture in JAX so TRILL-space
FAD works once the public SavedModel weights are converted.

Architecture (Shor et al. 2020, "Towards Learning a Universal
Non-Semantic Representation of Speech"): the VGGish log-mel frontend
(96x64 patches, see infer/vggish.py) feeding "ResNetish-50" (Hershey et
al. 2017) — a standard ResNet-50 v1 trunk ([3,4,6,3] bottlenecks,
7x7/2 stem + 3x3/2 maxpool, global average pool to 2048) — followed by
the 512-d triplet-loss embedding layer (the TF-Hub module's 'embedding'
output). TRILL windows audio with a 0.167 s step (reference
postprocessors.py:70-71); patches here use a 17-frame (0.17 s) hop.

BatchNorm is represented in inference-affine form: the converter
(tools/convert_trill.py, runs where TF + the SavedModel exist) folds
each BN's (mean, var, gamma, beta) into a per-channel (scale, bias)
pair, so the Flax module is conv -> affine -> relu throughout and the
npz is the single source of trained state. End-to-end output parity vs
the SavedModel is asserted by the converter, not here (no TF/egress in
this environment).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from music_spectrogram_diffusion_tpu.infer import vggish as vggish_lib

PATCH_FRAMES = 96
PATCH_HOP_FRAMES = 17  # 0.17 s — TRILL's ~0.167 s window step
NUM_MEL_BINS = vggish_lib.NUM_MEL_BINS
EMBEDDING_SIZE = 512
BLOCKS_PER_STAGE = (3, 4, 6, 3)  # ResNet-50
STAGE_FILTERS = (64, 128, 256, 512)


def log_mel_patches(audio: np.ndarray) -> np.ndarray:
  """[n_samples] @16 kHz -> [n_patches, 96, 64] log-mel, 0.17 s hop.

  The shared audioset frontend (vggish_lib.log_mel_frames) windowed at
  TRILL's ~0.167 s step instead of VGGish's non-overlapping patches."""
  log_mel = vggish_lib.log_mel_frames(audio)
  n_frames = len(log_mel)
  if n_frames < PATCH_FRAMES:
    return np.zeros((0, PATCH_FRAMES, NUM_MEL_BINS), np.float32)
  starts = np.arange(0, n_frames - PATCH_FRAMES + 1, PATCH_HOP_FRAMES)
  return np.stack([log_mel[s:s + PATCH_FRAMES] for s in starts])


class ConvBnRelu(nn.Module):
  """conv -> folded-BN affine -> optional relu (BN has no conv bias)."""
  features: int
  kernel: Sequence[int]
  strides: Sequence[int] = (1, 1)
  relu: bool = True

  @nn.compact
  def __call__(self, x):
    x = nn.Conv(self.features, tuple(self.kernel), tuple(self.strides),
                padding="SAME", use_bias=False, name="conv")(x)
    scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
    bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
    x = x * scale + bias
    return nn.relu(x) if self.relu else x


class Bottleneck(nn.Module):
  """ResNet v1 bottleneck: 1x1 -> 3x3 -> 1x1(x4) + projected shortcut."""
  filters: int
  strides: Sequence[int] = (1, 1)
  project: bool = False

  @nn.compact
  def __call__(self, x):
    shortcut = x
    if self.project:
      shortcut = ConvBnRelu(self.filters * 4, (1, 1), self.strides,
                            relu=False, name="proj")(x)
    y = ConvBnRelu(self.filters, (1, 1), self.strides, name="conv1")(x)
    y = ConvBnRelu(self.filters, (3, 3), name="conv2")(y)
    y = ConvBnRelu(self.filters * 4, (1, 1), relu=False, name="conv3")(y)
    return nn.relu(y + shortcut)


class ResNetish50(nn.Module):
  """[batch, 96, 64] log-mel -> [batch, 512] TRILL embedding."""
  embedding_size: int = EMBEDDING_SIZE

  @nn.compact
  def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
    x = patches[..., None]
    x = ConvBnRelu(64, (7, 7), (2, 2), name="stem")(x)
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
    for stage, (blocks, filters) in enumerate(
        zip(BLOCKS_PER_STAGE, STAGE_FILTERS)):
      for block in range(blocks):
        strides = (2, 2) if stage > 0 and block == 0 else (1, 1)
        x = Bottleneck(filters, strides, project=(block == 0),
                       name=f"stage{stage + 1}_block{block}")(x)
    x = jnp.mean(x, axis=(1, 2))  # global average pool -> [batch, 2048]
    return nn.Dense(self.embedding_size, name="embedding")(x)


def load_params(npz_path: str):
  """Load converted weights (tools/convert_trill.py output).

  Keys are '/'-joined module paths matching this tree, e.g.
  'stage1_block0/conv2/conv/kernel', 'stem/bn_scale',
  'embedding/kernel'."""
  raw = np.load(npz_path)
  params = {}
  for key in raw.files:
    node = params
    *path, leaf = key.split("/")
    for part in path:
      node = node.setdefault(part, {})
    node[leaf] = jnp.asarray(raw[key])
  return {"params": params}


class TRILLEmbedder:
  """audio [n_samples] @16 kHz -> [n_windows, 512] embeddings."""

  def __init__(self, npz_path: str):
    self.module = ResNetish50()
    self.variables = load_params(npz_path)
    self._apply = jax.jit(self.module.apply)

  def __call__(self, audio: np.ndarray) -> np.ndarray:
    patches = log_mel_patches(audio)
    if patches.shape[0] == 0:
      return np.zeros((0, EMBEDDING_SIZE), np.float32)
    return np.asarray(self._apply(self.variables, jnp.asarray(patches)))


def register(npz_path: Optional[str] = None) -> bool:
  """Register TRILL in postprocessors.EMBEDDING_MODELS.

  Uses `npz_path` or $MSD_TRILL_WEIGHTS. Returns True when registered
  (weights found); False otherwise."""
  from music_spectrogram_diffusion_tpu.infer import postprocessors
  path = npz_path or os.environ.get("MSD_TRILL_WEIGHTS")
  if not path or not os.path.exists(path):
    return False
  postprocessors.register_embedding_model("trill", TRILLEmbedder(path))
  return True
