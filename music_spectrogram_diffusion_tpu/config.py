"""Typed configuration presets replacing the reference's gin matrix.

The reference composes gin files (train|resume x audio_codec x model x
task); here the same matrix is plain dataclasses + factory functions, and
the resolved config is serialized alongside checkpoints as JSON.

Model sizes match gin/models/diffusion/{basic,context}/t5_*.gin:
  small: 512d / 6h  / 8+8 layers  / mlp 1024
  base:  768d / 12h / 12+12       / mlp 2048
  large: 1024d / 16h / 24+24      / mlp 2816
All with gated-gelu MLPs, concat_encodings cross-attention and
fixed_permuted_offset positions; context models use terminal-relative
context positions.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from music_spectrogram_diffusion_tpu.models.diffusion import network
from music_spectrogram_diffusion_tpu.ops import diffusion as dops


# Vocabulary: 3 special tokens + codec classes (see midi/vocabularies.py),
# rounded up to a multiple of 128 for TPU lane alignment.
def padded_vocab_size(base_size: int, multiple: int = 128) -> int:
  return multiple * math.ceil(base_size / multiple)


@dataclasses.dataclass(frozen=True)
class TaskLengths:
  """Feature lengths (reference gin/tasks/mt3/base.gin)."""
  inputs: int = 2048
  targets: int = 256
  targets_context: int = 256


@dataclasses.dataclass(frozen=True)
class TrainConfig:
  batch_size: int = 256
  learning_rate: float = 1e-3
  warmup_steps: int = 1000
  train_steps: int = 500_000
  adafactor_decay_rate: float = 0.8
  checkpoint_period: int = 10_000
  eval_period: int = 10_000
  num_microbatches: int = 1


_SIZES: Dict[str, Dict[str, int]] = {
    "tiny": dict(emb_dim=64, num_heads=2, num_encoder_layers=2,
                 num_decoder_layers=2, head_dim=32, mlp_dim=128),
    "small": dict(emb_dim=512, num_heads=6, num_encoder_layers=8,
                  num_decoder_layers=8, head_dim=64, mlp_dim=1024),
    "base": dict(emb_dim=768, num_heads=12, num_encoder_layers=12,
                 num_decoder_layers=12, head_dim=64, mlp_dim=2048),
    "large": dict(emb_dim=1024, num_heads=16, num_encoder_layers=24,
                  num_decoder_layers=24, head_dim=64, mlp_dim=2816),
}

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
}


def network_config(size: str = "base",
                   *,
                   with_context: bool = True,
                   vocab_size: Optional[int] = None,
                   dtype: str = "float32",
                   dropout_rate: float = 0.1,
                   use_fused_attention: bool = True,
                   remat: bool = False) -> network.NetworkConfig:
  """Build the transformer config for a given model size."""
  if size not in _SIZES:
    raise ValueError(f"Unknown size {size!r}; have {sorted(_SIZES)}")
  if vocab_size is None:
    # Default: mt3 task vocab (velocity bins=1) -> see midi/vocabularies.py;
    # computed lazily to avoid an import cycle.
    from music_spectrogram_diffusion_tpu.midi import vocabularies
    vocab = vocabularies.vocabulary_from_codec(
        vocabularies.build_codec(vocabularies.VocabularyConfig(
            num_velocity_bins=1)))
    vocab_size = padded_vocab_size(vocab.vocab_size)
  return network.NetworkConfig(
      vocab_size=vocab_size,
      dtype=_DTYPES[dtype],
      mlp_activations=("gelu", "linear"),
      dropout_rate=dropout_rate,
      cross_attend_style="concat_encodings",
      position_encoding="fixed_permuted_offset",
      context_positions=("terminal_relative" if with_context else "regular"),
      use_fused_attention=use_fused_attention,
      remat=remat,
      **_SIZES[size])


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
  """Fully-resolved experiment: model + diffusion + task + train."""
  size: str = "base"
  with_context: bool = True
  dtype: str = "float32"
  dropout_rate: float = 0.1
  # Per-layer rematerialization: required to train base+ sizes on one
  # 16GB chip (encoder MLP activations at inputs=2048 otherwise exceed
  # HBM); inference ignores it (no backward pass to save for).
  remat: bool = False
  codec_name: str = "melgan"
  task_lengths: TaskLengths = TaskLengths()
  diffusion: dops.DiffusionConfig = dops.DiffusionConfig()
  train: TrainConfig = TrainConfig()
  vocab_size: Optional[int] = None
  # 'diffusion' | 'autoregressive'; AR models ignore `with_context` and
  # `diffusion` and use `ar_output` as the output head.
  model_family: str = "diffusion"
  ar_output: str = "deterministic"  # 'deterministic' | 'gaussian_mixture'
  # Task vocabulary/representation (reference gin/tasks/*.gin): the mt3
  # family uses 1 velocity bin + ties + 'full' programs; the ismir2021
  # piano family uses 127 bins, no ties, 'flat' programs.
  num_velocity_bins: int = 1
  onsets_only: bool = False
  include_ties: bool = True
  program_granularity: str = "full"

  def vocab_config(self):
    from music_spectrogram_diffusion_tpu.midi import vocabularies
    return vocabularies.VocabularyConfig(
        num_velocity_bins=self.num_velocity_bins)

  def note_rep(self):
    from music_spectrogram_diffusion_tpu.data import tasks
    return tasks.NoteRepresentationConfig(
        onsets_only=self.onsets_only, include_ties=self.include_ties)

  def network(self) -> network.NetworkConfig:
    vocab_size = self.vocab_size
    if vocab_size is None and self.num_velocity_bins != 1:
      from music_spectrogram_diffusion_tpu.midi import vocabularies
      vocab = vocabularies.vocabulary_from_codec(
          vocabularies.build_codec(self.vocab_config()))
      vocab_size = padded_vocab_size(vocab.vocab_size)
    return network_config(
        self.size, with_context=self.with_context,
        vocab_size=vocab_size, dtype=self.dtype,
        dropout_rate=self.dropout_rate, remat=self.remat)

  def to_json(self) -> str:
    def default(o: Any):
      if dataclasses.is_dataclass(o):
        return {"__dc__": type(o).__name__, **dataclasses.asdict(o)}
      raise TypeError(o)
    return json.dumps(dataclasses.asdict(self), default=default, indent=2)

  @staticmethod
  def from_json(text: str) -> "ExperimentConfig":
    raw = json.loads(text)
    raw["task_lengths"] = TaskLengths(**raw["task_lengths"])
    d = raw["diffusion"]
    d["train_schedule"] = dops.Schedule(**d["train_schedule"])
    g = d["guidance"]
    if g.get("interval") is not None:
      g["interval"] = tuple(g["interval"])  # JSON round-trips tuples as lists
    d["guidance"] = dops.GuidanceConfig(**g)
    s = d["sampler"]
    s["schedule"] = dops.Schedule(**s["schedule"])
    d["sampler"] = dops.SamplerConfig(**s)
    raw["diffusion"] = dops.DiffusionConfig(**d)
    raw["train"] = TrainConfig(**raw["train"])
    return ExperimentConfig(**raw)


def preset(name: str) -> ExperimentConfig:
  """Named presets mirroring the reference gin model files."""
  presets = {
      "diffusion_tiny": ExperimentConfig(size="tiny", with_context=False),
      "diffusion_small": ExperimentConfig(size="small", with_context=False),
      "diffusion_base": ExperimentConfig(size="base", with_context=False),
      "context_tiny": ExperimentConfig(size="tiny", with_context=True),
      "context_small": ExperimentConfig(size="small", with_context=True),
      "context_base": ExperimentConfig(size="base", with_context=True),
      "context_large": ExperimentConfig(size="large", with_context=True),
      # Autoregressive baselines (reference gin/models/autoregressive/
      # deterministic/t5_{small,base}.gin).
      "ar_tiny": ExperimentConfig(size="tiny", with_context=False,
                                  model_family="autoregressive"),
      "ar_small": ExperimentConfig(size="small", with_context=False,
                                   model_family="autoregressive"),
      "ar_base": ExperimentConfig(size="base", with_context=False,
                                  model_family="autoregressive"),
  }
  # ismir2021 piano family (reference gin/tasks/ismir2021.gin): MAESTRO
  # only, 127 velocity bins, 'flat' program granularity, no tie section,
  # targets 512 frames, 400k steps, no segment context.
  for sz in ("tiny", "small", "base"):
    presets[f"ismir2021_{sz}"] = ExperimentConfig(
        size=sz, with_context=False,
        task_lengths=TaskLengths(inputs=2048, targets=512,
                                 targets_context=512),
        train=TrainConfig(train_steps=400_000),
        num_velocity_bins=127, include_ties=False,
        program_granularity="flat")
  if name not in presets:
    raise ValueError(f"Unknown preset {name!r}; have {sorted(presets)}")
  return presets[name]
