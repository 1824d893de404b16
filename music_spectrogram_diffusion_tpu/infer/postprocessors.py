"""Postprocessing: model outputs -> metric-ready dictionaries.

Equivalent of the reference postprocessors
(/root/reference/music_spectrogram_diffusion/postprocessors.py): decodes
predicted spectrograms to audio and attaches evaluation embeddings.

The reference pulls VGGish and TRILL from TF-Hub (host TF); those
SavedModels have no JAX port and this environment has no network egress,
so embedders are pluggable callables registered in EMBEDDING_MODELS.
`mel_frame_embeddings` (mel frames as the embedding space) is always
available and is what the mel-Fréchet metric uses.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional

import numpy as np

Array = np.ndarray

# name -> callable([samples] float audio @16k) -> [frames, dim] embedding.
EMBEDDING_MODELS: Dict[str, Callable[[Array], Array]] = {}


def register_embedding_model(name: str,
                             fn: Callable[[Array], Array]) -> None:
  EMBEDDING_MODELS[name] = fn


def mel_frame_embeddings(audio: Array, sample_rate: int = 16000
                         ) -> Array:
  """Log-mel frames as embeddings (always-available FAD space)."""
  import jax.numpy as jnp
  from music_spectrogram_diffusion_tpu.ops import stft
  mel = stft.mel_spectrogram(
      jnp.asarray(audio)[None, :], sample_rate=sample_rate, n_fft=1024,
      hop_length=320, win_length=640, n_mel_channels=128, mel_fmin=0.0,
      mel_fmax=sample_rate // 2)
  return np.asarray(mel[0])


register_embedding_model("mel", mel_frame_embeddings)


def get_embeddings(audio: Array) -> Dict[str, Array]:
  """Run every registered embedder over an audio clip."""
  return {name: fn(audio) for name, fn in EMBEDDING_MODELS.items()}


def make_output_dict(audio_codec,
                     example: Mapping,
                     prediction: Optional[Array] = None,
                     is_target: bool = False,
                     vocoder=None,
                     compute_embeddings: bool = True) -> Dict:
  """Build the per-example dict consumed by metric functions.

  For targets: raw audio + its embeddings + the NoteSequence.
  For predictions: decode the predicted spectrogram to audio (via the
  attached vocoder) + embeddings + timing info.
  """
  out: Dict = {}
  if is_target:
    raw = example.get("raw_targets")
    out["raw_targets"] = raw
    out["sequence"] = example.get("sequence")
    if compute_embeddings and raw is not None:
      out["embeddings"] = get_embeddings(np.asarray(raw))
  else:
    assert prediction is not None
    out["predicted_features"] = np.asarray(prediction)
    if vocoder is not None:
      audio = np.asarray(vocoder(prediction[None]))[0]
      out["audio"] = audio
      if compute_embeddings:
        out["embeddings"] = get_embeddings(audio)
    if "timings" in example:
      out["timings"] = example["timings"]
  return out
