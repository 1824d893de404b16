"""Full-song synthesis by segment chaining.

The reference renders songs in a Beam pipeline (beam/evaluation.py:
156-276): per segment it runs the model with the previous segment's
*prediction* fed back as `encoder_continuous_inputs` (mask zeroed for the
first segment), then inverts the concatenated spectrogram via the host
TF-Hub vocoder.

This renderer keeps the whole chain on device:
  * one compiled predict function reused for every segment of every song
    (shapes are constant by construction),
  * songs are BATCHED — segment i of many songs runs as one forward, so
    the sequential dependency is only along segments, not songs,
  * vocoding is a jitted on-device function (audio/vocoder.py).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _device_sync(x: Array) -> float:
  """Reliable device sync: fetch a scalar reduction (block_until_ready is
  a no-op on the tunneled TPU platform)."""
  return float(np.asarray(jnp.sum(x)))


@dataclasses.dataclass
class SongRender:
  """Result of rendering one song."""
  mel: np.ndarray  # [frames, n_dims] in codec feature space
  audio: Optional[np.ndarray]  # [samples] if a vocoder was attached
  timings: Dict[str, float]


class Synthesizer:
  """Segment-chained renderer for context diffusion models."""

  # Encoder token lengths compile-cached separately; padding beyond the
  # real tokens is masked out of every attention, so using the smallest
  # bucket that fits is bit-identical and much faster (cross-attention
  # cost scales with kv length: measured 1.96 -> 1.18 ms/step going
  # 2048 -> 512 on the base model).
  INPUT_BUCKETS = (256, 512, 1024, 2048)

  def __init__(self, model: Any, params: Any,
               task_feature_lengths: Mapping[str, int],
               vocoder=None, bucket_inputs: bool = True):
    """Args:
      model: ContextDiffusionModel (or compatible .predict).
      params: model parameters.
      task_feature_lengths: {'inputs', 'targets', 'targets_context'}.
      vocoder: optional callable [B, T, D] mel -> [B, T*hop] audio.
      bucket_inputs: pick the smallest input-length bucket per song
        batch instead of always padding to the task maximum.
    """
    self.model = model
    self.params = params
    self.lengths = dict(task_feature_lengths)
    l_ctx = self.lengths.get("targets_context")
    if l_ctx is not None and l_ctx > self.lengths["targets"]:
      # Chaining feeds the previous PREDICTION (l_tgt frames) as the
      # next context; a longer context window would need history across
      # >1 segment (the reference carries the same restriction).
      raise ValueError(
          f"targets_context ({l_ctx}) > targets "
          f"({self.lengths['targets']}) is unsupported: segment "
          "chaining uses the previous segment's prediction as context")
    self.vocoder = vocoder
    self.bucket_inputs = bucket_inputs
    self._predict = jax.jit(
        lambda params, batch, rng: self.model.predict(params, batch, rng)[0])
    # Vocoders that stage their own jits (e.g. Griffin-Lim with the
    # host-side PGHI phase init, audio/vocoder.py _StagedGriffinLim)
    # must NOT be wrapped in an outer jit — the axon TPU attachment has
    # no host-callback support, so their host step has to run between
    # device computations.
    if vocoder is None:
      self._vocode = None
    elif getattr(vocoder, "self_jitting", False):
      self._vocode = vocoder
    else:
      self._vocode = jax.jit(vocoder)

  def _input_length(self, max_tokens: int) -> int:
    """Smallest bucket >= max_tokens, capped at the task maximum."""
    cap = self.lengths["inputs"]
    if not self.bucket_inputs:
      return cap
    for bucket in self.INPUT_BUCKETS:
      if bucket >= max_tokens and bucket <= cap:
        return bucket
    return cap

  @property
  def _uses_context(self) -> bool:
    """Context chaining only applies to the dual-encoder family; the
    notes-only diffusion and AR baselines render segments independently
    (reference beam/evaluation.py feeds context only when present)."""
    return ("targets_context" in self.lengths and
            getattr(self.model, "USES_CONTEXT", False))

  def _segment_batch(self, tokens: Array, context: Array,
                     context_mask: Array) -> Dict[str, Array]:
    l_tgt = self.lengths["targets"]
    n_dims = self.model.audio_codec.n_dims
    batch = tokens.shape[0]
    out = {
        "encoder_input_tokens": tokens,
        "decoder_target_tokens": jnp.zeros((batch, l_tgt, n_dims),
                                           jnp.float32),
        "decoder_target_mask": jnp.ones((batch, l_tgt), bool),
    }
    if self._uses_context:
      out["encoder_continuous_inputs"] = context
      out["encoder_continuous_mask"] = context_mask
    else:
      # AR generation needs teacher-forcing placeholders.
      out["decoder_input_tokens"] = jnp.zeros((batch, l_tgt, n_dims),
                                              jnp.float32)
    return out

  def render_songs(self,
                   songs: Sequence[Sequence[np.ndarray]],
                   rng: Optional[jax.Array] = None,
                   vocode: bool = True,
                   always_mask_context: bool = False) -> List[SongRender]:
    """Render a batch of songs, chaining context across segments.

    Args:
      songs: per song, the list of per-segment `encoder_input_tokens`
        (1D int32, already padded/EOS'd to the task inputs length).
      rng: base PRNG key; folded per (song, segment), so a song renders
        identically whether batched with others or alone.
      vocode: run the attached vocoder (if any) on the result.

    Returns:
      One SongRender per song (trailing all-pad segments trimmed).
    """
    if rng is None:
      rng = jax.random.PRNGKey(0)
    n_songs = len(songs)
    max_segments = max(len(s) for s in songs)
    max_tokens = max((len(seg) for s in songs for seg in s), default=1)
    l_in = self._input_length(max_tokens)
    l_ctx = self.lengths.get("targets_context", self.lengths["targets"])
    l_tgt = self.lengths["targets"]
    n_dims = self.model.audio_codec.n_dims

    # [segments, songs, l_in] token tensor, zero-padded for short songs.
    tokens = np.zeros((max_segments, n_songs, l_in), np.int32)
    for si, song in enumerate(songs):
      for gi, seg in enumerate(song):
        seg = np.asarray(seg, np.int32)[:l_in]
        tokens[gi, si, :len(seg)] = seg

    context = jnp.full((n_songs, l_ctx, n_dims),
                       self.model.audio_codec.pad_value, jnp.float32)
    context_mask = jnp.zeros((n_songs, l_ctx), bool)

    # One key per song; the sampler draws each song's noise from its own
    # key, so batch composition doesn't change any song's output.
    song_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        rng, jnp.arange(n_songs))

    mel_segments = []
    seg_times = []
    for gi in range(max_segments):
      batch = self._segment_batch(
          jnp.asarray(tokens[gi]), context, context_mask)
      t0 = time.time()
      seg_keys = jax.vmap(jax.random.fold_in, (0, None))(
          song_keys, jnp.asarray(gi))
      pred = self._predict(self.params, batch, seg_keys)
      _device_sync(pred)
      seg_times.append(time.time() - t0)
      mel_segments.append(pred)
      # Next segment's context is this prediction (full-length mask);
      # always_mask_context reproduces the reference's ablation
      # (beam/evaluation.py:66-68) that renders every segment blind.
      context = pred[:, -l_ctx:, :]
      context_mask = jnp.full((n_songs, l_ctx),
                              not always_mask_context, bool)

    mel = jnp.concatenate(mel_segments, axis=1)  # [songs, frames, dims]

    audio = None
    vocode_time = 0.0
    if vocode and self._vocode is not None:
      t0 = time.time()
      audio = self._vocode(mel)
      _device_sync(audio)
      vocode_time = time.time() - t0

    frame_rate = self.model.audio_codec.frame_rate
    results = []
    mel_np = np.asarray(mel)
    audio_np = np.asarray(audio) if audio is not None else None
    # Timing semantics (reference beam/evaluation.py:217-252): the
    # realtime factor excludes the first segment (it may include
    # compilation) and, because segments run BATCHED here, rates are
    # per chip: steady wall / (steady segments x segment audio x songs
    # in the batch). prediction_seconds stays the literal whole-batch
    # wall including segment 0.
    steady = seg_times[1:] if len(seg_times) > 1 else seg_times
    seg_audio = l_tgt / frame_rate
    steady_rate = (float(np.sum(steady)) /
                   max(len(steady) * seg_audio * n_songs, 1e-9))
    for si, song in enumerate(songs):
      n_frames = len(song) * l_tgt
      song_audio = (audio_np[si, :n_frames *
                             self.model.audio_codec.hop_size]
                    if audio_np is not None else None)
      audio_seconds = n_frames / frame_rate
      results.append(SongRender(
          mel=mel_np[si, :n_frames],
          audio=song_audio,
          timings={
              "prediction_seconds": float(np.sum(seg_times)),
              "prediction_seconds_per_audio_second": steady_rate,
              "steady_segment_seconds": float(np.median(steady)),
              "audio_decode_seconds": vocode_time,
              "audio_seconds": audio_seconds,
          }))
    return results

  def render_song(self, segments: Sequence[np.ndarray],
                  rng: Optional[jax.Array] = None,
                  vocode: bool = True) -> SongRender:
    return self.render_songs([segments], rng=rng, vocode=vocode)[0]

  def stream_song(self, segments: Sequence[np.ndarray],
                  rng: Optional[jax.Array] = None,
                  vocoder_context_frames: int = 16):
    """Low-latency streaming render: yield audio per segment.

    Generator over (segment_index, mel [l_tgt, dims], audio [samples]
    or None). Audio for segment i is emitted as soon as its spectrogram
    is denoised: the vocoder runs on [context | segment] where context
    is the previous `vocoder_context_frames` mel frames, and the
    context's samples are dropped — the same warm-up convention the
    codec uses on the analysis side (16 extra STFT frames to avoid
    boundary pops, reference audio_codecs.py:214-218). Byte-identical
    to whole-song vocoding for vocoders whose receptive field fits the
    context (SoundStream-style causal convs); Griffin-Lim phase
    estimation is chunk-local, so streamed chunks differ slightly there.

    RNG structure matches render_songs, so the streamed mel equals the
    batch renderer's output exactly.
    """
    if rng is None:
      rng = jax.random.PRNGKey(0)
    l_ctx = self.lengths.get("targets_context", self.lengths["targets"])
    n_dims = self.model.audio_codec.n_dims
    max_tokens = max((len(s) for s in segments), default=1)
    l_in = self._input_length(max_tokens)

    song_key = jax.random.fold_in(rng, 0)  # song 0, as in render_songs
    context = jnp.full((1, l_ctx, n_dims),
                       self.model.audio_codec.pad_value, jnp.float32)
    context_mask = jnp.zeros((1, l_ctx), bool)
    prev_tail = None  # [vocoder_context_frames, dims] mel context

    for gi, seg in enumerate(segments):
      tokens = np.zeros((1, l_in), np.int32)
      seg = np.asarray(seg, np.int32)[:l_in]
      tokens[0, :len(seg)] = seg
      batch = self._segment_batch(jnp.asarray(tokens), context,
                                  context_mask)
      seg_key = jax.random.fold_in(song_key, gi)[None]
      pred = self._predict(self.params, batch, seg_key)
      mel = np.asarray(pred[0])  # [l_tgt, dims]

      audio = None
      if self._vocode is not None:
        if prev_tail is None or vocoder_context_frames == 0:
          chunk = self._vocode(pred)
          audio = np.asarray(chunk[0])
        else:
          warm = jnp.concatenate(
              [jnp.asarray(prev_tail)[None], pred], axis=1)
          chunk = self._vocode(warm)
          audio = np.asarray(
              chunk[0, vocoder_context_frames *
                    self.model.audio_codec.hop_size:])
        prev_tail = mel[-vocoder_context_frames:] if (
            vocoder_context_frames > 0) else None

      context = pred[:, -l_ctx:, :]
      context_mask = jnp.ones((1, l_ctx), bool)
      yield gi, mel, audio
