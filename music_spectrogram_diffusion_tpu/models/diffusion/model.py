"""Diffusion model API: training loss and the fused sampler predict path.

Replaces the reference's t5x BaseTransformerModel subclasses
(/root/reference/music_spectrogram_diffusion/models/diffusion/models.py)
with a self-contained, jit-friendly class. Differences that matter:

* `predict` runs classifier-free guidance as ONE 2B-batch decoder forward
  per step (reference: two sequential module.apply calls per step), and
  cross-attention K/V are projected once per segment and reused by all
  sampler steps (reference re-projects in every step).
* No gin/t5x plumbing: configs are plain dataclasses, the batch is a dict
  of arrays, everything works under jax.jit/pjit directly.

Batch schema (from data/feature_converters.py):
  encoder_input_tokens      int32  [B, L_in]
  encoder_continuous_inputs f32    [B, L_ctx, n_dims]   (context model only)
  encoder_continuous_mask   bool   [B, L_ctx]           (context model only)
  decoder_target_tokens     f32    [B, L_tgt, n_dims]
  decoder_target_mask       bool   [B, L_tgt]
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from music_spectrogram_diffusion_tpu.audio import codecs
from music_spectrogram_diffusion_tpu.models.diffusion import network
from music_spectrogram_diffusion_tpu.ops import diffusion as dops

Array = jnp.ndarray
PyTree = Any


class DiffusionModelBase:
  """Shared training/prediction logic for both diffusion model variants."""

  # Whether predict() consumes previous-segment context features.
  USES_CONTEXT = False

  def __init__(self,
               module: Any,
               diffusion_config: dops.DiffusionConfig,
               audio_codec: codecs.AudioCodec):
    self.module = module
    self.diffusion_config = diffusion_config
    self.audio_codec = audio_codec

  # -- subclass hooks -------------------------------------------------------

  def _encode(self, params: PyTree, batch: Mapping[str, Array]):
    raise NotImplementedError

  def _apply_train(self, params: PyTree, batch: Mapping[str, Array],
                   z_t: Array, noise_time: Array,
                   include_conditioning: Array, dropout_rng) -> Array:
    raise NotImplementedError

  # -- training -------------------------------------------------------------

  def loss_fn(self,
              params: PyTree,
              batch: Mapping[str, Array],
              dropout_rng: Optional[jax.Array],
              ) -> Tuple[Array, Dict[str, Array]]:
    """Masked, summed diffusion loss + scalar metrics."""
    targets = batch["decoder_target_tokens"]
    targets = self.audio_codec.scale_features(
        targets, output_range=(-1.0, 1.0), clip=True)

    # dropout_rng=None means a deterministic eval pass: fixed
    # noise/time draws AND no dropout (the t5x eval contract; the AR
    # model does the same — autoregressive/model.py).
    enable_dropout = dropout_rng is not None
    if dropout_rng is None:
      dropout_rng = jax.random.PRNGKey(0)
    dropout_rng, diffusion_rng = jax.random.split(dropout_rng)

    z_t, eps, noise_time, include_conditioning = dops.training_input(
        diffusion_rng, targets, self.diffusion_config)

    model_output = self._apply_train(
        params, batch, z_t, noise_time, include_conditioning, dropout_rng,
        enable_dropout)

    loss = dops.training_loss(
        x0=targets, eps=eps, z=z_t, time=noise_time,
        model_output=model_output, config=self.diffusion_config)
    mask = batch["decoder_target_mask"]
    loss = jnp.sum(loss * mask[..., None])

    n_frames = jnp.sum(mask)
    metrics = {
        "loss": loss,
        "loss_per_frame": loss / jnp.maximum(n_frames, 1),
        "n_frames": n_frames,
        "n_seqs": jnp.asarray(targets.shape[0], jnp.float32),
    }
    return loss, metrics

  # -- inference ------------------------------------------------------------

  def predict(self,
              params: PyTree,
              batch: Mapping[str, Array],
              rng: Optional[jax.Array] = None,
              ) -> Tuple[Array, Array]:
    """Sample a spectrogram segment; returns (features, dummy scores)."""
    if rng is None:
      rng = jax.random.PRNGKey(0)

    target_shape = batch["decoder_target_tokens"].shape
    batch_size = target_shape[0]

    encodings_and_masks = self._encode(params, batch)

    # The cross-attention KV cache is read by every denoise step (the
    # dominant per-step HBM traffic). On TPU, store it in bf16: f32
    # matmuls round their inputs to bf16 on the MXU anyway (default
    # precision), so this halves bandwidth without changing the computed
    # scores. On CPU (true f32 matmuls) keep f32 for exact parity.
    def _cast_kv(kv):
      if jax.default_backend() != "tpu":
        return kv
      return jax.tree.map(lambda x: x.astype(jnp.bfloat16), kv)

    cond_wt = self.diffusion_config.guidance.eval_condition_weight
    cross_kv = _cast_kv(self.module.apply(
        {"params": params}, encodings_and_masks,
        method=self.module.precompute_cross_kv))
    if cond_wt != 1.0:
      # Fused CFG: one decoder forward at batch 2B. Encodings / masks /
      # cached K/V stay at batch B — the unconditional rows' cross
      # attention is exactly zero (reference zeroes masks + encodings),
      # so the decoder computes it only for the conditional rows
      # (`cond_rows`), saving ~half the cross-attention work.

      def denoise_pair_fn(z, time):
        z2 = jnp.concatenate([z, z], axis=0)
        time2 = jnp.concatenate([time, time], axis=0)
        out = self.module.apply(
            {"params": params}, encodings_and_masks, z2, time2,
            enable_dropout=False, cross_kv=cross_kv,
            cond_rows=batch_size,
            method=self.module.decode)
        return out[:batch_size], out[batch_size:]
    else:
      def denoise_pair_fn(z, time):
        out = self.module.apply(
            {"params": params}, encodings_and_masks, z, time,
            enable_dropout=False, cross_kv=cross_kv,
            method=self.module.decode)
        return out, out

    # Single batch-B conditional forward, used by the sampler only for
    # steps outside guidance.interval (when set).
    def denoise_cond_fn(z, time):
      return self.module.apply(
          {"params": params}, encodings_and_masks, z, time,
          enable_dropout=False, cross_kv=cross_kv,
          method=self.module.decode)

    pred_x0 = dops.sample(
        rng, target_shape, self.diffusion_config,
        denoise_pair_fn=denoise_pair_fn,
        denoise_cond_fn=denoise_cond_fn)

    features = self.audio_codec.scale_to_features(
        pred_x0, input_range=(-1.0, 1.0))
    scores = jnp.zeros((batch_size,))
    return features, scores

  def predict_reference_path(self,
                             params: PyTree,
                             batch: Mapping[str, Array],
                             rng: Optional[jax.Array] = None,
                             ) -> Tuple[Array, Array]:
    """Two-forwards-per-step CFG, matching the reference call structure.

    Slower; kept for A/B parity validation of the fused path.
    """
    if rng is None:
      rng = jax.random.PRNGKey(0)
    target_shape = batch["decoder_target_tokens"].shape
    encodings_and_masks = self._encode(params, batch)

    def denoise_fn(z, time, include_conditioning):
      scaled = jax.tree.map(
          lambda x: x * jnp.asarray(include_conditioning, x.dtype),
          encodings_and_masks)
      return self.module.apply(
          {"params": params}, scaled, z, time,
          enable_dropout=False, method=self.module.decode)

    pred_x0 = dops.sample(
        rng, target_shape, self.diffusion_config, denoise_fn=denoise_fn)
    features = self.audio_codec.scale_to_features(
        pred_x0, input_range=(-1.0, 1.0))
    return features, jnp.zeros((target_shape[0],))


class DiffusionModel(DiffusionModelBase):
  """Notes-only diffusion model (reference DiffusionModel, models.py:34)."""

  def init_variables(self, rng: jax.Array,
                     input_shapes: Mapping[str, Tuple[int, ...]],
                     input_types: Optional[Mapping[str, Any]] = None):
    input_types = dict(input_types or {})
    enc_shape = input_shapes["encoder_input_tokens"]
    dec_shape = input_shapes["decoder_target_tokens"]
    return self.module.init(
        rng,
        encoder_input_tokens=jnp.ones(
            enc_shape, input_types.get("encoder_input_tokens", jnp.int32)),
        decoder_input_tokens=jnp.ones(dec_shape, jnp.float32),
        decoder_noise_time=jnp.ones(dec_shape[:1], jnp.float32),
        enable_dropout=False)

  def _encode(self, params, batch):
    return self.module.apply(
        {"params": params}, batch["encoder_input_tokens"],
        enable_dropout=False, method=self.module.encode)

  def _apply_train(self, params, batch, z_t, noise_time,
                   include_conditioning, dropout_rng,
                   enable_dropout=True):
    tokens = batch["encoder_input_tokens"]
    tokens = tokens * dops.bcast_left(
        include_conditioning, tokens.shape).astype(tokens.dtype)
    return self.module.apply(
        {"params": params},
        encoder_input_tokens=tokens,
        decoder_input_tokens=z_t,
        decoder_noise_time=noise_time,
        enable_dropout=enable_dropout,
        rngs={"dropout": dropout_rng})


class ContextDiffusionModel(DiffusionModelBase):
  """Dual-encoder model with previous-segment context
  (reference ContextDiffusionModel, models.py:208)."""

  USES_CONTEXT = True

  def init_variables(self, rng: jax.Array,
                     input_shapes: Mapping[str, Tuple[int, ...]],
                     input_types: Optional[Mapping[str, Any]] = None):
    input_types = dict(input_types or {})
    return self.module.init(
        rng,
        encoder_input_tokens=jnp.ones(
            input_shapes["encoder_input_tokens"],
            input_types.get("encoder_input_tokens", jnp.int32)),
        encoder_continuous_inputs=jnp.ones(
            input_shapes["encoder_continuous_inputs"], jnp.float32),
        encoder_continuous_mask=jnp.ones(
            input_shapes["encoder_continuous_mask"],
            input_types.get("encoder_continuous_mask", jnp.bool_)),
        decoder_input_tokens=jnp.ones(
            input_shapes["decoder_target_tokens"], jnp.float32),
        decoder_noise_time=jnp.ones(
            input_shapes["decoder_target_tokens"][:1], jnp.float32),
        enable_dropout=False)

  def _encode(self, params, batch):
    context = self.audio_codec.scale_features(
        batch["encoder_continuous_inputs"], output_range=(-1.0, 1.0),
        clip=True)
    return self.module.apply(
        {"params": params},
        input_tokens=batch["encoder_input_tokens"],
        continuous_inputs=context,
        continuous_mask=batch["encoder_continuous_mask"],
        enable_dropout=False, method=self.module.encode)

  def _apply_train(self, params, batch, z_t, noise_time,
                   include_conditioning, dropout_rng,
                   enable_dropout=True):
    tokens = batch["encoder_input_tokens"]
    tokens = tokens * dops.bcast_left(
        include_conditioning, tokens.shape).astype(tokens.dtype)
    ctx_mask = batch["encoder_continuous_mask"]
    ctx_mask = ctx_mask * dops.bcast_left(
        include_conditioning, ctx_mask.shape).astype(ctx_mask.dtype)
    context = self.audio_codec.scale_features(
        batch["encoder_continuous_inputs"], output_range=(-1.0, 1.0),
        clip=True)
    return self.module.apply(
        {"params": params},
        encoder_input_tokens=tokens,
        encoder_continuous_inputs=context,
        encoder_continuous_mask=ctx_mask,
        decoder_input_tokens=z_t,
        decoder_noise_time=noise_time,
        enable_dropout=enable_dropout,
        rngs={"dropout": dropout_rng})

  def loss_fn(self, params, batch, dropout_rng):
    loss, metrics = super().loss_fn(params, batch, dropout_rng)
    metrics["context_frames"] = jnp.mean(
        jnp.sum(batch["encoder_continuous_mask"], axis=-1).astype(
            jnp.float32))
    return loss, metrics
