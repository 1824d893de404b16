"""Autoregressive model API: teacher-forced loss + cached decode loop.

Replaces the reference's t5x EncoderDecoderModel subclass
(reference models/autoregressive/models.py): the generation loop is a
single lax.scan over target length, carrying the flax decode cache
functionally — one compiled program, no per-step dispatch.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from music_spectrogram_diffusion_tpu.audio import codecs
from music_spectrogram_diffusion_tpu.models.autoregressive import (
    network, output_functions)
from music_spectrogram_diffusion_tpu.ops import diffusion as dops

Array = jnp.ndarray
PyTree = Any


class AutoregressiveModel:
  """Continuous-output encoder-decoder with an output head."""

  USES_CONTEXT = False

  def __init__(self, module: network.ARTransformer,
               output_function: output_functions.OutputFunction,
               audio_codec: codecs.AudioCodec):
    self.module = module
    self.output_function = output_function
    self.audio_codec = audio_codec

  def init_variables(self, rng: jax.Array,
                     input_shapes: Mapping[str, Tuple[int, ...]],
                     input_types: Optional[Mapping[str, Any]] = None):
    input_types = dict(input_types or {})
    enc_shape = input_shapes["encoder_input_tokens"]
    dec_shape = input_shapes["decoder_target_tokens"]
    in_dim = self.audio_codec.n_dims
    return self.module.init(
        rng,
        encoder_input_tokens=jnp.ones(
            enc_shape, input_types.get("encoder_input_tokens", jnp.int32)),
        decoder_input_tokens=jnp.ones(dec_shape[:2] + (in_dim,)),
        decoder_target_tokens=jnp.ones(dec_shape[:2] + (in_dim,)),
        enable_dropout=False)

  # -- training -------------------------------------------------------------

  def loss_fn(self, params: PyTree, batch: Mapping[str, Array],
              dropout_rng: Optional[jax.Array]
              ) -> Tuple[Array, Dict[str, Array]]:
    targets = batch["decoder_target_tokens"]
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
    outputs = self.module.apply(
        {"params": params},
        encoder_input_tokens=batch["encoder_input_tokens"],
        decoder_input_tokens=batch["decoder_input_tokens"],
        decoder_target_tokens=targets,
        enable_dropout=dropout_rng is not None,
        rngs=rngs)
    loss = self.output_function.get_loss(outputs, targets)
    loss = loss * batch["decoder_target_mask"]
    loss = jnp.sum(loss)
    n_frames = jnp.sum(batch["decoder_target_mask"])
    return loss, {
        "loss": loss,
        "loss_per_frame": loss / jnp.maximum(n_frames, 1),
        "n_frames": n_frames,
        "n_seqs": jnp.asarray(targets.shape[0], jnp.float32),
    }

  # -- generation -----------------------------------------------------------

  def predict(self, params: PyTree, batch: Mapping[str, Array],
              rng: Optional[jax.Array] = None
              ) -> Tuple[Array, Array]:
    """Autoregressively generate the target spectrogram segment."""
    if rng is None:
      rng = jax.random.PRNGKey(42)
    tokens = batch["encoder_input_tokens"]
    target_shape = batch["decoder_target_tokens"].shape
    batch_size, target_len = target_shape[0], target_shape[1]
    n_dims = self.audio_codec.n_dims

    encoded = self.module.apply(
        {"params": params}, tokens, enable_dropout=False,
        method=self.module.encode)

    # Initialize the decode cache with a full-length pass.
    init_tokens = jnp.zeros((batch_size, target_len, n_dims))
    _, variables = self.module.apply(
        {"params": params}, encoded, tokens, init_tokens, init_tokens,
        enable_dropout=False, decode=True, mutable=["cache"],
        method=self.module.decode)
    cache = variables["cache"]

    # Per-example keys: a song's samples must not depend on its batch
    # neighbours (Synthesizer.render_songs' batch-invariance contract).
    # The diffusion sampler passes per-example keys already; a single
    # key is split per example here.
    if dops.is_batched_key(rng):
      example_keys = rng
    else:
      example_keys = jax.random.split(rng, batch_size)

    def step(carry, _):
      prev_y, cache, keys = carry
      outputs, vars_out = self.module.apply(
          {"params": params, "cache": cache},
          encoded, tokens, prev_y,
          jnp.zeros((batch_size, 1, n_dims)),
          enable_dropout=False, decode=True, mutable=["cache"],
          method=self.module.decode)
      split = jax.vmap(jax.random.split)(keys)  # [B, 2, key]
      keys, sample_keys = split[:, 0], split[:, 1]
      y = jax.vmap(lambda o, k: self.output_function.get_sample(o, k))(
          outputs[:, 0], sample_keys)
      y = y[:, None, :]
      return (y, vars_out["cache"], keys), y

    init_y = jnp.zeros((batch_size, 1, n_dims))
    (_, _, _), ys = jax.lax.scan(
        step, (init_y, cache, example_keys), None, length=target_len)
    # ys: [length, batch, 1, n_dims] -> [batch, length, n_dims]
    decodes = jnp.transpose(ys[:, :, 0, :], (1, 0, 2))
    return decodes, jnp.zeros((batch_size,))
