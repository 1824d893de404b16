"""Autoregressive spectrogram transformer (baseline model family).

Plain T5.1.1 encoder-decoder predicting continuous mel frames one at a
time (reference models/autoregressive/network.py). TPU-native details:

* The decode path uses DecodeCacheAttention's [B, H, D, L] cache layout
  with one-hot broadcast scatter (the layout XLA fuses without gathers).
* The full generation loop lives in model.py as a single lax.scan over
  the target length, carrying the flax cache functionally.
* Reference quirk preserved: the encoder self-attention mask is all-ones
  (padding is attended to! network.py:275-281) while the encoder-decoder
  mask masks padding via tokens > 0.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from music_spectrogram_diffusion_tpu.models import layers

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ARConfig:
  vocab_size: int
  dtype: Any = jnp.float32
  emb_dim: int = 512
  num_heads: int = 8
  num_encoder_layers: int = 6
  num_decoder_layers: int = 6
  head_dim: int = 64
  mlp_dim: int = 2048
  output_dim: int = 0  # 0 -> natural output size (input depth)
  audio_dim: int = 128  # decoder input (previous frame) depth
  mlp_activations: Sequence[str] = ("relu",)
  dropout_rate: float = 0.1


class EncoderLayer(nn.Module):
  config: ARConfig

  @nn.compact
  def __call__(self, inputs, encoder_mask=None, deterministic=False):
    cfg = self.config
    x = layers.RMSNorm(dtype=cfg.dtype, name="pre_attention_norm")(inputs)
    x = layers.MultiHeadAttention(
        num_heads=cfg.num_heads, head_dim=cfg.head_dim,
        out_features=cfg.emb_dim, dtype=cfg.dtype,
        dropout_rate=cfg.dropout_rate, name="attention")(
            x, x, encoder_mask, deterministic=deterministic)
    x = nn.Dropout(rate=cfg.dropout_rate, broadcast_dims=(-2,))(
        x, deterministic=deterministic)
    x = x + inputs
    y = layers.RMSNorm(dtype=cfg.dtype, name="pre_mlp_norm")(x)
    y = layers.MlpBlock(
        intermediate_dim=cfg.mlp_dim, activations=cfg.mlp_activations,
        intermediate_dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
        name="mlp")(y, deterministic=deterministic)
    y = nn.Dropout(rate=cfg.dropout_rate, broadcast_dims=(-2,))(
        y, deterministic=deterministic)
    return y + x


class DecoderLayer(nn.Module):
  config: ARConfig

  @nn.compact
  def __call__(self, inputs, encoded, decoder_mask=None,
               encoder_decoder_mask=None, deterministic=False,
               decode=False):
    cfg = self.config
    x = layers.RMSNorm(dtype=cfg.dtype,
                       name="pre_self_attention_norm")(inputs)
    x = layers.DecodeCacheAttention(
        num_heads=cfg.num_heads, head_dim=cfg.head_dim,
        dtype=cfg.dtype, dropout_rate=cfg.dropout_rate,
        name="self_attention")(
            x, x, decoder_mask, deterministic=deterministic,
            decode=decode)
    x = nn.Dropout(rate=cfg.dropout_rate, broadcast_dims=(-2,))(
        x, deterministic=deterministic)
    x = x + inputs

    y = layers.RMSNorm(dtype=cfg.dtype,
                       name="pre_cross_attention_norm")(x)
    cross = layers.MultiHeadAttention(
        num_heads=cfg.num_heads, head_dim=cfg.head_dim,
        out_features=cfg.emb_dim, dtype=cfg.dtype,
        dropout_rate=cfg.dropout_rate,
        name="encoder_decoder_attention")
    if decode:
      # The encoder memory is fixed for the whole generation, so its
      # K/V projections are computed ONCE on the cache-init pass and
      # stored alongside the self-attention decode cache — without
      # this, every single-token decode step re-projects the full
      # encoder output through K and V in every layer (the dominant
      # cost of AR/MT3 generation).
      if not self.has_variable("cache", "cross_key"):
        k_init, v_init = cross.project_kv(encoded)
      else:
        k_init = v_init = None
      ck = self.variable("cache", "cross_key", lambda: k_init)
      cv = self.variable("cache", "cross_value", lambda: v_init)
      y = cross(y, None, encoder_decoder_mask,
                cached_kv=(ck.value, cv.value),
                deterministic=deterministic)
    else:
      y = cross(y, encoded, encoder_decoder_mask,
                deterministic=deterministic)
    y = nn.Dropout(rate=cfg.dropout_rate, broadcast_dims=(-2,))(
        y, deterministic=deterministic)
    y = y + x

    z = layers.RMSNorm(dtype=cfg.dtype, name="pre_mlp_norm")(y)
    z = layers.MlpBlock(
        intermediate_dim=cfg.mlp_dim, activations=cfg.mlp_activations,
        intermediate_dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
        name="mlp")(z, deterministic=deterministic)
    z = nn.Dropout(rate=cfg.dropout_rate, broadcast_dims=(-2,))(
        z, deterministic=deterministic)
    return z + y


class Encoder(nn.Module):
  config: ARConfig

  @nn.compact
  def __call__(self, encoder_input_tokens, encoder_mask=None,
               deterministic=False):
    cfg = self.config
    seq_length = encoder_input_tokens.shape[1]
    positions = jnp.arange(seq_length)[None, :]
    x = layers.Embed(
        num_embeddings=cfg.vocab_size, features=cfg.emb_dim,
        dtype=cfg.dtype, embedding_init=nn.initializers.normal(stddev=1.0),
        one_hot=True, name="token_embedder")(
            encoder_input_tokens.astype("int32"))
    x = x + layers.FixedEmbed(features=cfg.emb_dim,
                              name="position_embedder")(positions)
    x = nn.Dropout(rate=cfg.dropout_rate, broadcast_dims=(-2,))(
        x, deterministic=deterministic)
    x = x.astype(cfg.dtype)
    for lyr in range(cfg.num_encoder_layers):
      x = EncoderLayer(config=cfg, name=f"layers_{lyr}")(
          x, encoder_mask, deterministic)
    x = layers.RMSNorm(dtype=cfg.dtype, name="encoder_norm")(x)
    return nn.Dropout(rate=cfg.dropout_rate)(x,
                                             deterministic=deterministic)


class Decoder(nn.Module):
  config: ARConfig

  @nn.compact
  def __call__(self, encoded, decoder_input_tokens, decoder_mask=None,
               encoder_decoder_mask=None, deterministic=False,
               decode=False):
    cfg = self.config
    seq_length = decoder_input_tokens.shape[1]
    positions = jnp.arange(seq_length)[None, :]
    assert decoder_input_tokens.ndim == 3
    y = layers.DenseGeneral(
        cfg.emb_dim, dtype=cfg.dtype,
        kernel_init=nn.linear.default_kernel_init,
        kernel_axes=("vocab", "embed"),
        name="continuous_inputs_projection")(decoder_input_tokens)
    y = y + layers.FixedEmbed(features=cfg.emb_dim,
                              name="position_embedder")(
                                  positions, decode=decode)
    y = nn.Dropout(rate=cfg.dropout_rate, broadcast_dims=(-2,))(
        y, deterministic=deterministic)
    y = y.astype(cfg.dtype)
    for lyr in range(cfg.num_decoder_layers):
      y = DecoderLayer(config=cfg, name=f"layers_{lyr}")(
          y, encoded, decoder_mask=decoder_mask,
          encoder_decoder_mask=encoder_decoder_mask,
          deterministic=deterministic, decode=decode)
    y = layers.RMSNorm(dtype=cfg.dtype, name="decoder_norm")(y)
    y = nn.Dropout(rate=cfg.dropout_rate, broadcast_dims=(-2,))(
        y, deterministic=deterministic)
    n_out = cfg.output_dim or decoder_input_tokens.shape[-1]
    return layers.DenseGeneral(
        n_out, dtype=jnp.float32, kernel_axes=("embed", "vocab"),
        name="spec_out_dense")(y)


class ARTransformer(nn.Module):
  """Encoder-decoder transformer for autoregressive mel generation."""
  config: ARConfig

  def setup(self):
    self.encoder = Encoder(config=self.config, name="encoder")
    self.decoder = Decoder(config=self.config, name="decoder")

  def encode(self, encoder_input_tokens, enable_dropout=True):
    cfg = self.config
    assert encoder_input_tokens.ndim == 2
    # Reference parity: all-ones self-attention mask (padding attended).
    encoder_mask = layers.make_attention_mask(
        jnp.ones_like(encoder_input_tokens),
        jnp.ones_like(encoder_input_tokens), dtype=cfg.dtype)
    return self.encoder(encoder_input_tokens, encoder_mask,
                        deterministic=not enable_dropout)

  def decode(self, encoded, encoder_input_tokens, decoder_input_tokens,
             decoder_target_tokens, enable_dropout=True, decode=False):
    cfg = self.config
    encoder_mask = encoder_input_tokens > 0
    target_mask = jnp.ones(decoder_target_tokens.shape[:2])
    encoder_decoder_mask = layers.make_attention_mask(
        target_mask, encoder_mask, dtype=cfg.dtype)
    if decode:
      decoder_mask = None
      # Single-position query: encoder-decoder mask for one step.
      encoder_decoder_mask = layers.make_attention_mask(
          jnp.ones((decoder_input_tokens.shape[0], 1)), encoder_mask,
          dtype=cfg.dtype)
    else:
      decoder_mask = layers.make_decoder_mask(
          decoder_target_tokens=target_mask, dtype=cfg.dtype)
    out = self.decoder(
        encoded, decoder_input_tokens=decoder_input_tokens,
        decoder_mask=decoder_mask,
        encoder_decoder_mask=encoder_decoder_mask,
        deterministic=not enable_dropout, decode=decode)
    return out.astype(cfg.dtype)

  def __call__(self, encoder_input_tokens, decoder_input_tokens,
               decoder_target_tokens, *, enable_dropout=True,
               decode=False):
    encoded = self.encode(encoder_input_tokens,
                          enable_dropout=enable_dropout)
    return self.decode(encoded, encoder_input_tokens,
                       decoder_input_tokens, decoder_target_tokens,
                       enable_dropout=enable_dropout, decode=decode)
