"""Spectrogram-diffusion transformer networks.

Architecture-equivalent to the reference
(/root/reference/music_spectrogram_diffusion/models/diffusion/network.py):
a T5.1.1 encoder(-pair) and a FiLM-conditioned non-causal decoder that
denoises a whole spectrogram segment at once, cross-attending to the note
encoder and (optionally) a previous-segment context encoder.

TPU-native differences:

* `Decoder.precompute_cross_kv` projects cross-attention K/V from the
  (fixed per segment) encoder memory ONCE; the per-step `decode` path then
  consumes cached K/V. The reference re-projects K/V inside all ~1000
  sampler steps per layer — pure wasted MXU time since the memory never
  changes within a segment.
* Conditional + unconditional (classifier-free guidance) branches are
  evaluated as one 2B-batch forward via `decode_cfg_pair`, doubling matmul
  batch instead of doubling kernel launches.
* Compute dtype configurable (bf16 matmuls with f32 output projection).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from music_spectrogram_diffusion_tpu.models import layers
from music_spectrogram_diffusion_tpu.ops import diffusion as diffusion_ops

Array = jnp.ndarray

# (encoded, mask) pairs produced by `encode`.
EncodingsAndMasks = List[Tuple[Array, Array]]
# Per-decoder-layer cached cross-attention (key, value).
CrossKVCache = List[Tuple[Array, Array]]


@dataclasses.dataclass(frozen=True)
class NetworkConfig:
  """Transformer hyperparameters (mirrors reference T5Config)."""
  vocab_size: int
  dtype: Any = jnp.float32
  emb_dim: int = 512
  num_heads: int = 8
  num_encoder_layers: int = 6
  num_decoder_layers: int = 6
  head_dim: int = 64
  mlp_dim: int = 2048
  mlp_activations: Sequence[str] = ("relu",)
  dropout_rate: float = 0.1
  max_decoder_noise_time: float = 2e4
  # 'sum_cross_attends' | 'concat_encodings'
  cross_attend_style: str = "sum_cross_attends"
  # 'fixed' | 'fixed_permuted_offset' | 'learnable_permuted_offset' | 'random'
  position_encoding: str = "fixed"
  # 'regular' | 'terminal_relative'
  context_positions: str = "regular"
  # Static geometry: position tables are sized by these maxima and
  # indexed by the (possibly shorter, bucketed) runtime lengths, so
  # parameter shapes are stable across input buckets and match the
  # published checkpoints (task lengths 2048/256/256).
  max_input_length: int = 2048
  max_context_length: int = 256
  max_target_length: int = 256
  output_dim: int = 128
  # Route big-score attention through the Pallas flash kernel at
  # inference (deterministic) time; small scores and all training steps
  # take the XLA path (see layers.FLASH_MIN_SCORE_BYTES).
  use_fused_attention: bool = True
  # Rematerialize encoder/decoder layers on the backward pass (trade
  # FLOPs for activation memory; enables bigger per-chip train batches).
  remat: bool = False


def sequence_length_from_mask(mask: Array) -> Array:
  """Length of the leading non-zero run of a 1D mask (all padding -> 0)."""
  length = jnp.argmax(mask == 0)
  return jnp.where(jnp.logical_and(length == 0, mask[0] != 0),
                   mask.shape[0], length)


def terminal_relative_positions(positions: Array, seq_len: Array) -> Array:
  """Roll positions so a sequence's final element sits at a fixed index.

  E.g. max length 5, sequence length 2: [0,1,2,3,4] -> [3,4,0,1,2], so the
  last valid frame of the context always gets position id max_len-1 no
  matter how much of it is padding.
  """
  return jnp.roll(positions, seq_len, axis=0)


def position_encoder(config: NetworkConfig, max_length: int,
                     name: str = "position_encoder") -> nn.Module:
  """Position-embedding table per the configured encoding style."""
  if config.position_encoding == "fixed":
    init, fixed = layers.sinusoidal(), True
  elif config.position_encoding == "fixed_permuted_offset":
    init = layers.sinusoidal(permute_bands=True, random_phase_offsets=True)
    fixed = True
  elif config.position_encoding == "learnable_permuted_offset":
    init = layers.sinusoidal(permute_bands=True, random_phase_offsets=True)
    fixed = False
  elif config.position_encoding == "random":
    init, fixed = layers.default_embed_init, False
  else:
    raise ValueError(
        f"Unknown position_encoding: {config.position_encoding}")
  return layers.Embed(
      num_embeddings=max_length, features=config.emb_dim,
      dtype=config.dtype, embedding_init=init, fixed=fixed, name=name)


class EncoderLayer(nn.Module):
  """Pre-LN self-attention + MLP block."""
  config: NetworkConfig

  @nn.compact
  def __call__(self, inputs: Array, mask: Array,
               deterministic: bool) -> Array:
    cfg = self.config

    x = layers.RMSNorm(dtype=cfg.dtype, name="pre_attention_norm")(inputs)
    # Padding masks are row-constant, so the self-attention mask rides
    # as a [b, len] kv vector instead of a [b, 1, len, len] bias (the
    # bias is score-sized: 16 MB/example at 2048 tokens — it dominated
    # encoder HBM traffic in training). Padded QUERY rows now attend
    # the valid keys instead of being fully masked; their outputs are
    # garbage either way and every consumer masks encoder keys.
    x = layers.MultiHeadAttention(
        num_heads=cfg.num_heads, head_dim=cfg.head_dim,
        out_features=cfg.emb_dim, dtype=cfg.dtype,
        dropout_rate=cfg.dropout_rate,
        use_fused_attention=cfg.use_fused_attention, name="attention")(
            x, x, kv_mask=(mask > 0), deterministic=deterministic)
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
  """FiLM-conditioned denoiser layer: self-attn (no causal mask) +
  cross-attn over the encoder memory + gated MLP.

  FiLM is applied to the normed activations before self-attention and
  before the MLP (reference network.py:177-178,243-244)."""
  config: NetworkConfig

  def setup(self):
    cfg = self.config
    self.pre_self_attention_norm = layers.RMSNorm(
        dtype=cfg.dtype, name="pre_self_attention_norm")
    self.self_attention_film = layers.FiLM(name="self_attention_film")
    self.self_attention = layers.MultiHeadAttention(
        num_heads=cfg.num_heads, head_dim=cfg.head_dim,
        out_features=cfg.emb_dim, dtype=cfg.dtype,
        dropout_rate=cfg.dropout_rate,
        use_fused_attention=cfg.use_fused_attention,
        name="self_attention")
    self.pre_cross_attention_norm = layers.RMSNorm(
        dtype=cfg.dtype, name="pre_cross_attention_norm")
    if cfg.cross_attend_style == "concat_encodings":
      n_cross = 1
    elif cfg.cross_attend_style == "sum_cross_attends":
      # One cross-attention module per encoder; sized for the max (2).
      n_cross = 2
    else:
      raise ValueError(
          f"Unknown cross_attend_style: {cfg.cross_attend_style}")
    self.cross_attentions = [
        layers.MultiHeadAttention(
            num_heads=cfg.num_heads, head_dim=cfg.head_dim,
            out_features=cfg.emb_dim, dtype=cfg.dtype,
            dropout_rate=cfg.dropout_rate,
            use_fused_attention=cfg.use_fused_attention,
            name=f"cross_attention_{i}")
        for i in range(n_cross)]
    self.pre_mlp_norm = layers.RMSNorm(dtype=cfg.dtype, name="pre_mlp_norm")
    self.mlp_film = layers.FiLM(name="mlp_film")
    self.mlp = layers.MlpBlock(
        intermediate_dim=cfg.mlp_dim, activations=cfg.mlp_activations,
        intermediate_dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
        name="mlp")
    self.dropout = nn.Dropout(rate=cfg.dropout_rate, broadcast_dims=(-2,))

  def precompute_cross_kv(
      self, encodings_and_masks: EncodingsAndMasks) -> CrossKVCache:
    """Project cross-attention K/V for each memory; done once per segment."""
    cfg = self.config
    if cfg.cross_attend_style == "concat_encodings":
      encoded = jnp.concatenate([e for e, _ in encodings_and_masks], axis=1)
      return [self.cross_attentions[0].project_kv(encoded)]
    return [self.cross_attentions[i].project_kv(e)
            for i, (e, _) in enumerate(encodings_and_masks)]

  def __call__(self,
               inputs: Array,
               encodings_and_encdec_masks: EncodingsAndMasks,
               conditioning: Optional[Array],
               deterministic: bool = False,
               cross_kv: Optional[CrossKVCache] = None,
               cond_rows: Optional[int] = None) -> Array:
    cfg = self.config

    x = self.pre_self_attention_norm(inputs)
    if conditioning is not None:
      x = self.self_attention_film(x, conditioning)
    # The denoiser sees the whole segment at once: no causal mask.
    x = self.self_attention(x, x, deterministic=deterministic)
    x = self.dropout(x, deterministic=deterministic)
    x = x + inputs

    y = self.pre_cross_attention_norm(x)
    # Classifier-free guidance fast path: rows >= cond_rows are the
    # unconditional half, whose cross-attention output is exactly zero
    # (all keys masked + zero_if_all_masked). Compute cross-attention
    # on the conditional rows only and concatenate zeros — identical
    # math at ~half the cross-attention cost and KV reads.
    if cond_rows is not None and cond_rows < y.shape[0]:
      y_q = y[:cond_rows]
      zeros_tail_rows = y.shape[0] - cond_rows
    else:
      y_q = y
      zeros_tail_rows = 0

    def pad_uncond(attn_out):
      if zeros_tail_rows == 0:
        return attn_out
      return jnp.concatenate(
          [attn_out,
           jnp.zeros((zeros_tail_rows,) + attn_out.shape[1:],
                     attn_out.dtype)], axis=0)

    # Masks here are raw [batch, kv_len] keep-masks (row-constant over
    # queries); MultiHeadAttention streams them as-is on the fused path
    # (q*kv-bias-free) and folds them into an additive bias on XLA.
    if cfg.cross_attend_style == "concat_encodings":
      encoded = jnp.concatenate(
          [e for e, _ in encodings_and_encdec_masks], axis=1)
      mask = jnp.concatenate(
          [jnp.asarray(m, cfg.dtype)
           for _, m in encodings_and_encdec_masks], axis=-1)
      y_n = self.cross_attentions[0](
          y_q, encoded, kv_mask=mask, deterministic=deterministic,
          cached_kv=cross_kv[0] if cross_kv is not None else None)
      y_n = layers.zero_if_all_masked(y_n, mask)
      y = pad_uncond(y_n)
      y = self.dropout(y, deterministic=deterministic)
      y = y + x
    else:  # sum_cross_attends
      ys = []
      for i, (encoded, mask) in enumerate(encodings_and_encdec_masks):
        mask = jnp.asarray(mask, cfg.dtype)
        y_n = self.cross_attentions[i](
            y_q, encoded, kv_mask=mask, deterministic=deterministic,
            cached_kv=cross_kv[i] if cross_kv is not None else None)
        y_n = layers.zero_if_all_masked(y_n, mask)
        y_n = self.dropout(y_n, deterministic=deterministic)
        ys.append(y_n)
      y = pad_uncond(sum(ys)) + x

    z = self.pre_mlp_norm(y)
    if conditioning is not None:
      z = self.mlp_film(z, conditioning)
    z = self.mlp(z, deterministic=deterministic)
    z = self.dropout(z, deterministic=deterministic)
    return z + y


class TokenEncoder(nn.Module):
  """Encodes MIDI event tokens."""
  config: NetworkConfig

  @nn.compact
  def __call__(self, token_ids: Array, mask: Array,
               deterministic: bool) -> Tuple[Array, Array]:
    cfg = self.config
    assert token_ids.ndim == 2  # [batch, length]
    seq_length = token_ids.shape[1]
    assert seq_length <= cfg.max_input_length, (
        f"{seq_length} > max_input_length {cfg.max_input_length}")
    positions = jnp.arange(seq_length)[None, :]

    x = layers.Embed(
        num_embeddings=cfg.vocab_size, features=cfg.emb_dim,
        dtype=cfg.dtype, embedding_init=nn.initializers.normal(stddev=1.0),
        one_hot=True, name="token_embedder")(token_ids.astype("int32"))
    x += position_encoder(cfg, cfg.max_input_length)(positions)
    x = nn.Dropout(rate=cfg.dropout_rate, broadcast_dims=(-2,))(
        x, deterministic=deterministic)
    x = x.astype(cfg.dtype)

    layer_cls = (nn.remat(EncoderLayer, static_argnums=(3,))
                 if cfg.remat else EncoderLayer)
    for lyr in range(cfg.num_encoder_layers):
      x = layer_cls(config=cfg, name=f"layers_{lyr}")(
          x, mask, deterministic)
    x = layers.RMSNorm(dtype=cfg.dtype, name="encoder_norm")(x)
    x = nn.Dropout(rate=cfg.dropout_rate)(x, deterministic=deterministic)
    return x, mask


class ContinuousEncoder(nn.Module):
  """Encodes the previous segment's spectrogram (the 'context').

  With `context_positions='terminal_relative'` the position ids are rolled
  so the context's last valid frame always lands on the same position id,
  keeping the boundary geometry constant across variable-length contexts.
  """
  config: NetworkConfig

  @nn.compact
  def __call__(self, continuous_inputs: Array, mask: Array,
               deterministic: bool) -> Tuple[Array, Array]:
    cfg = self.config
    assert continuous_inputs.ndim == 3  # [batch, length, n_dims]
    max_positions = continuous_inputs.shape[1]
    assert max_positions <= cfg.max_context_length, (
        f"{max_positions} > max_context_length {cfg.max_context_length}")

    x = layers.DenseGeneral(
        features=cfg.emb_dim, dtype=cfg.dtype,
        kernel_axes=("vocab", "embed"), name="input_proj")(continuous_inputs)

    if cfg.context_positions == "regular":
      positions = jnp.arange(max_positions)[None, :]
    elif cfg.context_positions == "terminal_relative":
      positions = jnp.broadcast_to(
          jnp.arange(max_positions), continuous_inputs.shape[:2])
      seq_lens = jax.vmap(sequence_length_from_mask)(mask)
      positions = jax.vmap(terminal_relative_positions)(positions, seq_lens)
    else:
      raise ValueError(f"Unknown context_positions: {cfg.context_positions}")

    x += position_encoder(cfg, cfg.max_context_length)(positions)
    x = nn.Dropout(rate=cfg.dropout_rate, broadcast_dims=(-2,))(
        x, deterministic=deterministic)
    x = x.astype(cfg.dtype)

    layer_cls = (nn.remat(EncoderLayer, static_argnums=(3,))
                 if cfg.remat else EncoderLayer)
    for lyr in range(cfg.num_encoder_layers):
      x = layer_cls(config=cfg, name=f"layers_{lyr}")(
          x, mask, deterministic)
    x = layers.RMSNorm(dtype=cfg.dtype, name="encoder_norm")(x)
    x = nn.Dropout(rate=cfg.dropout_rate)(x, deterministic=deterministic)
    return x, mask


class Decoder(nn.Module):
  """Denoising decoder: z_t + diffusion time -> model output (eps)."""
  config: NetworkConfig

  def setup(self):
    cfg = self.config
    self.time_emb_dense0 = layers.DenseGeneral(
        features=cfg.emb_dim * 4, dtype=cfg.dtype,
        kernel_axes=("vocab", "embed"), name="time_emb_dense0")
    self.time_emb_dense1 = layers.DenseGeneral(
        features=cfg.emb_dim * 4, dtype=cfg.dtype,
        kernel_axes=("vocab", "embed"), name="time_emb_dense1")
    self.continuous_inputs_projection = layers.DenseGeneral(
        features=cfg.emb_dim, dtype=cfg.dtype,
        kernel_init=nn.linear.default_kernel_init,
        kernel_axes=("vocab", "embed"),
        name="continuous_inputs_projection")
    decoder_layer_cls = (
        nn.remat(DecoderLayer, static_argnums=(4, 6)) if cfg.remat
        else DecoderLayer)
    self.decoder_layers = [
        decoder_layer_cls(config=cfg, name=f"layers_{i}")
        for i in range(cfg.num_decoder_layers)]
    self.decoder_norm = layers.RMSNorm(dtype=cfg.dtype, name="decoder_norm")
    self.dropout = nn.Dropout(rate=cfg.dropout_rate, broadcast_dims=(-2,))
    self.position_encoder = position_encoder(
        cfg, cfg.max_target_length, name="position_encoder")
    # Final projection in float32 for numerical stability of the sampler.
    self.spec_out_dense = layers.DenseGeneral(
        features=cfg.output_dim, dtype=jnp.float32,
        kernel_axes=("embed", "vocab"), name="spec_out_dense")

  def _conditioning(self, noise_time: Array, batch: int) -> Array:
    """Diffusion time -> FiLM conditioning embedding [batch, 1, 4*emb]."""
    cfg = self.config
    emb = diffusion_ops.timing_embedding(
        noise_time * cfg.max_decoder_noise_time, cfg.emb_dim,
        max_timescale=cfg.max_decoder_noise_time)
    emb = nn.swish(self.time_emb_dense0(emb))
    emb = nn.swish(self.time_emb_dense1(emb))
    emb = jnp.expand_dims(emb, axis=1)
    assert emb.shape == (batch, 1, cfg.emb_dim * 4)
    return emb

  def precompute_cross_kv(
      self, encodings_and_masks: EncodingsAndMasks) -> CrossKVCache:
    """Per-layer cross-attention K/V over the fixed encoder memory."""
    return [lyr.precompute_cross_kv(encodings_and_masks)
            for lyr in self.decoder_layers]

  def __call__(self,
               encodings_and_masks: EncodingsAndMasks,
               decoder_input_tokens: Array,
               decoder_noise_time: Array,
               deterministic: bool = False,
               cross_kv: Optional[List[CrossKVCache]] = None,
               cond_rows: Optional[int] = None) -> Array:
    cfg = self.config
    batch, seq_length, n_out = decoder_input_tokens.shape
    assert decoder_noise_time.shape == (batch,)
    assert seq_length <= cfg.max_target_length, (
        f"segment length {seq_length} exceeds configured "
        f"max_target_length {cfg.max_target_length}")
    assert n_out == cfg.output_dim, (
        f"decoder input dim {n_out} != configured output_dim "
        f"{cfg.output_dim}")

    conditioning = self._conditioning(decoder_noise_time, batch)
    # The denoiser attends from every decoder position, so the
    # encoder-decoder mask is row-constant: pass the raw [batch, kv]
    # keep-masks straight through to the layers.
    encdec = encodings_and_masks

    positions = jnp.broadcast_to(
        jnp.arange(seq_length), (batch, seq_length))
    position_encodings = self.position_encoder(positions)

    inputs = self.continuous_inputs_projection(decoder_input_tokens)
    inputs += position_encodings
    inputs = self.dropout(inputs, deterministic=deterministic)
    y = inputs.astype(cfg.dtype)

    for i, lyr in enumerate(self.decoder_layers):
      y = lyr(y, encdec, conditioning, deterministic,
              cross_kv[i] if cross_kv is not None else None, cond_rows)

    y = self.decoder_norm(y)
    y = self.dropout(y, deterministic=deterministic)

    return self.spec_out_dense(y)


class Transformer(nn.Module):
  """Single-encoder (notes only) diffusion transformer."""
  config: NetworkConfig

  def setup(self):
    self.encoder = TokenEncoder(config=self.config, name="encoder")
    self.decoder = Decoder(config=self.config, name="decoder")

  def encode(self, encoder_input_tokens: Array,
             enable_dropout: bool = True) -> EncodingsAndMasks:
    assert encoder_input_tokens.ndim == 2
    mask = encoder_input_tokens > 0
    encoded, mask = self.encoder(
        encoder_input_tokens, mask, deterministic=not enable_dropout)
    return [(encoded, mask)]

  def precompute_cross_kv(
      self, encodings_and_masks: EncodingsAndMasks) -> List[CrossKVCache]:
    return self.decoder.precompute_cross_kv(encodings_and_masks)

  def decode(self, encodings_and_masks: EncodingsAndMasks,
             decoder_input_tokens: Array, decoder_noise_time: Array,
             enable_dropout: bool = True,
             cross_kv: Optional[List[CrossKVCache]] = None,
             cond_rows: Optional[int] = None) -> Array:
    out = self.decoder(
        encodings_and_masks=encodings_and_masks,
        decoder_input_tokens=decoder_input_tokens,
        decoder_noise_time=decoder_noise_time,
        deterministic=not enable_dropout,
        cross_kv=cross_kv,
        cond_rows=cond_rows)
    return out.astype(self.config.dtype)

  def __call__(self, encoder_input_tokens: Array,
               decoder_input_tokens: Array, decoder_noise_time: Array,
               *, enable_dropout: bool = True) -> Array:
    encodings_and_masks = self.encode(
        encoder_input_tokens, enable_dropout=enable_dropout)
    return self.decode(
        encodings_and_masks, decoder_input_tokens, decoder_noise_time,
        enable_dropout=enable_dropout)


class ContextTransformer(nn.Module):
  """Dual-encoder (notes + previous-segment context) diffusion transformer."""
  config: NetworkConfig

  def setup(self):
    self.token_encoder = TokenEncoder(config=self.config,
                                      name="token_encoder")
    self.continuous_encoder = ContinuousEncoder(config=self.config,
                                                name="continuous_encoder")
    self.decoder = Decoder(config=self.config, name="decoder")

  def encode(self, input_tokens: Array, continuous_inputs: Array,
             continuous_mask: Array,
             enable_dropout: bool = True) -> EncodingsAndMasks:
    assert input_tokens.ndim == 2
    assert continuous_inputs.ndim == 3
    tokens_mask = input_tokens > 0
    tokens_encoded, tokens_mask = self.token_encoder(
        input_tokens, tokens_mask, deterministic=not enable_dropout)
    continuous_encoded, continuous_mask = self.continuous_encoder(
        continuous_inputs, continuous_mask,
        deterministic=not enable_dropout)
    return [(tokens_encoded, tokens_mask),
            (continuous_encoded, continuous_mask)]

  def precompute_cross_kv(
      self, encodings_and_masks: EncodingsAndMasks) -> List[CrossKVCache]:
    return self.decoder.precompute_cross_kv(encodings_and_masks)

  def decode(self, encodings_and_masks: EncodingsAndMasks,
             input_tokens: Array, noise_time: Array,
             enable_dropout: bool = True,
             cross_kv: Optional[List[CrossKVCache]] = None,
             cond_rows: Optional[int] = None) -> Array:
    out = self.decoder(
        encodings_and_masks=encodings_and_masks,
        decoder_input_tokens=input_tokens,
        decoder_noise_time=noise_time,
        deterministic=not enable_dropout,
        cross_kv=cross_kv,
        cond_rows=cond_rows)
    return out.astype(self.config.dtype)

  def __call__(self, encoder_input_tokens: Array,
               encoder_continuous_inputs: Array,
               encoder_continuous_mask: Array,
               decoder_input_tokens: Array, decoder_noise_time: Array,
               *, enable_dropout: bool = True) -> Array:
    encodings_and_masks = self.encode(
        encoder_input_tokens, encoder_continuous_inputs,
        encoder_continuous_mask, enable_dropout=enable_dropout)
    return self.decode(
        encodings_and_masks, decoder_input_tokens, decoder_noise_time,
        enable_dropout=enable_dropout)
