"""Checkpoint utilities: t5x param-tree remap + orbax save/restore."""

import numpy as np

from music_spectrogram_diffusion_tpu import config as cfg_lib
from music_spectrogram_diffusion_tpu.infer import inference
from music_spectrogram_diffusion_tpu.train import checkpoints


def test_remap_t5x_params():
  """Reference module names -> this framework's names."""
  t5x_tree = {
      "decoder": {
          "layers_0": {
              "pre_self_attention_layer_norm": {"scale": np.ones(4)},
              "FiLMLayer_0": {"DenseGeneral_0": {"kernel": np.ones(2)}},
              "FiLMLayer_1": {"DenseGeneral_0": {"kernel": np.ones(2)}},
              "MultiHeadDotProductAttention_0": {
                  "query": {"kernel": np.ones(2)}},
              "self_attention": {"query": {"kernel": np.ones(2)}},
              "pre_cross_attention_layer_norm": {"scale": np.ones(4)},
              "pre_mlp_layer_norm": {"scale": np.ones(4)},
              "mlp": {"wi_0": {"kernel": np.ones(2)}},
          },
          "Embed_0": {"embedding": np.ones(3)},
          "decoder_norm": {"scale": np.ones(4)},
          "spec_out_dense": {"kernel": np.ones(2)},
          "time_emb_dense0": {"kernel": np.ones(2)},
      },
      "token_encoder": {
          "layers_0": {
              "pre_attention_layer_norm": {"scale": np.ones(4)},
              "attention": {"key": {"kernel": np.ones(2)}},
          },
          "token_embedder": {"embedding": np.ones(3)},
          "Embed_0": {"embedding": np.ones(3)},
          "encoder_norm": {"scale": np.ones(4)},
      },
      "continuous_encoder": {
          "input_proj": {"kernel": np.ones(2)},
          "Embed_0": {"embedding": np.ones(3)},
      },
  }
  remapped = checkpoints.remap_t5x_params(t5x_tree)
  dec = remapped["decoder"]["layers_0"]
  assert "pre_self_attention_norm" in dec
  assert "self_attention_film" in dec
  assert "mlp_film" in dec
  assert "cross_attention_0" in dec
  assert "query" in dec["cross_attention_0"]
  assert "position_encoder" in remapped["decoder"]
  assert "position_encoder" in remapped["token_encoder"]
  enc = remapped["token_encoder"]["layers_0"]
  assert "pre_attention_norm" in enc
  # Untouched names survive.
  assert "spec_out_dense" in remapped["decoder"]
  assert "input_proj" in remapped["continuous_encoder"]


def test_latest_checkpoint(tmp_path):
  import os
  for step in [3, 10, 7]:
    os.makedirs(tmp_path / f"step_{step}")
    (tmp_path / f"step_{step}" / "METADATA").write_text("{}")
  assert checkpoints.latest_checkpoint(str(tmp_path)).endswith("step_10")
  assert checkpoints.latest_checkpoint(str(tmp_path / "nope")) is None


def test_latest_checkpoint_skips_partial_saves(tmp_path):
  """A kill mid-save leaves step_<N>/ without the orbax payload; resume
  must pick the newest COMMITTED checkpoint, not crash-loop on the
  partial (hit for real on the round-4 teacher run)."""
  import os
  os.makedirs(tmp_path / "step_500" / "state")  # committed payload
  os.makedirs(tmp_path / "step_1000")           # interrupted: no state
  assert checkpoints.latest_checkpoint(str(tmp_path)).endswith("step_500")
  # A directory holding only partials has no usable checkpoint at all.
  os.rename(tmp_path / "step_500" / "state", tmp_path / "step_500" / "x")
  assert checkpoints.latest_checkpoint(str(tmp_path)) is None


def test_ar_preset_build():
  import jax
  import jax.numpy as jnp
  exp = cfg_lib.preset("ar_tiny")
  model = inference.build_model(exp)
  batch_shapes = {
      "encoder_input_tokens": (1, 16),
      "decoder_target_tokens": (1, 8, 128),
  }
  params = model.init_variables(
      jax.random.PRNGKey(0), batch_shapes)["params"]
  batch = {
      "encoder_input_tokens": jnp.ones((1, 16), jnp.int32),
      "decoder_target_tokens": jnp.zeros((1, 8, 128)),
      "decoder_input_tokens": jnp.zeros((1, 8, 128)),
      "decoder_target_mask": jnp.ones((1, 8), bool),
  }
  loss, _ = model.loss_fn(params, batch, None)
  assert np.isfinite(float(loss))


def test_postprocessors_mel_embeddings():
  from music_spectrogram_diffusion_tpu.infer import postprocessors
  audio = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
  emb = postprocessors.get_embeddings(audio)
  assert "mel" in emb
  assert emb["mel"].shape[1] == 128
  out = postprocessors.make_output_dict(
      None, {"raw_targets": audio, "sequence": None}, is_target=True)
  assert "embeddings" in out
