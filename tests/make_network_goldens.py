"""Generate full-network parity goldens from the reference implementation.

Run manually (NOT part of the test suite) where /root/reference exists:

    python tests/make_network_goldens.py

Instantiates the reference ContinuousContextTransformer (flax-only modules:
reference models/diffusion/network.py + layers.py import no t5x/TF), saves
its init parameter tree plus outputs of encode/decode/__call__ and a seeded
8-step CFG sampler run (the predict_batch_with_aux closure from reference
models/diffusion/models.py:373-386). tests/test_reference_parity.py then
pins this framework's remapped-parameter outputs to these numbers without
importing the reference.
"""

import os
import sys
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

REFERENCE = "/root/reference"
HERE = os.path.dirname(__file__)


def _load_ref_module(relpath, name):
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      name, os.path.join(REFERENCE, relpath))
  mod = importlib.util.module_from_spec(spec)
  sys.modules[name] = mod
  spec.loader.exec_module(mod)
  return mod


def _shim_np_clip():
  """Reference calls np.clip(x, min=..., max=...) (newer numpy API)."""
  orig_clip = np.clip

  def _clip(a, *args, **kw):
    if "min" in kw or "max" in kw:
      return orig_clip(a, kw.pop("min", None), kw.pop("max", None), **kw)
    return orig_clip(a, *args, **kw)

  np.clip = _clip


def _load_reference_network():
  """Load reference network.py with its intra-package imports satisfied."""
  pkg = types.ModuleType("music_spectrogram_diffusion")
  pkg.__path__ = []
  models_pkg = types.ModuleType("music_spectrogram_diffusion.models")
  models_pkg.__path__ = []
  diff_pkg = types.ModuleType(
      "music_spectrogram_diffusion.models.diffusion")
  diff_pkg.__path__ = []
  sys.modules["music_spectrogram_diffusion"] = pkg
  sys.modules["music_spectrogram_diffusion.models"] = models_pkg
  sys.modules["music_spectrogram_diffusion.models.diffusion"] = diff_pkg

  layers = _load_ref_module(
      "music_spectrogram_diffusion/layers.py",
      "music_spectrogram_diffusion.layers")
  pkg.layers = layers
  dutils = _load_ref_module(
      "music_spectrogram_diffusion/models/diffusion/diffusion_utils.py",
      "music_spectrogram_diffusion.models.diffusion.diffusion_utils")
  diff_pkg.diffusion_utils = dutils
  network = _load_ref_module(
      "music_spectrogram_diffusion/models/diffusion/network.py",
      "music_spectrogram_diffusion.models.diffusion.network")
  return network, dutils


def _flatten(tree, prefix=""):
  out = {}
  for key, value in tree.items():
    path = f"{prefix}/{key}" if prefix else key
    if isinstance(value, dict) or hasattr(value, "items"):
      out.update(_flatten(value, path))
    else:
      out[path] = np.asarray(value)
  return out


def main():
  import jax
  jax.config.update("jax_platforms", "cpu")
  import jax.numpy as jnp

  _shim_np_clip()
  network, dutils = _load_reference_network()

  out = {}
  rng = np.random.RandomState(0)

  # Inputs shared by both model variants. Token rows have padding tails;
  # context row 1 is fully masked (empty context edge case).
  tokens = np.zeros((2, 16), np.int32)
  tokens[0, :12] = rng.randint(3, 100, size=12)
  tokens[1, :6] = rng.randint(3, 100, size=6)
  context = rng.randn(2, 8, 6).astype(np.float32) * 0.5
  ctx_mask = np.zeros((2, 8), bool)
  ctx_mask[0, :5] = True
  z = rng.randn(2, 8, 6).astype(np.float32)
  time = np.array([0.25, 0.75], np.float32)
  out["tokens"] = tokens
  out["context"] = context
  out["ctx_mask"] = ctx_mask
  out["z"] = z
  out["time"] = time

  # --- Variant A: the published base_with_context architecture style ----
  cfg_a = network.T5Config(
      vocab_size=100, emb_dim=32, num_heads=2, head_dim=8,
      num_encoder_layers=2, num_decoder_layers=2, mlp_dim=48,
      mlp_activations=("gelu", "linear"), dropout_rate=0.1,
      decoder_cross_attend_style="concat_encodings",
      position_encoding="fixed_permuted_offset",
      context_positions="terminal_relative")
  mod_a = network.ContinuousContextTransformer(config=cfg_a)
  variables = mod_a.init(
      jax.random.PRNGKey(0),
      encoder_input_tokens=jnp.asarray(tokens),
      encoder_continuous_inputs=jnp.asarray(context),
      encoder_continuous_mask=jnp.asarray(ctx_mask),
      decoder_input_tokens=jnp.asarray(z),
      decoder_noise_time=jnp.asarray(time),
      enable_dropout=False)
  params_a = variables["params"]
  for path, arr in _flatten(params_a).items():
    out[f"pA/{path}"] = arr

  apply_kw = dict(
      encoder_input_tokens=jnp.asarray(tokens),
      encoder_continuous_inputs=jnp.asarray(context),
      encoder_continuous_mask=jnp.asarray(ctx_mask),
      decoder_input_tokens=jnp.asarray(z),
      decoder_noise_time=jnp.asarray(time))
  out["outA_call"] = np.asarray(mod_a.apply(
      {"params": params_a}, enable_dropout=False, **apply_kw))

  encodings_and_masks = mod_a.apply(
      {"params": params_a},
      input_tokens=jnp.asarray(tokens),
      continuous_inputs=jnp.asarray(context),
      continuous_mask=jnp.asarray(ctx_mask),
      enable_dropout=False, method=mod_a.encode)
  out["outA_tokens_encoded"] = np.asarray(encodings_and_masks[0][0])
  out["outA_context_encoded"] = np.asarray(encodings_and_masks[1][0])
  out["outA_decode"] = np.asarray(mod_a.apply(
      {"params": params_a},
      encodings_and_masks=encodings_and_masks,
      input_tokens=jnp.asarray(z),
      noise_time=jnp.asarray(time),
      enable_dropout=False, method=mod_a.decode))

  # Seeded sampler runs through the reference predict_batch_with_aux CFG
  # closure (models/diffusion/models.py:373-386): uncond branch multiplies
  # encodings AND masks by include_conditioning.
  def pred_fn(z, time, include_conditioning):
    step_enc = jax.tree.map(
        lambda x: x * include_conditioning, encodings_and_masks)
    return mod_a.apply(
        {"params": params_a},
        encodings_and_masks=step_enc,
        input_tokens=z, noise_time=time,
        enable_dropout=False, method=mod_a.decode)

  for sampler_name in ["ddpm", "ddim"]:
    dcfg = dutils.DiffusionConfig(
        sampler=dutils.SamplerConfig(
            name=sampler_name,
            schedule=dutils.DiffusionSchedule(name="cosine", num_steps=8)))
    res = dutils.eval_scan(
        jax.random.PRNGKey(11), z.shape, pred_fn, dcfg)
    out[f"outA_sample_{sampler_name}"] = np.asarray(res)

  # --- Variant B: sum_cross_attends (two cross-attn modules per layer,
  # exercising the MultiHeadDotProductAttention_1 checkpoint remap) ------
  cfg_b = network.T5Config(
      vocab_size=100, emb_dim=32, num_heads=2, head_dim=8,
      num_encoder_layers=2, num_decoder_layers=2, mlp_dim=48,
      mlp_activations=("gelu", "linear"), dropout_rate=0.1,
      decoder_cross_attend_style="sum_cross_attends",
      position_encoding="fixed", context_positions="regular")
  mod_b = network.ContinuousContextTransformer(config=cfg_b)
  variables_b = mod_b.init(
      jax.random.PRNGKey(1),
      encoder_input_tokens=jnp.asarray(tokens),
      encoder_continuous_inputs=jnp.asarray(context),
      encoder_continuous_mask=jnp.asarray(ctx_mask),
      decoder_input_tokens=jnp.asarray(z),
      decoder_noise_time=jnp.asarray(time),
      enable_dropout=False)
  params_b = variables_b["params"]
  for path, arr in _flatten(params_b).items():
    out[f"pB/{path}"] = arr
  out["outB_call"] = np.asarray(mod_b.apply(
      {"params": params_b}, enable_dropout=False, **apply_kw))

  os.makedirs(os.path.join(HERE, "goldens"), exist_ok=True)
  path = os.path.join(HERE, "goldens", "network.npz")
  np.savez_compressed(path, **out)
  print(f"wrote {path} with {len(out)} arrays")


if __name__ == "__main__":
  main()
