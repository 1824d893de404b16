"""Generate AR-baseline parity goldens from the reference implementation.

Run manually (NOT part of the test suite) where /root/reference exists:

    python tests/make_ar_goldens.py

Instantiates the reference autoregressive Transformer (flax-only:
reference models/autoregressive/network.py + layers.py import no
t5x/TF), saves its init parameter tree plus encode/teacher-forced
__call__ outputs. tests/test_ar_parity.py then pins this framework's
ARTransformer — fed the reference parameters through
`remap_t5x_params` — to these numbers without importing the reference.
"""

import os
import sys
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

# The image's sitecustomize pre-imports jax on the 'axon' TPU platform;
# goldens must be true-f32 CPU numbers (TPU f32 matmuls take bf16 MXU
# passes), so re-assert CPU.
try:
  jax.config.update("jax_platforms", "cpu")
except RuntimeError:
  pass

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


def _load_reference_ar_network():
  pkg = types.ModuleType("music_spectrogram_diffusion")
  pkg.__path__ = []
  models_pkg = types.ModuleType("music_spectrogram_diffusion.models")
  models_pkg.__path__ = []
  ar_pkg = types.ModuleType(
      "music_spectrogram_diffusion.models.autoregressive")
  ar_pkg.__path__ = []
  sys.modules["music_spectrogram_diffusion"] = pkg
  sys.modules["music_spectrogram_diffusion.models"] = models_pkg
  sys.modules["music_spectrogram_diffusion.models.autoregressive"] = ar_pkg

  layers = _load_ref_module(
      "music_spectrogram_diffusion/layers.py",
      "music_spectrogram_diffusion.layers")
  pkg.layers = layers
  network = _load_ref_module(
      "music_spectrogram_diffusion/models/autoregressive/network.py",
      "music_spectrogram_diffusion.models.autoregressive.network")
  return network


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
  import jax.numpy as jnp

  network = _load_reference_ar_network()

  cfg = network.T5Config(
      vocab_size=100, emb_dim=32, num_heads=2, head_dim=8,
      num_encoder_layers=2, num_decoder_layers=2, mlp_dim=48,
      mlp_activations=("gelu", "linear"), dropout_rate=0.1,
      output_dim=6, logits_via_embedding=False)
  module = network.Transformer(config=cfg)

  rng = np.random.RandomState(42)
  batch, l_in, l_tgt, dims = 2, 16, 8, 6
  tokens = rng.randint(0, 100, (batch, l_in)).astype(np.int32)
  tokens[0, 12:] = 0  # padding on one example
  dec_targets = rng.randn(batch, l_tgt, dims).astype(np.float32)
  # Teacher forcing: inputs are targets shifted right by one frame.
  dec_inputs = np.concatenate(
      [np.zeros((batch, 1, dims), np.float32), dec_targets[:, :-1]], axis=1)

  variables = module.init(
      jax.random.PRNGKey(7), jnp.asarray(tokens), jnp.asarray(dec_inputs),
      jnp.asarray(dec_targets), enable_dropout=False)

  encoded = module.apply(
      variables, jnp.asarray(tokens), enable_dropout=False,
      method=module.encode)
  out = module.apply(
      variables, jnp.asarray(tokens), jnp.asarray(dec_inputs),
      jnp.asarray(dec_targets), enable_dropout=False)

  payload = {
      "tokens": tokens,
      "dec_inputs": dec_inputs,
      "dec_targets": dec_targets,
      "outAR_encoded": np.asarray(encoded),
      "outAR_call": np.asarray(out),
  }
  for key, value in _flatten(variables["params"], "pAR").items():
    payload[key] = value

  out_path = os.path.join(HERE, "goldens", "ar_network.npz")
  np.savez(out_path, **payload)
  print(f"wrote {out_path}: "
        f"{[k for k in payload if not k.startswith('pAR')]} "
        f"+ {sum(1 for k in payload if k.startswith('pAR'))} params")


if __name__ == "__main__":
  main()
