"""Regression-locks for the external-weight converters.

The real TF-Hub / slim checkpoints are unfetchable in this environment,
so the converters' REMAP LOGIC is pinned against fabricated variable
sets carrying the exact upstream naming and geometry (no TensorFlow
needed): name->module mapping, BN folding, transpose handling, and a
shape round-trip through the consuming Flax model for each converter
(VGGish reference: postprocessors.py:82-89; TRILL: postprocessors.py:
90-98; SoundStream: audio_codecs.py:249-264).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools import convert_soundstream, convert_trill, convert_vggish  # noqa: E402


# ---------------------------------------------------------------------------
# VGGish
# ---------------------------------------------------------------------------

# The published audioset VGGish geometry (vggish_slim.py): conv stacks
# 64-128-256x2-512x2 on a [96, 64, 1] input, fc 4096-4096-128.
_VGGISH_SHAPES = {
    "vggish/conv1/weights": (3, 3, 1, 64),
    "vggish/conv2/weights": (3, 3, 64, 128),
    "vggish/conv3/conv3_1/weights": (3, 3, 128, 256),
    "vggish/conv3/conv3_2/weights": (3, 3, 256, 256),
    "vggish/conv4/conv4_1/weights": (3, 3, 256, 512),
    "vggish/conv4/conv4_2/weights": (3, 3, 512, 512),
    "vggish/fc1/fc1_1/weights": (12288, 4096),
    "vggish/fc1/fc1_2/weights": (4096, 4096),
    "vggish/fc2/weights": (4096, 128),
}


def _fake_vggish_vars():
  r = np.random.RandomState(0)
  by_name = {}
  for name, shape in _VGGISH_SHAPES.items():
    by_name[name] = r.randn(*shape).astype(np.float32) * 0.01
    by_name[name.replace("weights", "biases")] = (
        r.randn(shape[-1]).astype(np.float32) * 0.01)
  return by_name


def test_vggish_remap_and_roundtrip(tmp_path):
  import jax
  from music_spectrogram_diffusion_tpu.infer import vggish

  by_name = _fake_vggish_vars()
  weights = convert_vggish.remap_variables(lambda n: by_name[n])
  convert_vggish.check_geometry(weights)

  # Every TF variable consumed, every npz key a '<layer>/<leaf>' pair.
  assert len(weights) == len(by_name)
  assert set(weights) == {
      f"{layer}/{leaf}"
      for layer in ("conv1", "conv2", "conv3_1", "conv3_2", "conv4_1",
                    "conv4_2", "fc1_1", "fc1_2", "fc2")
      for leaf in ("kernel", "bias")}
  # Values are copied verbatim (layouts are identical by construction).
  np.testing.assert_array_equal(
      weights["conv3_2/kernel"], by_name["vggish/conv3/conv3_2/weights"])
  np.testing.assert_array_equal(
      weights["fc2/bias"], by_name["vggish/fc2/biases"])

  # Shape round-trip: the consuming model loads the npz and runs.
  path = str(tmp_path / "vggish.npz")
  np.savez(path, **weights)
  variables = vggish.load_params(path)
  out = jax.jit(vggish.VGGish().apply)(
      variables, np.zeros((2, 96, 64), np.float32))
  assert out.shape == (2, 128)


def test_vggish_remap_missing_variable_raises():
  by_name = _fake_vggish_vars()
  del by_name["vggish/fc2/weights"]
  with pytest.raises(KeyError):
    convert_vggish.remap_variables(lambda n: by_name[n])


# ---------------------------------------------------------------------------
# TRILL
# ---------------------------------------------------------------------------


def _trill_param_shapes():
  """Flat {path: shape} of the in-repo ResNetish50 tree (eval_shape)."""
  import jax
  from music_spectrogram_diffusion_tpu.infer import trill

  variables = jax.eval_shape(
      lambda: trill.ResNetish50().init(
          jax.random.PRNGKey(0), np.zeros((1, 96, 64), np.float32)))
  flat = {}

  def walk(node, prefix):
    for k, v in sorted(node.items()):
      path = f"{prefix}/{k}" if prefix else k
      if hasattr(v, "items"):
        walk(v, path)
      else:
        flat[path] = tuple(v.shape)

  walk(variables["params"], "")
  return flat


def _fake_trill_vars():
  """Fabricate SavedModel-style variables in trunk declaration order."""
  shapes = _trill_param_shapes()
  r = np.random.RandomState(1)
  named = []
  for i, layer in enumerate(convert_trill.expected_layer_names()):
    kshape = shapes[f"{layer}/conv/kernel"]
    c = kshape[-1]
    scope = f"resnetish50/layer_{i}"
    named.append((f"{scope}/kernel:0",
                  r.randn(*kshape).astype(np.float32) * 0.01))
    # BatchNorm lives in its own sibling scope (Keras-style export).
    bn = f"{scope}/batch_norm"
    named.append((f"{bn}/gamma:0", 1.0 + 0.1 * r.randn(c).astype(np.float32)))
    named.append((f"{bn}/beta:0", 0.1 * r.randn(c).astype(np.float32)))
    named.append((f"{bn}/moving_mean:0",
                  0.1 * r.randn(c).astype(np.float32)))
    named.append((f"{bn}/moving_variance:0",
                  np.abs(1.0 + 0.1 * r.randn(c)).astype(np.float32)))
  named.append(("resnetish50/embedding/kernel:0",
                r.randn(*shapes["embedding/kernel"]).astype(np.float32)
                * 0.01))
  named.append(("resnetish50/embedding/bias:0",
                r.randn(*shapes["embedding/bias"]).astype(np.float32)))
  return named, shapes


def test_trill_convert_and_roundtrip(tmp_path):
  import jax
  from music_spectrogram_diffusion_tpu.infer import trill

  named, shapes = _fake_trill_vars()
  out = convert_trill.convert_variables(named)

  # Exactly the module tree's keys, with conv kernel + folded-BN affine
  # per conv layer and the dense embedding head.
  assert set(out) == set(shapes)
  for path, shape in shapes.items():
    assert out[path].shape == shape, path

  # BN folding: y = gamma/sqrt(var+eps) * x + (beta - mean*scale).
  by_name = dict(named)
  gamma = by_name["resnetish50/layer_0/batch_norm/gamma:0"]
  beta = by_name["resnetish50/layer_0/batch_norm/beta:0"]
  mean = by_name["resnetish50/layer_0/batch_norm/moving_mean:0"]
  var = by_name["resnetish50/layer_0/batch_norm/moving_variance:0"]
  scale = gamma / np.sqrt(var + convert_trill.BN_EPS)
  np.testing.assert_allclose(out["stem/bn_scale"], scale, rtol=1e-6)
  np.testing.assert_allclose(out["stem/bn_bias"], beta - mean * scale,
                             rtol=1e-5, atol=1e-7)

  # Shape round-trip through the consuming model.
  path = str(tmp_path / "trill.npz")
  np.savez(path, **out)
  variables = trill.load_params(path)
  emb = jax.jit(trill.ResNetish50().apply)(
      variables, np.zeros((2, 96, 64), np.float32))
  assert emb.shape == (2, 512)


def test_trill_convert_wrong_trunk_fails():
  named, _ = _fake_trill_vars()
  with pytest.raises(SystemExit):
    convert_trill.convert_variables(named[:20])  # truncated trunk


# ---------------------------------------------------------------------------
# SoundStream
# ---------------------------------------------------------------------------


def test_soundstream_map_and_roundtrip(tmp_path, capsys):
  """Order-based shape mapping onto SoundStreamDecoder + load check.

  base_channels=32 keeps the fabricated tree small; the tree still has
  repeated residual-conv shapes, so this exercises the order-based
  tie-breaking, and one ConvTranspose kernel is stored [w, out, in] to
  exercise the Keras-layout transpose.
  """
  import jax
  from music_spectrogram_diffusion_tpu.audio import vocoder

  target = convert_soundstream._target_tree(base_channels=32)
  assert target, "empty target tree"
  r = np.random.RandomState(2)
  raw = {}
  transposed_key = None
  for i, (path, shape) in enumerate(target.items()):
    arr = r.randn(*shape).astype(np.float32) * 0.01
    if (transposed_key is None and len(shape) == 3
        and shape[1] != shape[2]):
      # Keras ConvTranspose layout [w, out, in] for one kernel.
      arr = np.transpose(arr, (0, 2, 1))
      transposed_key = path
    raw[f"upstream/var_{i}__0"] = arr
  assert transposed_key is not None
  raw_path = str(tmp_path / "raw.npz")
  np.savez(raw_path, **raw)

  out_path = str(tmp_path / "mapped.npz")
  convert_soundstream.map_weights(raw_path, out_path, base_channels=32)
  logs = capsys.readouterr().out
  assert "transposed" in logs

  mapped = dict(np.load(out_path).items())
  assert set(mapped) == set(target)
  for path, shape in target.items():
    assert mapped[path].shape == shape, path

  # The loader consumes the mapped npz and vocodes a tiny mel.
  voc = vocoder.load_soundstream(out_path, base_channels=32)
  audio = voc(np.zeros((1, 4, 128), np.float32))
  assert audio.shape[0] == 1 and audio.shape[1] > 4
  assert np.all(np.isfinite(np.asarray(audio)))


def test_soundstream_map_missing_exits(tmp_path):
  target = convert_soundstream._target_tree(base_channels=32)
  r = np.random.RandomState(3)
  items = list(target.items())[:-2]  # drop two params
  raw = {f"v{i}__0": r.randn(*s).astype(np.float32)
         for i, (_, s) in enumerate(items)}
  raw_path = str(tmp_path / "raw.npz")
  np.savez(raw_path, **raw)
  with pytest.raises(SystemExit):
    convert_soundstream.map_weights(raw_path, str(tmp_path / "out.npz"),
                                    base_channels=32)
