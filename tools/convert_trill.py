"""Convert the public TRILL SavedModel to the .npz this framework loads.

Run this wherever TensorFlow + network egress (or a mirrored SavedModel)
exist — this development image has neither:

  python tools/convert_trill.py \
      --saved_model /path/to/nonsemantic-speech-benchmark_trill_3 \
      --out trill_weights.npz [--validate_wav some_16khz.wav]

Then point $MSD_TRILL_WEIGHTS (or infer.trill.register(path)) at the
npz so evaluation emits TRILL-space FAD (reference
postprocessors.py:90-98 parity).

Mapping strategy: the SavedModel (tfhub.dev/google/
nonsemantic-speech-benchmark/trill/3) carries a ResNetish-50 trunk
(Hershey et al. 2017) + a 512-d triplet embedding layer, mirrored by
infer/trill.py's module tree. The converter:

  1. enumerates `model.variables` and groups them by conv layer: each
     conv kernel plus its BatchNorm's (gamma, beta, moving_mean,
     moving_variance);
  2. folds every BN into an inference affine
        scale = gamma / sqrt(var + eps),  bias = beta - mean * scale
     matching ConvBnRelu's (bn_scale, bn_bias);
  3. maps trunk order onto this module's names: `stem`, then
     stage{1..4}_block{i} x (proj?, conv1, conv2, conv3) in
     declaration order, then `embedding` (Dense kernel/bias);
  4. (--validate_wav) runs both models on the same audio and asserts
     the 'embedding' outputs match to 1e-3 — the real acceptance test,
     since upstream variable names vary across re-exports, the
     order-based mapping must be verified numerically.

TF conv kernels are HWIO and dense kernels [in, out] — identical to
Flax, copied verbatim.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BN_EPS = 1e-5  # tf.slim / Keras BatchNormalization default epsilon


def fold_bn(gamma, beta, mean, var, eps=BN_EPS):
  scale = gamma / np.sqrt(var + eps)
  return scale, beta - mean * scale


def expected_layer_names():
  """This module tree's conv layers, in trunk declaration order."""
  names = ["stem"]
  for stage, blocks in enumerate((3, 4, 6, 3)):
    for block in range(blocks):
      base = f"stage{stage + 1}_block{block}"
      if block == 0:
        names.append(f"{base}/proj")
      names += [f"{base}/conv1", f"{base}/conv2", f"{base}/conv3"]
  return names


def convert(saved_model_path: str) -> dict:
  import tensorflow as tf

  model = tf.saved_model.load(saved_model_path)
  return convert_variables(
      [(v.name, v.numpy()) for v in model.variables])


def convert_variables(named_vars) -> dict:
  """TF-free mapping core over [(tf_var_name, np.ndarray), ...].

  Split from `convert` so the scope-grouping / BN-folding / order-based
  trunk mapping is unit-testable against fabricated variable sets
  (tests/test_converters.py) without TensorFlow.
  """
  # Group variables by their scope prefix (everything before the last
  # '/'); each conv scope carries kernel (+BN) variables.
  groups = {}
  order = []
  for name, value in named_vars:
    scope, leaf = name.rsplit("/", 1)
    leaf = leaf.split(":")[0]
    if scope not in groups:
      groups[scope] = {}
      order.append(scope)
    groups[scope][leaf] = np.asarray(value)

  conv_scopes = [s for s in order if any(
      k in groups[s] for k in ("kernel", "weights"))]
  dense_scopes = [s for s in conv_scopes
                  if np.asarray(groups[s].get(
                      "kernel", groups[s].get("weights"))).ndim == 2]
  conv_scopes = [s for s in conv_scopes if s not in dense_scopes]
  names = expected_layer_names()
  if len(conv_scopes) != len(names):
    raise SystemExit(
        f"SavedModel has {len(conv_scopes)} conv scopes, expected "
        f"{len(names)} (ResNetish-50). Inspect `model.variables` and "
        f"adjust expected_layer_names(); scopes: {conv_scopes[:8]}...")

  out = {}
  for scope, name in zip(conv_scopes, names):
    g = groups[scope]
    kernel = g.get("kernel", g.get("weights"))
    out[f"{name}/conv/kernel"] = np.asarray(kernel)
    # The BN for this conv is either in the same scope or the next
    # scope in variable order carrying gamma/moving stats.
    bn = g if "gamma" in g else None
    if bn is None:
      idx = order.index(scope)
      for later in order[idx + 1:idx + 3]:
        if "gamma" in groups[later]:
          bn = groups[later]
          break
    if bn is None:
      raise SystemExit(f"no BatchNorm found for conv scope {scope!r}")
    scale, bias = fold_bn(bn["gamma"], bn["beta"], bn["moving_mean"],
                          bn["moving_variance"])
    out[f"{name}/bn_scale"] = scale.astype(np.float32)
    out[f"{name}/bn_bias"] = bias.astype(np.float32)

  if len(dense_scopes) != 1:
    raise SystemExit(f"expected one dense (embedding) scope, got "
                     f"{dense_scopes}")
  dg = groups[dense_scopes[0]]
  out["embedding/kernel"] = np.asarray(dg.get("kernel", dg.get("weights")))
  out["embedding/bias"] = np.asarray(dg.get("bias", dg.get("biases")))
  return out


def validate(saved_model_path: str, npz_path: str, wav_path: str):
  import tensorflow as tf
  from music_spectrogram_diffusion_tpu.infer import trill

  sr, audio = _read_wav(wav_path)
  assert sr == 16000, f"validation wav must be 16 kHz, got {sr}"
  model = tf.saved_model.load(saved_model_path)
  want = np.asarray(model(samples=audio, sample_rate=16000)["embedding"])
  got = trill.TRILLEmbedder(npz_path)(audio)
  assert got.shape == want.shape, (got.shape, want.shape)
  err = np.max(np.abs(got - want))
  print(f"max |diff| = {err:.2e} over {got.shape}")
  assert err < 1e-3, "converted TRILL does not match the SavedModel"


def _read_wav(path):
  import wave
  with wave.open(path, "rb") as w:
    data = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    return w.getframerate(), data.astype(np.float32) / 32768.0


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--saved_model", required=True)
  p.add_argument("--out", required=True)
  p.add_argument("--validate_wav", default=None,
                 help="16 kHz WAV for output-parity validation")
  args = p.parse_args()
  np.savez(args.out, **convert(args.saved_model))
  print(f"wrote {args.out}")
  if args.validate_wav:
    validate(args.saved_model, args.out, args.validate_wav)


if __name__ == "__main__":
  main()
