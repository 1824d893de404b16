"""Convert the public VGGish checkpoint to the .npz this framework loads.

Run this wherever TensorFlow and the checkpoint are available (this
development image has neither TF nor network egress):

  # Option A: from the slim checkpoint (vggish_model.ckpt,
  # https://storage.googleapis.com/audioset/vggish_model.ckpt):
  python tools/convert_vggish.py --ckpt vggish_model.ckpt \
      --out vggish_weights.npz

  # Option B: from the TF-Hub SavedModel (https://tfhub.dev/google/vggish/1):
  python tools/convert_vggish.py --saved_model /path/to/vggish_hub \
      --out vggish_weights.npz

Then point $MSD_VGGISH_WEIGHTS (or infer.vggish.register(path)) at the
npz. Variable mapping (TF slim name -> npz key); TF conv kernels are
HWIO and dense kernels [in, out], identical to Flax, so values are
copied verbatim:

  vggish/conv1/weights            -> conv1/kernel
  vggish/conv1/biases             -> conv1/bias
  vggish/conv2/{weights,biases}   -> conv2/{kernel,bias}
  vggish/conv3/conv3_1/...        -> conv3_1/...
  vggish/conv3/conv3_2/...        -> conv3_2/...
  vggish/conv4/conv4_1/...        -> conv4_1/...
  vggish/conv4/conv4_2/...        -> conv4_2/...
  vggish/fc1/fc1_1/...            -> fc1_1/...
  vggish/fc1/fc1_2/...            -> fc1_2/...
  vggish/fc2/{weights,biases}     -> fc2/{kernel,bias}
"""

import argparse

import numpy as np

_NAME_MAP = {
    "vggish/conv1": "conv1",
    "vggish/conv2": "conv2",
    "vggish/conv3/conv3_1": "conv3_1",
    "vggish/conv3/conv3_2": "conv3_2",
    "vggish/conv4/conv4_1": "conv4_1",
    "vggish/conv4/conv4_2": "conv4_2",
    "vggish/fc1/fc1_1": "fc1_1",
    "vggish/fc1/fc1_2": "fc1_2",
    "vggish/fc2": "fc2",
}
_LEAF_MAP = {"weights": "kernel", "biases": "bias"}


def remap_variables(lookup) -> dict:
  """TF-free mapping core: `lookup(tf_name) -> np.ndarray`.

  Shared by the ckpt and SavedModel paths and unit-tested against
  fabricated variable sets (tests/test_converters.py), so the name
  table cannot rot while the real weights stay unfetchable here.
  """
  out = {}
  for tf_scope, layer in _NAME_MAP.items():
    for tf_leaf, leaf in _LEAF_MAP.items():
      out[f"{layer}/{leaf}"] = np.asarray(lookup(f"{tf_scope}/{tf_leaf}"))
  return out


def check_geometry(weights: dict) -> None:
  """Shape sanity for the published VGGish (audioset) geometry."""
  assert weights["conv1/kernel"].shape == (3, 3, 1, 64)
  assert weights["fc1_1/kernel"].shape == (12288, 4096)
  assert weights["fc2/kernel"].shape[-1] == 128


def convert_from_ckpt(ckpt_path: str) -> dict:
  import tensorflow as tf  # noqa: F401 - requires a TF environment
  reader = tf.train.load_checkpoint(ckpt_path)
  return remap_variables(reader.get_tensor)


def convert_from_saved_model(path: str) -> dict:
  import tensorflow as tf
  model = tf.saved_model.load(path)
  by_name = {v.name.split(":")[0]: v for v in model.variables}
  return remap_variables(lambda name: by_name[name].numpy())


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--ckpt", default=None)
  p.add_argument("--saved_model", default=None)
  p.add_argument("--out", required=True)
  args = p.parse_args()
  if bool(args.ckpt) == bool(args.saved_model):
    p.error("pass exactly one of --ckpt / --saved_model")
  weights = (convert_from_ckpt(args.ckpt) if args.ckpt
             else convert_from_saved_model(args.saved_model))
  check_geometry(weights)  # shape sanity before writing
  np.savez(args.out, **weights)
  print(f"wrote {len(weights)} arrays to {args.out}")


if __name__ == "__main__":
  main()
