"""Generate golden values from the reference implementation.

Run manually (NOT part of the test suite) in an environment where
/root/reference is present:

    JAX_PLATFORMS=cpu python tests/make_goldens.py

Stores reference outputs in tests/goldens/diffusion.npz. The tests then pin
our implementation to these numbers without importing the reference.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

REFERENCE = "/root/reference"


def _load_ref_module(relpath, name):
  """Load a reference module file directly, bypassing package __init__
  (which imports tensorflow_hub, unavailable here)."""
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      name, os.path.join(REFERENCE, relpath))
  mod = importlib.util.module_from_spec(spec)
  sys.modules[name] = mod
  spec.loader.exec_module(mod)
  return mod


def main():
  import jax  # noqa: E402
  # The image's sitecustomize pre-imports jax on the 'axon' TPU platform,
  # ignoring JAX_PLATFORMS; force CPU so goldens match the CPU test run.
  jax.config.update("jax_platforms", "cpu")
  import jax.numpy as jnp  # noqa: E402
  ref = _load_ref_module(
      "music_spectrogram_diffusion/models/diffusion/diffusion_utils.py",
      "ref_diffusion_utils")

  # The reference calls np.clip(x, min=..., max=...), an API newer than the
  # numpy in this image. Shim it for the duration of golden generation.
  orig_clip = np.clip
  def _clip(a, *args, **kw):
    if "min" in kw or "max" in kw:
      return orig_clip(a, kw.pop("min", None), kw.pop("max", None), **kw)
    return orig_clip(a, *args, **kw)
  np.clip = _clip

  rng = np.random.RandomState(42)
  out = {}

  # logSNR schedules.
  t = np.linspace(0.0, 1.0, 17).astype(np.float32)
  out["t"] = t
  out["logsnr_cosine"] = np.asarray(
      ref.get_logsnr_t(jnp.asarray(t), ref.DiffusionSchedule(name="cosine")))
  linear = ref.DiffusionSchedule(
      name="linear", start=1e-4, stop=0.02, num_steps=1000)
  out["logsnr_linear"] = np.asarray(
      ref.get_logsnr_t(jnp.asarray(t), linear))

  # Forward / reverse processes.
  x0 = rng.randn(2, 8, 4).astype(np.float32)
  z_t = rng.randn(2, 8, 4).astype(np.float32)
  logsnr_t = np.full((2, 8, 4), -1.3, np.float32)
  logsnr_s = np.full((2, 8, 4), 0.7, np.float32)
  out["x0"] = x0
  out["z_t"] = z_t
  fwd = ref.diffusion_forward(x0=jnp.asarray(x0), logsnr=jnp.asarray(logsnr_t))
  out["fwd_mean"] = np.asarray(fwd["mean"])
  out["fwd_std"] = np.asarray(fwd["std"])
  for lv in ["small", "large", "medium:0.3"]:
    rev = ref.diffusion_reverse(
        x0=jnp.asarray(x0), z_t=jnp.asarray(z_t),
        logsnr_s=jnp.asarray(logsnr_s), logsnr_t=jnp.asarray(logsnr_t),
        logvar_type=lv)
    key = lv.replace(":", "_").replace(".", "")
    out[f"rev_mean_{key}"] = np.asarray(rev["mean"])
    out[f"rev_std_{key}"] = np.asarray(rev["std"])

  # Parameterisation conversions.
  logsnr_vec = np.array([-2.0, 1.5], np.float32)
  out["logsnr_vec"] = logsnr_vec
  out["eps_from_x0"] = np.asarray(ref.predict_eps_from_x0(
      z=jnp.asarray(z_t), x0=jnp.asarray(x0), logsnr=jnp.asarray(logsnr_vec)))
  out["x0_from_eps"] = np.asarray(ref.predict_x0_from_eps(
      z=jnp.asarray(z_t), eps=jnp.asarray(x0), logsnr=jnp.asarray(logsnr_vec)))
  out["x0_from_v"] = np.asarray(ref.predict_x0_from_v(
      z=jnp.asarray(z_t), v=jnp.asarray(x0), logsnr=jnp.asarray(logsnr_vec)))

  # Training input sampling (checks RNG split structure parity).
  cfg = ref.DiffusionConfig()
  key = jax.random.PRNGKey(7)
  z, eps, time, cond = ref.get_diffusion_training_input(
      key, jnp.asarray(x0), cfg)
  out["train_z"] = np.asarray(z)
  out["train_eps"] = np.asarray(eps)
  out["train_time"] = np.asarray(time)
  out["train_cond"] = np.asarray(cond)

  # Loss values for each loss_type / model_output combo that's exercised.
  model_output = rng.randn(2, 8, 4).astype(np.float32)
  out["model_output"] = model_output
  time2 = np.array([0.3, 0.8], np.float32)
  out["time2"] = time2
  for loss_type in ["eps", "x0", "max_x0_eps", "x0_and_eps"]:
    cfg_l = ref.DiffusionConfig(loss_type=loss_type)
    loss = ref.calculate_loss(
        x0=jnp.asarray(x0), eps=jnp.asarray(x0 * 0.5 + 0.1),
        z=jnp.asarray(z_t), time=jnp.asarray(time2),
        model_output=jnp.asarray(model_output), diffusion_config=cfg_l)
    out[f"loss_{loss_type}"] = np.asarray(loss)

  # Full 8-step DDPM + DDIM sampler runs with a linear toy "network":
  # model_output = 0.9 * z + 0.05 (pure function, no params).
  def pred_fn(z, time, include_conditioning):
    scale = 0.9 if include_conditioning else 0.45
    return scale * z + 0.05

  for name in ["ddpm", "ddim"]:
    cfg_s = ref.DiffusionConfig(
        sampler=ref.SamplerConfig(
            name=name,
            schedule=ref.DiffusionSchedule(name="cosine", num_steps=8)))
    res = ref.eval_scan(
        jax.random.PRNGKey(3), (2, 8, 4), pred_fn, cfg_s)
    out[f"sample_{name}"] = np.asarray(res)

  # Timing embedding.
  pos = np.array([0.0, 1.0, 17.5], np.float32)
  out["timing_pos"] = pos
  out["timing"] = np.asarray(
      ref.get_timing_signal_1d(jnp.asarray(pos), 16, max_timescale=2.0e4))

  os.makedirs(os.path.join(os.path.dirname(__file__), "goldens"),
              exist_ok=True)
  path = os.path.join(os.path.dirname(__file__), "goldens", "diffusion.npz")
  np.savez(path, **out)
  print(f"wrote {path} with {len(out)} arrays")


def main_rle():
  """Goldens for encode_and_index_events from the reference."""
  # The reference module imports seqio/tensorflow/absl at top level; the
  # function under test uses none of them — stub the imports.
  from unittest import mock
  for name in ["seqio", "tensorflow", "absl", "absl.logging"]:
    sys.modules.setdefault(name, mock.MagicMock())
  ref_codec_mod = _load_ref_module(
      "music_spectrogram_diffusion/event_codec.py", "ref_event_codec")
  pkg_mock = mock.MagicMock()
  pkg_mock.event_codec = ref_codec_mod
  sys.modules["music_spectrogram_diffusion"] = pkg_mock
  sys.modules["music_spectrogram_diffusion.event_codec"] = ref_codec_mod
  ref_rle = _load_ref_module(
      "music_spectrogram_diffusion/run_length_encoding.py", "ref_rle")

  codec = ref_codec_mod.Codec(
      max_shift_steps=100, steps_per_second=100,
      event_ranges=[
          ref_codec_mod.EventRange("pitch", 0, 127),
          ref_codec_mod.EventRange("velocity", 0, 1),
          ref_codec_mod.EventRange("tie", 0, 0),
      ])

  Event = ref_codec_mod.Event

  def encode_event_fn(state, value, codec_):
    # value = (pitch, velocity_bin); track active pitches in state dict.
    pitch, vel = value
    if state is not None:
      state[pitch] = vel
    return [Event("velocity", vel), Event("pitch", pitch)]

  def state_to_events_fn(state):
    evs = [Event("pitch", p) for p in sorted(state) if state[p]]
    return evs + [Event("tie", 0)]

  event_times = [0.0, 0.032, 0.032, 0.05, 0.11, 0.113]
  event_values = [(60, 1), (62, 1), (60, 0), (65, 1), (62, 0), (65, 0)]
  frame_times = [i * 0.02 for i in range(8)]  # 50 fps frames

  out = {}
  for with_state in [False, True]:
    state = {} if with_state else None
    res = ref_rle.encode_and_index_events(
        state=state, event_times=event_times, event_values=event_values,
        encode_event_fn=encode_event_fn, codec=codec,
        frame_times=frame_times,
        encoding_state_to_events_fn=(
            state_to_events_fn if with_state else None))
    tag = "state" if with_state else "plain"
    for name, arr in zip(["events", "start", "end", "state_events",
                          "state_idx"], res):
      out[f"{tag}_{name}"] = np.asarray(arr)

  path = os.path.join(os.path.dirname(__file__), "goldens", "rle.npz")
  np.savez(path, **out)
  print(f"wrote {path} with {len(out)} arrays")


if __name__ == "__main__":
  if "--rle-only" not in sys.argv:
    main()
  main_rle()
