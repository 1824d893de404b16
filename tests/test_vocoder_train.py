"""Vocoder reconstruction training: loss decreases on a tiny decoder."""

import pytest

pytestmark = pytest.mark.slow

import itertools

import jax
import numpy as np

from music_spectrogram_diffusion_tpu.audio import (codecs, vocoder,
                                                   vocoder_train)
from music_spectrogram_diffusion_tpu.data import synthetic


def test_stft_loss_zero_for_identical():
  audio = np.random.RandomState(0).randn(1, 6400).astype(np.float32)
  losses = vocoder_train.stft_loss(
      jax.numpy.asarray(audio), jax.numpy.asarray(audio),
      resolutions=((512, 128, 240),))
  assert float(losses["spectral_convergence"]) < 1e-6
  assert float(losses["log_magnitude"]) < 1e-6


def test_vocoder_training_reduces_loss():
  codec = codecs.MelGan()
  dec = vocoder.SoundStreamDecoder(
      config=vocoder.SoundStreamConfig(base_channels=32))
  trainer = vocoder_train.VocoderTrainer(dec, codec, learning_rate=1e-3)
  state = trainer.create_state(jax.random.PRNGKey(0), mel_frames=16)

  def clips():
    rng = np.random.RandomState(0)
    while True:
      ns = synthetic.random_note_sequence(rng, duration=2.0)
      yield synthetic.render_note_sequence(ns, 16000, duration=2.0)

  batches = vocoder_train.vocoder_batches(
      itertools.islice(clips(), 50), codec, segment_frames=16,
      batch_size=2)
  first_loss = None
  last_loss = None
  for i, (mel, audio) in enumerate(itertools.islice(batches, 8)):
    state, metrics = trainer.train_step(state, mel, audio)
    if first_loss is None:
      first_loss = float(metrics["loss"])
    last_loss = float(metrics["loss"])
  assert int(state.step) == 8
  assert np.isfinite(last_loss)
  assert last_loss < first_loss, (first_loss, last_loss)

  # Trained decoder plugs into the codec decode path.
  apply_fn, params = trainer.as_codec_decoder(state)
  codec.set_vocoder(apply_fn, params)
  out = codec.decode(jax.numpy.zeros((1, 16, 128)))
  assert out.shape == (1, 16 * 320)


def test_adversarial_vocoder_training_step():
  codec = codecs.MelGan()
  dec = vocoder.SoundStreamDecoder(
      config=vocoder.SoundStreamConfig(base_channels=32))
  trainer = vocoder_train.AdversarialVocoderTrainer(dec, codec)
  state = trainer.create_state(jax.random.PRNGKey(0), mel_frames=8)

  rng = np.random.RandomState(0)
  mel = jax.numpy.asarray(rng.uniform(-11, 4, (2, 8, 128)),
                          jax.numpy.float32)
  audio = jax.numpy.asarray(rng.randn(2, 8 * 320) * 0.1,
                            jax.numpy.float32)
  g0 = jax.tree_util.tree_leaves(state.g_params)[0].copy()
  for _ in range(2):
    state, metrics = trainer.train_step(state, mel, audio)
  assert int(state.step) == 2
  for k in ["g_loss", "d_loss", "adv", "feature_matching"]:
    assert np.isfinite(float(metrics[k])), k
  # Both generator and discriminator actually updated.
  g1 = jax.tree_util.tree_leaves(state.g_params)[0]
  assert float(jax.numpy.abs(g1 - g0).max()) > 0


def test_load_soundstream_roundtrip(tmp_path):
  """Converter-format npz loads into SoundStreamDecoder and vocodess."""
  import jax
  import numpy as np
  from music_spectrogram_diffusion_tpu.audio import vocoder

  dec = vocoder.SoundStreamDecoder(
      config=vocoder.SoundStreamConfig(base_channels=64))
  variables = dec.init(jax.random.PRNGKey(0),
                       np.zeros((1, 4, 128), np.float32))
  flat = {}

  def walk(node, prefix):
    for k, v in node.items():
      path = f"{prefix}/{k}" if prefix else k
      if hasattr(v, "items"):
        walk(v, path)
      else:
        flat[path] = np.asarray(v)
  walk(variables["params"], "")
  npz = tmp_path / "ss.npz"
  np.savez(npz, **flat)

  vocode = vocoder.load_soundstream(str(npz), base_channels=64)
  mel = np.zeros((2, 6, 128), np.float32)
  audio = vocode(mel)
  assert audio.shape == (2, 6 * 320)
  want = dec.apply(variables, mel)
  np.testing.assert_allclose(np.asarray(audio), np.asarray(want),
                             atol=1e-6)


def test_train_vocoder_cli_resume(tmp_path, monkeypatch, capsys):
  """--resume restores params+opt state and continues the step count."""
  import sys
  from music_spectrogram_diffusion_tpu.cli import train_vocoder
  from music_spectrogram_diffusion_tpu.train import checkpoints

  model_dir = str(tmp_path / "voc")
  base = ["train_vocoder", "--model_dir", model_dir, "--synthetic",
          "--batch", "1", "--segment_frames", "8",
          "--base_channels", "16", "--log_period", "1",
          "--checkpoint_period", "2"]
  monkeypatch.setattr(sys, "argv", base + ["--steps", "2"])
  train_vocoder.main()
  first = checkpoints.latest_checkpoint(model_dir)
  assert first.endswith("step_2")
  p2 = checkpoints.restore_checkpoint(first)["params"]

  monkeypatch.setattr(sys, "argv", base + ["--steps", "4", "--resume"])
  train_vocoder.main()
  out = capsys.readouterr().out
  assert "resumed from" in out and "step 2" in out
  latest = checkpoints.latest_checkpoint(model_dir)
  assert latest.endswith("step_4")
  # Resume really started from the step-2 params (fresh init differs).
  restored = checkpoints.restore_checkpoint(latest)
  assert checkpoints.checkpoint_metadata(latest)["has_opt_state"]
  assert restored["params"] is not None and p2 is not None

  # A third invocation with --steps already reached is a no-op.
  monkeypatch.setattr(sys, "argv", base + ["--steps", "4", "--resume"])
  train_vocoder.main()
  assert "nothing to do" in capsys.readouterr().out


def test_load_trained_roundtrip(tmp_path):
  """load_trained restores a train_vocoder checkpoint and matches a
  direct decoder.apply with the same params."""
  from music_spectrogram_diffusion_tpu.train import checkpoints

  codec = codecs.MelGan()
  dec = vocoder.SoundStreamDecoder(
      config=vocoder.SoundStreamConfig(base_channels=16))
  trainer = vocoder_train.VocoderTrainer(dec, codec)
  state = trainer.create_state(jax.random.PRNGKey(3), mel_frames=8)
  model_dir = str(tmp_path / "voc")
  checkpoints.save_checkpoint(model_dir, 7, state.params,
                              opt_state=state.opt_state)

  vocode = vocoder.load_trained(model_dir, base_channels=16)
  mel = np.random.RandomState(0).uniform(
      -11, 4, (2, 6, 128)).astype(np.float32)
  audio = np.asarray(vocode(jax.numpy.asarray(mel)))
  assert audio.shape == (2, 6 * 320)
  want = np.asarray(dec.apply(state.params, mel))
  np.testing.assert_allclose(audio, want, atol=1e-6)

  # The adapter shape plugs into AudioCodec.set_vocoder.
  codec.set_vocoder(*vocode.as_codec_decoder())
  out = codec.decode(jax.numpy.asarray(mel))
  np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)

  with pytest.raises(FileNotFoundError):
    vocoder.load_trained(str(tmp_path / "missing"))


def test_magnitude_trainer_reduces_loss():
  """MagnitudeNet mel->linear-magnitude regression learns on real pairs."""
  codec = codecs.MelGan()
  net = vocoder.MagnitudeNet(hidden=32)
  trainer = vocoder_train.MagnitudeTrainer(net, codec,
                                           learning_rate=1e-3)
  state = trainer.create_state(jax.random.PRNGKey(0), mel_frames=16)

  def clips():
    rng = np.random.RandomState(0)
    while True:
      ns = synthetic.random_note_sequence(rng, duration=2.0)
      yield synthetic.render_note_sequence(ns, 16000, duration=2.0)

  batches = vocoder_train.vocoder_batches(
      itertools.islice(clips(), 50), codec, segment_frames=16,
      batch_size=2)
  first = last = None
  for mel, audio in itertools.islice(batches, 10):
    state, metrics = trainer.train_step(state, mel, audio)
    if first is None:
      first = float(metrics["loss"])
    last = float(metrics["loss"])
  assert np.isfinite(last) and last < first, (first, last)


def test_load_trained_magnitude_gl_arch(tmp_path):
  """The config.json sidecar routes load_trained to HybridGLVocoder."""
  import json as json_lib

  from music_spectrogram_diffusion_tpu.train import checkpoints

  codec = codecs.MelGan()
  net = vocoder.MagnitudeNet(hidden=16)
  trainer = vocoder_train.MagnitudeTrainer(net, codec)
  state = trainer.create_state(jax.random.PRNGKey(1), mel_frames=8)
  model_dir = str(tmp_path / "magnet")
  checkpoints.save_checkpoint(
      model_dir, 3, state.params, opt_state=state.opt_state,
      config_json=json_lib.dumps({"arch": "magnitude_gl", "hidden": 16}))

  voc = vocoder.load_trained(model_dir, num_iters=2)
  assert isinstance(voc, vocoder.HybridGLVocoder)
  mel = np.random.RandomState(0).uniform(
      -11, 4, (2, 8, 128)).astype(np.float32)
  audio = np.asarray(voc(jax.numpy.asarray(mel)))
  assert audio.shape == (2, 8 * 320)
  assert np.isfinite(audio).all()
  # Adapter plugs into AudioCodec.set_vocoder like the other vocoders.
  codec.set_vocoder(*voc.as_codec_decoder())
  out = codec.decode(jax.numpy.asarray(mel))
  assert np.asarray(out).shape == (2, 8 * 320)


def test_hybrid_mel_consistency_projection():
  """The inference-time projection restores mel(pred) ~= input mel.

  The residual MagnitudeNet is free to trade mel consistency for |STFT|
  accuracy; HybridGLVocoder's pinv-lifted mel-residual projection must
  bring the predicted magnitude's re-encoded mel (much) closer to the
  input mel than the raw prediction, without touching the net params.
  """
  from music_spectrogram_diffusion_tpu.ops import stft as stft_ops

  net = vocoder.MagnitudeNet(hidden=16)
  rng = np.random.RandomState(0)
  mel_lin = rng.uniform(0.0, 2.0, (2, 8, 128)).astype(np.float32)
  log_mel = jax.numpy.log(jax.numpy.asarray(mel_lin) + 1e-5)
  params = net.init(jax.random.PRNGKey(0), log_mel)
  # Perturb params so the raw prediction is NOT mel-consistent (at init
  # the zero-init correction head makes the net exactly the pinv).
  # (small scale: where the corrected magnitude would clip at 0 the
  # projection is inexact by design, so keep the perturbation mild)
  params = jax.tree.map(
      lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(1), x.shape),
      params)

  raw = vocoder.HybridGLVocoder(params, hidden=16, mel_consistency=False)
  proj = vocoder.HybridGLVocoder(params, hidden=16, mel_consistency=True)
  mag_raw = raw._apply(params, log_mel)
  mag_proj = proj._apply(params, log_mel)

  basis = proj._basis
  err_raw = float(jax.numpy.linalg.norm(mag_raw @ basis - mel_lin))
  err_proj = float(jax.numpy.linalg.norm(mag_proj @ basis - mel_lin))
  # Not exact: the pinv lift of a random (non-realizable) mel clips at
  # zero in many bins; on harmonic audio the measured gap is larger
  # (magnitude sc 0.054 -> 0.044, BENCH.md round 3).
  assert err_proj < 0.5 * err_raw, (err_raw, err_proj)
  assert np.all(np.asarray(mag_proj) >= 0)


def test_eval_vocoder_cli(tmp_path, monkeypatch, capsys):
  """eval_vocoder scores Griffin-Lim + a trained checkpoint and writes
  the comparison report."""
  import json as json_lib
  import sys

  from music_spectrogram_diffusion_tpu.cli import (eval_vocoder,
                                                   train_vocoder)

  model_dir = str(tmp_path / "voc")
  monkeypatch.setattr(sys, "argv", [
      "train_vocoder", "--model_dir", model_dir, "--synthetic",
      "--steps", "2", "--batch", "1", "--segment_frames", "8",
      "--base_channels", "16", "--checkpoint_period", "2"])
  train_vocoder.main()

  out_json = str(tmp_path / "report.json")
  monkeypatch.setattr(sys, "argv", [
      "eval_vocoder", "--checkpoint", model_dir, "--base_channels", "16",
      "--synthetic", "--clips", "2", "--clip_seconds", "0.5",
      "--griffin_lim_iters", "2", "--batch", "2",
      "--output", out_json])
  eval_vocoder.main()
  capsys.readouterr()
  with open(out_json) as f:
    report = json_lib.load(f)
  assert report["clips"] == 2
  for method in ("griffin_lim", "trained"):
    m = report["methods"][method]
    for k in ("spectral_convergence", "log_magnitude",
              "mel_roundtrip_l2", "snr_db"):
      assert np.isfinite(m[k]), (method, k)
  assert set(report["trained_vs_griffin_lim"]) == {
      "spectral_convergence", "log_magnitude", "mel_roundtrip_l2",
      "snr_db"}


def test_train_vocoder_cli_adversarial_resume(tmp_path, monkeypatch,
                                              capsys):
  """Adversarial restarts resume the FULL GAN state (generator,
  discriminator, both optimizers) via the sibling 'disc' checkpoint —
  the periodic-restart RSS mitigation must not reset the adversarial
  game. A recon warm start (no disc dir) still loads generator-only."""
  import sys

  import numpy as np

  from music_spectrogram_diffusion_tpu.cli import train_vocoder
  from music_spectrogram_diffusion_tpu.train import checkpoints

  model_dir = str(tmp_path / "gan")
  base = ["train_vocoder", "--model_dir", model_dir, "--synthetic",
          "--batch", "1", "--segment_frames", "8",
          "--base_channels", "16", "--log_period", "1",
          "--checkpoint_period", "2"]
  # Recon warmup.
  monkeypatch.setattr(sys, "argv", base + ["--steps", "2"])
  train_vocoder.main()
  # Adversarial leg 1: warm-starts generator from the recon checkpoint.
  monkeypatch.setattr(
      sys, "argv", base + ["--steps", "4", "--adversarial", "--resume",
                           "--waveform_weight", "0"])
  train_vocoder.main()
  out = capsys.readouterr().out
  assert "resumed from" in out
  assert "restored adversarial state" not in out  # recon warm start
  disc = checkpoints.latest_checkpoint(str(tmp_path / "gan" / "disc"))
  assert disc is not None and disc.endswith("step_4")
  d4 = checkpoints.restore_checkpoint(disc)["params"]

  # Adversarial leg 2 (the restart): full GAN state restored.
  monkeypatch.setattr(
      sys, "argv", base + ["--steps", "6", "--adversarial", "--resume",
                           "--waveform_weight", "0"])
  train_vocoder.main()
  out = capsys.readouterr().out
  assert "restored adversarial state" in out
  disc6 = checkpoints.latest_checkpoint(str(tmp_path / "gan" / "disc"))
  assert disc6.endswith("step_6")
  d6 = checkpoints.restore_checkpoint(disc6)["params"]
  # The discriminator actually continued training (leaves changed).
  leaves4 = jax.tree_util.tree_leaves(d4)
  leaves6 = jax.tree_util.tree_leaves(d6)
  assert any(not np.allclose(a, b) for a, b in zip(leaves4, leaves6))
