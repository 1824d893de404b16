"""Train the SoundStream-style mel inverter (vocoder).

  python -m music_spectrogram_diffusion_tpu.cli.train_vocoder \
      --model_dir /tmp/vocoder --synthetic --steps 1000 \
      [--adversarial] [--batch 8] [--segment_frames 64]

  # Real dataset audio (TFRecords mirrored locally):
  python -m music_spectrogram_diffusion_tpu.cli.train_vocoder \
      --model_dir /tmp/vocoder --dataset maestrov3 --data_root /mirror

Reconstruction objective by default (multi-resolution STFT + waveform
L1); --adversarial adds the SoundStream GAN losses.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import time


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--model_dir", required=True)
  p.add_argument("--synthetic", action="store_true")
  p.add_argument("--dataset", default=None,
                 help="dataset config name (e.g. maestrov3); audio is "
                      "read from its TFRecords via --data_root")
  p.add_argument("--split", default=None,
                 help="dataset split (default: the train split)")
  p.add_argument("--data_root", default=None,
                 help="local mirror root for gs:// dataset paths")
  p.add_argument("--steps", type=int, default=1000)
  p.add_argument("--batch", type=int, default=8)
  p.add_argument("--segment_frames", type=int, default=64)
  p.add_argument("--base_channels", type=int, default=512)
  p.add_argument("--arch", default="soundstream",
                 choices=["soundstream", "magnitude_gl"],
                 help="'soundstream': end-to-end waveform decoder. "
                      "'magnitude_gl': MagnitudeNet mel->linear-"
                      "magnitude inversion served with Griffin-Lim "
                      "phase (HybridGLVocoder) — beats the pinv "
                      "baseline within minutes of training")
  p.add_argument("--adversarial", action="store_true")
  p.add_argument("--learning_rate", type=float, default=1e-4)
  p.add_argument("--waveform_weight", type=float, default=None,
                 help="weight of the sample-exact waveform L1 term "
                      "(default: the trainer's 10.0). A conv decoder "
                      "cannot phase-lock arbitrary frequencies, so a "
                      "dominant waveform term drives amplitude collapse "
                      "toward silence; pass 0 to train on the "
                      "phase-invariant multi-resolution STFT loss only")
  p.add_argument("--log_period", type=int, default=50)
  p.add_argument("--checkpoint_period", type=int, default=500)
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--resume", action="store_true",
                 help="continue from the latest checkpoint in "
                      "--model_dir (params + opt state; the data "
                      "stream restarts from its seed)")
  args = p.parse_args()

  import jax
  import numpy as np

  from music_spectrogram_diffusion_tpu.audio import (codecs, vocoder,
                                                     vocoder_train)
  from music_spectrogram_diffusion_tpu.data import synthetic
  from music_spectrogram_diffusion_tpu.train import checkpoints

  if not args.synthetic and not args.dataset:
    p.error("pick an audio source: --synthetic or --dataset NAME")

  codec = codecs.MelGan()
  decoder = vocoder.SoundStreamDecoder(
      config=vocoder.SoundStreamConfig(base_channels=args.base_channels))

  ww = {} if args.waveform_weight is None else {
      "waveform_weight": args.waveform_weight}
  if args.arch == "magnitude_gl":
    if args.adversarial:
      p.error("--adversarial applies to --arch soundstream only")
    trainer = vocoder_train.MagnitudeTrainer(
        vocoder.MagnitudeNet(), codec,
        learning_rate=args.learning_rate)
    arch_config = {"arch": "magnitude_gl", "hidden": 512}
  elif args.adversarial:
    trainer = vocoder_train.AdversarialVocoderTrainer(
        decoder, codec, g_learning_rate=args.learning_rate, **ww)
    arch_config = {"arch": "soundstream",
                   "base_channels": args.base_channels}
  else:
    trainer = vocoder_train.VocoderTrainer(
        decoder, codec, learning_rate=args.learning_rate, **ww)
    arch_config = {"arch": "soundstream",
                   "base_channels": args.base_channels}
  state = trainer.create_state(jax.random.PRNGKey(args.seed),
                               mel_frames=args.segment_frames)

  start_step = 0
  if args.resume:
    latest = checkpoints.latest_checkpoint(args.model_dir)
    if latest is None:
      print(f"--resume: no checkpoint under {args.model_dir}, "
            "starting fresh")
    else:
      import jax.numpy as jnp
      meta = checkpoints.checkpoint_metadata(latest)
      start_step = int(meta.get("step", 0))
      if args.adversarial:
        # A matching sibling 'disc' checkpoint means this resumes an
        # ADVERSARIAL run (e.g. the periodic-restart RSS-leak
        # mitigation): restore generator, discriminator AND both
        # optimizer states so restarts don't reset the GAN dynamics.
        # A recon-only warm start has no disc dir: generator params
        # only, discriminator and optimizers fresh.
        disc_dir = os.path.join(args.model_dir, "disc")
        disc_latest = checkpoints.latest_checkpoint(disc_dir)
        if (disc_latest is not None and
            int(checkpoints.checkpoint_metadata(disc_latest)
                .get("step", -1)) == start_step):
          restored = checkpoints.restore_checkpoint(
              latest, {"params": state.g_params,
                       "opt_state": state.g_opt_state})
          d_restored = checkpoints.restore_checkpoint(
              disc_latest, {"params": state.d_params,
                            "opt_state": state.d_opt_state})
          state = state.replace(
              g_params=restored["params"],
              g_opt_state=restored["opt_state"],
              d_params=d_restored["params"],
              d_opt_state=d_restored["opt_state"])
          print(f"restored adversarial state from {disc_latest}")
        else:
          # The recon checkpoint may carry the recon trainer's
          # opt_state, so restore as-stored rather than with a subset
          # target (orbax rejects those).
          restored = checkpoints.restore_checkpoint(latest)
          state = state.replace(g_params=restored["params"])
      else:
        target = {"params": state.params}
        if meta.get("has_opt_state"):
          target["opt_state"] = state.opt_state
        restored = checkpoints.restore_checkpoint(latest, target)
        state = state.replace(
            step=jnp.asarray(start_step, jnp.int32),
            params=restored["params"],
            opt_state=restored.get("opt_state", state.opt_state))
      print(f"resumed from {latest} (step {start_step})")
  if start_step >= args.steps:
    print(f"checkpoint step {start_step} >= --steps {args.steps}; "
          "nothing to do")
    return

  if args.synthetic:
    def clips():
      rng = np.random.RandomState(args.seed)
      while True:
        ns = synthetic.random_note_sequence(rng, duration=6.0)
        yield synthetic.render_note_sequence(ns, codec.sample_rate,
                                             duration=6.0)
  else:
    # The per-dataset tokenizers own the audio decode/resample rules
    # (wav bytes vs float features, stem mixes); the vocoder just takes
    # the 16 kHz 'audio' they emit and ignores the note features.
    from music_spectrogram_diffusion_tpu.data import registry
    try:
      source = registry.audio_source(args.dataset, args.split, codec,
                                     data_root=args.data_root)
    except ValueError as e:
      p.error(str(e))
    print(f"audio source: {args.dataset}/"
          f"{args.split or 'train split'}")

    def clips():
      while True:
        for ex in source:
          yield np.asarray(ex["audio"], np.float32)

  batches = vocoder_train.vocoder_batches(
      clips(), codec, segment_frames=args.segment_frames,
      batch_size=args.batch, seed=args.seed)
  # Host-side clip rendering + mel encode overlaps the device step
  # (measurably host-bound otherwise: synthesis + encode_np is ~15-20%
  # of the step wall on one chip).
  batches = vocoder_train.prefetch(batches, depth=4)

  os.makedirs(args.model_dir, exist_ok=True)
  log = open(os.path.join(args.model_dir, "metrics.jsonl"), "a")
  t0 = time.time()
  last_logged = start_step
  for step, (mel, audio) in enumerate(
      itertools.islice(batches, args.steps - start_step),
      start=start_step + 1):
    state, metrics = trainer.train_step(state, mel, audio)
    if step % args.log_period == 0 or step == args.steps:
      window = step - last_logged  # final window may be short
      payload = {"step": step,
                 **{k: float(v) for k, v in metrics.items()},
                 "steps_per_second": window / max(
                     time.time() - t0, 1e-9)}
      t0 = time.time()
      last_logged = step
      log.write(json.dumps(payload) + "\n")
      log.flush()
      print(" ".join(f"{k}={v:.5g}" for k, v in payload.items()))
    if step % args.checkpoint_period == 0 or step == args.steps:
      params = (state.g_params if args.adversarial else state.params)
      opt_state = (state.g_opt_state if args.adversarial
                   else state.opt_state)
      path = checkpoints.save_checkpoint(args.model_dir, step, params,
                                         opt_state=opt_state,
                                         config_json=json.dumps(
                                             arch_config))
      if args.adversarial:
        # Full GAN state: the discriminator (+ its optimizer) in a
        # sibling dir, so restarts resume the adversarial game intact.
        checkpoints.save_checkpoint(
            os.path.join(args.model_dir, "disc"), step,
            state.d_params, opt_state=state.d_opt_state)
      print(f"saved {path}")


if __name__ == "__main__":
  main()
