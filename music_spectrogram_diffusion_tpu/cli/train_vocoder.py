"""Train the SoundStream-style mel inverter (vocoder).

  python -m music_spectrogram_diffusion_tpu.cli.train_vocoder \
      --model_dir /tmp/vocoder --synthetic --steps 1000 \
      [--adversarial] [--batch 8] [--segment_frames 64]

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
  p.add_argument("--steps", type=int, default=1000)
  p.add_argument("--batch", type=int, default=8)
  p.add_argument("--segment_frames", type=int, default=64)
  p.add_argument("--base_channels", type=int, default=512)
  p.add_argument("--adversarial", action="store_true")
  p.add_argument("--learning_rate", type=float, default=1e-4)
  p.add_argument("--log_period", type=int, default=50)
  p.add_argument("--checkpoint_period", type=int, default=500)
  p.add_argument("--seed", type=int, default=0)
  args = p.parse_args()

  import jax
  import numpy as np

  from music_spectrogram_diffusion_tpu.audio import (codecs, vocoder,
                                                     vocoder_train)
  from music_spectrogram_diffusion_tpu.data import synthetic
  from music_spectrogram_diffusion_tpu.train import checkpoints

  if not args.synthetic:
    raise NotImplementedError("only --synthetic audio sources in this env")

  codec = codecs.MelGan()
  decoder = vocoder.SoundStreamDecoder(
      config=vocoder.SoundStreamConfig(base_channels=args.base_channels))

  if args.adversarial:
    trainer = vocoder_train.AdversarialVocoderTrainer(
        decoder, codec, g_learning_rate=args.learning_rate)
  else:
    trainer = vocoder_train.VocoderTrainer(
        decoder, codec, learning_rate=args.learning_rate)
  state = trainer.create_state(jax.random.PRNGKey(args.seed),
                               mel_frames=args.segment_frames)

  def clips():
    rng = np.random.RandomState(args.seed)
    while True:
      ns = synthetic.random_note_sequence(rng, duration=6.0)
      yield synthetic.render_note_sequence(ns, codec.sample_rate,
                                           duration=6.0)

  batches = vocoder_train.vocoder_batches(
      clips(), codec, segment_frames=args.segment_frames,
      batch_size=args.batch, seed=args.seed)

  os.makedirs(args.model_dir, exist_ok=True)
  log = open(os.path.join(args.model_dir, "metrics.jsonl"), "a")
  t0 = time.time()
  last_logged = 0
  for step, (mel, audio) in enumerate(
      itertools.islice(batches, args.steps), start=1):
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
      path = checkpoints.save_checkpoint(args.model_dir, step, params)
      print(f"saved {path}")


if __name__ == "__main__":
  main()
