"""Evaluate mel-inversion quality: trained vocoder vs Griffin-Lim.

  python -m music_spectrogram_diffusion_tpu.cli.eval_vocoder \
      --checkpoint /tmp/vocoder --synthetic --clips 16 --seed 1000 \
      [--output results.json]

Held-out clips are encoded to log-mel, inverted by each vocoder, and the
reconstruction scored against the ground-truth audio with phase-invariant
magnitude metrics (the multi-resolution STFT loss of vocoder_train.py)
plus the mel-space roundtrip error (re-encode the reconstruction and
L2 against the original mel). Griffin-Lim is always scored as the
weights-free baseline; pass --checkpoint to score a trained
SoundStreamDecoder (cli/train_vocoder.py) next to it.

The reference never measures its frozen TF-Hub inverter (it is trusted
as shipped, reference audio_codecs.py:249-264); this tool exists because
in-repo training makes inversion quality a measurable claim.
"""

from __future__ import annotations

import argparse
import json


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--checkpoint", default=None,
                 help="trained vocoder model_dir or step_<N> dir "
                      "(cli/train_vocoder.py); omit to score only the "
                      "Griffin-Lim baseline")
  p.add_argument("--base_channels", type=int, default=512)
  p.add_argument("--synthetic", action="store_true")
  p.add_argument("--dataset", default=None,
                 help="dataset config name; audio from its TFRecords")
  p.add_argument("--split", default=None)
  p.add_argument("--data_root", default=None)
  p.add_argument("--clips", type=int, default=16)
  p.add_argument("--clip_seconds", type=float, default=4.0)
  p.add_argument("--seed", type=int, default=1000,
                 help="held-out generator seed (training used its own "
                      "--seed stream; keep them disjoint)")
  p.add_argument("--griffin_lim_iters", type=int, default=32)
  p.add_argument("--gl_momentum", type=float, default=None,
                 help="fast-Griffin-Lim (FGLA) extrapolation factor; "
                      "0 = classic alternating projections. Default: "
                      "each vocoder's own default (trained chain 0.9, "
                      "pinv chain classic)")
  p.add_argument("--phase_init", default="pghi", choices=["pghi", "zero"],
                 help="Griffin-Lim phase initializer (pghi = phase "
                      "gradient heap integration; zero = round-3 "
                      "behavior). With pghi, the zero-init baseline is "
                      "also scored as griffin_lim_zero for the A/B.")
  p.add_argument("--batch", type=int, default=4)
  p.add_argument("--output", default=None, help="write metrics JSON here")
  p.add_argument("--wav_dir", default=None,
                 help="write reference + per-method reconstruction WAVs")
  args = p.parse_args()

  import jax.numpy as jnp
  import numpy as np

  from music_spectrogram_diffusion_tpu.audio import (codecs, vocoder,
                                                     vocoder_train)

  if not args.synthetic and not args.dataset:
    p.error("pick an audio source: --synthetic or --dataset NAME")

  codec = codecs.MelGan()
  seg_samples = int(args.clip_seconds * codec.sample_rate)
  seg_frames = seg_samples // codec.hop_size
  seg_samples = seg_frames * codec.hop_size

  if args.synthetic:
    from music_spectrogram_diffusion_tpu.data import synthetic
    rng = np.random.RandomState(args.seed)

    def clip_iter():
      while True:
        ns = synthetic.random_note_sequence(
            rng, duration=args.clip_seconds + 1.0)
        yield synthetic.render_note_sequence(
            ns, codec.sample_rate, duration=args.clip_seconds + 1.0)
  else:
    from music_spectrogram_diffusion_tpu.data import registry
    try:
      source = registry.audio_source(args.dataset, args.split, codec,
                                     data_root=args.data_root,
                                     is_training=False)
    except ValueError as e:
      p.error(str(e))

    def clip_iter():
      for ex in source:
        yield np.asarray(ex["audio"], np.float32)

  clips = []
  for clip in clip_iter():
    if len(clip) < seg_samples:
      continue
    clips.append(clip[:seg_samples])
    if len(clips) == args.clips:
      break
  if len(clips) < args.clips:
    print(f"warning: only {len(clips)} usable clips")
  audio = np.stack(clips)  # [N, samples]
  mel = codec.encode_np(audio)[:, :seg_frames]  # [N, frames, 128]

  import jax
  scored = jax.jit(vocoder_train.stft_loss)

  mom = ({} if args.gl_momentum is None
         else {"momentum": args.gl_momentum})
  vocoders = {"griffin_lim": vocoder.GriffinLimVocoder(
      num_iters=args.griffin_lim_iters, phase_init=args.phase_init,
      **mom)}
  if args.phase_init == "pghi":
    vocoders["griffin_lim_zero"] = vocoder.GriffinLimVocoder(
        num_iters=args.griffin_lim_iters, phase_init="zero", **mom)
  if args.checkpoint:
    vocoders["trained"] = vocoder.load_trained(
        args.checkpoint, base_channels=args.base_channels,
        num_iters=args.griffin_lim_iters, phase_init=args.phase_init,
        **mom)

  report = {"clips": len(clips), "clip_seconds": args.clip_seconds,
            "seed": args.seed, "methods": {}}
  for name, voc in vocoders.items():
    # The jitted adapter: eager per-op dispatch is not supported on all
    # TPU attachment paths (axon rejects host-driven FFT ops).
    apply_fn, voc_params = voc.as_codec_decoder()
    recon = []
    for i in range(0, len(clips), args.batch):
      out = np.asarray(apply_fn(voc_params, jnp.asarray(mel[i:i + args.batch])))
      recon.append(out[:, :seg_samples])
    recon = np.concatenate(recon)
    spec = {k: float(v) for k, v in scored(
        jnp.asarray(recon), jnp.asarray(audio)).items()}
    mel_rt = codec.encode_np(recon)[:, :seg_frames]
    mel_l2 = float(np.sqrt(np.mean((mel_rt - mel) ** 2)))
    # Time-domain SNR: meaningful for the phase-preserving trained
    # decoder; Griffin-Lim invents phase, so its SNR ~ 0 dB by design.
    noise = audio - recon
    snr_db = float(10 * np.log10(
        (np.sum(audio ** 2) + 1e-9) / (np.sum(noise ** 2) + 1e-9)))
    report["methods"][name] = {**spec, "mel_roundtrip_l2": mel_l2,
                               "snr_db": snr_db}
    if args.wav_dir:
      import os

      from music_spectrogram_diffusion_tpu.audio import wav_io
      os.makedirs(args.wav_dir, exist_ok=True)
      for i in range(min(len(clips), 4)):
        with open(os.path.join(args.wav_dir,
                               f"clip{i}_{name}.wav"), "wb") as f:
          f.write(wav_io.encode_wav(recon[i].astype(np.float32),
                                    codec.sample_rate))
        ref_path = os.path.join(args.wav_dir, f"clip{i}_ref.wav")
        if not os.path.exists(ref_path):
          with open(ref_path, "wb") as f:
            f.write(wav_io.encode_wav(audio[i].astype(np.float32),
                                      codec.sample_rate))
    print(f"{name}: " + " ".join(
        f"{k}={v:.4f}" for k, v in report["methods"][name].items()))

  if "trained" in report["methods"]:
    g = report["methods"]["griffin_lim"]
    t = report["methods"]["trained"]
    # All metrics are lower-is-better except snr_db; flip its sign so
    # "negative = trained better" holds for every key in the report.
    report["trained_vs_griffin_lim"] = {
        k: ((g[k] - t[k]) if k == "snr_db" else (t[k] - g[k]))
           / max(abs(g[k]), 1e-9) for k in g}
    print("relative delta (negative = trained better): " + " ".join(
        f"{k}={v:+.1%}" for k, v in
        report["trained_vs_griffin_lim"].items()))

  if args.output:
    with open(args.output, "w") as f:
      json.dump(report, f, indent=2)
    print(f"wrote {args.output}")


if __name__ == "__main__":
  main()
