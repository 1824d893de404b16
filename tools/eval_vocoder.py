"""Score a trained SoundStream vocoder against Griffin-Lim.

  python tools/eval_vocoder.py --checkpoint /tmp/vocoder/step_2000 \
      [--clips 8] [--seed 900] [--out /tmp/vocoder_eval]

Held-out synthetic clips are mel-encoded, decoded back to audio by (a)
the trained decoder and (b) Griffin-Lim, then scored by re-encoding the
audio and measuring mel distance to the original mel (the metric the
synthesis eval uses), plus time-domain SNR. The reference ships a
pretrained MelGAN ("audio_codecs.py:176: SavedModel vocoder"); this is
the in-repo replacement's quality gate.

Prints one JSON dict; optionally writes WAV pairs.
"""

from __future__ import annotations

import argparse
import json
import os


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--checkpoint", required=True,
                 help="train_vocoder step_<N> dir (or parent)")
  p.add_argument("--base_channels", type=int, default=512)
  p.add_argument("--clips", type=int, default=8)
  p.add_argument("--clip_seconds", type=float, default=4.0)
  p.add_argument("--seed", type=int, default=900,
                 help="held-out clip seed (train_vocoder uses its own "
                      "stream seeds)")
  p.add_argument("--griffin_lim_iters", type=int, default=32)
  p.add_argument("--out", default=None, help="write WAV pairs here")
  args = p.parse_args()

  import jax
  import numpy as np

  from music_spectrogram_diffusion_tpu.audio import (codecs, vocoder,
                                                     wav_io)
  from music_spectrogram_diffusion_tpu.data import synthetic
  from music_spectrogram_diffusion_tpu.train import checkpoints

  codec = codecs.MelGan()
  decoder = vocoder.SoundStreamDecoder(
      config=vocoder.SoundStreamConfig(base_channels=args.base_channels))
  params = checkpoints.restore_checkpoint(args.checkpoint)["params"]
  gl = vocoder.GriffinLimVocoder(num_iters=args.griffin_lim_iters)

  ss_decode = jax.jit(lambda mel: decoder.apply({"params": params}, mel))
  gl_decode = jax.jit(gl)
  encode = jax.jit(codec.encode)

  def mel_dist(target_mel, audio):
    n = min(target_mel.shape[0] * codec.hop_size, audio.shape[-1])
    frames = n // codec.hop_size
    re = np.asarray(encode(audio[None, :frames * codec.hop_size]))[0]
    t = np.asarray(target_mel[:frames])
    return float(np.mean(np.abs(t - re[:frames])))

  def snr(ref, est):
    n = min(len(ref), len(est))
    ref, est = np.asarray(ref[:n]), np.asarray(est[:n])
    noise = ref - est
    return float(10 * np.log10(
        (np.sum(ref ** 2) + 1e-9) / (np.sum(noise ** 2) + 1e-9)))

  rng = np.random.RandomState(args.seed)
  rows = {"soundstream_mel_l1": [], "griffin_lim_mel_l1": [],
          "soundstream_snr_db": [], "griffin_lim_snr_db": []}
  if args.out:
    os.makedirs(args.out, exist_ok=True)
  for i in range(args.clips):
    ns = synthetic.random_note_sequence(rng, duration=args.clip_seconds)
    audio = synthetic.render_note_sequence(
        ns, codec.sample_rate, duration=args.clip_seconds)
    n_frames = len(audio) // codec.hop_size
    audio = audio[:n_frames * codec.hop_size]
    mel = np.asarray(encode(audio[None]))[0]

    ss_audio = np.asarray(ss_decode(mel[None]))[0][:len(audio)]
    gl_audio = np.asarray(gl_decode(mel[None]))[0][:len(audio)]

    rows["soundstream_mel_l1"].append(mel_dist(mel, ss_audio))
    rows["griffin_lim_mel_l1"].append(mel_dist(mel, gl_audio))
    rows["soundstream_snr_db"].append(snr(audio, ss_audio))
    rows["griffin_lim_snr_db"].append(snr(audio, gl_audio))
    if args.out:
      for name, wav in [("ref", audio), ("soundstream", ss_audio),
                        ("griffin_lim", gl_audio)]:
        with open(os.path.join(args.out, f"clip{i}_{name}.wav"),
                  "wb") as f:
          f.write(wav_io.encode_wav(np.asarray(wav, np.float32),
                                    codec.sample_rate))

  summary = {k: float(np.mean(v)) for k, v in rows.items()}
  summary["clips"] = args.clips
  summary["soundstream_beats_griffin_lim_mel"] = bool(
      summary["soundstream_mel_l1"] < summary["griffin_lim_mel_l1"])
  print(json.dumps(summary, indent=2))


if __name__ == "__main__":
  main()
