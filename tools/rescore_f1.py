"""Rescore transcription F1 of completed eval cells with a new transcriber.

A finished `cli/evaluate.py --output_dir CELL` run saves the rendered
audio (`<song>_pred.wav`) next to its metrics.json, so transcription
metrics can be recomputed after the fact without re-sampling the
diffusion model (the expensive part). This re-runs the exact scoring
path of infer/evaluation.py:157-173 — transcribe the saved prediction
audio AND the regenerated ground-truth audio, score both against the
true NoteSequence (reference metrics.py:422-446) — and patches ONLY the
transcription keys into metrics.json, leaving the FAD/mel numbers of
record untouched.

  python tools/rescore_f1.py --transcriber_checkpoint /tmp/transcriber_big \
      --preset context_base --songs 16 --seed 1000 \
      results/round5/base_sweep/ddpm1000 [more cell dirs...]

The synthetic source is seeded, so --songs/--seed must match the
original eval invocation for the ground truth to line up.
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("cell_dirs", nargs="+")
  p.add_argument("--transcriber_checkpoint", required=True)
  p.add_argument("--preset", default="context_base")
  p.add_argument("--songs", type=int, default=16)
  p.add_argument("--seed", type=int, default=1000)
  p.add_argument("--duration", type=float, default=10.0)
  p.add_argument("--decode", default="greedy", choices=["greedy", "beam"])
  p.add_argument("--bootstrap", type=int, default=200)
  p.add_argument("--max_tokens", type=int, default=None,
                 help="cap decode length (debug/smoke only — truncated "
                      "decodes depress recall)")
  args = p.parse_args()

  import numpy as np

  from music_spectrogram_diffusion_tpu import config as cfg_lib
  from music_spectrogram_diffusion_tpu.audio import wav_io
  from music_spectrogram_diffusion_tpu.data import synthetic, tasks
  from music_spectrogram_diffusion_tpu.infer import (evaluation, inference,
                                                     mt3, transcription)

  experiment = cfg_lib.preset(args.preset)
  model = inference.build_model(experiment)
  tl = experiment.task_lengths
  lengths = {"inputs": tl.inputs, "targets": tl.targets,
             "targets_context": tl.targets_context}
  task = tasks.Task(
      name="eval", source_fn=lambda: synthetic.synthetic_source(
          args.songs, duration=args.duration, seed=args.seed),
      audio_codec=model.audio_codec,
      vocab_config=experiment.vocab_config(),
      note_rep=experiment.note_rep(),
      with_context=experiment.with_context,
      program_granularity=experiment.program_granularity)
  songs = evaluation.group_songs(task.full_song_dataset(lengths))
  print(f"regenerated {len(songs)} ground-truth songs")

  transcriber = mt3.load_trained_transcriber(
      args.transcriber_checkpoint, decode_mode=args.decode,
      max_tokens=args.max_tokens)

  # Ground truth transcriptions are shared across cells: cache them.
  gt_transcribed = {}

  for cell in args.cell_dirs:
    metrics_path = os.path.join(cell, "metrics.json")
    if not os.path.exists(metrics_path):
      print(f"SKIP {cell}: no metrics.json")
      continue
    with open(metrics_path) as f:
      report = json.load(f)
    per_song = report["per_song"]

    replaced = 0
    for song_id, segs in songs.items():
      if song_id not in per_song:
        continue
      safe = song_id.replace("/", "_") or "song"
      wav_path = os.path.join(cell, f"{safe}_pred.wav")
      if not os.path.exists(wav_path):
        print(f"  {cell}: no {safe}_pred.wav; skipping song")
        continue
      with open(wav_path, "rb") as f:
        _, pred_audio = wav_io.decode_wav(f.read())
      raw_target = np.concatenate(
          [np.asarray(s["raw_targets"]) for s in segs])
      if song_id not in gt_transcribed:
        gt_transcribed[song_id] = transcriber(raw_target)
      target_entry = {"sequence": segs[0]["sequence"],
                      "transcribed_audio": gt_transcribed[song_id]}
      pred_entry = {
          "transcribed_audio": transcriber(pred_audio[:len(raw_target)])}
      m = transcription.transcription_metrics([target_entry], [pred_entry])
      # Drop the old transcription keys (incl. their stale CI entries in
      # aggregate below), then merge the fresh scores.
      per_song[song_id] = {
          k: v for k, v in per_song[song_id].items()
          if not (k.startswith("Model Onset") or k.startswith("GT Onset"))}
      per_song[song_id].update(m)
      replaced += 1

    # Recompute aggregate mean + bootstrap CI for the transcription keys
    # only (same procedure as evaluation.aggregate).
    agg = report["aggregate"]
    for k in list(agg):
      if k.startswith("Model Onset") or k.startswith("GT Onset"):
        del agg[k]
    fresh = collections.defaultdict(list)
    for metrics in per_song.values():
      for k, v in metrics.items():
        if k.startswith("Model Onset") or k.startswith("GT Onset"):
          fresh[k].append(v)
    rng = np.random.default_rng(0)
    for k, vals in fresh.items():
      v = np.asarray(vals, np.float64)
      agg[k] = float(v.mean())
      if args.bootstrap > 0 and len(v) >= 4:
        draws = rng.integers(0, len(v), size=(args.bootstrap, len(v)))
        means = v[draws].mean(axis=1)
        agg[f"{k}_ci95_low"] = float(np.percentile(means, 2.5))
        agg[f"{k}_ci95_high"] = float(np.percentile(means, 97.5))
    agg["f1_rescored_with"] = os.path.abspath(args.transcriber_checkpoint)

    with open(metrics_path, "w") as f:
      json.dump(report, f, indent=2)
    flat = agg.get("Model Onset + program precision/recall/F1 (flat) F1")
    gt_flat = agg.get("GT Onset + program precision/recall/F1 (flat) F1")
    print(f"{cell}: rescored {replaced} songs; "
          f"Model flat-F1={flat} GT flat-F1={gt_flat}")


if __name__ == "__main__":
  main()
