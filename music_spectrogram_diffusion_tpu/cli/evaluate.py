"""Full-song evaluation CLI (single-host replacement for the Beam
pipeline).

  python -m music_spectrogram_diffusion_tpu.cli.evaluate \
      --checkpoint /path/ckpt --synthetic --output_dir /tmp/eval \
      [--steps 50] [--songs 4] [--vocode] [--always_mask_context] \
      [--prediction_source model|gt_encoded|gt_raw] \
      [--num_shards N --shard I]
"""

from __future__ import annotations

import argparse
import json


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--checkpoint", default=None)
  p.add_argument("--preset", default="context_small",
                 help="used when no checkpoint is given (random weights)")
  p.add_argument("--synthetic", action="store_true")
  p.add_argument("--songs", type=int, default=2)
  p.add_argument("--songs_per_batch", type=int, default=2)
  p.add_argument("--steps", type=int, default=None)
  p.add_argument("--vocode", action="store_true")
  p.add_argument("--output_dir", default=None)
  p.add_argument("--prediction_source", default="model",
                 choices=["model", "gt_encoded", "gt_raw"])
  p.add_argument("--always_mask_context", action="store_true",
                 help="render every segment without context (ablation)")
  p.add_argument("--seed", type=int, default=0)
  # Work sharding across independent processes/hosts (the Beam
  # pipeline's shard parallelism): each process takes every
  # num_shards-th song.
  p.add_argument("--num_shards", type=int, default=1)
  p.add_argument("--shard", type=int, default=0)
  args = p.parse_args()

  import dataclasses
  import jax
  import jax.numpy as jnp

  from music_spectrogram_diffusion_tpu import config as cfg_lib
  from music_spectrogram_diffusion_tpu.audio import vocoder
  from music_spectrogram_diffusion_tpu.data import synthetic, tasks
  from music_spectrogram_diffusion_tpu.infer import (evaluation, inference,
                                                     synthesize)
  from music_spectrogram_diffusion_tpu.midi import vocabularies

  if not args.synthetic:
    raise NotImplementedError("only --synthetic sources in this env")

  if args.checkpoint:
    wrapper = inference.InferenceModel(args.checkpoint,
                                       sampler_steps=args.steps)
    model, params = wrapper.model, wrapper.params
    experiment, lengths = wrapper.experiment, wrapper.task_lengths
  else:
    experiment = cfg_lib.preset(args.preset)
    if args.steps:
      experiment = dataclasses.replace(
          experiment, diffusion=dataclasses.replace(
              experiment.diffusion, sampler=dataclasses.replace(
                  experiment.diffusion.sampler, num_steps=args.steps)))
    model = inference.build_model(experiment)
    tl = experiment.task_lengths
    lengths = {"inputs": tl.inputs, "targets": tl.targets,
               "targets_context": tl.targets_context}
    shapes = {
        "encoder_input_tokens": (1, tl.inputs),
        "encoder_continuous_inputs": (1, tl.targets_context, 128),
        "encoder_continuous_mask": (1, tl.targets_context),
        "decoder_target_tokens": (1, tl.targets, 128)}
    types = {"encoder_input_tokens": jnp.int32,
             "encoder_continuous_mask": jnp.bool_}
    params = jax.jit(lambda k: model.init_variables(k, shapes, types))(
        jax.random.PRNGKey(0))["params"]

  task = tasks.Task(
      name="eval", source_fn=lambda: synthetic.synthetic_source(
          args.songs, duration=10.0, seed=args.seed),
      audio_codec=model.audio_codec,
      vocab_config=vocabularies.VocabularyConfig(num_velocity_bins=1),
      note_rep=tasks.NoteRepresentationConfig(include_ties=True),
      with_context=experiment.with_context)

  ds = task.full_song_dataset(lengths)
  songs = evaluation.group_songs(ds)
  if args.num_shards > 1:
    keys = sorted(songs)
    songs = {k: songs[k] for k in keys[args.shard::args.num_shards]}
  print(f"evaluating {len(songs)} songs"
        + (f" (shard {args.shard}/{args.num_shards})"
           if args.num_shards > 1 else ""))

  voc = vocoder.GriffinLimVocoder(num_iters=16) if args.vocode else None
  synth = synthesize.Synthesizer(model, params, lengths, vocoder=voc)
  results = evaluation.evaluate_songs(
      synth, songs, songs_per_batch=args.songs_per_batch,
      rng=jax.random.PRNGKey(args.seed), vocode=args.vocode,
      keep_arrays=args.output_dir is not None,
      prediction_source=args.prediction_source,
      always_mask_context=args.always_mask_context)

  agg = evaluation.aggregate(results)
  print(json.dumps(agg, indent=2))
  if args.output_dir:
    evaluation.write_outputs(results, args.output_dir,
                             sample_rate=model.audio_codec.sample_rate)
    print(f"wrote artifacts to {args.output_dir}")


if __name__ == "__main__":
  main()
