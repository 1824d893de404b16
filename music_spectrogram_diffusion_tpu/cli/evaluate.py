"""Full-song evaluation CLI (single-host replacement for the Beam
pipeline).

  # Synthetic source (no dataset files needed):
  python -m music_spectrogram_diffusion_tpu.cli.evaluate \
      --checkpoint /path/ckpt --synthetic --output_dir /tmp/eval \
      [--steps 50] [--songs 4] [--vocode] [--always_mask_context] \
      [--prediction_source model|gt_encoded|gt_raw] \
      [--num_shards N --shard I]

  # Real dataset (TFRecord shards mirrored locally; see data/registry):
  python -m music_spectrogram_diffusion_tpu.cli.evaluate \
      --checkpoint /path/ckpt --dataset maestrov3 --split validation \
      --data_root /data/mirror --output_dir /tmp/eval
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
  p.add_argument("--synthetic_timbre", default="sine",
                 choices=["sine", "rich"],
                 help="'rich' = program-keyed harmonic stacks + noise "
                      "transients (same seeded note streams, richer "
                      "rendered texture)")
  p.add_argument("--synthetic_drums", type=float, default=0.0,
                 help="fraction of extra drum hits per song")
  p.add_argument("--dataset", default=None,
                 help="dataset config name (e.g. maestrov3); requires "
                      "TFRecord files reachable via --data_root")
  p.add_argument("--split", default="validation",
                 help="dataset split for --dataset")
  p.add_argument("--data_root", default=None,
                 help="local mirror root for gs:// dataset paths")
  p.add_argument("--songs", type=int, default=8)
  p.add_argument("--songs_per_batch", type=int, default=2)
  p.add_argument("--steps", type=int, default=None)
  p.add_argument("--sampler", default=None, choices=["ddpm", "ddim", "dpm++", "sde-dpm++"],
                 help="override the sampler family (DDIM keeps quality "
                      "at far fewer steps; pair with --steps)")
  p.add_argument("--guidance_interval", default=None, metavar="LO,HI",
                 help="apply CFG only at noise times LO <= t <= HI; "
                      "steps outside run one conditional forward "
                      "(Kynkaanniemi et al. 2024)")
  p.add_argument("--vocode", action="store_true")
  p.add_argument("--vocoder_checkpoint", default=None,
                 help="trained SoundStreamDecoder dir "
                      "(cli/train_vocoder.py); implies --vocode and "
                      "replaces the Griffin-Lim fallback")
  p.add_argument("--vocoder_base_channels", type=int, default=512)
  p.add_argument("--output_dir", default=None)
  p.add_argument("--prediction_source", default="model",
                 choices=["model", "gt_encoded", "gt_raw"])
  p.add_argument("--always_mask_context", action="store_true",
                 help="render every segment without context (ablation)")
  p.add_argument("--compute_dtype", default=None,
                 choices=["float32", "bfloat16", "int8"],
                 help="serving dtype for the checkpointed model: bf16 "
                      "cast or weight-only int8 (ops/quantize.py)")
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--vggish_weights", default=None,
                 help="converted VGGish .npz (tools/convert_vggish.py); "
                      "enables VGGish-space FAD (also honours "
                      "$MSD_VGGISH_WEIGHTS)")
  p.add_argument("--trill_weights", default=None,
                 help="converted TRILL .npz (tools/convert_trill.py); "
                      "enables TRILL-space FAD (also honours "
                      "$MSD_TRILL_WEIGHTS)")
  p.add_argument("--mt3_checkpoint", default=None,
                 help="t5x MT3 checkpoint dir (infer/mt3.py); registers "
                      "the transcriber so rendered audio is scored with "
                      "note-onset F1 (reference TranscribeAudio stage); "
                      "implies --vocode")
  p.add_argument("--transcriber_checkpoint", default=None,
                 help="in-repo-trained transcriber model_dir "
                      "(cli/train_transcriber.py); same role as "
                      "--mt3_checkpoint for self-trained weights")
  p.add_argument("--transcriber_decode", default="greedy",
                 choices=["greedy", "beam"])
  # Work sharding across independent processes/hosts (the Beam
  # pipeline's shard parallelism): each process takes every
  # num_shards-th song.
  p.add_argument("--num_shards", type=int, default=1)
  p.add_argument("--shard", type=int, default=0)
  args = p.parse_args()
  if not 0 <= args.shard < args.num_shards:
    p.error(f"--shard {args.shard} out of range [0, {args.num_shards})")

  import dataclasses
  import jax
  import jax.numpy as jnp

  from music_spectrogram_diffusion_tpu import config as cfg_lib
  from music_spectrogram_diffusion_tpu.audio import vocoder
  from music_spectrogram_diffusion_tpu.data import (datasets, registry,
                                                    synthetic, tasks)
  from music_spectrogram_diffusion_tpu.infer import (evaluation, inference,
                                                     synthesize)
  from music_spectrogram_diffusion_tpu.midi import vocabularies

  if not args.synthetic and not args.dataset:
    p.error("pick a source: --synthetic or --dataset NAME")
  if args.dataset and args.dataset not in datasets.ALL_DATASET_CONFIGS:
    p.error(f"unknown dataset {args.dataset!r}; "
            f"known: {sorted(datasets.ALL_DATASET_CONFIGS)}")

  interval = None
  if args.guidance_interval:
    parts = args.guidance_interval.split(",")
    if len(parts) != 2:
      p.error("--guidance_interval expects LO,HI (e.g. 0.1,0.8)")
    interval = (float(parts[0]), float(parts[1]))

  if args.checkpoint:
    wrapper = inference.InferenceModel(args.checkpoint,
                                       sampler_steps=args.steps,
                                       sampler_name=args.sampler,
                                       guidance_interval=interval,
                                       compute_dtype=args.compute_dtype)
    model, params = wrapper.model, wrapper.params
    experiment, lengths = wrapper.experiment, wrapper.task_lengths
  else:
    experiment = cfg_lib.preset(args.preset)
    if args.steps or args.sampler or interval:
      overrides = {}
      if args.steps:
        overrides["num_steps"] = args.steps
      if args.sampler:
        overrides["name"] = args.sampler
      diffusion = dataclasses.replace(
          experiment.diffusion, sampler=dataclasses.replace(
              experiment.diffusion.sampler, **overrides))
      if interval:
        diffusion = dataclasses.replace(
            diffusion, guidance=dataclasses.replace(
                diffusion.guidance, interval=interval))
      experiment = dataclasses.replace(experiment, diffusion=diffusion)
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

  if args.synthetic:
    task = tasks.Task(
        name="eval", source_fn=lambda: synthetic.synthetic_source(
            args.songs, duration=10.0, seed=args.seed,
            timbre=args.synthetic_timbre,
            drum_fraction=args.synthetic_drums),
        audio_codec=model.audio_codec,
        vocab_config=experiment.vocab_config(),
        note_rep=experiment.note_rep(),
        with_context=experiment.with_context,
        program_granularity=experiment.program_granularity)
  else:
    task = registry.make_dataset_task(
        datasets.ALL_DATASET_CONFIGS[args.dataset], args.split,
        vocab_config=experiment.vocab_config(),
        note_rep=experiment.note_rep(),
        program_granularity=experiment.program_granularity,
        with_context=experiment.with_context,
        data_root=args.data_root,
        audio_codec=model.audio_codec)
    print(f"task: {task.name}")

  ds = task.full_song_dataset(lengths)
  if not args.synthetic and args.songs:
    # Bound song count by CUTTING the segment stream (take_while, not
    # filter: filter would keep tokenizing + mel-encoding the rest of
    # the split just to discard it); group_songs drops the trailing
    # partial song below. The seen-set is rebuilt per iteration so the
    # bounded dataset can be iterated more than once.
    def make_within_limit():
      songs_seen = set()

      def within_limit(ex):
        key = ex.get("id", "")
        key = key.decode() if isinstance(key, bytes) else str(key)
        songs_seen.add(key)
        return len(songs_seen) <= args.songs
      return within_limit
    ds = ds.take_while_stateful(make_within_limit)
  songs = evaluation.group_songs(ds)
  if args.num_shards > 1:
    keys = sorted(songs)
    songs = {k: songs[k] for k in keys[args.shard::args.num_shards]}
  print(f"evaluating {len(songs)} songs"
        + (f" (shard {args.shard}/{args.num_shards})"
           if args.num_shards > 1 else ""))

  from music_spectrogram_diffusion_tpu.infer import trill, vggish
  if vggish.register(args.vggish_weights):
    print("VGGish embeddings enabled (FAD in VGGish space)")
  elif args.vggish_weights:
    p.error(f"VGGish weights not found: {args.vggish_weights}")
  if trill.register(args.trill_weights):
    print("TRILL embeddings enabled (FAD in TRILL space)")
  elif args.trill_weights:
    p.error(f"TRILL weights not found: {args.trill_weights}")
  if args.mt3_checkpoint:
    from music_spectrogram_diffusion_tpu.infer import mt3
    mt3.register(args.mt3_checkpoint)
    print("MT3 transcriber enabled (note-onset F1 on rendered audio)")
    args.vocode = True
  elif args.transcriber_checkpoint:
    from music_spectrogram_diffusion_tpu.infer import mt3, transcription
    transcription.register_transcriber(mt3.load_trained_transcriber(
        args.transcriber_checkpoint, decode_mode=args.transcriber_decode))
    print("in-repo transcriber enabled (note-onset F1 on rendered audio)")
    args.vocode = True
  from music_spectrogram_diffusion_tpu.infer import postprocessors
  audio_embedders = set(postprocessors.EMBEDDING_MODELS) - {"mel"}
  if audio_embedders and not args.vocode:
    # Audio-embedding FAD needs rendered audio; without this the
    # requested metric would silently vanish from the report. ('mel'
    # operates on spectrograms and doesn't need audio.)
    print(f"audio-embedding models {sorted(audio_embedders)} registered "
          "-> enabling --vocode")
    args.vocode = True

  if args.vocoder_checkpoint:
    args.vocode = True
    voc = vocoder.load_trained(args.vocoder_checkpoint,
                               base_channels=args.vocoder_base_channels)
  else:
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
