"""Training entry point.

  python -m music_spectrogram_diffusion_tpu.cli.train \
      --preset context_small --model_dir /tmp/run1 \
      [--synthetic] [--steps 1000] [--batch 8] [--mesh 4x2]

Replaces the reference's `python -m t5x.train --gin_file=...` matrix
(reference gin/README.md): the preset picks model size/context, the task
flags pick data. --synthetic trains on the generated sine dataset (smoke
runs / this environment, which has no dataset files).
"""

from __future__ import annotations

import argparse


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--preset", default="context_small")
  p.add_argument("--model_dir", required=True)
  p.add_argument("--steps", type=int, default=None)
  p.add_argument("--batch", type=int, default=None)
  p.add_argument("--mesh", default=None,
                 help="DATAxMODEL, e.g. 4x2 (default: all devices as DP)")
  p.add_argument("--synthetic", action="store_true",
                 help="train on the generated sine dataset")
  p.add_argument("--synthetic_examples", type=int, default=64,
                 help="synthetic dataset size (--synthetic only)")
  p.add_argument("--synthetic_seed", type=int, default=0,
                 help="base seed of the synthetic song generator; songs "
                      "are seeds [base, base+N). Keep the training range "
                      "disjoint from eval's --seed (default 1000) when "
                      "N > 1000, e.g. --synthetic_seed 20000")
  p.add_argument("--synthetic_timbre", default="sine",
                 choices=["sine", "rich"],
                 help="'rich' = program-keyed harmonic stacks + noise "
                      "transients + drums instead of pure sines (quality "
                      "metrics stop being pure-tone artifacts)")
  p.add_argument("--synthetic_drums", type=float, default=0.0,
                 help="fraction of extra drum hits per song (rich render "
                      "gives them noise-burst timbre)")
  p.add_argument("--dataset", default="maestrov3",
                 help="dataset config name, or 'mega' for the full "
                      "example-proportional mixture (requires TFRecords)")
  p.add_argument("--data_root", default=None,
                 help="local mirror root for gs:// dataset paths")
  p.add_argument("--cache_root", default=None,
                 help="offline tokenization cache root "
                      "(build with cli.cache_task)")
  p.add_argument("--shuffle_buffer", type=int, default=256)
  p.add_argument("--data_threads", type=int, default=8,
                 help="post-cache transform thread pool size")
  p.add_argument("--log_period", type=int, default=100)
  p.add_argument("--checkpoint_period", type=int, default=None)
  p.add_argument("--eval_batches", type=int, default=0,
                 help="run a held-out eval pass of N batches every "
                      "eval_period steps (reference train.gin:61 "
                      "eval_period; 0 = off)")
  p.add_argument("--eval_period", type=int, default=None,
                 help="override the preset's eval period")
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--remat", action="store_true",
                 help="per-layer rematerialization (needed to train "
                      "base+ sizes on one 16GB chip)")
  p.add_argument("--microbatches", type=int, default=None,
                 help="gradient-accumulation microbatches per update")
  # Multi-host: run the same command on every host (see
  # parallel/multihost.py for the launch procedure).
  p.add_argument("--distributed", action="store_true",
                 help="initialize jax.distributed (multi-host training)")
  p.add_argument("--coordinator", default=None,
                 help="coordinator host:port (non-TPU clusters)")
  p.add_argument("--num_processes", type=int, default=None)
  p.add_argument("--process_id", type=int, default=None)
  args = p.parse_args()

  if args.distributed:
    from music_spectrogram_diffusion_tpu.parallel import multihost
    multihost.initialize(coordinator_address=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)

  import dataclasses
  import jax
  import jax.numpy as jnp

  from music_spectrogram_diffusion_tpu import config as cfg_lib
  from music_spectrogram_diffusion_tpu.audio import codecs
  from music_spectrogram_diffusion_tpu.data import registry, tasks
  from music_spectrogram_diffusion_tpu.infer import inference

  from music_spectrogram_diffusion_tpu.parallel import mesh as mesh_lib
  from music_spectrogram_diffusion_tpu.train import loop, trainer

  experiment = cfg_lib.preset(args.preset)
  if args.steps:
    experiment = dataclasses.replace(
        experiment, train=dataclasses.replace(
            experiment.train, train_steps=args.steps))
  if args.batch:
    experiment = dataclasses.replace(
        experiment, train=dataclasses.replace(
            experiment.train, batch_size=args.batch))
  if args.checkpoint_period:
    experiment = dataclasses.replace(
        experiment, train=dataclasses.replace(
            experiment.train, checkpoint_period=args.checkpoint_period))
  if args.eval_period:
    experiment = dataclasses.replace(
        experiment, train=dataclasses.replace(
            experiment.train, eval_period=args.eval_period))
  if args.remat:
    experiment = dataclasses.replace(experiment, remat=True)
  if args.microbatches:
    experiment = dataclasses.replace(
        experiment, train=dataclasses.replace(
            experiment.train, num_microbatches=args.microbatches))

  if args.mesh:
    data_par, model_par = map(int, args.mesh.split("x"))
    mesh = mesh_lib.make_mesh(data=data_par, model=model_par)
  else:
    mesh = mesh_lib.make_mesh(model=1)
  print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} "
        f"{jax.devices()[0].platform} device(s)")

  model = inference.build_model(experiment)

  # Data.
  tl = experiment.task_lengths
  lengths = {"inputs": tl.inputs, "targets": tl.targets}
  if experiment.with_context:
    lengths["targets_context"] = tl.targets_context

  batch_size = experiment.train.batch_size
  if args.synthetic:
    # The cache key encodes example count + vocab/note-rep so changing
    # --synthetic_examples (or the preset family) rebuilds rather than
    # silently streaming a stale cache.
    task = registry.synthetic_cached_task(
        "train",
        audio_codec=model.audio_codec,
        vocab_config=experiment.vocab_config(),
        note_rep=experiment.note_rep(),
        with_context=experiment.with_context,
        program_granularity=experiment.program_granularity,
        num_examples=args.synthetic_examples,
        seed=args.synthetic_seed,
        timbre=args.synthetic_timbre,
        drum_fraction=args.synthetic_drums,
        cache_root=args.cache_root)
    ds = task.model_dataset(lengths, training=True, seed=args.seed,
                            shuffle_buffer_size=args.shuffle_buffer,
                            num_threads=args.data_threads).repeat()
  elif args.dataset == "mega":
    registry.register_all_tasks(data_root=args.data_root,
                                with_context=experiment.with_context,
                                include_eval_splits=False,
                                cache_root=args.cache_root)
    mix_name = ("synthesis_with_context_mega" if experiment.with_context
                else "synthesis_mega")
    mixture = tasks.MIXTURE_REGISTRY[mix_name]
    print(f"mixture: {mix_name} over {len(mixture.task_names)} tasks")
    ds = mixture.dataset(lengths, training=True, seed=args.seed,
                         shuffle_buffer_size=args.shuffle_buffer,
                         num_threads=args.data_threads)
  else:
    from music_spectrogram_diffusion_tpu.data import datasets
    if args.dataset not in datasets.ALL_DATASET_CONFIGS:
      p.error(f"unknown dataset {args.dataset!r}; "
              f"known: {sorted(datasets.ALL_DATASET_CONFIGS)} or 'mega'")
    config = datasets.ALL_DATASET_CONFIGS[args.dataset]
    task = registry.make_dataset_task(
        config, config.train_split,
        vocab_config=experiment.vocab_config(),
        note_rep=experiment.note_rep(),
        program_granularity=experiment.program_granularity,
        with_context=experiment.with_context,
        data_root=args.data_root,
        audio_codec=model.audio_codec,
        cache_root=args.cache_root)
    print(f"task: {task.name}"
          + (" (cached)" if task.cache_dir else " (no cache: tokenizing "
             "online; build one with cli.cache_task)"))
    ds = task.model_dataset(lengths, training=True, seed=args.seed,
                            shuffle_buffer_size=args.shuffle_buffer,
                            num_threads=args.data_threads).repeat()

  # Multi-host: each host feeds its round-robin shard of the stream at
  # the process-local batch size; shard_batch assembles the global batch.
  if jax.process_count() > 1:
    from music_spectrogram_diffusion_tpu.parallel import multihost
    ds = multihost.shard_for_host(ds)
    batch_size = multihost.process_local_batch_size(batch_size)
  ds = ds.batch(batch_size).prefetch(4, num_threads=2)

  # Trainer + state.
  t = trainer.Trainer(model=model, train_cfg=experiment.train, mesh=mesh)
  first = ds.first()
  state = t.create_state(
      jax.random.PRNGKey(args.seed),
      {k: v.shape for k, v in first.items()},
      {k: jnp.asarray(v).dtype for k, v in first.items()})
  n_params = sum(p.size for p in jax.tree_util.tree_leaves(state.params))
  print(f"params: {n_params / 1e6:.1f}M")

  # Held-out eval pass every eval_period steps (the role of the
  # reference's seqio Evaluator, gin/train.gin:61,126-133): a fixed set
  # of batches from a disjoint source, scored with the loss metrics.
  eval_fn = None
  if args.eval_batches:
    import itertools

    import numpy as np
    if args.synthetic:
      eval_task = registry.synthetic_cached_task(
          "eval",
          audio_codec=model.audio_codec,
          vocab_config=experiment.vocab_config(),
          note_rep=experiment.note_rep(),
          with_context=experiment.with_context,
          program_granularity=experiment.program_granularity,
          num_examples=max(args.synthetic_examples // 8, 8),
          seed=1000,  # disjoint from the training generator
          timbre=args.synthetic_timbre,
          drum_fraction=args.synthetic_drums,
          cache_root=args.cache_root)
    elif args.dataset != "mega":
      from music_spectrogram_diffusion_tpu.data import datasets
      config = datasets.ALL_DATASET_CONFIGS[args.dataset]
      eval_task = registry.make_dataset_task(
          config, config.train_eval_split,
          vocab_config=experiment.vocab_config(),
          note_rep=experiment.note_rep(),
          program_granularity=experiment.program_granularity,
          with_context=experiment.with_context,
          data_root=args.data_root,
          audio_codec=model.audio_codec,
          cache_root=args.cache_root)
    else:
      eval_task = None
      print("--eval_batches: no held-out eval for the mega mixture; "
            "run cli.evaluate on the per-dataset eval splits instead")
    if eval_task is not None:
      eval_set = list(itertools.islice(
          iter(eval_task.model_dataset(lengths, training=True, seed=1)
               .repeat().batch(batch_size)), args.eval_batches))

      def eval_fn(state):
        per_batch = [t.eval_step(state, t.shard_batch(b))
                     for b in eval_set]
        out = {}
        for k, v in per_batch[0].items():
          if np.asarray(v).size != 1:
            continue
          out[k] = float(np.mean([float(np.asarray(m[k]))
                                  for m in per_batch]))
        return out

  train_loop = loop.TrainLoop(
      trainer=t, experiment=experiment, model_dir=args.model_dir,
      log_period=args.log_period, eval_fn=eval_fn)
  state = train_loop.maybe_resume(state)
  train_loop.run(iter(ds), state, rng=jax.random.PRNGKey(args.seed + 1))


if __name__ == "__main__":
  main()
