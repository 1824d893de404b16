"""Progressive-distillation driver: halve sampler steps per round.

  python -m music_spectrogram_diffusion_tpu.cli.distill \
      --teacher /path/to/step_500000 --model_dir /tmp/distilled \
      --rounds 2 --steps_per_round 10000 --synthetic

Round r: teacher at N steps -> student at N/2 (student initialized from
the teacher, trained to match two teacher DDIM half-steps with guidance
folded in), then the student becomes the next round's teacher. The final
checkpoint samples with DDIM at N/2^rounds steps and NO classifier-free
guidance branch — e.g. 1000-step DDPM x2 CFG -> 250-step DDIM x1 is a
~8x sampling-cost reduction (see train/distill.py).
"""

from __future__ import annotations

import argparse


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--teacher", required=True,
                 help="teacher checkpoint (step_<N> dir or parent)")
  p.add_argument("--model_dir", required=True)
  p.add_argument("--rounds", type=int, default=2)
  p.add_argument("--steps_per_round", type=int, default=10_000)
  p.add_argument("--batch", type=int, default=None)
  p.add_argument("--mesh", default=None, help="DATAxMODEL, e.g. 4x2")
  p.add_argument("--synthetic", action="store_true",
                 help="distill on the synthetic sine dataset (smoke)")
  p.add_argument("--synthetic_examples", type=int, default=64,
                 help="synthetic dataset size (--synthetic only)")
  p.add_argument("--data_threads", type=int, default=8)
  p.add_argument("--dataset", default="maestrov3")
  p.add_argument("--data_root", default=None)
  p.add_argument("--cache_root", default=None)
  p.add_argument("--learning_rate", type=float, default=1e-4,
                 help="distillation LR (finetune-scale; the teacher's "
                      "training LR is too hot for a converged init)")
  p.add_argument("--warmup_steps", type=int, default=100)
  p.add_argument("--guidance_weight", type=float, default=None,
                 help="CFG weight folded into the student (default: the "
                      "teacher's eval_condition_weight)")
  p.add_argument("--log_period", type=int, default=100)
  p.add_argument("--seed", type=int, default=0)
  args = p.parse_args()

  import dataclasses
  import os

  import jax
  import jax.numpy as jnp

  from music_spectrogram_diffusion_tpu import config as cfg_lib
  from music_spectrogram_diffusion_tpu.data import registry
  from music_spectrogram_diffusion_tpu.infer import inference
  from music_spectrogram_diffusion_tpu.parallel import mesh as mesh_lib
  from music_spectrogram_diffusion_tpu.train import (checkpoints, distill,
                                                     loop, trainer)

  wrapper = inference.InferenceModel(args.teacher)
  teacher_exp = wrapper.experiment
  teacher_model, teacher_params = wrapper.model, wrapper.params

  if args.mesh:
    data_par, model_par = map(int, args.mesh.split("x"))
    mesh = mesh_lib.make_mesh(data=data_par, model=model_par)
  else:
    mesh = mesh_lib.make_mesh(model=1)

  tl = teacher_exp.task_lengths
  lengths = {"inputs": tl.inputs, "targets": tl.targets}
  if teacher_exp.with_context:
    lengths["targets_context"] = tl.targets_context

  if args.synthetic:
    # The helper's cache key encodes the teacher's vocab/note-rep, so a
    # cache tokenized for one teacher family is never reused for
    # another (e.g. mt3-family ties vs ismir2021 127-velocity-bin).
    task = registry.synthetic_cached_task(
        "distill",
        audio_codec=teacher_model.audio_codec,
        vocab_config=teacher_exp.vocab_config(),
        note_rep=teacher_exp.note_rep(),
        with_context=teacher_exp.with_context,
        program_granularity=teacher_exp.program_granularity,
        num_examples=args.synthetic_examples,
        cache_root=args.cache_root)
  else:
    from music_spectrogram_diffusion_tpu.data import datasets
    config = datasets.ALL_DATASET_CONFIGS[args.dataset]
    task = registry.make_dataset_task(
        config, config.train_split,
        vocab_config=teacher_exp.vocab_config(),
        note_rep=teacher_exp.note_rep(),
        program_granularity=teacher_exp.program_granularity,
        with_context=teacher_exp.with_context,
        data_root=args.data_root, cache_root=args.cache_root,
        audio_codec=teacher_model.audio_codec)

  batch_size = args.batch or teacher_exp.train.batch_size
  teacher_steps = teacher_exp.diffusion.sampler.num_steps

  for round_idx in range(args.rounds):
    student_steps = teacher_steps // 2
    print(f"round {round_idx}: {teacher_steps} -> {student_steps} steps")
    student_exp = distill.student_experiment(teacher_exp, student_steps)
    student_exp = dataclasses.replace(
        student_exp, train=dataclasses.replace(
            student_exp.train, train_steps=args.steps_per_round,
            checkpoint_period=args.steps_per_round,
            learning_rate=args.learning_rate,
            warmup_steps=args.warmup_steps))
    student_model = inference.build_model(student_exp)
    dmodel = distill.DistillModel(
        student_model, teacher_model, teacher_params, student_steps,
        guidance_weight=(args.guidance_weight if round_idx == 0 else 1.0))

    ds = (task.model_dataset(lengths, training=True,
                             seed=args.seed + round_idx,
                             num_threads=args.data_threads)
          .repeat().batch(batch_size).prefetch(4, num_threads=4))
    t = trainer.Trainer(model=dmodel, train_cfg=student_exp.train,
                        mesh=mesh)
    first = ds.first()
    state = t.create_state(
        jax.random.PRNGKey(args.seed),
        {k: v.shape for k, v in first.items()},
        {k: jnp.asarray(v).dtype for k, v in first.items()},
        params=teacher_params)  # student starts from the teacher

    round_dir = os.path.join(args.model_dir, f"round_{round_idx}")
    train_loop = loop.TrainLoop(
        trainer=t, experiment=student_exp, model_dir=round_dir,
        log_period=args.log_period)
    state = train_loop.run(iter(ds), state,
                           num_steps=args.steps_per_round,
                           rng=jax.random.PRNGKey(args.seed + 1))

    # Student becomes the next teacher (guidance already folded in).
    teacher_model = inference.build_model(student_exp)
    teacher_params = state.params
    teacher_exp = student_exp
    teacher_steps = student_steps
    print(f"round {round_idx} done -> {round_dir}")


if __name__ == "__main__":
  main()
