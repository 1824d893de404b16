"""Synthesize a MIDI file to audio (the colab demo as a CLI).

  python -m music_spectrogram_diffusion_tpu.cli.synthesize_midi \
      --midi song.mid --output out.wav \
      [--checkpoint /path/to/ckpt] [--steps 1000] [--size base]

Without a checkpoint, runs with random weights (useful only for smoke
testing the pipeline); with one, this is the full MIDI -> mel -> audio
chain of the reference colab (reference README.md:13-18) entirely on
device.
"""

from __future__ import annotations

import argparse
import time


def segment_midi(ns, task, task_lengths):
  """Tokenize a NoteSequence into per-segment encoder token arrays."""
  import numpy as np
  from music_spectrogram_diffusion_tpu.data import preprocessors
  from music_spectrogram_diffusion_tpu.data import tasks as task_lib
  from music_spectrogram_diffusion_tpu.midi import run_length

  duration = ns.total_time + 0.5
  samples = np.zeros(int(duration * task.audio_codec.sample_rate) + 1,
                     np.float32)  # silent audio, only timing matters
  ex = preprocessors.tokenize_example(
      ns=ns, samples=samples, audio_codec=task.audio_codec,
      codec=task.codec, onsets_only=task.note_rep.onsets_only,
      include_ties=task.note_rep.include_ties)
  ex = preprocessors.rekey_transcription_to_synthesis(ex)

  segments = []
  for seg in preprocessors.split_full_song(
      ex, feature_key="targets", max_tokens=task_lengths["targets"],
      audio_codec=task.audio_codec,
      additional_feature_keys=["event_start_indices", "event_end_indices",
                               "state_event_indices"],
      passthrough_feature_keys=["inputs", "state_events"]):
    seg = preprocessors.note_representation_chain(
        seg, codec=task.codec, include_ties=task.note_rep.include_ties,
        granularity_type=task.program_granularity, feature_key="inputs")
    seg = preprocessors.tokenize_and_append_eos(
        seg, task.vocabulary, keys=("inputs",))
    segments.append(seg["inputs"])
  return segments


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--midi", required=True)
  p.add_argument("--output", required=True)
  p.add_argument("--checkpoint", default=None)
  p.add_argument("--size", default="small")
  p.add_argument("--steps", type=int, default=None,
                 help="sampler steps override (default: the checkpoint's\n                 configured count — e.g. a distilled checkpoint keeps its\n                 reduced steps)")
  p.add_argument("--sampler", default=None,
                 choices=["ddpm", "ddim", "dpm++", "sde-dpm++"],
                 help="sampler family override (default: the checkpoint's)")
  p.add_argument("--guidance_interval", default=None, metavar="LO,HI",
                 help="apply CFG only at noise times LO <= t <= HI; "
                      "steps outside run one conditional forward")
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--vocoder", default="griffin_lim",
                 choices=["griffin_lim", "none"])
  p.add_argument("--vocoder_checkpoint", default=None,
                 help="trained SoundStreamDecoder dir "
                      "(cli/train_vocoder.py); overrides --vocoder")
  p.add_argument("--vocoder_base_channels", type=int, default=512)
  args = p.parse_args()

  import jax
  import numpy as np

  from music_spectrogram_diffusion_tpu import config as cfg_lib
  from music_spectrogram_diffusion_tpu.audio import codecs, vocoder, wav_io
  from music_spectrogram_diffusion_tpu.data import tasks as task_lib
  from music_spectrogram_diffusion_tpu.infer import inference, synthesize
  from music_spectrogram_diffusion_tpu.midi import midi_io, vocabularies

  print(f"reading {args.midi}")
  ns = midi_io.read_midi_file(args.midi)
  print(f"  {len(ns.notes)} notes, {ns.total_time:.1f}s")

  import dataclasses
  interval = None
  if args.guidance_interval:
    lo, hi = args.guidance_interval.split(",")
    interval = (float(lo), float(hi))
  if args.checkpoint:
    model_wrapper = inference.InferenceModel(
        args.checkpoint, sampler_steps=args.steps,
        sampler_name=args.sampler, guidance_interval=interval)
    model = model_wrapper.model
    params = model_wrapper.params
    experiment = model_wrapper.experiment
    lengths = model_wrapper.task_lengths
  else:
    print("NOTE: no checkpoint given; using random weights (smoke test).")
    base = cfg_lib.ExperimentConfig().diffusion
    diffusion = dataclasses.replace(
        base,
        sampler=dataclasses.replace(
            base.sampler, num_steps=args.steps or 1000,
            **({"name": args.sampler} if args.sampler else {})))
    if interval:
      diffusion = dataclasses.replace(
          diffusion, guidance=dataclasses.replace(
              diffusion.guidance, interval=interval))
    experiment = dataclasses.replace(
        cfg_lib.ExperimentConfig(size=args.size, dropout_rate=0.0),
        diffusion=diffusion)
    model = inference.build_model(experiment)
    tl = experiment.task_lengths
    lengths = {"inputs": tl.inputs, "targets": tl.targets,
               "targets_context": tl.targets_context}
    shapes = {
        "encoder_input_tokens": (1, tl.inputs),
        "encoder_continuous_inputs": (1, tl.targets_context, 128),
        "encoder_continuous_mask": (1, tl.targets_context),
        "decoder_target_tokens": (1, tl.targets, 128)}
    import jax.numpy as jnp
    types = {"encoder_input_tokens": jnp.int32,
             "encoder_continuous_mask": jnp.bool_}
    params = jax.jit(lambda k: model.init_variables(k, shapes, types))(
        jax.random.PRNGKey(0))["params"]

  task = task_lib.Task(
      name="synthesize_midi", source_fn=lambda: None,
      audio_codec=model.audio_codec,
      vocab_config=vocabularies.VocabularyConfig(num_velocity_bins=1),
      note_rep=task_lib.NoteRepresentationConfig(include_ties=True))

  segments = segment_midi(ns, task, lengths)
  print(f"  {len(segments)} segments of "
        f"{lengths['targets'] / model.audio_codec.frame_rate:.2f}s")

  if args.vocoder_checkpoint:
    voc = vocoder.load_trained(args.vocoder_checkpoint,
                               base_channels=args.vocoder_base_channels)
  else:
    voc = (vocoder.GriffinLimVocoder(num_iters=32)
           if args.vocoder == "griffin_lim" else None)
  synth = synthesize.Synthesizer(model, params, lengths, vocoder=voc)
  t0 = time.time()
  out = synth.render_song(segments, rng=jax.random.PRNGKey(args.seed),
                          vocode=voc is not None)
  print(f"rendered in {time.time() - t0:.1f}s "
        f"({out.timings['prediction_seconds_per_audio_second']:.3f} "
        f"pred-s per audio-s)")

  if out.audio is not None:
    wav_io.write_wav(args.output, out.audio, model.audio_codec.sample_rate)
    print(f"wrote {args.output} "
          f"({len(out.audio) / model.audio_codec.sample_rate:.1f}s)")
  else:
    np.save(args.output, out.mel)
    print(f"wrote mel features to {args.output}")


if __name__ == "__main__":
  main()
