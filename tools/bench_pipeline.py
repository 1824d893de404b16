"""Input-pipeline throughput benchmark (host CPU, no accelerator).

Measures the post-cache training pipeline — cached-chunk read ->
random-chunk-with-context -> RLE slice -> mel encode -> feature
convert -> batch — in examples/s, the number that decides whether the
host can feed the TPU (the reference caches offline for exactly this
reason: reference tasks.py:38,325).

  python tools/bench_pipeline.py [--songs 64] [--batch 256] \
      [--threads 1 4 8] [--seconds 20]

Compares against the measured train-step consumption (BENCH.md): the
base model consumes ~24-27 seqs/s per chip, so one host feeding DP-16
needs ~400-450 examples/s.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--songs", type=int, default=64)
  p.add_argument("--duration", type=float, default=12.0)
  p.add_argument("--batch", type=int, default=256)
  p.add_argument("--threads", type=int, nargs="+", default=[1, 4, 8])
  p.add_argument("--seconds", type=float, default=20.0,
                 help="measurement window per config")
  args = p.parse_args()

  from music_spectrogram_diffusion_tpu.audio import codecs
  from music_spectrogram_diffusion_tpu.data import (cache as cache_lib,
                                                    synthetic,
                                                    tasks as task_lib)
  from music_spectrogram_diffusion_tpu.midi import vocabularies

  lengths = {"inputs": 2048, "targets": 256, "targets_context": 256}

  with tempfile.TemporaryDirectory() as tmp:
    task = task_lib.Task(
        name="bench_pipeline",
        source_fn=lambda: synthetic.synthetic_source(
            args.songs, duration=args.duration),
        audio_codec=codecs.MelGan(),
        vocab_config=vocabularies.VocabularyConfig(num_velocity_bins=1),
        note_rep=task_lib.NoteRepresentationConfig(include_ties=True),
        cache_dir=tmp)

    t0 = time.time()
    meta = cache_lib.write_cache(
        task._tokenized_fresh(split_sequences=True), tmp)
    build_s = time.time() - t0
    print(f"cache build: {meta['num_examples']} chunks from "
          f"{args.songs} songs in {build_s:.1f}s "
          f"({meta['num_examples'] / build_s:.1f} ex/s, one thread)")

    for n_threads in args.threads:
      ds = task.model_dataset(lengths, training=True, seed=0,
                              num_threads=n_threads).repeat()
      it = iter(ds.batch(args.batch))
      next(it)  # warm up
      n_batches = 0
      t0 = time.time()
      while time.time() - t0 < args.seconds:
        next(it)
        n_batches += 1
      dt = time.time() - t0
      ex_s = n_batches * args.batch / dt
      print(f"threads={n_threads}: {ex_s:.0f} examples/s "
            f"({n_batches / dt:.2f} batch-{args.batch}/s)")


if __name__ == "__main__":
  main()
