"""Build the offline tokenization cache for dataset tasks.

  python -m music_spectrogram_diffusion_tpu.cli.cache_task \
      --dataset maestrov3 --data_root /data/mirror \
      --cache_root /data/cache [--split train]

Materializes the pre-cache chain (tokenize -> rekey -> split into
<=2000-frame chunks) to TFRecord shards — the reference does this with
`seqio.CacheDatasetPlaceholder` + an offline beam job (reference
tasks.py:38,325). Training then streams the cache each epoch instead of
re-tokenizing raw records.
"""

from __future__ import annotations

import argparse
import os
import time


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--dataset", required=True,
                 help="dataset config name, or 'all' for the mega-"
                      "mixture datasets")
  p.add_argument("--split", default=None,
                 help="dataset split (default: the train split)")
  p.add_argument("--data_root", default=None,
                 help="local mirror root for gs:// dataset paths")
  p.add_argument("--cache_root", required=True)
  p.add_argument("--examples_per_shard", type=int, default=128)
  args = p.parse_args()

  from music_spectrogram_diffusion_tpu.data import datasets, registry

  if args.dataset == "all":
    configs = list(datasets.SYNTH_MIXTURE_DATASET_CONFIGS)
  elif args.dataset in datasets.ALL_DATASET_CONFIGS:
    configs = [datasets.ALL_DATASET_CONFIGS[args.dataset]]
  else:
    p.error(f"unknown dataset {args.dataset!r}; "
            f"known: {sorted(datasets.ALL_DATASET_CONFIGS)} or 'all'")

  for config in configs:
    split = args.split or config.train_split
    task = registry.make_dataset_task(
        config, split,
        vocab_config=registry.VOCAB_CONFIG_NOVELOCITY,
        data_root=args.data_root,
        cache_root=args.cache_root)
    cache_dir = os.path.join(args.cache_root, task.name)
    t0 = time.time()
    meta = task.build_cache(cache_dir,
                            examples_per_shard=args.examples_per_shard)
    print(f"{task.name}: cached {meta['num_examples']} examples in "
          f"{meta['num_shards']} shards -> {cache_dir} "
          f"({time.time() - t0:.1f}s)")


if __name__ == "__main__":
  main()
