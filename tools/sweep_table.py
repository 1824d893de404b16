"""Render a markdown table from a directory of eval metrics JSONs.

  python tools/sweep_table.py --dir results/round4/base_sweep \
      [--metrics mel_l2 frechet_audio_distance/mel]

Each subdirectory with a metrics.json becomes a row; bootstrap CI
columns (<metric>_ci95_low/high, from infer/evaluation.py aggregate)
are folded into "value [lo, hi]" cells. Baseline-relative deltas are
computed against the row named by --baseline (substring match).
"""

from __future__ import annotations

import argparse
import json
import os


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--dir", required=True)
  p.add_argument("--metrics", nargs="+",
                 default=["mel_l2", "mel_frechet",
                          "frechet_audio_distance/mel"])
  p.add_argument("--baseline", default="ddpm1000",
                 help="row-name substring for relative deltas "
                      "(first exact-prefix match wins)")
  args = p.parse_args()

  rows = {}
  for name in sorted(os.listdir(args.dir)):
    path = os.path.join(args.dir, name, "metrics.json")
    if os.path.exists(path):
      with open(path) as f:
        rows[name] = json.load(f)["aggregate"]
  if not rows:
    raise SystemExit(f"no metrics.json under {args.dir}/*/")

  base_name = next((n for n in rows if n == args.baseline),
                   next((n for n in rows if args.baseline in n), None))
  base = rows.get(base_name, {})

  def cell(agg, metric, with_delta):
    if metric not in agg:
      return "-"
    v = agg[metric]
    s = f"{v:.1f}" if abs(v) >= 100 else f"{v:.3f}"
    lo, hi = agg.get(f"{metric}_ci95_low"), agg.get(f"{metric}_ci95_high")
    if lo is not None:
      s += (f" [{lo:.0f}, {hi:.0f}]" if abs(v) >= 100
            else f" [{lo:.3f}, {hi:.3f}]")
    if with_delta and metric in base and base[metric]:
      s += f" ({(v - base[metric]) / abs(base[metric]):+.1%})"
    return s

  print("| run | " + " | ".join(args.metrics) + " | songs |")
  print("|---" * (len(args.metrics) + 2) + "|")
  for name, agg in rows.items():
    cells = [cell(agg, m, name != base_name) for m in args.metrics]
    print(f"| {name} | " + " | ".join(cells)
          + f" | {int(agg.get('num_songs', 0))} |")


if __name__ == "__main__":
  main()
