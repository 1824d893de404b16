"""A/B the int8 weight-only matmul against bf16/f32 across batch sizes.

  python tools/bench_qmm.py [--k 2048] [--iters 50] [--out results.json]

Round-3 verdict item #6: int8 serving LOST at its own benchmark geometry
(M=512) and the claimed low-M win was asserted, not measured. This
measures it: per-matmul wall time at M in {1, 8, 32, 128, 512} for
  * f32 jnp.dot (XLA default on TPU uses fast bf16 passes),
  * bf16 jnp.dot (weights stored bf16 — the serving cast),
  * int8 quantized_matmul Pallas kernel,
  * int8 quantized_matmul XLA fallback (dequantize-then-dot).

Microbenchmarks at ~us scale are dispatch-dominated through the TPU
tunnel (BENCH.md round-2 lesson), so each measurement chains `iters`
dependent matmuls inside ONE jit (square K=N so outputs feed back as
inputs) and reports wall/iters.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--k", type=int, default=2048,
                 help="square weight dim (K=N)")
  p.add_argument("--iters", type=int, default=50)
  p.add_argument("--repeats", type=int, default=5)
  p.add_argument("--ms", type=int, nargs="+",
                 default=[1, 8, 32, 128, 512])
  p.add_argument("--out", default=None)
  args = p.parse_args()

  import jax
  import jax.numpy as jnp
  import numpy as np

  from music_spectrogram_diffusion_tpu.ops import quantize as qops

  k = args.k
  r = np.random.RandomState(0)
  w = jnp.asarray(r.randn(k, k).astype(np.float32) * 0.02)
  q, s = qops.quantize_kernel(w)
  w_bf16 = w.astype(jnp.bfloat16)
  on_tpu = jax.default_backend() == "tpu"

  def chain(matmul):
    def run(x):
      def body(x, _):
        y = matmul(x)
        return y.astype(x.dtype), ()
      out, _ = jax.lax.scan(body, x, None, length=args.iters)
      return out
    return jax.jit(run)

  methods = {
      "f32_dot": chain(lambda x: jnp.dot(x, w)),
      "bf16_dot": chain(lambda x: jnp.dot(x.astype(jnp.bfloat16), w_bf16)),
      "int8_pallas": chain(lambda x: qops.quantized_matmul(
          x, q, s, use_pallas=True, interpret=not on_tpu,
          partitioned=False)),
      "int8_xla": chain(lambda x: qops.quantized_matmul(
          x, q, s, use_pallas=False, partitioned=False)),
  }

  results = {"k": k, "iters": args.iters, "backend": jax.default_backend(),
             "per_matmul_us": {}}
  for m in args.ms:
    x = jnp.asarray(r.randn(m, k).astype(np.float32))
    row = {}
    for name, fn in methods.items():
      fn(x).block_until_ready()  # compile
      best = float("inf")
      for _ in range(args.repeats):
        t0 = time.perf_counter()
        fn(x).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / args.iters)
      row[name] = best * 1e6
    results["per_matmul_us"][str(m)] = row
    rel = row["int8_pallas"] / row["bf16_dot"]
    print(f"M={m:4d}: " + "  ".join(f"{n}={v:8.2f}us"
                                    for n, v in row.items())
          + f"   int8_pallas/bf16 = {rel:.2f}x")

  if args.out:
    with open(args.out, "w") as f:
      json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
  main()
