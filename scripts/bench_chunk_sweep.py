"""A/B the blend chunk size on the full bench workload (one chip).

The backward kernel's per-instance transmittance-cumsum MXU cost is linear
in chunk (tril matmul row = chunk*P MACs/instance) and chunk-alignment
padding shrinks with chunk (9.2% -> 4.4% at bench scale, CPU-measured), but
a 64-wide matmul only half-fills the 128x128 MXU and doubles the grid.
Answer empirically: run bench.run_bench at each chunk and print one JSON
line. Output-equivalence across chunks is covered by the CPU suite.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_chunk_sweep.py \
      [--chunks 64 128 256] [--iters 10]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--device", default=None)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)

    from bench import run_bench

    out = {}
    for c in args.chunks:
        kw = dict(n_gaussians=2_000, width=256, height=192, iters=2) \
            if args.smoke else dict(iters=args.iters)
        res = run_bench(chunk=c, **kw)
        out[f"chunk{c}"] = {"mpixels_per_s": round(res["mpixels_per_s"], 2),
                            "step_ms": round(res["step_ms"], 2),
                            "instances": res["instances"]}
        print(f"  chunk={c}: {res['mpixels_per_s']:.2f} Mpix/s "
              f"({res['step_ms']:.1f} ms)", file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
