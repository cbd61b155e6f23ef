#!/usr/bin/env python
"""Data-parallel scaling efficiency: tokenization throughput 1 -> N devices.

On CPU (JAX_PLATFORMS=cpu with --xla_force_host_platform_device_count=N) this
exercises the sharded program end to end; on a real TPU slice the same code
measures ICI-backed scaling.  Target: >=90% efficiency (BASELINE.md).

Usage:  python benchmarks/scaling.py [--devices 8] [--batch 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0, help="0 = all available")
    ap.add_argument("--batch", type=int, default=2048, help="docs per device")
    ap.add_argument("--cpu", action="store_true", help="force CPU virtual mesh")
    args = ap.parse_args()

    if args.cpu or not os.environ.get("JAX_PLATFORMS"):
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from blingfire_tpu.models.loader import load_model
    from blingfire_tpu.parallel.mesh import ShardedBpeRunner, data_parallel_mesh
    from blingfire_tpu.runtime.host import SpTokenizer

    n_all = len(jax.devices())
    n_max = args.devices or n_all

    model = load_model("/root/reference/ldbsrc/ldb/gpt2.bin")
    tok = SpTokenizer(model, max_doc_symbols=128)

    line = b"The quick brown fox jumps over the lazy dog while the committee discussed it."

    results = {}
    n = 1
    while n <= n_max:
        docs = [line] * (args.batch * n)
        runner = ShardedBpeRunner(tok, mesh=data_parallel_mesh(n))
        # warmup/compile
        runner.run(docs[: runner.n_dp * 8])
        t0 = time.perf_counter()
        ids, counts, stats = runner.run(docs)
        jax.block_until_ready(ids)
        dt = time.perf_counter() - t0
        total_bytes = len(line) * len(docs)
        results[n] = total_bytes / dt
        print(f"devices={n:2d}  {results[n]/1e6:8.2f} MB/s  tokens={stats.total_tokens}")
        n *= 2

    base = results[1]
    out = {
        "throughput_mb_s": {k: round(v / 1e6, 2) for k, v in results.items()},
        "scaling_efficiency": {
            k: round(v / (base * k), 3) for k, v in results.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
