#!/usr/bin/env python
"""Quick e2e measurement of a [pos-dict] config on the (32 MB) real corpus,
with cache/dispatch stats — the round-5 development loop harness."""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache"))


def main(name: str = "gpt2", trials: int = 2) -> None:
    from benchmarks.realtext import real_lines
    from blingfire_tpu.models.loader import load_model
    from blingfire_tpu.runtime import metrics
    from blingfire_tpu.runtime.host import SpTokenizer

    tok = SpTokenizer(load_model(f"/root/reference/ldbsrc/ldb/{name}.bin"),
                      max_doc_symbols=128)
    t0 = time.perf_counter()
    tok._unit_runner().warm()
    print(f"warm: {time.perf_counter() - t0:.1f}s", flush=True)
    docs = real_lines()
    nbytes = sum(len(d) for d in docs)
    print(f"corpus: {len(docs)} docs, {nbytes/1e6:.2f} MB", flush=True)
    for t in range(trials):
        c = metrics.Counters()
        t0 = time.perf_counter()
        ids, bounds = tok.encode_corpus_flat(docs, batch_docs=65536, counters=c)
        dt = time.perf_counter() - t0
        print(f"trial {t}: {dt:.2f}s = {nbytes/dt/1e6:.2f} MB/s  "
              f"tokens={len(ids)} fb={c.fallback_docs} inv={c.invalid_docs} "
              f"units={c.cache_units} rows={c.dispatched_rows} "
              f"stages={{{', '.join(f'{k}: {v:.2f}' for k, v in c.stage_seconds.items())}}}",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "gpt2",
         int(sys.argv[2]) if len(sys.argv) > 2 else 2)
