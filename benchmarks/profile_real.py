#!/usr/bin/env python
"""Stage-level profile of the [pos-dict] production path on the real corpus.

Breaks `collect` into its parts (device wait, d2h read, native stitch,
fallback patching) to locate the real-text bottleneck (VERDICT r4 weak #2).
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache"))

import numpy as np


def main(name: str = "gpt2") -> None:
    from benchmarks.realtext import real_lines
    from blingfire_tpu import native
    from blingfire_tpu.models.loader import load_model
    from blingfire_tpu.runtime import metrics
    from blingfire_tpu.runtime.host import SpTokenizer, _batches_by_bytes

    model = load_model(f"/root/reference/ldbsrc/ldb/{name}.bin")
    tok = SpTokenizer(model, max_doc_symbols=128)
    runner = tok._unit_runner()
    t0 = time.perf_counter()
    runner.warm()
    print(f"warm: {time.perf_counter() - t0:.1f}s", flush=True)

    docs = real_lines()
    nbytes = sum(len(d) for d in docs)
    print(f"corpus: {len(docs)} docs, {nbytes/1e6:.2f} MB", flush=True)

    for trial in range(3):
        batches = _batches_by_bytes(docs, 65536)
        t_all0 = time.perf_counter()
        t_analyze = t_dispatch = t_wait = t_stitch = t_patch = 0.0
        n_rows_total = 0
        states = []
        for chunk in batches:
            t0 = time.perf_counter()
            nu = native.units_analyze(
                chunk, tok.n_doc, tok._sym2iw, runner.spm_iw,
                tok.seg.use_raw_bytes, tok.seg.no_dummy_prefix,
                tok.seg.charmap,
            )
            t_analyze += time.perf_counter() - t0
            n_rows_total += nu.n_rows
            # dispatch via the runner internals
            t0 = time.perf_counter()
            state = runner.dispatch_docs(chunk, 0)
            t_dispatch += time.perf_counter() - t0
            states.append((chunk, state))
        for chunk, state in states:
            nu, pending, row_map = state
            t0 = time.perf_counter()
            rows_parts = [np.asarray(h) for h in pending]
            t_wait += time.perf_counter() - t0
            t0 = time.perf_counter()
            rows = (rows_parts[0] if len(rows_parts) == 1
                    else np.concatenate(rows_parts, axis=0))
            from blingfire_tpu.runtime.dedup import ID_SHIFT
            ids, bounds, need = nu.stitch(
                np.ascontiguousarray(rows), ID_SHIFT, row_map=row_map
            )
            t_stitch += time.perf_counter() - t0
            t0 = time.perf_counter()
            if need.any():
                c = metrics.Counters()
                tok._patch_fallbacks(chunk, ids, bounds, need, nu.status, 0, c)
            t_patch += time.perf_counter() - t0
        total = time.perf_counter() - t_all0
        print(f"trial {trial}: total {total:.3f}s = {nbytes/total/1e6:.2f} MB/s"
              f"  (analyze {t_analyze:.3f} + dispatch {t_dispatch:.3f}"
              f" + wait/d2h {t_wait:.3f} + stitch {t_stitch:.3f}"
              f" + patch {t_patch:.3f}; rows={n_rows_total},"
              f" batches={len(batches)})", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "gpt2")
