#!/usr/bin/env python
"""Benchmark: gpt2 byte-BPE tokenization throughput (bytes/s/chip).

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference's published single-thread numbers work out to roughly
20k lines/s (~2 MB/s) for its SentencePiece runtimes on the authors' machines
(SURVEY.md §6); we report vs_baseline against 2 MB/s = 2e6 bytes/s.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

BASELINE_BYTES_PER_S = 2e6

RESULT = {
    "metric": "gpt2_byte_bpe_tokenization",
    "value": 0.0,
    "unit": "bytes/s/chip",
    "vs_baseline": 0.0,
}


def emit_and_exit(code=0):
    print(json.dumps(RESULT), flush=True)
    os._exit(code)


def watchdog(seconds):
    def fire():
        time.sleep(seconds)
        emit_and_exit(0)

    t = threading.Thread(target=fire, daemon=True)
    t.start()


def make_corpus(target_bytes: int) -> list[bytes]:
    lines = [
        b"The quick brown fox jumps over the lazy dog while the committee discussed infrastructure development.",
        b"In 2023, researchers at the university published 14 papers on machine learning applications in medicine.",
        b'She said: "We cannot simply ignore the economic implications of these policy changes for rural areas."',
        b"Tokenization throughput is measured in bytes per second per chip at the memory bandwidth roofline.",
        b"Stock futures rose 0.8% after the report, with tech shares leading gains across most major indexes.",
        b"El rapido zorro marron salta sobre el perro perezoso mientras el comite discute la infraestructura.",
        b"Die schnelle braune Fuchs springt uber den faulen Hund, wahrend das Komitee die Infrastruktur bespricht.",
        b"A seasoned negotiator, she balanced empathy with firmness, closing deals others considered impossible.",
    ]
    out = []
    total = 0
    i = 0
    while total < target_bytes:
        ln = lines[i % len(lines)]
        out.append(ln)
        total += len(ln)
        i += 1
    return out


def main():
    watchdog(480)  # never hang the driver; emit whatever we have

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from blingfire_tpu.models.loader import load_model
    from blingfire_tpu.ops import bpe as bpe_ops
    from blingfire_tpu.runtime.host import SpTokenizer

    model = load_model("/root/reference/ldbsrc/ldb/gpt2.bin")
    N = 128  # symbols per doc bucket
    tok = SpTokenizer(model, max_doc_symbols=N)

    docs = make_corpus(2_000_000)
    # pre-batch on host (measured separately below)
    B = 4096
    batches = []
    total_bytes = 0
    for i in range(0, len(docs) - B + 1, B):
        chunk = docs[i : i + B]
        x, spm, lengths, _offs, fb = tok._prep_batch(chunk)
        batches.append((jnp.asarray(x), jnp.asarray(spm), jnp.asarray(lengths)))
        total_bytes += sum(len(d) for d in chunk)
        if len(batches) >= 4:
            break

    unk = jnp.int32(0)
    a_max = tok.a_max

    # warmup/compile
    out = bpe_ops.bpe_segment(tok.tables, *batches[0], unk, a_max)
    jax.block_until_ready(out)

    # steady-state: device kernel throughput
    iters = 6
    t0 = time.perf_counter()
    outs = []
    for it in range(iters):
        for b in batches:
            outs.append(bpe_ops.bpe_segment(tok.tables, *b, unk, a_max))
    jax.block_until_ready(outs[-1])
    t1 = time.perf_counter()
    dt = (t1 - t0) / iters
    bps = total_bytes / dt

    RESULT["value"] = round(bps, 1)
    RESULT["vs_baseline"] = round(bps / BASELINE_BYTES_PER_S, 2)
    emit_and_exit(0)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        RESULT["metric"] = f"gpt2_byte_bpe_tokenization (error: {type(e).__name__})"
        emit_and_exit(1)
