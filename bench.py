#!/usr/bin/env python
"""Benchmark: tokenization throughput (bytes/s/chip) for the five BASELINE
configs — gpt2 byte-BPE (primary), xlnet unigram, bert WordPiece, wbd
TextToWords, syllab hyphenation.

Prints exactly one JSON line whose required fields are
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
plus per-config extras (<name>_bytes_per_s, fallback percentages, e2e rates,
compile times).  vs_baseline is against ~2 MB/s — the reference's published
single-thread SentencePiece-runtime rate (2.05M lines in ~101 s,
ldbsrc/xlnet/README.TXT:44-53; SURVEY.md §6).

Robustness + honesty:
- Each config runs in its OWN subprocess with a hard timeout: a wedged
  device tunnel (observed: a d2h transfer that never completes also wedges
  every subsequent compile in that process) can cost at most one config.
  Children stream partial results line-by-line, so even a SIGKILLed child
  contributes every number it recorded before the wedge.
- Device rates are timed dispatch -> host read of a chained scalar.  On the
  tunneled TPU backend jax.block_until_ready() can return before queued
  executions actually finish (measured: 8 chained 260 ms executions
  "blocked" in 0.9 ms, then a 4-byte d2h read took 23.8 s draining the
  backlog), so wall-clocking to block_until_ready overstates throughput by
  orders of magnitude.  Timing to read-completion of a value that
  data-depends on every chained iteration cannot lie.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache"))

BASELINE_BYTES_PER_S = 2e6
T0 = time.time()

RESULT = {
    "metric": "gpt2_byte_bpe_tokenization",
    "value": 0.0,
    "unit": "bytes/s/chip",
    "vs_baseline": 0.0,
}

LDB = "/root/reference/ldbsrc/ldb"


def log(msg: str) -> None:
    print(f"[bench +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def record(key: str, value) -> None:
    """Record one metric.  In child mode, stream it to the parent
    immediately so a later wedge/kill cannot lose it."""
    RESULT[key] = value
    if "--step" in sys.argv:
        print("RESULT-JSON: " + json.dumps({key: value}), flush=True)


# ---------------------------------------------------------------------------
# measurements (child-process side)
# ---------------------------------------------------------------------------


def measure_sp(name: str, n_sym: int = 128,
               batch: int = int(os.environ.get("BENCH_SP_BATCH", "16384")),
               iters: int = int(os.environ.get("BENCH_SP_ITERS", "4")),
               rounds: int = 2):
    """Effective device rate for one [pos-dict] model.

    The production path (runtime/dedup.py) tokenizes only the batch's
    UNIQUE word-units, repacked into dense rows, so the device-rate
    denominator is the full corpus byte count while the device walks ~40x
    fewer lanes.  Iterations are chained through a data dependency and the
    timed loop ends with a host read (see module docstring on the lying
    block_until_ready)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.textgen import corpus_lines
    from blingfire_tpu.models.loader import load_model
    from blingfire_tpu.ops import bpe as bpe_ops
    from blingfire_tpu.ops import unigram as uni_ops
    from blingfire_tpu.runtime.dedup import PACK_ROWS, _helpers, pack_units, split_units
    from blingfire_tpu.runtime.host import SpTokenizer

    model = load_model(f"{LDB}/{name}.bin")
    tok = SpTokenizer(model, max_doc_symbols=n_sym)
    runner = tok._unit_runner()
    unk = jnp.int32(0)
    derive_spm, *_pack = _helpers()

    def dispatch(xj, lj):
        if tok.is_bpe:
            return bpe_ops.bpe_segment(
                tok.tables, xj, derive_spm(xj, runner.spm_iw), lj, unk, tok.a_max
            )
        return uni_ops.unigram_segment(tok.tables, xj, lj, unk)

    @jax.jit
    def salt_input(xv, counts):
        s = jnp.where(jnp.sum(counts) == jnp.iinfo(jnp.int32).min, 1, 0)
        return xv + s

    # -- prep + dedup on host ----------------------------------------------
    docs = corpus_lines(batch, seed=2)
    nbytes = sum(len(d) for d in docs)
    t0 = time.perf_counter()
    x, spm, lengths, _o, pre_fb = tok._prep_batch(docs)
    ub = split_units(np.asarray(x), np.asarray(spm), np.asarray(lengths))
    px, plen, _ur, _uo = pack_units(ub, tok.n_doc)
    host_s = time.perf_counter() - t0
    n_disp = (len(px) + PACK_ROWS - 1) // PACK_ROWS
    record(f"{name}_dedup_rows", int(len(px)))
    log(f"{name}: host prep+dedup {host_s * 1e3:.0f} ms — {len(ub.u_len)} "
        f"unique units, {len(px)} packed rows, {n_disp} dispatches")

    # device inputs: every packed-row chunk
    chunks = []
    for lo in range(0, len(px), PACK_ROWS):
        bx = np.full((PACK_ROWS, tok.n_doc), -1, np.int32)
        blen = np.zeros(PACK_ROWS, np.int32)
        n = min(PACK_ROWS, len(px) - lo)
        bx[:n] = px[lo : lo + n]
        blen[:n] = plen[lo : lo + n]
        chunks.append((jnp.asarray(bx), jnp.asarray(blen)))

    # -- warm/compile -------------------------------------------------------
    t0 = time.perf_counter()
    r = dispatch(*chunks[0])
    _ = int(np.asarray(r[3][0]))  # read = executed, not just queued
    compile_s = time.perf_counter() - t0
    log(f"{name}: compile+first {compile_s:.1f}s  ({nbytes} B/batch)")
    record(f"{name}_compile_s", round(compile_s, 1))

    best = 0.0
    for rd in range(rounds):
        salt = chunks[0][0][:1, :1]  # (1,1) carry chaining every dispatch
        t0 = time.perf_counter()
        for _ in range(iters):
            for xj, lj in chunks:
                r = dispatch(xj + salt * 0, lj)
                salt = salt_input(salt, r[3])
        chk = int(np.asarray(salt[0, 0]))  # forces the chain to finish
        dt = (time.perf_counter() - t0) / iters
        bps = nbytes / dt
        best = max(best, bps)
        record(f"{name}_bytes_per_s", round(best, 1))
        log(f"{name}: round {rd}: {bps / 1e6:.2f} MB/s device "
            f"({dt * 1e3:.2f} ms/batch, chk={chk})")

    # prep-side fallback (doc-level device fallback is counted in the e2e
    # step's Counters, where it has per-doc resolution)
    record(f"{name}_prep_fallback_pct",
           round(float(np.asarray(pre_fb).mean() * 100.0), 3))
    return tok


def measure_sp_e2e(name: str) -> None:
    """End-to-end rate: host prep + device + d2h collect + oracle fallbacks."""
    from benchmarks.textgen import corpus_lines
    from blingfire_tpu.models.loader import load_model
    from blingfire_tpu.runtime import metrics
    from blingfire_tpu.runtime.host import SpTokenizer

    model = load_model(f"{LDB}/{name}.bin")
    tok = SpTokenizer(model, max_doc_symbols=128)
    warm = corpus_lines(64, seed=1)
    tok.encode_corpus(warm, batch_docs=64)
    log(f"{name}: e2e warm done")

    c = metrics.Counters()
    e2e_docs = corpus_lines(int(os.environ.get("BENCH_E2E_DOCS", "32768")), seed=3)
    e2e_bytes = sum(len(d) for d in e2e_docs)
    t0 = time.perf_counter()
    tok.encode_corpus(e2e_docs, batch_docs=16384, counters=c)
    dt = time.perf_counter() - t0
    record(f"{name}_e2e_bytes_per_s", round(e2e_bytes / dt, 1))
    record(f"{name}_fallback_pct",
           round(100.0 * c.fallback_docs / max(c.docs_in, 1), 3))
    log(f"{name}: e2e {e2e_bytes / dt / 1e6:.2f} MB/s ({c.fallback_docs} fallbacks)")


def measure_wordpiece(batch: int = int(os.environ.get("BENCH_LEX_BATCH", "4096"))):
    from benchmarks.textgen import corpus_lines
    from blingfire_tpu.models.loader import load_model
    from blingfire_tpu.runtime.lexer_host import WordPieceTpu

    model = load_model(f"{LDB}/bert_base_cased_tok.bin")
    wp = WordPieceTpu(model)
    wp.text_to_ids_batch(corpus_lines(256, seed=4))  # compile + warm
    log("bert: warm done")
    docs = corpus_lines(batch, seed=5)
    nbytes = sum(len(d) for d in docs)
    t0 = time.perf_counter()
    wp.text_to_ids_batch(docs)  # returns host lists: read-complete by design
    dt = time.perf_counter() - t0
    record("bert_bytes_per_s", round(nbytes / dt, 1))
    log(f"bert: {nbytes / dt / 1e6:.2f} MB/s")


def measure_words(batch: int = int(os.environ.get("BENCH_LEX_BATCH", "4096"))):
    from benchmarks.textgen import corpus_lines
    from blingfire_tpu.models.loader import load_model
    from blingfire_tpu.runtime.lexer_host import WordsTpu

    model = load_model(f"{LDB}/wbd.bin")
    w = WordsTpu(model)
    w.text_to_words_batch(corpus_lines(256, seed=6))
    log("wbd: warm done")
    docs = corpus_lines(batch, seed=7)
    nbytes = sum(len(d) for d in docs)
    t0 = time.perf_counter()
    w.text_to_words_batch(docs)
    dt = time.perf_counter() - t0
    record("wbd_bytes_per_s", round(nbytes / dt, 1))
    log(f"wbd: {nbytes / dt / 1e6:.2f} MB/s")


def measure_hyph(n_words: int = int(os.environ.get("BENCH_HYPH_WORDS", "20000"))):
    from benchmarks.textgen import corpus_lines
    from blingfire_tpu.models.loader import load_model
    from blingfire_tpu.runtime.hyph import HyphTpu

    model = load_model(f"{LDB}/syllab.bin")
    hy = HyphTpu(model.w2h)
    words: list[list[int]] = []
    for line in corpus_lines(4000, seed=8):
        for w in line.decode("utf-8", "ignore").split():
            w = w.strip(".,!?\"'")
            if 2 <= len(w) <= 28 and w.isalpha():
                words.append([ord(c) for c in w])
            if len(words) >= n_words:
                break
        if len(words) >= n_words:
            break
    hy.process_batch(words[:64])  # warm
    log("syllab: warm done")
    nbytes = sum(len(w) for w in words)
    t0 = time.perf_counter()
    hy.process_batch(words)
    dt = time.perf_counter() - t0
    record("syllab_bytes_per_s", round(nbytes / dt, 1))
    log(f"syllab: {nbytes / dt / 1e6:.2f} MB/s over {len(words)} words")


def measure_native():
    """Host-native C++ runtime rates (the framework's production path for
    the C ABI surface) — no device involved, so these are wedge-proof."""
    import ctypes

    from benchmarks.textgen import corpus_lines
    from blingfire_tpu import native

    rt = native.get_runtime()
    if rt is None:
        log("native runtime unavailable")
        return
    rt.LoadModel.restype = ctypes.c_void_p
    rt.LoadModel.argtypes = [ctypes.c_char_p]
    rt.TextToIds.restype = ctypes.c_int
    rt.TextToIds.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
                             ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                             ctypes.c_int]
    docs = corpus_lines(int(os.environ.get("BENCH_NATIVE_DOCS", "8192")), seed=4)
    nbytes = sum(len(d) for d in docs)
    arr = (ctypes.c_int32 * 1024)()
    for mname in ("gpt2", "xlnet", "bert_base_cased_tok"):
        h = rt.LoadModel(f"{LDB}/{mname}.bin".encode())
        t0 = time.perf_counter()
        for d in docs:
            rt.TextToIds(h, d, len(d), arr, 1024, 0)
        dt = time.perf_counter() - t0
        key = {"bert_base_cased_tok": "bert"}.get(mname, mname)
        record(f"{key}_native_bytes_per_s", round(nbytes / dt, 1))
        log(f"{key}: native TextToIds {nbytes / dt / 1e6:.2f} MB/s")
    # words/sentences via the default models
    wbd = rt.LoadModel(f"{LDB}/wbd.bin".encode())
    sbd = rt.LoadModel(f"{LDB}/sbd.bin".encode())
    rt.SetDefaultModels.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    rt.SetDefaultModels(wbd, sbd)
    buf = ctypes.create_string_buffer(1 << 16)
    for fname, key in (("TextToWords", "wbd"), ("TextToSentences", "sbd")):
        fn = getattr(rt, fname)
        t0 = time.perf_counter()
        for d in docs:
            fn(d, len(d), buf, 1 << 16)
        dt = time.perf_counter() - t0
        record(f"{key}_native_bytes_per_s", round(nbytes / dt, 1))
        log(f"{key}: native {fname} {nbytes / dt / 1e6:.2f} MB/s")


STEPS = {
    "native": measure_native,
    "gpt2": lambda: measure_sp("gpt2"),
    "xlnet": lambda: measure_sp("xlnet"),
    "bert": measure_wordpiece,
    "wbd": measure_words,
    "syllab": measure_hyph,
    "gpt2_e2e": lambda: measure_sp_e2e("gpt2"),
    "xlnet_e2e": lambda: measure_sp_e2e("xlnet"),
}

# per-step wall budgets (s): compile can be slow cold; the disk compilation
# cache makes warm reruns much cheaper
STEP_TIMEOUT = {
    "native": 240.0,
    "gpt2": 420.0,
    "xlnet": 420.0,
    "bert": 300.0,
    "wbd": 300.0,
    "syllab": 240.0,
    "gpt2_e2e": 300.0,
    "xlnet_e2e": 300.0,
}


def child_main(step: str) -> None:
    import jax

    log(f"[{step}] backend: {jax.default_backend()}  devices: {jax.devices()}")
    STEPS[step]()


def parent_main() -> None:
    order = os.environ.get(
        "BENCH_STEPS", "native,gpt2,xlnet,gpt2_e2e,xlnet_e2e,bert,wbd,syllab"
    ).split(",")
    for step in order:
        step = step.strip()
        if step not in STEPS:
            continue
        budget = float(os.environ.get("BENCH_STEP_TIMEOUT_S", "0")) or STEP_TIMEOUT[step]
        log(f"=== {step} (budget {budget:.0f}s) ===")
        t0 = time.time()
        try:
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--step", step],
                stdout=subprocess.PIPE,
                stderr=sys.stderr,
                text=True,
                cwd=ROOT,
            )
            try:
                out, _ = proc.communicate(timeout=budget)
            except subprocess.TimeoutExpired:
                proc.kill()
                out, _ = proc.communicate(timeout=30)
                RESULT[f"{step}_timeout"] = True
                log(f"{step}: TIMED OUT after {budget:.0f}s (partial results kept)")
            for line in (out or "").splitlines():
                if line.startswith("RESULT-JSON: "):
                    RESULT.update(json.loads(line[len("RESULT-JSON: "):]))
            if proc.returncode not in (0, None) and f"{step}_timeout" not in RESULT:
                RESULT[f"error_{step}"] = f"exit={proc.returncode}"
        except Exception:
            log(f"{step} FAILED:\n{traceback.format_exc()}")
            RESULT[f"error_{step}"] = traceback.format_exc(limit=1).strip()[-200:]
        log(f"{step}: done in {time.time() - t0:.0f}s")

    bps = float(RESULT.get("gpt2_bytes_per_s", 0.0))
    RESULT["value"] = round(bps, 1)
    RESULT["vs_baseline"] = round(bps / BASELINE_BYTES_PER_S, 2)
    print(json.dumps(RESULT), flush=True)


if __name__ == "__main__":
    if "--step" in sys.argv:
        try:
            child_main(sys.argv[sys.argv.index("--step") + 1])
            sys.exit(0)
        except Exception:
            log(traceback.format_exc())
            sys.exit(1)
    parent_main()
