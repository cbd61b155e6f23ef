"""Cross-batch unit cache (native/prep.cpp::BtlUnitCache): cumulative dedup
must be invisible in the results — batches sharing a cache produce exactly
the ids of independent batches — while later batches dispatch only unseen
units (VERDICT r4 #1b)."""

from __future__ import annotations

import numpy as np
import pytest

import reference_lib as ref
from corpus import full_corpus

from blingfire_tpu import native
from blingfire_tpu.models.loader import load_model
from blingfire_tpu.runtime import metrics
from blingfire_tpu.runtime.host import SpTokenizer

LDB = "/root/reference/ldbsrc/ldb"

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _docs() -> list[bytes]:
    lines = [ln.encode("utf-8") if isinstance(ln, str) else ln
             for ln in full_corpus(n_random=40)]
    return [ln for ln in lines if ln.strip()]


@pytest.mark.parametrize("name", ["gpt2.bin", "xlnet.bin"])
def test_cache_parity_across_batches(name):
    tok = SpTokenizer(load_model(f"{LDB}/{name}"), max_doc_symbols=128)
    if not tok._native_units_ok():
        pytest.skip("unit path unavailable for this model")
    runner = tok._unit_runner()
    docs = _docs()
    # overlapping batches: batch 2 repeats half of batch 1's lines
    b1 = docs[: len(docs) // 2]
    b2 = docs[len(docs) // 3 :]

    cache = native.UnitCache()
    r1 = runner.collect_docs(runner.dispatch_docs(b1, 0, cache=cache))
    st2 = runner.dispatch_docs(b2, 0, cache=cache)
    nu2 = st2[0]
    r2 = runner.collect_docs(st2)
    stats = cache.stats()
    assert stats["units"] >= stats["resolved"] > 0

    # cache-off singles must agree doc by doc
    for batch, (ids, bounds, need, _status) in ((b1, r1), (b2, r2)):
        plain = runner.encode_docs(batch, 0)
        pids, pbounds, pneed, _ = plain
        assert np.array_equal(need, pneed)
        assert np.array_equal(np.asarray(ids), np.asarray(pids))
        assert np.array_equal(np.asarray(bounds), np.asarray(pbounds))

    # batch 2 must have skipped every unit batch 1 resolved
    c2 = native.units_analyze(
        b2, tok.n_doc, tok._sym2iw, runner.spm_iw,
        tok.seg.use_raw_bytes, tok.seg.no_dummy_prefix, tok.seg.charmap,
    )
    assert nu2.n_local < c2.n_units  # strictly fewer than a cold analyze


@pytest.mark.parametrize("name", ["gpt2.bin", "xlnet.bin", "roberta.bin"])
def test_corpus_flat_cached_matches_reference(name):
    tok = SpTokenizer(load_model(f"{LDB}/{name}"), max_doc_symbols=128)
    if not tok._native_units_ok():
        pytest.skip("unit path unavailable for this model")
    h = ref.load_model(name)
    docs = _docs()
    c = metrics.Counters()
    # tiny batches force many cache-sharing dispatches through the pipeline
    ids, bounds = tok.encode_corpus_flat(docs, batch_docs=16, counters=c)
    assert c.cache_units > 0
    for i, d in enumerate(docs):
        want = ref.text_to_ids(h, d, max_len=65536, unk_id=0).tolist()
        got = ids[bounds[i] : bounds[i + 1]].tolist()
        assert got == want, (name, i, d[:80])


def test_cache_long_docs_unit_path():
    """Docs far wider than the device row stay on the unit path (round 5:
    only a single unit > n_sym falls back)."""
    tok = SpTokenizer(load_model(f"{LDB}/gpt2.bin"), max_doc_symbols=128)
    if not tok._native_units_ok():
        pytest.skip("unit path unavailable")
    h = ref.load_model("gpt2.bin")
    docs = [
        ("the quick brown fox " * 400).encode(),  # ~8 KB
        ("naïve café résumé " * 300).encode(),
        b"x" * 600,  # one giant unit -> fallback
        b"tail doc",
    ]
    c = metrics.Counters()
    ids, bounds = tok.encode_corpus_flat(docs, counters=c)
    for i, d in enumerate(docs):
        want = ref.text_to_ids(h, d, max_len=65536, unk_id=0).tolist()
        assert ids[bounds[i] : bounds[i + 1]].tolist() == want, i
    assert c.fallback_docs == 1  # only the giant-unit doc


@pytest.mark.parametrize("n_docs", [63, 64, 65, 130])
def test_threaded_analyze_status_edges(n_docs):
    """Doc counts straddling the threading threshold (64), with invalid
    UTF-8 and giant-unit docs mixed in: statuses and ids must be identical
    to the reference regardless of the thread split."""
    tok = SpTokenizer(load_model(f"{LDB}/xlnet.bin"), max_doc_symbols=128)
    if not tok._native_units_ok():
        pytest.skip("unit path unavailable")
    h = ref.load_model("xlnet.bin")
    base = [b"hello world", "naïve café".encode(), b"a b c d e",
            b"\xff\xfe bad", b"y" * 400, b"short", b"the end."]
    docs = [base[i % len(base)] + b" %d" % i for i in range(n_docs)]
    docs[n_docs // 2] = b"\x80broken"      # invalid mid-corpus
    docs[n_docs - 1] = b"z" * 600           # giant unit at a boundary
    ids, bounds = tok.encode_corpus_flat(docs, batch_docs=32)
    for i, d in enumerate(docs):
        want = ref.text_to_ids(h, d, max_len=65536, unk_id=0).tolist()
        assert ids[bounds[i] : bounds[i + 1]].tolist() == want, (n_docs, i)


def test_big_bucket_mixed_chunks():
    """Force the 2048-row bucket live and drive >2048 unique units through
    one batch: mixed big/small chunks must map rows correctly through the
    grouped transfers (round-5 progressive-bucket dispatch)."""
    tok = SpTokenizer(load_model(f"{LDB}/gpt2.bin"), max_doc_symbols=128)
    if not tok._native_units_ok():
        pytest.skip("unit path unavailable")
    runner = tok._unit_runner()
    runner.big_ready = True  # big programs compile on this CPU run
    h = ref.load_model("gpt2.bin")
    # 5000 distinct ~50-symbol words pack ~2 units/row -> >2048 rows, so
    # the batch dispatches a 2048-row chunk AND 512-row tail chunks
    docs = [b"w%050d xy%d" % (i, i) for i in range(5000)]
    from blingfire_tpu import native

    nu = native.units_analyze(
        docs, tok.n_doc, tok._sym2iw, runner.spm_iw,
        tok.seg.use_raw_bytes, tok.seg.no_dummy_prefix, tok.seg.charmap,
    )
    assert nu.n_rows > 2048, nu.n_rows  # the premise of this test
    ids, bounds = tok.encode_corpus_flat(docs, batch_docs=8192)
    for i in (0, 1, 1500, 2047, 2048, 4999):
        want = ref.text_to_ids(h, docs[i], max_len=65536, unk_id=0).tolist()
        assert ids[bounds[i] : bounds[i + 1]].tolist() == want, i
    # and a doc-by-doc sweep on a stride
    for i in range(0, 5000, 97):
        want = ref.text_to_ids(h, docs[i], max_len=65536, unk_id=0).tolist()
        assert ids[bounds[i] : bounds[i + 1]].tolist() == want, i
