"""Long-document device chunking: multi-KB docs must take the device path
(whitespace-safe windows, VERDICT r2 #5 / SURVEY §5) and match the reference
byte-for-byte (blingfiretokdll.cpp:1349-1534 processes the whole string)."""

from __future__ import annotations

import numpy as np
import pytest

import reference_lib as ref
from corpus import full_corpus

from blingfire_tpu.models.loader import load_model
from blingfire_tpu.runtime import metrics
from blingfire_tpu.runtime.host import SpTokenizer

LDB = "/root/reference/ldbsrc/ldb"


def _chunkable_docs() -> list[bytes]:
    """Long docs whose every word fits the 128-symbol window."""
    words = (
        "the committee discussed infrastructure development while researchers "
        "published papers on machine learning applications in medicine and "
        "das Komitee bespricht die Infrastruktur naïve café résumé 3.14159 "
        "stock futures rose 0.8% after the report"
    ).split()
    docs = [
        (" ".join(words * 60))[:10240].encode(),  # ~10 KB
        ("word " * 3000).encode(),  # ~15 KB uniform
        ("Supercalifragilistic " * 400).encode(),
        ("你好 世界 " * 800).encode(),
    ]
    return docs


def _mixed_docs() -> list[bytes]:
    lines = [l for l in full_corpus(n_random=0) if l.strip()]
    joined = " ".join(lines)
    return [
        (joined * 3)[:10240].encode("utf-8", "ignore"),  # edge-case soup
        b"x" * 5000,  # one giant word: host oracle, still correct
    ]


@pytest.mark.parametrize("name", ["gpt2.bin", "xlnet.bin"])
def test_long_docs_device_chunking(name):
    tok = SpTokenizer(load_model(f"{LDB}/{name}"), max_doc_symbols=128)
    assert tok._chunk_safe, f"{name} expected chunk-safe"
    h = ref.load_model(name)
    docs = _chunkable_docs()

    c = metrics.Counters()
    got = tok.encode_corpus(docs, batch_docs=8, counters=c)
    for i, d in enumerate(docs):
        want = ref.text_to_ids(h, d, max_len=65536, unk_id=0).tolist()
        assert got[i] == want, (name, i, len(d))
    # every doc must stay on a device path (round 5: the unit pipeline takes
    # docs of ANY length directly — only a single unit wider than the device
    # row falls back — so no chunked pass and no oracle should be needed)
    assert c.fallback_docs == 0, c.as_dict()


@pytest.mark.parametrize("name", ["gpt2.bin", "xlnet.bin"])
def test_long_docs_mixed_parity(name):
    """Edge-case soup + giant single words: parity regardless of which path
    (chunked device vs host oracle) serves each doc."""
    tok = SpTokenizer(load_model(f"{LDB}/{name}"), max_doc_symbols=128)
    h = ref.load_model(name)
    docs = _mixed_docs()
    got = tok.encode_corpus(docs, batch_docs=8)
    for i, d in enumerate(docs):
        want = ref.text_to_ids(h, d, max_len=65536, unk_id=0).tolist()
        assert got[i] == want, (name, i, len(d))


def test_long_docs_encode_batch():
    tok = SpTokenizer(load_model(f"{LDB}/gpt2.bin"), max_doc_symbols=128)
    h = ref.load_model("gpt2.bin")
    docs = _chunkable_docs()[:3] + [b"short one"]
    got = tok.encode_batch(docs)
    for i, d in enumerate(docs):
        want = ref.text_to_ids(h, d, max_len=65536, unk_id=0).tolist()
        assert got[i] == want, (i, len(d))
