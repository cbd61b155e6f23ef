"""WordPiece hybrid path (runtime/wp_hybrid.py): native level-0 + device
sub-token pass over deduped words, parity-locked to the reference .so."""

from __future__ import annotations

import numpy as np
import pytest

import reference_lib as ref
from blingfire_tpu.models.loader import load_model
from blingfire_tpu.runtime.wp_hybrid import WordPieceHybrid

LDB = "/root/reference/ldbsrc/ldb"

DOCS = [
    b"Hello world, this is a TEST.",
    b"unaffable preprocessing tokenization",
    "naïve café résumé 中文没有空格".encode(),
    b"",
    b" ",
    b"x" * 300,  # one oversize word -> native fallback
    b"supercalifragilisticexpialidociousbutlonger" * 2,  # 86-char word
    b"the the the quick brown fox jumped over the lazy dog",
    b"e.g. Mr. Smith's co-worker (test@example.com) said: 50% off!",
    bytes([0xFF, 0xFE]) + b" broken utf8",
    "İstanbul ı MiXeD CaSe".encode(),
    b"a b c d e f g h i j k l m n o p",
]


@pytest.fixture(scope="module")
def wp():
    model = load_model(f"{LDB}/bert_base_cased_tok.bin")
    h = WordPieceHybrid(model)
    if not h.available():
        pytest.skip("hybrid unavailable (no native runtime)")
    return h


@pytest.fixture(scope="module")
def refh():
    return ref.load_model("bert_base_cased_tok.bin")


def test_pack_safety_precheck(wp):
    assert wp.available()


def test_flat_parity_vs_reference(wp, refh):
    from benchmarks.textgen import corpus_lines

    docs = DOCS * 2 + corpus_lines(300, seed=21)
    ids, bounds = wp.encode_corpus_flat(docs, unk_id=0, batch_docs=77)
    assert len(bounds) == len(docs) + 1
    for i, d in enumerate(docs):
        db = d if isinstance(d, bytes) else d.encode()
        got = ids[bounds[i] : bounds[i + 1]].tolist()
        exp = ref.text_to_ids(refh, db, unk_id=0).tolist()
        assert got == exp, (i, db[:50], got[:10], exp[:10])


def test_unk_id_passthrough(wp, refh):
    docs = [b"zzzqqqxxyzzy \xf0\x9f\x8e\x89 normal words"]
    ids, bounds = wp.encode_corpus_flat(docs, unk_id=100)
    exp = ref.text_to_ids(refh, docs[0], unk_id=100).tolist()
    assert ids[: bounds[1]].tolist() == exp


def test_api_routes_to_hybrid():
    from blingfire_tpu import api

    h = api.load_model(f"{LDB}/bert_base_cased_tok.bin")
    got = h.text_to_ids_batch([b"Hello world", b"unaffable"])
    assert isinstance(h._wp_dev, WordPieceHybrid)
    rh = ref.load_model("bert_base_cased_tok.bin")
    for d, g in zip([b"Hello world", b"unaffable"], got):
        assert g == ref.text_to_ids(rh, d, unk_id=0).tolist()
