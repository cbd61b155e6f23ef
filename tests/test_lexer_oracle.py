"""Lexer oracle parity: TextToWords / TextToSentences / WordPiece ids."""

from __future__ import annotations

import pytest

import reference_lib as ref
from corpus import full_corpus

from blingfire_tpu.models.loader import load_model
from blingfire_tpu.runtime.lexer import LexerOracleApi

CORPUS = full_corpus(n_random=60)

SENTS = [
    "This is one sentence. And here is another! Is this the third? Yes.",
    "Dr. Smith went to Washington D.C. on Jan. 3rd. He arrived at 3 p.m. It rained.",
    "One line.\nAnother line.\n\nA paragraph?  Sure thing.",
    "No trailing punctuation at all",
    "Mr. and Mrs. Jones met Prof. Lee at 5 p.m. sharp. They talked.",
]


@pytest.fixture(scope="module")
def wbd_api():
    return LexerOracleApi(load_model("/root/reference/ldbsrc/ldb/wbd.bin"))


@pytest.fixture(scope="module")
def sbd_api():
    return LexerOracleApi(load_model("/root/reference/ldbsrc/ldb/sbd.bin"))


def test_text_to_words(wbd_api):
    h = ref.load_model("wbd.bin")
    for line in CORPUS:
        got = wbd_api.text_to_words(line.encode())
        want = ref.text_to_words(line.encode(), handle=h)
        assert got == want, line


def test_text_to_words_matches_builtin_default(wbd_api):
    # ldb/wbd.bin must behave like the compiled-in default model
    for line in CORPUS[:40]:
        got = wbd_api.text_to_words(line.encode())
        want = ref.text_to_words(line.encode(), handle=None)
        assert got == want, line


def test_text_to_sentences(sbd_api):
    h = ref.load_model("sbd.bin")
    for line in CORPUS + SENTS:
        got = sbd_api.text_to_sentences(line.encode())
        want = ref.text_to_sentences(line.encode(), handle=h)
        assert got == want, line


@pytest.mark.parametrize(
    "name,unk", [("bert_base_cased_tok.bin", 100), ("bert_chinese.bin", 100)]
)
def test_wordpiece_ids(name, unk):
    api = LexerOracleApi(load_model(f"/root/reference/ldbsrc/ldb/{name}"))
    h = ref.load_model(name)
    for line in CORPUS:
        got = api.text_to_ids(line.encode(), max_len=4096, unk_id=unk)
        want = ref.text_to_ids(h, line.encode(), max_len=4096, unk_id=unk).tolist()
        assert got == want, line
