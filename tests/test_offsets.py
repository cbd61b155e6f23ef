"""Offsets-returning API variants vs the reference."""

from __future__ import annotations

import pytest

import reference_lib as ref
from corpus import full_corpus

from blingfire_tpu.models.loader import load_model
from blingfire_tpu.runtime.lexer import LexerOracleApi

CORPUS = [l for l in full_corpus(n_random=40) if l]


def test_words_offsets():
    api = LexerOracleApi(load_model("/root/reference/ldbsrc/ldb/wbd.bin"))
    h = ref.load_model("wbd.bin")
    for line in CORPUS:
        got = api.text_to_words_with_offsets(line.encode())
        want = ref.text_to_words_with_offsets(line.encode(), h)
        assert got is not None
        assert got[0] == want[0], line
        assert got[1] == want[1], line
        assert got[2] == want[2], line


def test_sentences_offsets():
    api = LexerOracleApi(load_model("/root/reference/ldbsrc/ldb/sbd.bin"))
    h = ref.load_model("sbd.bin")
    for line in CORPUS:
        got = api.text_to_sentences_with_offsets(line.encode())
        want = ref.text_to_sentences_with_offsets(line.encode(), h)
        assert got is not None
        assert got[0] == want[0], line
        assert got[1] == want[1], line
        assert got[2] == want[2], line


def test_wordpiece_offsets():
    api = LexerOracleApi(
        load_model("/root/reference/ldbsrc/ldb/bert_base_cased_tok.bin")
    )
    h = ref.load_model("bert_base_cased_tok.bin")
    for line in CORPUS:
        ids, starts, ends = api.text_to_ids_with_offsets(
            line.encode(), max_len=4096, unk_id=100
        )
        rid, rs, re_ = ref.text_to_ids_with_offsets(
            h, line.encode(), max_len=4096, unk_id=100
        )
        assert ids == rid.tolist(), line
        assert starts == rs.tolist(), line
        assert ends == re_.tolist(), line
