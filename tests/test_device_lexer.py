"""Device lexer (wbd/sbd/WordPiece) vs scalar oracle."""

from __future__ import annotations

import pytest

from corpus import full_corpus

from blingfire_tpu.models.loader import load_model
from blingfire_tpu.runtime.lexer import LexerOracleApi
from blingfire_tpu.runtime.lexer_host import WordsTpu, WordPieceTpu

CORPUS = full_corpus(n_random=60)


@pytest.fixture(scope="module")
def wbd():
    return load_model("/root/reference/ldbsrc/ldb/wbd.bin")


@pytest.fixture(scope="module")
def sbd():
    return load_model("/root/reference/ldbsrc/ldb/sbd.bin")


def test_words_device(wbd):
    api = LexerOracleApi(wbd)
    dev = WordsTpu(wbd)
    got = dev.text_to_words_batch(CORPUS)
    for line, g in zip(CORPUS, got):
        assert g == api.text_to_words(line.encode()), line


def test_sentences_device(sbd):
    api = LexerOracleApi(sbd)
    dev = WordsTpu(sbd)
    got = dev.text_to_sentences_batch(CORPUS)
    for line, g in zip(CORPUS, got):
        assert g == api.text_to_sentences(line.encode()), line


def test_wordpiece_device():
    m = load_model("/root/reference/ldbsrc/ldb/bert_base_cased_tok.bin")
    api = LexerOracleApi(m)
    dev = WordPieceTpu(m)
    got = dev.text_to_ids_batch(CORPUS, unk_id=100)
    for line, g in zip(CORPUS, got):
        assert g == api.text_to_ids(line.encode(), unk_id=100), line
