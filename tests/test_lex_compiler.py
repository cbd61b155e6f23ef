"""Lex-rules compiler: grammars compiled from sources vs shipped models."""

from __future__ import annotations

import ctypes
import os
import tempfile

import pytest

import reference_lib as ref
from corpus import full_corpus

from blingfire_tpu.compiler.lexbin import compile_lex_model
from blingfire_tpu.compiler.lexrules import load_tagset, read_lex_source
from blingfire_tpu.compiler.wordpiece import compile_wordpiece_model
from blingfire_tpu.models.loader import load_model
from blingfire_tpu.runtime.lexer import LexerOracleApi

LDBSRC = "/root/reference/ldbsrc"
CORPUS = full_corpus(n_random=40) + [
    "x -] y",  # the shipped [HYPHEN]] macro-expansion quirk
    "cannot",
    "e.g. yes",
    "U.S.A. is",
    "Dr. Smith went. He came back! Did he? Yes.",
    'He said "Stop." Then left. Mr. X agreed.',
]


def _compile(name: str, depth: int) -> bytes:
    lex = read_lex_source(f"{LDBSRC}/{name}/wbd.lex.utf8")
    ts = load_tagset(f"{LDBSRC}/{name}/wbd.tagset.txt")
    return compile_lex_model(lex, ts, dict_root=LDBSRC, max_depth=depth)


def _load(blob: bytes):
    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        return load_model(path)
    finally:
        os.unlink(path)


def test_compile_wbd_from_sources():
    blob = _compile("wbd", 4)
    a_new = LexerOracleApi(_load(blob))
    a_old = LexerOracleApi(load_model(f"{LDBSRC}/ldb/wbd.bin"))
    for l in CORPUS:
        assert a_new.text_to_words(l.encode()) == a_old.text_to_words(l.encode()), l
    # and through the original runtime
    lib = ref._lib()
    buf = ctypes.create_string_buffer(blob, len(blob))
    h_new = lib.SetModel(buf, ctypes.c_int(len(blob)))
    h_old = ref.load_model("wbd.bin")
    for l in CORPUS[:40]:
        assert ref.text_to_words(l.encode(), handle=h_new) == ref.text_to_words(
            l.encode(), handle=h_old
        ), l


def test_compile_sbd_from_sources():
    blob = _compile("sbd", 3)
    a_new = LexerOracleApi(_load(blob))
    a_old = LexerOracleApi(load_model(f"{LDBSRC}/ldb/sbd.bin"))
    for l in CORPUS:
        assert a_new.text_to_sentences(l.encode()) == a_old.text_to_sentences(
            l.encode()
        ), l


@pytest.mark.slow
def test_compile_bert_from_vocab():
    vocab = open(
        f"{LDBSRC}/bert_base_cased_tok/vocab.txt", encoding="utf-8"
    ).read().splitlines()
    grammar = read_lex_source(f"{LDBSRC}/bert_base_cased_tok/wbd.lex.utf8")
    ts = load_tagset(f"{LDBSRC}/bert_base_cased_tok/wbd.tagset.txt")
    blob = compile_wordpiece_model(vocab, grammar, ts, dict_root=LDBSRC)
    m_new = _load(blob)
    m_old = load_model(f"{LDBSRC}/ldb/bert_base_cased_tok.bin")
    assert m_new.wbd.aut.n_states == m_old.wbd.aut.n_states  # exact match!
    a_new, a_old = LexerOracleApi(m_new), LexerOracleApi(m_old)
    for l in CORPUS:
        assert a_new.text_to_ids(l.encode(), unk_id=100) == a_old.text_to_ids(
            l.encode(), unk_id=100
        ), l


@pytest.mark.slow
def test_compile_bert_chinese_with_charmap():
    from blingfire_tpu.compiler.lexrules import parse_charmap

    root = LDBSRC
    # NOTE: split("\n"), not splitlines() — the vocab contains U+2028 tokens
    # and the reference generator iterates file lines (\n only)
    vocab = open(f"{root}/bert_chinese/vocab.txt", encoding="utf-8").read().split("\n")
    grammar = read_lex_source(f"{root}/bert_chinese/wbd.lex.utf8")
    ts = load_tagset(f"{root}/bert_chinese/wbd.tagset.txt")
    cm = parse_charmap(read_lex_source(f"{root}/bert_chinese/charmap.utf8"))
    blob = compile_wordpiece_model(vocab, grammar, ts, dict_root=root, charmap=cm)
    m_new = _load(blob)
    m_old = load_model(f"{root}/ldb/bert_chinese.bin")
    assert m_new.wbd.aut.n_states == m_old.wbd.aut.n_states
    a_new, a_old = LexerOracleApi(m_new), LexerOracleApi(m_old)
    for l in CORPUS[:60]:
        assert a_new.text_to_ids(l.encode(), unk_id=100) == a_old.text_to_ids(
            l.encode(), unk_id=100
        ), l
