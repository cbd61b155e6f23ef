"""Coverage sweep: every shipped .bin model loads and matches the reference."""

from __future__ import annotations

import os

import pytest

import reference_lib as ref
from corpus import full_corpus

from blingfire_tpu.models.loader import load_model
from blingfire_tpu.runtime.lexer import LexerOracleApi
from blingfire_tpu.runtime.oracle import SpTokenizerOracle

LDB = "/root/reference/ldbsrc/ldb"
CORPUS = full_corpus(n_random=25)

SP_MODELS = [
    "gpt2.bin",
    "roberta.bin",
    "xlnet.bin",
    "xlnet_nonorm.bin",
    "laser100k.bin",
    "laser50k.bin",
    "uri100k.bin",
    "uri100kint.bin",
    "bpe_example.bin",
    "bpe_example2.bin",
]

WBD_MODELS = ["wbd.bin", "wbd_chuni.bin", "bert_chinese.bin"]


@pytest.mark.parametrize("name", SP_MODELS)
def test_sp_model_parity(name):
    m = load_model(os.path.join(LDB, name))
    assert m.seg is not None
    oracle = SpTokenizerOracle(m.seg)
    h = ref.load_model(name)
    for line in CORPUS:
        data = line.encode()
        if not data:
            continue
        got = oracle.text_to_ids(data, max_len=4096)
        want = ref.text_to_ids(h, data, max_len=4096).tolist()
        assert got == want, (name, line)


@pytest.mark.parametrize("name", WBD_MODELS)
def test_wbd_model_words_parity(name):
    m = load_model(os.path.join(LDB, name))
    assert m.wbd is not None
    api = LexerOracleApi(m)
    h = ref.load_model(name)
    for line in CORPUS:
        got = api.text_to_words(line.encode())
        want = ref.text_to_words(line.encode(), handle=h)
        assert got == want, (name, line)
