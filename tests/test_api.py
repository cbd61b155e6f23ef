"""Full API-surface parity: hyphenation, ids_to_text, spaces, hashes."""

from __future__ import annotations

import numpy as np
import pytest

import reference_lib as ref
from corpus import full_corpus

from blingfire_tpu import api

CORPUS = full_corpus(n_random=40)

WORDS = [
    "hyphenation",
    "dictionary",
    "extraordinary",
    "a",
    "supercalifragilisticexpialidocious",
    "computer",
    "university",
    "washing",
    "согласование",
    "information",
    "algorithm",
]


def test_word_hyphenation():
    h = ref.load_model("syllab.bin")
    tok = api.load_model("/root/reference/ldbsrc/ldb/syllab.bin")
    for w in WORDS + [w.upper() for w in WORDS[:4]]:
        got = tok.word_hyphenation(w)
        want = ref.word_hyphenation(h, w)
        assert got == want, (w, got, want)


def test_ids_to_text_gpt2():
    h = ref.load_model("gpt2.bin")
    tok = api.load_model(
        "/root/reference/ldbsrc/ldb/gpt2.bin",
        i2w_path="/root/reference/ldbsrc/ldb/gpt2.i2w",
    )
    # the reference needs the i2w model loaded as its own handle
    h_i2w = ref.load_model("gpt2.i2w")
    for line in CORPUS[:30]:
        ids = ref.text_to_ids(h, line.encode(), max_len=4096)
        got = tok.ids_to_text(ids)
        want = ref.ids_to_text(h_i2w, ids)
        assert got == want, (line, got, want)


def test_ids_to_text_skip_special():
    tok = api.load_model(
        "/root/reference/ldbsrc/ldb/gpt2.bin",
        i2w_path="/root/reference/ldbsrc/ldb/gpt2.i2w",
    )
    h_i2w = ref.load_model("gpt2.i2w")
    ids = [50270, 464, 2159, 50271]  # specials outside token-id-max=50255
    assert tok.ids_to_text(ids) == ref.ids_to_text(h_i2w, np.array(ids, np.int32))
    # with specials kept, id 50270 has no i2w entry: both sides signal error
    got = tok.ids_to_text(ids, skip_special_tokens=False)
    want = ref.ids_to_text(h_i2w, np.array(ids, np.int32), skip_special=False)
    assert not got and not want


def test_normalize_spaces():
    for line in CORPUS:
        if not line:
            continue
        got = api.normalize_spaces(line)
        want = ref.normalize_spaces(line)
        assert (got or "") == want, line


def test_text_to_hashes():
    import ctypes

    lib = ref._lib()
    for line in ["This is ok .", "a b", "hello", "x " * 10]:
        for ngrams in (1, 2, 3):
            data = line.encode()
            got = api.text_to_hashes(data, ngrams)
            arr = np.zeros(4096, np.int32)
            n = lib.TextToHashes(
                ctypes.c_char_p(data),
                ctypes.c_int(len(data)),
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.c_int(4096),
                ctypes.c_int(ngrams),
                ctypes.c_int(2_000_000),
            )
            assert got == arr[:n].tolist(), (line, ngrams)


def test_get_version():
    assert api.get_version() >= 1000
