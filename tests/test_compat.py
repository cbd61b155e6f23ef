"""Compat layer vs the reference Python binding behavior."""

from __future__ import annotations

import numpy as np

import reference_lib as ref

from blingfire_tpu import compat


def test_words_and_sentences():
    assert compat.text_to_words("Hello, world!") == "Hello , world !"
    s = compat.text_to_sentences("One. Two! Three?")
    assert s.count("\n") == 2


def test_text_to_ids_padding():
    h = compat.load_model("/root/reference/ldbsrc/ldb/gpt2.bin")
    out = compat.text_to_ids(h, "Hello world", 16)
    assert out.dtype == np.uint32 and len(out) == 16
    rh = ref.load_model("gpt2.bin")
    want = ref.text_to_ids(rh, b"Hello world", 16)
    assert out[: len(want)].astype(np.int64).tolist() == want.tolist()
    np_out = compat.text_to_ids(h, "Hello world", 16, no_padding=True)
    assert len(np_out) == len(want)


def test_ids_roundtrip():
    h = compat.load_model("/root/reference/ldbsrc/ldb/gpt2.bin")
    i2w = compat.load_model("/root/reference/ldbsrc/ldb/gpt2.i2w")
    ids = compat.text_to_ids(h, "The quick brown fox", 16, no_padding=True)
    assert compat.ids_to_text(i2w, ids) == "The quick brown fox"


def test_offsets():
    text, offs = compat.text_to_words_with_offsets("ab cd")
    assert text == "ab cd"
    assert offs == [(0, 1), (3, 4)]


def test_version():
    assert compat.get_blingfiretok_version() >= 1000
