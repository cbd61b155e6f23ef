"""Native C++ host runtime: full C-ABI parity against the reference library.

``blingfire_tpu/native/runtime.cpp`` exports the reference's exact C ABI
(blingfiretokdll.h); this test loads BOTH shared libraries and compares
every product function on the shared edge-case corpus across all shipped
models.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np
import pytest

import reference_lib as ref
from corpus import EDGE_CASES

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "blingfire_tpu", "native")
OUR_SO = os.path.join(NATIVE_DIR, "libbtf_runtime.so")
REF_DIR = "/root/reference/dist-pypi/blingfire"
LDB_DIR = "/root/reference/ldbsrc/ldb"

TEXTS = [t.encode() for t in EDGE_CASES] + [b"", b"x" * 500]


@functools.lru_cache(maxsize=1)
def _ours():
    if not os.path.exists(OUR_SO):
        subprocess.run(["make", "-C", NATIVE_DIR], check=True)
    lib = ctypes.cdll.LoadLibrary(OUR_SO)
    lib.LoadModel.restype = ctypes.c_void_p
    lib.LoadModel.argtypes = [ctypes.c_char_p]
    lib.SetModel.restype = ctypes.c_void_p
    from blingfire_tpu.runtime.casefold import tolower_table

    t = np.ascontiguousarray(tolower_table(), dtype=np.int32)
    lib.SetCaseFoldTable(t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(t))
    _ours.table = t  # keep alive
    return lib


def _model_path(name: str) -> bytes:
    for d in (REF_DIR, LDB_DIR):
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p.encode()
    pytest.skip(f"{name} not shipped")


@functools.lru_cache(maxsize=32)
def _handles(name: str):
    p = _model_path(name)
    ho = _ours().LoadModel(p)
    hr = ref._lib().LoadModel(p)
    assert ho and hr
    return ho, hr


def _ids(lib, h, s, offsets=False, maxn=1024, unk=0):
    a = (ctypes.c_int32 * maxn)()
    if offsets:
        st = (ctypes.c_int32 * maxn)()
        en = (ctypes.c_int32 * maxn)()
        fn = lib.TextToIdsWithOffsets
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
                       ctypes.POINTER(ctypes.c_int32),
                       ctypes.POINTER(ctypes.c_int32),
                       ctypes.POINTER(ctypes.c_int32),
                       ctypes.c_int, ctypes.c_int]
        n = fn(h, s, len(s), a, st, en, maxn, unk)
        n = min(n, maxn)
        return list(a[:n]), list(st[:n]), list(en[:n])
    fn = lib.TextToIds
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
                   ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int]
    n = fn(h, s, len(s), a, maxn, unk)
    return list(a[: min(n, maxn)])


def _str_fn(lib, fname, h, s, offsets=False, maxn=1 << 15):
    out = ctypes.create_string_buffer(maxn)
    if offsets:
        st = (ctypes.c_int32 * maxn)()
        en = (ctypes.c_int32 * maxn)()
        fn = getattr(lib, fname + "WithOffsetsWithModel")
        n = fn(s, len(s), out, st, en, maxn, ctypes.c_void_p(h))
        if n <= 0:
            return n, None, None, None
        txt = out.raw[: n - 1].decode("utf-8", errors="replace")
        k = txt.count(" ") + 1 if fname.endswith("Words") else txt.count("\n") + 1
        if not txt:
            k = 0
        return n, txt, list(st[:k]), list(en[:k])
    fn = getattr(lib, fname + "WithModel")
    n = fn(s, len(s), out, maxn, ctypes.c_void_p(h))
    return n, (out.raw[: n - 1].decode("utf-8", errors="replace") if n > 0 else None)


SEG_MODELS = ["gpt2.bin", "roberta.bin", "xlnet.bin", "xlnet_nonorm.bin",
              "laser100k.bin", "uri100k.bin", "bpe_example.bin"]
WP_MODELS = ["bert_base_cased_tok.bin", "bert_chinese.bin", "bert_base_tok.bin"]
LEX_MODELS = ["wbd.bin", "sbd.bin", "wbd_chuni.bin"]


@pytest.mark.parametrize("name", SEG_MODELS + WP_MODELS)
def test_text_to_ids_parity(name):
    ho, hr = _handles(name)
    for s in TEXTS:
        assert _ids(_ours(), ho, s) == _ids(ref._lib(), hr, s), s[:50]


def _norm_dummy(res):
    """The reference's end offset for the dummy-prefix token is UNDEFINED: it
    computes FAUtf8Size(pInUtf8Str + (-1)), reading the byte BEFORE the input
    buffer (blingfiretokdll.cpp:1388+1527), so the value depends on adjacent
    heap contents (observed -1 or 2 for identical input). Normalize it."""
    ids, st, en = res
    en = [(-1 if s == -1 else e) for s, e in zip(st, en)]
    return ids, st, en


@pytest.mark.parametrize("name", ["gpt2.bin", "xlnet.bin", "bert_base_cased_tok.bin"])
def test_text_to_ids_offsets_parity(name):
    ho, hr = _handles(name)
    for s in TEXTS:
        assert _norm_dummy(_ids(_ours(), ho, s, offsets=True)) == _norm_dummy(
            _ids(ref._lib(), hr, s, offsets=True)
        ), s[:50]


@pytest.mark.parametrize("name", LEX_MODELS)
def test_words_sentences_parity(name):
    ho, hr = _handles(name)
    fname = "TextToSentences" if name == "sbd.bin" else "TextToWords"
    for s in TEXTS:
        a = _str_fn(_ours(), fname, ho, s)
        b = _str_fn(ref._lib(), fname, hr, s)
        assert a == b, (name, s[:50], a, b)


def test_words_offsets_parity():
    ho, hr = _handles("wbd.bin")
    for s in TEXTS:
        a = _str_fn(_ours(), "TextToWords", ho, s, offsets=True)
        b = _str_fn(ref._lib(), "TextToWords", hr, s, offsets=True)
        assert a == b, (s[:50], a, b)


def test_hyphenation_parity():
    ho, hr = _handles("syllab.bin")
    words = [b"hyphenation", b"tokenization", b"supercalifragilistic",
             b"BlingFire", "naïve".encode(), b"a", b""]
    for w in words:
        out1 = ctypes.create_string_buffer(4096)
        out2 = ctypes.create_string_buffer(4096)
        n1 = _ours().WordHyphenationWithModel(
            w, len(w), out1, 4096, ctypes.c_void_p(ho), 0x2012)
        n2 = ref._lib().WordHyphenationWithModel(
            w, len(w), out2, 4096, ctypes.c_void_p(hr), 0x2012)
        assert (n1, out1.raw[:max(n1, 0)]) == (n2, out2.raw[:max(n2, 0)]), w


def test_normalize_spaces_parity():
    for s in TEXTS:
        if not s:
            continue
        o1 = ctypes.create_string_buffer(1 << 14)
        o2 = ctypes.create_string_buffer(1 << 14)
        n1 = _ours().NormalizeSpaces(s, len(s), o1, 1 << 14, 0x20)
        n2 = ref._lib().NormalizeSpaces(s, len(s), o2, 1 << 14, 0x20)
        assert (n1, o1.raw[:max(n1, 0)]) == (n2, o2.raw[:max(n2, 0)]), s[:50]


def test_text_to_hashes_parity():
    for s in [b"this is a test", b"one", b"a b c d e f g", b"x"]:
        for ngrams in (1, 2, 3):
            o1 = (ctypes.c_int32 * 256)()
            o2 = (ctypes.c_int32 * 256)()
            n1 = _ours().TextToHashes(s, len(s), o1, 256, ngrams, 2000000)
            n2 = ref._lib().TextToHashes(s, len(s), o2, 256, ngrams, 2000000)
            assert n1 == n2 and list(o1[:n1]) == list(o2[:n2]), (s, ngrams)


def test_ids_to_text_parity():
    # i2w-only aux models
    p = _model_path("gpt2.i2w")
    ho = _ours().LoadModel(p)
    hr = ref._lib().LoadModel(p)
    assert ho and hr
    pm = _model_path("gpt2.bin")
    hmo, hmr = _ours().LoadModel(pm), ref._lib().LoadModel(pm)
    s = b"Hello world, tokenize me please!"
    ids = _ids(_ours(), hmo, s)
    assert ids == _ids(ref._lib(), hmr, s)
    arr = (ctypes.c_int32 * len(ids))(*ids)
    o1 = ctypes.create_string_buffer(4096)
    o2 = ctypes.create_string_buffer(4096)
    for skip in (True, False):
        n1 = _ours().IdsToText(ctypes.c_void_p(ho), arr, len(ids), o1, 4096,
                               ctypes.c_bool(skip))
        n2 = ref._lib().IdsToText(ctypes.c_void_p(hr), arr, len(ids), o2, 4096,
                                  ctypes.c_bool(skip))
        assert (n1, o1.raw[:max(n1, 0)]) == (n2, o2.raw[:max(n2, 0)])


def test_set_model_and_free():
    with open(_model_path("gpt2.bin"), "rb") as f:
        blob = f.read()
    buf = ctypes.create_string_buffer(blob, len(blob))
    h = _ours().SetModel(buf, len(blob))
    assert h
    assert _ids(_ours(), h, b"hello") != []
    assert _ours().FreeModel(ctypes.c_void_p(h)) == 1


def test_version():
    assert _ours().GetBlingFireTokVersion() == 1000
