"""Case folding + diacritics normalization: bit-exact parity vs the reference.

Covers FAUtf32ToLower/ToUpper/IsLower/IsUpper (FAUtf32Utils.cpp:45-176),
FAStrUtf8Normalize (FAUtf8Utils.cpp:580-676), and the ignore-case paths of
the pattern lexer (FALexTools_t.h:262-264).
"""

from __future__ import annotations

import ctypes

import numpy as np
import pytest

import reference_lib as ref

from blingfire_tpu.formats.consts import NormAlgo, Param
from blingfire_tpu.runtime import casefold
from blingfire_tpu.runtime.normalize import normalize_text


def _ref_int_fn(sym: str, restype=ctypes.c_int):
    fn = getattr(ref._lib(), sym)
    fn.restype = restype
    fn.argtypes = [ctypes.c_int]
    return fn


CHECK_MAX = 0x20100  # past CASE_MAX to cover the identity tail


def test_tolower_toupper_full_range_parity():
    lo = _ref_int_fn("_ZN9BlingFire14FAUtf32ToLowerEi")
    up = _ref_int_fn("_ZN9BlingFire14FAUtf32ToUpperEi")
    bad = [
        cp
        for cp in range(CHECK_MAX)
        if casefold.to_lower(cp) != lo(cp) or casefold.to_upper(cp) != up(cp)
    ]
    assert not bad, f"{len(bad)} case-fold mismatches, first: {bad[:10]}"


def test_is_lower_is_upper_full_range_parity():
    il = _ref_int_fn("_ZN9BlingFire14FAUtf32IsLowerEi", ctypes.c_bool)
    iu = _ref_int_fn("_ZN9BlingFire14FAUtf32IsUpperEi", ctypes.c_bool)
    bad = [
        cp
        for cp in range(CHECK_MAX)
        if casefold.is_lower(cp) != il(cp) or casefold.is_upper(cp) != iu(cp)
    ]
    assert not bad, f"{len(bad)} is_lower/is_upper mismatches, first: {bad[:10]}"


def test_case_fold_reference_quirks():
    # the <=0xFF fast path maps MULTIPLICATION SIGN -> DIVISION SIGN
    assert casefold.to_lower(0xD7) == 0xF7
    assert casefold.to_upper(0xF7) == 0xD7
    assert casefold.to_upper(0xB5) == 0x39C  # micro sign
    # dotted capital I has no 1:1 simple lowering; reference leaves it as-is
    assert casefold.to_lower(0x130) == 0x130
    assert casefold.to_lower(0x110000) == 0x110000  # out of range: identity


def test_str_fold_vectorized_matches_scalar():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 0x22000, size=5000, dtype=np.int32)
    low = casefold.str_lower(arr)
    up = casefold.str_upper(arr)
    for i in range(0, 5000, 97):
        assert low[i] == casefold.to_lower(int(arr[i]))
        assert up[i] == casefold.to_upper(int(arr[i]))


def _ref_normalize(text: bytes, algo: int) -> str | None:
    fn = ref._lib()._ZN9BlingFire18FAStrUtf8NormalizeEPKciPcii
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
    ]
    buf = ctypes.create_string_buffer(4 * len(text) + 16)
    n = fn(text, len(text), buf, len(buf), algo)
    if n < 0:
        return None
    return buf.raw[:n].decode("utf-8")


@pytest.mark.parametrize("algo", [int(a) for a in NormAlgo])
def test_normalize_text_codepoint_sweep_parity(algo):
    # every 7th codepoint + the full recorded nontrivial domain
    cps = list(range(1, 0xFFFF, 7))
    z = np.load(casefold._DATA.replace("unicode_compat", "unicode_compat"))
    key = {0: "prod", 1: "preserve", 2: "remove"}[algo]
    cps += z[f"diac_{key}_cp"].tolist()
    bad = []
    for cp in cps:
        if 0xD800 <= cp <= 0xDFFF:
            continue
        s = chr(cp).encode("utf-8")
        if normalize_text(s, algo) != _ref_normalize(s, algo):
            bad.append(cp)
    assert not bad, f"{len(bad)} normalize mismatches (algo={algo}): {bad[:10]}"


def test_normalize_text_strings():
    for s in ["Crème Brûlée à la mode", "ÅÆÇÐØÞ ß", "﻿BOM start", "já você"]:
        for algo in (0, 1, 2):
            assert normalize_text(s, algo) == _ref_normalize(s.encode(), algo)


# -- ignore-case pattern lexer, cross-runtime -------------------------------

IC_LEX = """
_define WS [\\x0020]

< [a-z]+ > --> WORD
< [0-9]+ > --> WORD
< [WS]+ > --> IGNORE
"""

IC_TAGSET = {"WORD": 1, "IGNORE": 4}

IC_TEXTS = [
    "Hello WORLD",
    "MiXeD CaSe 123",
    "ÀÉÎÕÜ naïve ÑOÑO",  # Latin-1 fast path incl. the 0xD7 quirk range
    "ΑΒΓΔ αβγδ ЩЮЯ щюя",  # Greek + Cyrillic table pages
    "İstanbul Iı",  # dotted/dotless I
]


def _build_ic_model(ignore_case: bool) -> bytes:
    from blingfire_tpu.compiler.lexbin import compile_lex_model

    extra = {int(Param.IGNORE_CASE): None} if ignore_case else None
    return compile_lex_model(IC_LEX, dict(IC_TAGSET), extra_params=extra)


def test_lexer_ignore_case_cross_runtime():
    import os
    import tempfile

    from blingfire_tpu.models.loader import load_bytes
    from blingfire_tpu.runtime.lexer import LexerOracleApi

    blob = _build_ic_model(ignore_case=True)
    model = load_bytes(blob, use_cache=False)
    assert model.wbd is not None and model.wbd.ignore_case
    ours = LexerOracleApi(model)

    lib = ref._lib()
    buf = ctypes.create_string_buffer(blob, len(blob))
    h = lib.SetModel(buf, ctypes.c_int(len(blob)))
    assert h
    for t in IC_TEXTS:
        assert ours.text_to_words(t.encode()) == ref.text_to_words(
            t.encode(), handle=h
        ), t


def test_lexer_ignore_case_device_path():
    from blingfire_tpu.models.loader import load_bytes
    from blingfire_tpu.runtime.lexer import LexerOracleApi
    from blingfire_tpu.runtime.lexer_host import WordsTpu

    blob = _build_ic_model(ignore_case=True)
    model = load_bytes(blob, use_cache=False)
    ours = LexerOracleApi(model)
    dev = WordsTpu(model)
    got = dev.text_to_words_batch([t.encode() for t in IC_TEXTS])
    want = [ours.text_to_words(t.encode()) for t in IC_TEXTS]
    assert got == want


def test_lexer_ignore_case_changes_behavior():
    """Sanity: without ignore-case the same grammar must not match A-Z."""
    from blingfire_tpu.models.loader import load_bytes
    from blingfire_tpu.runtime.lexer import LexerOracleApi

    plain = LexerOracleApi(load_bytes(_build_ic_model(False), use_cache=False))
    folded = LexerOracleApi(load_bytes(_build_ic_model(True), use_cache=False))
    assert folded.text_to_words(b"Hello WORLD") == "Hello WORLD"
    assert plain.text_to_words(b"Hello WORLD") != "Hello WORLD"
