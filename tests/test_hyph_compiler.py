"""W2H pattern-induction compiler: dictionary -> .bin, cross-runtime.

Builds hyphenation models from small annotated dictionaries with
``compiler/hyphpats.py`` and checks that (a) solved training words
hyphenate exactly per the dictionary, (b) the produced ``.bin`` loads in
the ORIGINAL reference runtime and both runtimes agree on training and
novel words.
"""

from __future__ import annotations

import ctypes

import pytest

import reference_lib as ref
from blingfire_tpu.api import TokenizerHandle
from blingfire_tpu.compiler.hyphpats import (
    HYPH_DONT_CARE,
    HYPH_SIMPLE_HYPH,
    build_pattern_dict,
    compile_w2h_model,
    induce_patterns,
    parse_tr_word,
    select_patterns,
    suffix_chains,
)
from blingfire_tpu.models.loader import load_bytes

# a toy but non-trivial hyphenation dictionary: consistent syllable rules
DICT = [
    "ba[=]na[=]na",
    "ba[=]na[=]nas",
    "ca[=]na[=]da",
    "pa[=]na[=]ma",
    "ta[=]ma[=]le",
    "to[=]ma[=]to",
    "po[=]ta[=]to",
    "do[=]mi[=]no",
    "ca[=]si[=]no",
    "sa[=]la[=]mi",
    "ko[=]a[=]la",
    "la[=]va",
    "so[=]da",
    "co[=]la",
    "ma[=]ma",
    "pa[=]pa",
    "da[=]ta",
    "me[=]ga",
    "se[=]pi[=]a",
    "ra[=]di[=]o",
]


def test_parse_tr_word_ops():
    iws, ows = parse_tr_word("ab[=]cd")
    assert [chr(c) for c in iws] == list("abcd")
    assert ows == [0, HYPH_SIMPLE_HYPH, 0, 0]
    # ADD/CHANGE/DELETE forms (FATrWordIOTools_utf8.cpp:20-97)
    _, ows = parse_tr_word("a[c=0]b")
    assert ows[0] == (ord("c") << 4) | 2
    _, ows = parse_tr_word("a[X=0]b")
    assert ows[0] == 4
    _, ows = parse_tr_word("a[Xc=]b")
    assert ows[0] == (ord("c") << 4) | 3
    _, ows = parse_tr_word("a[=Xk]b")
    assert ows[0] == (ord("k") << 4) | 5
    _, ows = parse_tr_word("a[?]b")
    assert ows[0] == HYPH_DONT_CARE


def test_induction_full_precision():
    entries = [parse_tr_word(ln) for ln in DICT]
    counts = suffix_chains(entries, min_len=3, max_len=7)
    pats = induce_patterns(counts, min_len=3, dont_care=True, max_context=5)
    assert pats, "no patterns induced"
    pd = build_pattern_dict(pats)
    sel, unsolved, conflicts = select_patterns(entries, pd)
    assert sel, "no patterns selected"
    # with 100% precision there must be no conflicts on training data
    assert not conflicts


def _hyphenate_all(handle_ours, handle_ref, words):
    ours, theirs = [], []
    for w in words:
        ours.append(handle_ours.word_hyphenation(w))
        theirs.append(ref.word_hyphenation(handle_ref, w))
    return ours, theirs


@pytest.mark.parametrize("dont_care", [True, False])
def test_w2h_compile_cross_runtime(dont_care):
    blob, selected, unsolved = compile_w2h_model(
        DICT,
        min_pat_len=3,
        max_pat_len=7,
        dont_care=dont_care,
        max_context=5,
        runtime_min_len=1,
    )
    assert selected

    handle_ours = TokenizerHandle(load_bytes(blob, use_cache=False))
    lib = ref._lib()
    buf = ctypes.create_string_buffer(blob, len(blob))
    h = lib.SetModel(buf, ctypes.c_int(len(blob)))
    assert h, "reference runtime rejected our w2h .bin"

    train = [ln.replace("[=]", "") for ln in DICT]
    novel = ["banadata", "tomala", "canadino", "xyz", "a", "salanama"]
    ours, theirs = _hyphenate_all(handle_ours, handle_ref=h, words=train + novel)
    assert ours == theirs, list(zip(train + novel, ours, theirs))[:10]

    # solved training words must match the dictionary annotation exactly
    unsolved_words = {"".join(chr(c) for c in iws) for iws, _ in unsolved}
    for ln, word, got in zip(DICT, train, ours):
        if word in unsolved_words:
            continue
        want = ln.replace("[=]", "‒")
        assert got == want, (word, got, want)


def test_w2h_take_all_improves_recall():
    blob, selected, _ = compile_w2h_model(
        DICT, min_pat_len=3, max_pat_len=7, take_all=True, runtime_min_len=1
    )
    blob_sel, sel2, _ = compile_w2h_model(
        DICT, min_pat_len=3, max_pat_len=7, runtime_min_len=1
    )
    assert len(selected) >= len(sel2)
    m = TokenizerHandle(load_bytes(blob, use_cache=False))
    assert m.word_hyphenation("banana")  # loads and runs
