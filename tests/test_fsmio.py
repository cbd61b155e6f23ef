"""Textual FSM interchange parity (compiler/fsmio.py).

Two-sided proof against the ORIGINAL FAAutIOTools/FAMapIOTools compiled
into tests/refshim:
  1. text printed by fsmio is ACCEPTED by the reference reader, and
  2. text printed by the reference printer parses back here to the same
     machine (semantic equality),
which together make the formats interchangeable with every reference fa_*
build tool (reference: blingfirecompile.library/src/FAAutIOTools.cpp:339-,
FAMapIOTools.cpp:99-).
"""

from __future__ import annotations

import random

import pytest

import refshim
from blingfire_tpu.compiler import fsmio
from blingfire_tpu.compiler.mindfa import assign_mph_ows, build_min_dfa


def _dfa_semantics(d: fsmio.TextDfa):
    return (d.initial, tuple(sorted(set(d.finals))), dict(d.trans),
            dict(d.arc_ow), dict(d.state_ow),
            {k: tuple(v) for k, v in d.state_ows.items()})


def _rand_dfa(seed: int, n: int = 25, n_iw: int = 8) -> fsmio.TextDfa:
    rng = random.Random(seed)
    trans = {}
    for s in range(n):
        for iw in range(n_iw):
            if rng.random() < 0.35:
                trans[(s, iw)] = rng.randrange(n)
    finals = sorted(rng.sample(range(n), 4))
    d = fsmio.TextDfa(n - 1, n_iw - 1, 0, finals, trans)
    d.arc_ow = {k: rng.randrange(100) for k in trans if rng.random() < 0.5}
    d.state_ow = {s: rng.randrange(50) for s in finals}
    d.state_ows = {s: sorted(rng.sample(range(60), rng.randrange(1, 4)))
                   for s in finals}
    return d


# ---------------------------------------------------------------------------
# pure python round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["rs", "mealy", "moore", "moore-mult"])
def test_dfa_roundtrip_python(mode):
    d = _rand_dfa(1)
    got = fsmio.read_dfa(fsmio.print_dfa(d, mode), mode)
    assert got.initial == d.initial
    assert got.finals == sorted(set(d.finals))
    assert got.trans == d.trans
    if mode == "mealy":
        assert got.arc_ow == d.arc_ow
    if mode == "moore":
        assert got.state_ow == d.state_ow
    if mode == "moore-mult":
        assert got.state_ows == d.state_ows


def test_nfa_roundtrip_python():
    rng = random.Random(7)
    trans = {}
    for s in range(12):
        for iw in range(5):
            if rng.random() < 0.4:
                trans[(s, iw)] = sorted(rng.sample(range(12), rng.randrange(1, 3)))
    n = fsmio.TextNfa(11, 4, [0, 1], [5, 7], trans)
    got = fsmio.read_nfa(fsmio.print_nfa(n))
    assert got.initials == n.initials and got.finals == n.finals
    assert got.trans == n.trans


def test_maps_roundtrip_python():
    m = {3: 7, 1: -4, 9: 0}
    assert fsmio.read_map(fsmio.print_map(m)) == m
    mm = {2: [5, 6], 0: [1], 7: [9, 9, 3]}
    assert fsmio.read_multimap(fsmio.print_multimap(mm)) == mm
    c2n = [((1, 2, 3), 9), ((4,), -1), ((2, 2), 0)]
    assert fsmio.read_chain2num(fsmio.print_chain2num(c2n)) == c2n
    arr = [5, -3, 0, 12]
    assert fsmio.read_int_array(fsmio.print_int_array(arr)) == arr
    s2i = [("hello", 3), ("wo rld", -2)]
    assert fsmio.read_str2int(fsmio.print_str2int(s2i)) == s2i


# ---------------------------------------------------------------------------
# reference interop
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode,kind", [
    ("rs", "rs-dfa"),
    ("mealy", "mealy-dfa"),
    ("moore", "moore-dfa"),
    ("moore-mult", "moore-mdfa"),
])
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_dfa_reference_interop(mode, kind, seed):
    d = _rand_dfa(seed)
    if mode != "moore":
        d.state_ow = {}
    if mode != "moore-mult":
        d.state_ows = {}
    if mode != "mealy":
        d.arc_ow = {}
    ours = fsmio.print_dfa(d, mode)
    # (1) the reference reader accepts our text; (2) its re-print parses
    # back here to the same machine
    ref_text = refshim.aut_roundtrip(kind, ours)
    got = fsmio.read_dfa(ref_text, mode)
    assert _dfa_semantics(got) == _dfa_semantics(d)
    # byte-identical once normalized through the reference printer
    assert fsmio.print_dfa(got, mode) == ref_text


def test_nfa_reference_interop():
    rng = random.Random(11)
    trans = {}
    for s in range(15):
        for iw in range(6):
            if rng.random() < 0.4:
                trans[(s, iw)] = sorted(rng.sample(range(15), rng.randrange(1, 3)))
    # reference requires at least one initial + final; dst lists sorted
    n = fsmio.TextNfa(14, 5, [0], [3, 14], trans)
    ref_text = refshim.aut_roundtrip("rs-nfa", fsmio.print_nfa(n))
    got = fsmio.read_nfa(ref_text)
    assert got.initials == n.initials and got.finals == n.finals
    assert got.trans == n.trans


def test_maps_reference_interop():
    mm = {0: [4, 5], 3: [1], 9: [2, 2, 7]}
    got = fsmio.read_multimap(refshim.map_roundtrip("mmap", fsmio.print_multimap(mm)))
    # the shim's FAMultiMap_ar is dense, so gap keys come back as explicit
    # zero-length entries — semantically identical
    assert {k: v for k, v in got.items() if v} == mm

    c2n = [((1, 2), 5), ((3,), 8), ((7, 7, 7), -1)]
    got = fsmio.read_chain2num(refshim.map_roundtrip("chain2num", fsmio.print_chain2num(c2n)))
    assert sorted(got) == sorted(c2n)  # hash-map iteration order differs

    arr = [3, -1, 0, 99]
    assert fsmio.read_int_array(refshim.map_roundtrip("arr", fsmio.print_int_array(arr))) == arr


# ---------------------------------------------------------------------------
# real compiler artifacts through the reference toolchain
# ---------------------------------------------------------------------------


def test_min_dfa_mealy_mph_interop():
    """A Daciuk min-DFA with MPH ows (the gpt2-style Mealy) survives the
    reference round trip bit-exactly."""
    words = sorted({tuple(w.encode()) for w in [
        "app", "apple", "apply", "banana", "band", "bandit", "can", "candy",
    ]})
    n, final, edges = build_min_dfa(words)
    ows = assign_mph_ows(n, final, edges)
    d = fsmio.from_min_dfa(n, final, edges, ows)
    ref_text = refshim.aut_roundtrip("mealy-dfa", fsmio.print_dfa(d, "mealy"))
    got = fsmio.read_dfa(ref_text, "mealy")
    assert _dfa_semantics(got) == _dfa_semantics(d)


def test_lex_automaton_interop():
    """A compiled lexer automaton (class-iw alphabet) prints as a Moore
    multi-DFA the reference toolchain accepts."""
    from blingfire_tpu.compiler.lexfsm import build_lex_automaton
    from blingfire_tpu.compiler.lexrules import Group
    from blingfire_tpu.compiler.relex import parse, tokenize

    groups = [
        Group("g0", [0, 0, 1], [parse(tokenize("abc"))]),
        Group("g1", [0, 0, 2], [parse(tokenize("ab+d"))]),
    ]
    aut = build_lex_automaton(groups, multi_ows=True)
    d = fsmio.from_lex_automaton(aut)
    ref_text = refshim.aut_roundtrip("moore-mdfa", fsmio.print_dfa(d, "moore-mult"))
    got = fsmio.read_dfa(ref_text, "moore-mult")
    assert got.trans == d.trans
    assert got.state_ows == d.state_ows
