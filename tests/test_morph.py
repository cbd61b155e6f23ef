"""Legacy morphology engines: parity vs the ORIGINAL reference client library.

Models are built with compiler/morphbin.py, then loaded by BOTH
runtime/morph.py and the reference C++ engines (tests/refshim compiles the
reference sources into a test-only oracle .so).  This wires + verifies the
stack VERDICT r2 flagged as dead code: word guessers, prob guessers, HMM
tagger, tag dictionary, word->prob, suffix stemmer, transforms, WRE parser,
and the all-match regexp tagger.
"""

from __future__ import annotations

import numpy as np
import pytest

import refshim

from blingfire_tpu.compiler.morphbin import (
    MorphSpec,
    RegexpTagsRule,
    SuffixRule,
    TagDictSpec,
    TrsSpec,
    TsSpec,
    W2PSpec,
    WftSpec,
    WgSpec,
    WreRule,
    WreSpec,
    compile_morph_model,
    compile_regexp_tags_model,
)
from blingfire_tpu.formats.consts import WRE_TT_TAGS, Dir, Tr
from blingfire_tpu.runtime import transforms as tr_mod
from blingfire_tpu.runtime.morph import MorphLdb, load_regexp_tags

W = lambda s: [ord(c) for c in s]  # noqa: E731


# ---------------------------------------------------------------------------
# shared model fixtures
# ---------------------------------------------------------------------------

TAGS = {"NN": 1, "VB": 2, "JJ": 3, "DT": 4, "EOS": 5}


def _wg_entries():
    # suffix-style guesser entries (reversed by the builder for R2L)
    return {
        "walking": [TAGS["VB"]],
        "talking": [TAGS["VB"], TAGS["JJ"]],
        "ing": [TAGS["VB"]],
        "ed": [TAGS["VB"]],
        "dog": [TAGS["NN"]],
        "the": [TAGS["DT"]],
        "s": [TAGS["NN"], TAGS["VB"]],
    }


def _w2tp_entries():
    # [tags..., int probs...] even-length Ows
    return {
        "walking": [TAGS["VB"], 240],
        "dog": [TAGS["NN"], TAGS["VB"], 230, 40],
        "the": [TAGS["DT"], 255],
        "ing": [TAGS["VB"], TAGS["NN"], 200, 55],
        "s": [TAGS["NN"], TAGS["VB"], 128, 127],
        "e": [TAGS["NN"], 99],
    }


@pytest.fixture(scope="module")
def morph_pair():
    spec = MorphSpec(
        w2t=WgSpec(_wg_entries(), direction=Dir.R2L, def_tag=TAGS["NN"]),
        b2t=WgSpec({"walk": [TAGS["VB"]], "dog": [TAGS["NN"]]}, dict_mode=True,
                   add_delim=False),
        w2tp=WgSpec(
            _w2tp_entries(),
            direction=Dir.R2L,
            def_tag=TAGS["NN"],
            max_prob=255,
            log_scale=True,
            prob_range=(-15.0, 0.0),
            eos_tag=TAGS["EOS"],
        ),
        t2p=[-1.2, -2.3, -3.4, -0.5, -4.0],
        tt2p=TsSpec(
            max_tag=5,
            int_probs=[(i * 37 + j * 11) % 256 for i in range(5) for j in range(5)],
            max_prob=255,
            prob_range=(-12.0, 0.0),
            log_scale=True,
        ),
        w2b=WftSpec([
            SuffixRule("ing", 3, ""),
            SuffixRule("ies", 3, "y"),
            SuffixRule("s", 1, ""),
        ]),
        b2w=WftSpec([
            SuffixRule("walk", 0, "ing", whole_word=True),
            SuffixRule("y", 1, "ies"),
            SuffixRule("g", 0, "s"),
        ]),
        wt2b=WftSpec([
            SuffixRule("ing", 3, "", tags=(TAGS["VB"],)),
            SuffixRule("s", 1, "", tags=(TAGS["NN"], TAGS["VB"])),
        ]),
        b2wt=WftSpec([
            SuffixRule("k", 0, "ing", tags=(TAGS["VB"],)),
            SuffixRule("g", 0, "s", tags=(TAGS["NN"],)),
        ]),
        tag_dict=TagDictSpec(entries={
            "run": [1, 2, 7],
            "runs": [2],
            "dog": [1, 5],
            "a": [4],
        }),
        w2p=W2PSpec(
            entries={"the": 255, "dog": 200, "walking": 100, "a": 30},
            max_prob=255,
            prob_range=(-20.0, 0.0),
        ),
    )
    image = compile_morph_model(spec)
    return MorphLdb(image), refshim.RefMorph(image), image


WORDS = [
    "walking", "talking", "working", "dog", "dogs", "the", "cities",
    "walked", "zzz", "a", "run", "runs", "ing", "s", "x", "walk",
    "puppies", "strings",
]


# ---------------------------------------------------------------------------
# word guessers
# ---------------------------------------------------------------------------


def test_word_guesser_parity(morph_pair):
    ours, ref, _ = morph_pair
    g = ours.word_guesser("w2t")
    assert g is not None
    for w in WORDS:
        got = g.process(W(w))
        want = ref.wg(W(w), which=0)
        assert (got or None) == (want or None), w


def test_word_guesser_dict_mode_parity(morph_pair):
    ours, ref, _ = morph_pair
    g = ours.word_guesser("b2t")
    for w in ["walk", "dog", "walking", "zzz"]:
        got = g.process(W(w))
        want = ref.wg(W(w), which=1)
        assert (got or None) == (want or None), w


def test_word_guesser_prob_parity(morph_pair):
    ours, ref, _ = morph_pair
    g = ours.word_guesser_prob("w2tp")
    for w in WORDS:
        got = g.process_probs(W(w))
        want = ref.wg_prob(W(w), which=2)
        if got is None or want is None:
            assert got is None and want is None, w
            continue
        gt, gp = got
        wt, wp = want
        assert list(gt) == list(wt), w
        np.testing.assert_array_equal(
            np.asarray(gp, np.float32), np.asarray(wp, np.float32), err_msg=w
        )


# ---------------------------------------------------------------------------
# tag dictionary / probability tables / HMM
# ---------------------------------------------------------------------------


def test_tag_dict_parity(morph_pair):
    ours, ref, _ = morph_pair
    d = ours.dict_interpreter()
    for w in WORDS:
        assert d.get_info_id(W(w)) == ref.tag_dict_id(W(w)), w
        got = d.get_info(W(w))
        want = ref.tag_dict_info(W(w))
        assert (got or None) == (want or None), w


def test_prob_tables_parity(morph_pair):
    from blingfire_tpu.runtime.morph import T2PTable, Ts2PTable

    ours, ref, _ = morph_pair
    pt = T2PTable(ours.t2p)
    ptt = Ts2PTable(ours.tt2p)
    for t in range(1, 6):
        assert np.float32(pt.get_prob(t)) == np.float32(ref.t2p(t)), t
        for t2 in range(1, 6):
            assert np.float32(ptt.get_prob2(t, t2)) == np.float32(
                ref.ts2p(t, t2)
            ), (t, t2)


def test_hmm_tagger_parity(morph_pair):
    ours, ref, _ = morph_pair
    tagger = ours.hmm_tagger()
    assert tagger is not None
    sents = [
        ["the", "dog", "walking"],
        ["dog"],
        ["the", "dog", "s", "ing", "e"],
        ["zzz", "the", "walking", "dog", "e", "s"],
    ]
    for sent in sents:
        got = tagger.tag([W(w) for w in sent])
        want = ref.hmm([W(w) for w in sent])
        assert got == want, sent


# ---------------------------------------------------------------------------
# stemmer / word->prob
# ---------------------------------------------------------------------------


def _split0(flat):
    """0-separated concatenated words -> list of words."""
    if flat is None:
        return None
    out, cur = [], []
    for c in flat:
        if c == 0:
            out.append(cur)
            cur = []
        else:
            cur.append(c)
    return out


def test_stemmer_parity(morph_pair):
    ours, ref_m, image = morph_pair
    ref = refshim.RefStemmer(image)
    st = ours.stemmer()
    for w in WORDS:
        assert (st.process_w2b(W(w)) or None) == (
            _split0(ref.stem(0, W(w))) or None
        ), ("w2b", w)
        assert (st.process_b2w(W(w)) or None) == (
            _split0(ref.stem(1, W(w))) or None
        ), ("b2w", w)
        assert (st.process_w2w(W(w)) or None) == (
            _split0(ref.stem(2, W(w))) or None
        ), ("w2w", w)
        for t in (1, 2):
            assert (st.process_wt2b(W(w), t) or None) == (
                _split0(ref.stem(3, W(w), t1=t)) or None
            ), ("wt2b", w, t)
            assert (st.process_b2wt(W(w), t) or None) == (
                _split0(ref.stem(4, W(w), t1=t)) or None
            ), ("b2wt", w, t)
        assert (st.process_wtt2w(W(w), 2, 1) or None) == (
            _split0(ref.stem(5, W(w), t1=2, t2=1)) or None
        ), ("wtt2w", w)


def test_word_to_prob_parity(morph_pair):
    ours, ref_m, image = morph_pair
    ref = refshim.RefStemmer(image)
    w2p = ours.word_to_prob()
    for w in WORDS:
        assert w2p.get_int_prob(W(w)) == ref.w2p_int(W(w)), w
        assert np.float32(w2p.get_prob(W(w))) == np.float32(ref.w2p_prob(W(w))), w


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_transforms_parity():
    cases = [
        "aaab-aaabce", "ab-abx", "x-yz", "nothing", "pre~word",
        "word~pre", "Capital", "lower", "A", "ab\\tcd", "a\\nb", "bad\\q",
        "plain\tTAB",
    ]
    delim = ord("~")
    pairs = [
        (0, tr_mod.HyphRedup(delim)),
        (1, tr_mod.HyphRedupRev(delim)),
        (3, tr_mod.PrefixRev(delim)),
        (4, tr_mod.Capital(delim)),
        (5, tr_mod.CapitalRev(delim)),
        (6, tr_mod.Unescape()),
    ]
    for kind, t in pairs:
        for s in cases:
            got = t(W(s))
            want = refshim.transform(kind, W(s), delim=delim)
            assert (got or None) == (want or None), (kind, s)


def test_prefix_transform_parity():
    from blingfire_tpu.compiler.morphbin import (
        _pack_moore,
        build_trie_moore,
    )
    from blingfire_tpu.formats.dfa import PackedDfaImage, densify_automaton
    from blingfire_tpu.runtime.morph import DfaWalker

    prefixes = ["pre", "un", "anti"]
    entries = {tuple(W(p)): 0 for p in prefixes}
    n, final, edges, state_ow = build_trie_moore(entries)
    img = _pack_moore(n, final, edges, state_ow)
    delim = ord("~")
    aut = densify_automaton(PackedDfaImage(img, 0))
    ours = tr_mod.Prefix(DfaWalker(aut), delim)
    for s in ["preword", "unknown", "antique", "nothing", "pre", "un", "u"]:
        got = ours(W(s))
        want = refshim.transform(2, W(s), delim=delim, pref_img=img)
        assert (got or None) == (want or None), s


def test_trs_cascade_in_model():
    """A model whose guesser normalizes through an input transform chain."""
    spec = MorphSpec(
        trs=TrsSpec(in_trs=[Tr.HYPH_REDUP], redup_delim=ord("~")),
        w2t=WgSpec({"aaab~ce": [3], "plain": [1]}, add_delim=False,
                   dict_mode=True),
        validate=True,
    )
    image = compile_morph_model(spec)
    ours = MorphLdb(image)
    ref = refshim.RefMorph(image)
    g = ours.word_guesser("w2t")
    for s in ["aaab-aaabce", "aaab~ce", "plain", "other"]:
        got = g.process(W(s))
        want = ref.wg(W(s), which=0)
        assert (got or None) == (want or None), s


# ---------------------------------------------------------------------------
# regexp tagger
# ---------------------------------------------------------------------------


def test_regexp_tags_parity():
    rules = [
        RegexpTagsRule(regexp='[0-9]+', score=10, tag=1),
        RegexpTagsRule(regexp='[a-z]+', score=5, tag=2),
        RegexpTagsRule(regexp='^http', score=20, tag=3),
        RegexpTagsRule(regexp='[.][a-z][a-z][a-z]$', score=15, tag=4),
    ]
    image = compile_regexp_tags_model(rules)
    ours = load_regexp_tags(image)
    ref = refshim.RefWbd(image)
    for s in [
        "http://x.com", "hello", "42", "abc123", "x.txt", "HTTP", "",
        "tail.doc", "99 bottles",
    ]:
        got_tags, got_scores = ours.process(W(s))
        want = ref.regexp_tags(W(s))
        assert want is not None
        assert got_tags == want[0], s
        assert got_scores == want[1], s


# ---------------------------------------------------------------------------
# WRE parser
# ---------------------------------------------------------------------------


def test_wre_parser_parity():
    base = 100
    spec = MorphSpec(
        wre=WreSpec(
            token_type=WRE_TT_TAGS,
            tag_ow_base=base,
            rules=[
                # DT NN -> constituent 10
                WreRule(tuples=[(base + 4,), (base + 1,)], action=[0, 0, 10]),
                # 10 VB -> constituent 11 (matches over constituents)
                WreRule(tuples=[(base + 10,), (base + 2,)], action=[0, 0, 11]),
            ],
            max_pass_count=2,
        ),
        validate=True,
    )
    image = compile_morph_model(spec)
    ours = MorphLdb(image)
    ref = refshim.RefMorph(image)

    from blingfire_tpu.runtime.morph import ParseTree

    cases = [
        (["the", "dog", "walks"], [4, 1, 2]),
        (["the", "dog"], [4, 1]),
        (["dog", "walks"], [1, 2]),
        (["the", "dog", "walks", "the", "dog"], [4, 1, 2, 4, 1]),
    ]
    for words, tags in cases:
        wre = ours.wre_parser()
        assert wre is not None
        wre.reset(len(words))
        for w, t in zip(words, tags):
            wre.add_word(W(w), t)
        tree = ParseTree(len(words))
        wre.set_parse_tree(tree)
        added = wre.process()
        tree.update()
        got_labels = tree.get_upper_labels()

        want = ref.wre([W(w) for w in words], tags)
        assert want is not None
        w_added, w_labels = want
        assert added == w_added, (words, tags)
        assert got_labels == w_labels, (words, tags)
