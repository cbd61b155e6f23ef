"""Unique-word-unit dedup path (runtime/dedup.py): decomposition
invariants + end-to-end parity with the host oracle (itself parity-locked
to the reference .so by tests/test_oracle_parity.py)."""

from __future__ import annotations

import numpy as np
import pytest

from blingfire_tpu.models.loader import load_model
from blingfire_tpu.runtime.dedup import UNIT_MAX, pack_units, split_units
from blingfire_tpu.runtime.host import SpTokenizer

LDB = "/root/reference/ldbsrc/ldb"

DOCS = [
    b"Hello world, this is a test.",
    b"hello world hello world hello",
    b"    indented   code   block    ",
    b"\ttabs\tand\nnewlines\n",
    b"",
    b" ",
    b"a",
    "naïve café résumé 🎉 emoji".encode(),
    b"x" * 100,  # one oversize unit -> classic path
    b"supercalifragilisticexpialidocious antidisestablishmentarianism",
    b"the the the the the the the the",
    "中文没有空格的长句子测试".encode(),
    b"Mr. Smith's co-worker (test@example.com) said: 50% off!",
    b"  leading and trailing  ",
    b"first-word no space",  # doc-initial unit without leading delimiter
    b"A b C d E f G h",  # many tiny units
]


def _prep(tok, docs):
    x, spm, lengths, _o, _f = tok._prep_batch(docs)
    return np.asarray(x), np.asarray(spm), np.asarray(lengths)


@pytest.fixture(scope="module")
def gpt2():
    return SpTokenizer(load_model(f"{LDB}/gpt2.bin"), max_doc_symbols=128)


def test_split_units_reconstructs(gpt2):
    """Units exactly tile every valid doc prefix; instances reference the
    right content."""
    x, spm, lengths = _prep(gpt2, DOCS)
    ub = split_units(x, spm, lengths)
    # instance coverage: per non-classic doc, unit lengths sum to doc length
    covered = np.zeros(len(DOCS), np.int64)
    np.add.at(covered, ub.inst_doc, ub.u_len[ub.inst_unit])
    for i in range(len(DOCS)):
        if not ub.classic[i]:
            assert covered[i] == lengths[i], DOCS[i]
    # dedup: repeated words collapse ("the the the ..." has 2 distinct units
    # at most: "the" and "▁the")
    the = [i for i, d in enumerate(DOCS) if d.startswith(b"the the")][0]
    insts = ub.inst_unit[ub.inst_doc == the]
    assert len(set(insts.tolist())) <= 2 < len(insts)


def test_pack_units_invariants(gpt2):
    x, spm, lengths = _prep(gpt2, DOCS)
    ub = split_units(x, spm, lengths)
    px, plen, u_row, u_off = pack_units(ub, 128)
    assert (u_off + ub.u_len <= 128).all()
    # non-▁-initial units must open their row (nothing before them)
    assert (u_off[~ub.u_spm0] == 0).all()
    # packed rows reproduce every unit's symbols
    for u in range(len(ub.u_len)):
        ln = ub.u_len[u]
        got = px[u_row[u], u_off[u] : u_off[u] + ln]
        assert (got == ub.u_x[u, :ln]).all()
    # fill levels
    assert (plen <= 128).all() and (plen > 0).all()


@pytest.mark.parametrize("name", ["gpt2", "roberta", "xlnet", "laser100k"])
def test_encode_parity_vs_oracle(name):
    tok = SpTokenizer(load_model(f"{LDB}/{name}.bin"), max_doc_symbols=128)
    assert tok.dedup_units, "all shipped models are unit-factorizable"
    got = tok.encode_batch(DOCS, unk_id=0)
    for d, g in zip(DOCS, got):
        assert list(g) == list(tok._oracle.text_to_ids(d, unk_id=0)), d


def test_encode_corpus_parity_mixed(gpt2):
    """encode_corpus (pipelined dispatch/collect) through the unit path."""
    docs = DOCS * 40  # repetition exercises dedup ratios and batching
    got = gpt2.encode_corpus(docs, unk_id=0, batch_docs=128)
    want = [gpt2._oracle.text_to_ids(d, unk_id=0) for d in DOCS]
    for i, d in enumerate(docs):
        assert list(got[i]) == list(want[i % len(DOCS)]), (i, d)


def test_dedup_off_still_exact(gpt2):
    got = gpt2.encode_batch(DOCS, unk_id=0, dedup=False)
    for d, g in zip(DOCS, got):
        assert list(g) == list(gpt2._oracle.text_to_ids(d, unk_id=0)), d


# ---------------------------------------------------------------- native flat


def test_native_units_analyze_matches_numpy(gpt2):
    """Native C++ analyze (prep+split+dedup+pack) agrees with the numpy
    decomposition on unit/instance counts and on the multiset of packed
    symbols (packing order may differ — both layouts are valid)."""
    from blingfire_tpu import native

    if not native.available():
        pytest.skip("no native toolchain")
    docs = [d for d in DOCS if d]
    x, spm, lengths = _prep(gpt2, docs)
    ub = split_units(x, spm, lengths)
    keep = ~ub.classic
    nu = native.units_analyze(
        docs, gpt2.n_doc, gpt2._sym2iw, gpt2._unit_runner().spm_iw,
        gpt2.seg.use_raw_bytes, gpt2.seg.no_dummy_prefix, gpt2.seg.charmap,
    )
    # numpy path drops oversize-unit docs to classic; native keeps every
    # unit (UNIT_MAX == n_doc there), so compare on the no-classic subset
    if not ub.classic.any():
        assert nu.n_units == len(ub.u_len)
        assert nu.n_instances == len(ub.inst_unit)
    assert (nu.status == 0).sum() == int(keep.sum()) + int(
        (ub.classic & (lengths > 0)).sum()
    )


def test_encode_corpus_flat_parity(gpt2):
    """encode_corpus_flat (native prep/dedup/stitch + compact d2h) matches
    the host oracle doc by doc, including fallback splicing."""
    docs = DOCS * 3 + [("word%d " % i).encode() * 40 for i in range(8)]
    ids, bounds = gpt2.encode_corpus_flat(docs, unk_id=0, batch_docs=17)
    assert bounds[0] == 0 and len(bounds) == len(docs) + 1
    for i, d in enumerate(docs):
        exp = gpt2._oracle.text_to_ids(d, unk_id=0) if d else []
        got = ids[bounds[i] : bounds[i + 1]].tolist()
        assert got == exp, (i, d[:40], got[:8], exp[:8])


def test_encode_corpus_flat_matches_lists(gpt2):
    """The compat list API and the flat API agree."""
    docs = DOCS * 2
    ids, bounds = gpt2.encode_corpus_flat(docs, unk_id=0, batch_docs=11)
    lists = gpt2.encode_corpus(docs, unk_id=0, batch_docs=11)
    for i in range(len(docs)):
        assert ids[bounds[i] : bounds[i + 1]].tolist() == lists[i]
