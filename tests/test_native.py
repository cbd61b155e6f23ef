"""Native C++ prep vs the NumPy reference implementation."""

from __future__ import annotations

import numpy as np
import pytest

from corpus import full_corpus

from blingfire_tpu import native
from blingfire_tpu.runtime.host import SpTokenizer

CORPUS = [l.encode() for l in full_corpus(n_random=80)]
CORPUS += [b"", b"\xff\xfe invalid", b"\xef\xbb\xbfBOM text", b"a" * 600]


@pytest.fixture(scope="module", autouse=True)
def _built():
    assert native.available(), "native library failed to build"


@pytest.mark.parametrize("fixture", ["gpt2_model", "xlnet_model"])
def test_native_prep_matches_numpy(fixture, request):
    model = request.getfixturevalue(fixture)
    tok = SpTokenizer.__new__(SpTokenizer)  # prep-only; skip device tables
    from blingfire_tpu.ops.tables import build_comb_table

    tok.model = model
    tok.seg = model.seg
    tok.comb = build_comb_table(model.seg.aut)
    tok._sym2iw = tok.comb.sym2iw
    tok.n_doc = 512

    xn, sn, ln, _on, fn = tok._prep_batch(CORPUS, force_numpy=True)
    xc, sc, lc, _oc, fc = tok._prep_batch(CORPUS, force_numpy=False)
    assert (ln == lc).all()
    assert (fn == fc).all()
    for i in range(len(CORPUS)):
        n = ln[i]
        assert (xn[i, :n] == xc[i, :n]).all(), (i, CORPUS[i][:40])
        assert (sn[i, :n] == sc[i, :n]).all(), (i, CORPUS[i][:40])


def test_native_version():
    assert native.get_lib().btl_version() == 1000
