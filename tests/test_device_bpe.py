"""Device BPE kernel vs scalar oracle (and host prep vs oracle prep)."""

from __future__ import annotations

import numpy as np
import pytest

from corpus import full_corpus

from blingfire_tpu.runtime.host import BpeTokenizer, prepare_sp_doc
from blingfire_tpu.runtime.oracle import (
    SpTokenizerOracle,
    squeeze_whitespace,
    utf8_as_bytes,
)

CORPUS = full_corpus(n_random=150)


def test_prep_matches_oracle_gpt2(gpt2_model):
    seg = gpt2_model.seg
    for line in CORPUS:
        data = line.encode("utf-8")
        if not data:
            continue
        p = prepare_sp_doc(data, seg)
        # oracle path
        chars, offs = utf8_as_bytes(data)
        chars = [0x2581] + chars
        offs = [-1] + offs
        chars, offs = squeeze_whitespace(chars, offs)
        assert p.ok
        assert p.syms.tolist() == chars, line
        assert p.offs.tolist() == offs, line


@pytest.mark.parametrize("fixture", ["gpt2_model", "roberta_model"])
def test_device_matches_oracle(fixture, request):
    model = request.getfixturevalue(fixture)
    tok = BpeTokenizer(model, max_doc_symbols=512)
    oracle = SpTokenizerOracle(model.seg)
    got = tok.encode_batch(CORPUS)
    bad = []
    for line, g in zip(CORPUS, got):
        want = oracle.text_to_ids(line.encode("utf-8"))
        if g != want:
            bad.append((line, g, want))
    assert not bad, f"{len(bad)}/{len(CORPUS)} mismatch; first: {bad[0]}"


def test_device_matches_reference_gpt2(gpt2_model):
    import reference_lib as ref

    tok = BpeTokenizer(gpt2_model, max_doc_symbols=512)
    h = ref.load_model("gpt2.bin")
    got = tok.encode_batch(CORPUS)
    for line, g in zip(CORPUS, got):
        want = ref.text_to_ids(h, line.encode("utf-8"), max_len=4096).tolist()
        assert g == want, line
