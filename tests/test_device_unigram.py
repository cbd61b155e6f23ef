"""Device unigram-LM kernel vs scalar oracle / reference."""

from __future__ import annotations

import pytest

from corpus import full_corpus

from blingfire_tpu.runtime.host import SpTokenizer
from blingfire_tpu.runtime.oracle import SpTokenizerOracle

CORPUS = full_corpus(n_random=120)


@pytest.mark.parametrize("fixture", ["xlnet_model", "laser100k_model"])
def test_device_matches_oracle(fixture, request):
    model = request.getfixturevalue(fixture)
    tok = SpTokenizer(model, max_doc_symbols=512)
    oracle = SpTokenizerOracle(model.seg)
    got = tok.encode_batch(CORPUS)
    bad = []
    for line, g in zip(CORPUS, got):
        want = oracle.text_to_ids(line.encode("utf-8"))
        if g != want:
            bad.append((line, g, want))
    assert not bad, f"{len(bad)}/{len(CORPUS)} mismatch; first: {bad[0]}"


def test_device_matches_reference_xlnet(xlnet_model):
    import reference_lib as ref

    tok = SpTokenizer(xlnet_model, max_doc_symbols=512)
    h = ref.load_model("xlnet.bin")
    got = tok.encode_batch(CORPUS)
    for line, g in zip(CORPUS, got):
        want = ref.text_to_ids(h, line.encode("utf-8"), max_len=4096).tolist()
        assert g == want, line
