"""Device hyphenation kernel vs scalar engine + reference."""

from __future__ import annotations

import reference_lib as ref

from blingfire_tpu.models.loader import load_model
from blingfire_tpu.runtime.hyph import HyphEngine, HyphTpu

WORDS = [
    "hyphenation",
    "dictionary",
    "extraordinary",
    "a",
    "supercalifragilisticexpialidocious",
    "computer",
    "university",
    "information",
    "algorithm",
    "tokenization",
    "beautiful",
    "x" * 40,
    "working",
    "subdivision",
    "неделя",
]


def test_device_matches_scalar():
    m = load_model("/root/reference/ldbsrc/ldb/syllab.bin")
    eng = HyphEngine(m.w2h)
    dev = HyphTpu(m.w2h)
    cps = [[ord(c) for c in w] for w in WORDS]
    res = dev.process_batch(cps)
    for w, c, rd in zip(WORDS, cps, res):
        assert rd == eng.process(list(c)), w


def test_api_batch_matches_reference():
    from blingfire_tpu import api

    tok = api.load_model("/root/reference/ldbsrc/ldb/syllab.bin")
    h = ref.load_model("syllab.bin")
    for w in WORDS:
        assert tok.word_hyphenation(w) == ref.word_hyphenation(h, w), w
