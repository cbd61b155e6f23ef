"""Offline dict-compiler round trips, cross-checked against BOTH runtimes."""

from __future__ import annotations

import ctypes

import numpy as np
import pytest

import reference_lib as ref
from corpus import full_corpus

from blingfire_tpu.compiler.dict import (
    DictModelSpec,
    VocabEntry,
    compile_dict_model,
    compile_i2w_model,
)
from blingfire_tpu.formats.consts import TokAlgo
from blingfire_tpu.models.loader import Model, load_model
from blingfire_tpu.runtime.oracle import SpTokenizerOracle

CORPUS = [l for l in full_corpus(n_random=30) if l]


def enumerate_vocab(model: Model) -> list[VocabEntry]:
    """All accepted chains + (id, score) from a loaded [pos-dict] model."""
    aut = model.seg.aut
    order = np.argsort(aut.edge_src, kind="stable")
    src_s = aut.edge_src[order]
    iw_s = aut.edge_iw[order]
    dst_s = aut.edge_dst[order]
    ow_s = aut.edge_ow[order]
    row = np.searchsorted(src_s, np.arange(aut.n_states + 1))
    out = []
    stack = [(0, (), 0)]
    while stack:
        s, chain, sow = stack.pop()
        if aut.final[s]:
            out.append(
                VocabEntry(
                    chain,
                    int(model.seg.i2info_ids[sow]),
                    float(model.seg.i2info_scores[sow]),
                )
            )
        for ei in range(row[s], row[s + 1]):
            d = dst_s[ei]
            if d >= 0:
                stack.append((int(d), chain + (int(iw_s[ei]),), sow + int(ow_s[ei])))
    return out


def _roundtrip(name: str, spec_kw: dict, lines):
    src = load_model(f"/root/reference/ldbsrc/ldb/{name}.bin")
    entries = enumerate_vocab(src)
    charmap = None
    if src.seg.charmap is not None:
        cm = src.seg.charmap
        charmap = {}
        for k in range(cm.min_key, cm.max_key + 1):
            v = cm.get(k)
            if v is not None:
                charmap[k] = [int(x) for x in v]
    blob = compile_dict_model(
        DictModelSpec(entries=entries, charmap=charmap, **spec_kw)
    )

    # our runtime
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        ours = load_model(path)
    finally:
        os.unlink(path)
    o_src = SpTokenizerOracle(src.seg)
    o_new = SpTokenizerOracle(ours.seg)
    for line in lines:
        assert o_new.text_to_ids(line.encode()) == o_src.text_to_ids(line.encode()), line

    # reference runtime
    lib = ref._lib()
    buf = ctypes.create_string_buffer(blob, len(blob))
    h_new = lib.SetModel(buf, ctypes.c_int(len(blob)))
    assert h_new
    h_src = ref.load_model(f"{name}.bin")
    for line in lines:
        a = ref.text_to_ids(h_src, line.encode(), 4096).tolist()
        b = ref.text_to_ids(h_new, line.encode(), 4096).tolist()
        assert a == b, line


def test_compile_gpt2_roundtrip():
    _roundtrip(
        "gpt2",
        dict(tok_algo=TokAlgo.BPE_OPT, id_offset=-1, use_byte_encoding=True),
        CORPUS,
    )


def test_compile_xlnet_roundtrip():
    _roundtrip("xlnet", dict(tok_algo=TokAlgo.DEFAULT), CORPUS[:40])


def test_compile_tiny_vocab():
    entries = [
        VocabEntry((0x2581,), 1, -1.0),
        VocabEntry((0x2581, ord("a")), 2, -2.0),
        VocabEntry((ord("a"),), 3, -3.0),
        VocabEntry((ord("b"),), 4, -4.0),
        VocabEntry((ord("a"), ord("b")), 5, -5.0),
    ]
    blob = compile_dict_model(
        DictModelSpec(entries=entries, tok_algo=TokAlgo.BPE_OPT, id_offset=-1)
    )
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        m = load_model(path)
    finally:
        os.unlink(path)
    o = SpTokenizerOracle(m.seg)
    lib = ref._lib()
    buf = ctypes.create_string_buffer(blob, len(blob))
    h = lib.SetModel(buf, ctypes.c_int(len(blob)))
    for text in [b"ab", b"a b", b"ba", b"aabb", b"b a"]:
        assert o.text_to_ids(text) == ref.text_to_ids(h, text, 64).tolist(), text


def test_compile_i2w():
    strings = [b"tok%d" % i for i in range(100)]
    blob = compile_i2w_model(strings, token_id_max=98)
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".i2w", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        m = load_model(path)
    finally:
        os.unlink(path)
    assert m.i2w.count == 100
    assert m.i2w.get(7) == b"tok7"
    assert m.i2w.max_token_id == 98
