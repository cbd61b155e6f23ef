"""Property/fuzz tests: novel random vocabularies compiled with our offline
toolchain must behave identically under our runtime and the reference
runtime.  This exercises compiler+runtime correctness far outside the shipped
models."""

from __future__ import annotations

import ctypes
import random

import pytest

import reference_lib as ref

from blingfire_tpu.compiler.dict import DictModelSpec, VocabEntry, compile_dict_model
from blingfire_tpu.formats.consts import TokAlgo
from blingfire_tpu.models.loader import LdbContainer
from blingfire_tpu.runtime.oracle import SpTokenizerOracle


def _rand_vocab(rng: random.Random, n: int, byte_mode: bool):
    chains = set()
    # guarantee full single-symbol coverage like real BPE models
    alphabet = list(range(1, 127)) + [0x2581]
    if not byte_mode:
        alphabet += [0x410, 0x411, 0x4E2D]
    for a in alphabet:
        chains.add((a,))
    while len(chains) < n:
        ln = rng.randint(2, 8)
        chains.add(tuple(rng.choice(alphabet) for _ in range(ln)))
    entries = []
    for i, ch in enumerate(sorted(chains)):
        entries.append(VocabEntry(ch, i + 1, -float(i + 1)))
    return entries


def _rand_texts(rng: random.Random, n: int):
    out = []
    pool = "abcdefg hij klm  nopqrs tuv wxyz  0123456789 .,!? АБВ中"
    for _ in range(n):
        out.append("".join(rng.choice(pool) for _ in range(rng.randint(1, 80))))
    return out


@pytest.mark.parametrize("algo", [TokAlgo.BPE_OPT, TokAlgo.BPE_OPT_WITH_MERGES, TokAlgo.DEFAULT])
@pytest.mark.parametrize("seed", [0, 1])
def test_random_model_cross_runtime(algo, seed):
    rng = random.Random(seed * 100 + int(algo))
    byte_mode = algo == TokAlgo.BPE_OPT and seed % 2 == 0
    entries = _rand_vocab(rng, 400, byte_mode)
    spec = DictModelSpec(
        entries=entries,
        tok_algo=algo,
        id_offset=rng.choice([0, -1]),
        use_byte_encoding=byte_mode,
        no_dummy_prefix=rng.choice([False, True]),
    )
    blob = compile_dict_model(spec)

    # our runtime
    import io, tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        from blingfire_tpu.models.loader import load_model

        ours = SpTokenizerOracle(load_model(path).seg)
    finally:
        os.unlink(path)

    # reference runtime
    lib = ref._lib()
    buf = ctypes.create_string_buffer(blob, len(blob))
    h = lib.SetModel(buf, ctypes.c_int(len(blob)))
    assert h

    for text in _rand_texts(rng, 60):
        data = text.encode()
        got = ours.text_to_ids(data, max_len=2048)
        want = ref.text_to_ids(h, data, max_len=2048).tolist()
        assert got == want, (algo, seed, text)


def test_random_model_device_kernel():
    rng = random.Random(42)
    entries = _rand_vocab(rng, 300, byte_mode=False)
    spec = DictModelSpec(entries=entries, tok_algo=TokAlgo.BPE_OPT, id_offset=-1)
    blob = compile_dict_model(spec)
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        from blingfire_tpu.models.loader import load_model
        from blingfire_tpu.runtime.host import SpTokenizer

        m = load_model(path)
    finally:
        os.unlink(path)
    tok = SpTokenizer(m, max_doc_symbols=128)
    oracle = SpTokenizerOracle(m.seg)
    texts = [t.encode() for t in _rand_texts(rng, 40) if len(t) < 100]
    got = tok.encode_batch(texts)
    for t, g in zip(texts, got):
        assert g == oracle.text_to_ids(t), t
