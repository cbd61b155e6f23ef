"""Sharded runner on the virtual 8-device CPU mesh: correctness + shardings."""

from __future__ import annotations

import jax
import numpy as np

from corpus import full_corpus

from blingfire_tpu.parallel.mesh import ShardedBpeRunner, data_parallel_mesh
from blingfire_tpu.runtime.host import SpTokenizer
from blingfire_tpu.runtime.oracle import SpTokenizerOracle


def test_sharded_bpe_matches_oracle(gpt2_model):
    assert len(jax.devices()) == 8, "conftest should force 8 virtual devices"
    tok = SpTokenizer(gpt2_model, max_doc_symbols=128)
    runner = ShardedBpeRunner(tok, mesh=data_parallel_mesh(8))
    docs = [l.encode() for l in full_corpus(n_random=24) if l and len(l) < 100]
    docs = docs[:48]
    ids, counts, stats = runner.run(docs)
    ids = np.asarray(ids)
    counts = np.asarray(counts)
    oracle = SpTokenizerOracle(gpt2_model.seg)
    total = 0
    for i, d in enumerate(docs):
        want = oracle.text_to_ids(d)
        got = ids[i, : counts[i]].tolist()
        assert got == want, d
        total += len(want)
    assert stats.total_tokens == total


def test_sharded_output_sharding(gpt2_model):
    tok = SpTokenizer(gpt2_model, max_doc_symbols=128)
    runner = ShardedBpeRunner(tok, mesh=data_parallel_mesh(8))
    docs = [b"hello world"] * 16
    ids, counts, stats = runner.run(docs)
    # outputs stay sharded over dp — no implicit gather
    assert len(ids.sharding.device_set) == 8
    assert stats.total_tokens > 0


def test_sharded_units_bpe_matches_oracle(gpt2_model):
    """Production dedup layout sharded over the mesh == oracle per doc."""
    from blingfire_tpu import native

    if not native.available():
        import pytest

        pytest.skip("no native toolchain")
    tok = SpTokenizer(gpt2_model, max_doc_symbols=128)
    runner = ShardedBpeRunner(tok, mesh=data_parallel_mesh(8))
    docs = [l.encode() for l in full_corpus(n_random=24) if l and len(l) < 100]
    docs = docs[:48]
    ids, bounds, need, status, stats = runner.run_units(docs)
    oracle = SpTokenizerOracle(gpt2_model.seg)
    for i, d in enumerate(docs):
        if need[i]:
            continue  # rare: handled by host fallback in the full pipeline
        want = oracle.text_to_ids(d)
        got = ids[bounds[i] : bounds[i + 1]].tolist()
        assert got == want, d


def test_sharded_unigram_matches_oracle(xlnet_model):
    tok = SpTokenizer(xlnet_model, max_doc_symbols=128)
    runner = ShardedBpeRunner(tok, mesh=data_parallel_mesh(4))
    docs = [l.encode() for l in full_corpus(n_random=12) if l and len(l) < 100]
    docs = docs[:24]
    ids, counts, stats = runner.run(docs)
    ids = np.asarray(ids)
    counts = np.asarray(counts)
    oracle = SpTokenizerOracle(xlnet_model.seg)
    for i, d in enumerate(docs):
        want = oracle.text_to_ids(d)
        got = ids[i, : counts[i]].tolist()
        assert got == want, d


def test_checksum_stable_across_mesh_sizes(gpt2_model):
    """The psum'd parity checksum is sharding-independent."""
    tok = SpTokenizer(gpt2_model, max_doc_symbols=128)
    docs = [b"hello world this is a line of text"] * 8
    sums = set()
    for n in (1, 2, 8):
        runner = ShardedBpeRunner(tok, mesh=data_parallel_mesh(n))
        _, _, stats = runner.run(docs)
        sums.add(stats.checksum)
    assert len(sums) == 1


def test_sharded_wp_runner():
    """bert hybrid device stage sharded over the mesh: identical packed
    output rows and checksum across mesh sizes (VERDICT r4 #4)."""
    import pytest

    from blingfire_tpu.models.loader import load_model
    from blingfire_tpu.parallel.mesh import ShardedWpRunner
    from blingfire_tpu.runtime.wp_hybrid import ROW_W, WordPieceHybrid

    path = "/root/reference/ldbsrc/ldb/bert_base_cased_tok.bin"
    wp = WordPieceHybrid(load_model(path), path)
    if not (wp.available() and wp._dense is not None):
        pytest.skip("wp hybrid unavailable")
    word = wp._map_raw(np.array([ord(c) for c in "hello"], np.int32))
    ext = len(word) + 2
    per = ROW_W // ext
    bx = np.full((8, ROW_W), -1, np.int32)
    bi = np.full((8, ROW_W), -1, np.int32)
    perm = wp._dense[2]
    fini = next(int(perm[f]) for f in wp.engine.fn2ini[1:]
                if f is not None and f >= 0)
    for k in range(per):
        o = k * ext
        bx[:, o] = wp._l_iw
        bx[:, o + 1 : o + 1 + len(word)] = word[None, :]
        bx[:, o + ext - 1] = wp._r_iw
        bi[:, o : o + ext] = fini
    outs, sums = [], set()
    for n in (1, 2, 8):
        runner = ShardedWpRunner(wp, mesh=data_parallel_mesh(n))
        rows, total, checksum = runner.run_rows(bx, bi, 16 + 2)
        assert total > 0
        outs.append(rows)
        sums.add(checksum)
    assert len(sums) == 1
    assert np.array_equal(outs[0], outs[1]) and np.array_equal(outs[0], outs[2])
