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
