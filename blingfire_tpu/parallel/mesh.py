"""Multi-chip / multi-host scaling: data-parallel corpus tokenization.

The reference scales by running one process per core (README.md:105); the
TPU-native design instead shards the *corpus* over a device mesh while model
tables are replicated, and reduces global statistics (token counts, byte
counts, parity checksums) with XLA collectives over ICI/DCN
(SURVEY.md §2.8).  Tokenization is embarrassingly parallel across documents,
so the only cross-chip traffic is the statistics reduction.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("dp",))


@dataclass
class ShardedStats:
    total_tokens: int
    total_docs: int
    checksum: int  # xor-fold of ids, used as a cheap cross-host parity probe


class ShardedSpRunner:
    """Runs the [pos-dict] kernels (BPE or unigram) data-parallel over a
    mesh with psum'd stats.  Two input modes:

    - run(docs): classic doc-row layout, one document per row.
    - run_units(docs): the PRODUCTION dedup layout — native prep/dedup
      packs each batch's unique word-units into dense rows, and the row
      slab is sharded over the mesh (tokenization is embarrassingly
      parallel across rows; only statistics cross chips).
    """

    def __init__(self, tokenizer, mesh: Mesh | None = None):
        from ..runtime.host import SpTokenizer

        assert isinstance(tokenizer, SpTokenizer)
        self.tok = tokenizer
        self.mesh = mesh or data_parallel_mesh()
        self.n_dp = self.mesh.devices.size
        self._data_sh = NamedSharding(self.mesh, P("dp", None))
        self._vec_sh = NamedSharding(self.mesh, P("dp"))
        self._rep_sh = NamedSharding(self.mesh, P())
        self._step = self._build_step()

    def _build_step(self):
        from ..ops import bpe as bpe_ops
        from ..ops import unigram as uni_ops

        tables = self.tok.tables
        a_max = self.tok.a_max
        is_bpe = self.tok.is_bpe

        # Two separate jit programs, like ops/bpe.bpe_segment: compiling the
        # match walk together with its consumers makes XLA pick
        # pathological layouts and ~30x compile times.  Data-parallel shardings
        # propagate from the inputs through both programs (GSPMD), so the
        # walk outputs stay on their shards with no resharding in between.
        walk = jax.jit(lambda x, s, l: bpe_ops._walk_impl(tables, x, s, l))
        uni = jax.jit(
            lambda x, l, u: uni_ops.unigram_segment(tables, x, l, u),
            out_shardings=(
                self._data_sh, self._data_sh, self._data_sh, self._vec_sh
            ),
        ) if not is_bpe else None

        @functools.partial(
            jax.jit,
            out_shardings=(
                self._data_sh,  # ids
                self._data_sh,  # starts
                self._vec_sh,  # counts
                self._vec_sh,  # per-row device-fallback flags
                self._rep_sh,  # total tokens (replicated scalar)
                self._rep_sh,  # checksum
            ),
        )
        def resolve(m_pack, m_rank, slot_ov, is_spm, lengths, unk_id):
            ids, st, _en, counts, fb = bpe_ops._resolve_impl(
                tables, m_pack, m_rank, slot_ov, is_spm, lengths,
                unk_id, a_max,
            )
            # global statistics: XLA inserts the cross-shard reductions
            total = jnp.sum(counts)
            pos = jnp.arange(ids.shape[1], dtype=jnp.int32)[None, :]
            masked = jnp.where(pos < counts[:, None], ids, 0)
            # position-weighted wrap-around sum: order-sensitive, cheap to
            # psum, and stable across shardings of the same corpus
            weights = pos * jnp.int32(-1640531527) + 1  # Knuth multiplier
            checksum = jnp.sum(masked * weights, dtype=jnp.int32)
            return ids, st, counts, fb, total, checksum

        @functools.partial(
            jax.jit,
            out_shardings=(self._data_sh, self._data_sh, self._vec_sh,
                           self._vec_sh, self._rep_sh, self._rep_sh),
        )
        def stats_of(ids, st, counts):
            total = jnp.sum(counts)
            pos = jnp.arange(ids.shape[1], dtype=jnp.int32)[None, :]
            masked = jnp.where(pos < counts[:, None], ids, 0)
            weights = pos * jnp.int32(-1640531527) + 1
            checksum = jnp.sum(masked * weights, dtype=jnp.int32)
            fb = jnp.zeros(ids.shape[0], bool)  # unigram has no device fb
            return ids, st, counts, fb, total, checksum

        def step(x_iw, is_spm, lengths, unk_id):
            if is_bpe:
                m_pack, m_rank, slot_ov = walk(x_iw, is_spm, lengths)
                return resolve(
                    m_pack, m_rank, slot_ov, is_spm, lengths, unk_id
                )
            ids, st, _en, counts = uni(x_iw, lengths, unk_id)
            return stats_of(ids, st, counts)

        return step

    def run(self, docs: list[bytes], unk_id: int = 0):
        B = len(docs)
        pad = (-B) % self.n_dp
        docs = docs + [b""] * pad
        x, spm, lengths, _offs, _fb = self.tok._prep_batch(docs)
        xj = jax.device_put(jnp.asarray(x), self._data_sh)
        sj = jax.device_put(jnp.asarray(spm), self._data_sh)
        lj = jax.device_put(jnp.asarray(lengths), self._vec_sh)
        ids, _st, counts, _fbd, total, checksum = self._step(
            xj, sj, lj, jnp.int32(unk_id)
        )
        return ids, counts, ShardedStats(int(total), B, int(checksum))

    def run_units(self, docs: list[bytes], unk_id: int = 0, cache=None):
        """Production dedup layout, rows sharded over the mesh.  Returns
        (flat ids, bounds, need_fb, status, stats) — the encode_corpus_flat
        contract plus replicated global statistics.

        Reuses the UnitRunner pieces (native analyze/stitch, cross-batch
        cache); only the device pass differs: one mesh-sharded full-depth
        slab instead of bucketed per-class dispatches.  Device-fallback
        rows propagate into need_fb exactly like the single-chip path."""
        import numpy as np

        from .. import native
        from ..runtime import dedup as dd

        tok = self.tok
        runner = tok._unit_runner()
        nu = native.units_analyze(
            docs, tok.n_doc, tok._sym2iw, runner.spm_iw,
            tok.seg.use_raw_bytes, tok.seg.no_dummy_prefix, tok.seg.charmap,
            cache=cache,
        )
        R = max(nu.n_rows, 1)
        Rp = -(-R // self.n_dp) * self.n_dp
        bx = np.full((Rp, tok.n_doc), -1, np.int32)
        bl = np.zeros(Rp, np.int32)
        bx[: nu.n_rows] = nu.px
        bl[: nu.n_rows] = nu.plen
        xj = jax.device_put(jnp.asarray(bx), self._data_sh)
        lj = jax.device_put(jnp.asarray(bl), self._vec_sh)
        derive_spm, _po, pack_out_compact = dd._helpers()
        sj = jax.device_put(derive_spm(xj, runner.spm_iw), self._data_sh)
        ids, starts, counts, fbd, total, checksum = self._step(
            xj, sj, lj, jnp.int32(unk_id)
        )
        packed = np.asarray(pack_out_compact(ids, starts, counts, fbd))
        out = nu.stitch(
            np.ascontiguousarray(packed[: nu.n_rows]), dd.ID_SHIFT
        )
        stats = ShardedStats(int(total), len(docs), int(checksum))
        return (*out, nu.status, stats)


class ShardedWpRunner:
    """The bert hybrid's DEVICE stage (dense sub-token pass) data-parallel
    over a mesh: packed unit rows shard over 'dp', tables replicate, token
    counts psum (VERDICT r4 #4 — wp joins bpe/unigram in the sharded set).

    Host stages (native scan/intern, packing, stitch) are unchanged from
    WordPieceHybrid; this runner shards the row slab of one batch."""

    def __init__(self, wp, mesh: Mesh | None = None):
        from ..runtime.wp_hybrid import WordPieceHybrid

        assert isinstance(wp, WordPieceHybrid)
        assert wp.available() and wp._dense is not None
        self.wp = wp
        self.mesh = mesh or data_parallel_mesh()
        self.n_dp = self.mesh.devices.size
        self._data_sh = NamedSharding(self.mesh, P("dp", None))
        self._rep_sh = NamedSharding(self.mesh, P())
        rep = lambda t: jax.device_put(jnp.asarray(t), self._rep_sh)
        self.tables = jax.tree.map(rep, wp.tables)
        dnext, ow_perm, _perm, n_f, _n_reach = wp._dense
        self._dnext = rep(dnext)
        self._ow_perm = rep(ow_perm)
        self._n_f = n_f
        self._step_cache = {}

    def _step(self, lw: int):
        if lw in self._step_cache:
            return self._step_cache[lw]
        from ..ops import lexer as lexer_ops

        wp = self.wp

        @functools.partial(
            jax.jit,
            out_shardings=(self._data_sh, self._rep_sh, self._rep_sh),
        )
        def step(bx, bi):
            out = lexer_ops.wp_subword_pass_dense(
                self.tables, self._dnext, self._ow_perm, bx, bi,
                jnp.int32(wp._l_iw), jnp.int32(wp._r_iw), lw,
                self._n_f, wp._n_iws,
            )
            counts = out[:, -2]
            pos = jnp.arange(out.shape[1] - 2, dtype=jnp.int32)[None, :]
            masked = jnp.where(pos < counts[:, None], out[:, :-2], 0)
            weights = pos * jnp.int32(-1640531527) + 1
            return out, jnp.sum(counts), jnp.sum(masked * weights,
                                                 dtype=jnp.int32)

        self._step_cache[lw] = step
        return step

    def run_rows(self, bx: np.ndarray, bi: np.ndarray, lw: int):
        """Shard one packed row slab; returns (rows_out, total, checksum)."""
        R = bx.shape[0]
        Rp = -(-max(R, 1) // self.n_dp) * self.n_dp
        if Rp != R:
            bx = np.pad(bx, ((0, Rp - R), (0, 0)), constant_values=-1)
            bi = np.pad(bi, ((0, Rp - R), (0, 0)), constant_values=-1)
        bxj = jax.device_put(jnp.asarray(bx), self._data_sh)
        bij = jax.device_put(jnp.asarray(bi), self._data_sh)
        out, total, checksum = self._step(lw)(bxj, bij)
        return np.asarray(out)[:R], int(total), int(checksum)


# Backwards-compatible name (r2/r3 API); BPE-only assertion dropped.
ShardedBpeRunner = ShardedSpRunner
