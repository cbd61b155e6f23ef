"""Vectorized (byte-)BPE segmentation for TPU.

Reformulates the reference's sequential per-string algorithm
(FATokenSegmentationTools_1best_bpe_t.h:125-316 and
…_bpe_with_merges_t.h:150-316) as batched tensor ops:

  1. WALK     — every input position advances through the vocabulary Mealy
                automaton in lockstep (one comb-table gather step per depth),
                recording matches BY DEPTH (slot d = match of length d+1).
  2. FILTER   — the "bpe-opt" whole-token optimisation, fast-forward skips
                and unknown-run merging, reproduced with closed-form masks +
                one O(N) scan (visited positions).
  3. SORT     — arcs ordered by (merge-rank desc,) id asc, start asc with a
                single multi-key lexicographic sort per document.
  4. CLAIM    — the greedy non-overlap resolution as a scan over sorted arcs
                with a per-document *bitmask* carry (32 positions per lane),
                O(1) work per arc per document.
  5. EMIT     — claimed arcs scattered to their start position and compacted.

Everything is fixed-shape and jit-compatible; thousands of documents are
processed per call.  Documents that exceed the static match/arc budgets are
flagged for the host fallback path (exactly reproducing reference semantics
there too).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tables import CombTable

INT32_MAX = np.int32(2**31 - 1)

import os


def _gather_mode() -> bool:
    """Prefer sort/gather/reduction formulations over scatters (TPU)."""
    v = os.environ.get("BTL_GATHER", "auto")
    if v == "1":
        return True
    if v == "0":
        return False
    return jax.default_backend() == "tpu"


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BpeDeviceTables:
    """Device-resident model tables for the BPE kernel (all jnp arrays)."""

    base: jax.Array  # int32[n_states]
    owner: jax.Array  # int32[slots]
    nxt: jax.Array  # int32[slots]
    ow: jax.Array  # int32[slots]
    final: jax.Array  # bool[n_states]
    ids_tab: jax.Array  # int32[nkeys]
    ranks_tab: jax.Array  # float32[nkeys]
    # optional vocabulary-trie expansion (ops/tables.py::build_trie_table):
    # final nodes are numbered BY token id, so the walk is ONE gather per
    # step instead of five (owner/nxt/ow/final/ids) — the XLA gather is the
    # TPU bottleneck of the whole kernel
    trie_next: jax.Array | None
    rank_by_id: jax.Array | None
    # merge-PRIORITY mode (round 5): when every real rank is negative (the
    # dict compiler negates merge ranks; unknown arcs carry rank 0.0f and
    # sort first — …_bpe_with_merges_t.h:229,247), (rank desc, id asc) is a
    # fixed permutation of the vocabulary.  Trie finals are renumbered by
    # that priority (0 = unknown), so the merges kernel needs NO rank
    # arrays or extra sort keys — identical cost to plain bpe-opt — and
    # ids are recovered at emit through this table (+ id_offset baked out).
    prio2id: jax.Array | None
    n_slots: int = field(metadata=dict(static=True))
    max_len: int = field(metadata=dict(static=True))  # walk depth bound
    with_merges: bool = field(metadata=dict(static=True))
    fast: bool = field(metadata=dict(static=True))
    id_offset: int = field(metadata=dict(static=True))
    trie_root: int = field(metadata=dict(static=True), default=-1)
    trie_v: int = field(metadata=dict(static=True), default=0)
    trie_a: int = field(metadata=dict(static=True), default=0)


def make_device_tables(
    table: CombTable,
    ids: np.ndarray,
    ranks: np.ndarray,
    max_len: int,
    with_merges: bool,
    fast: bool,
    id_offset: int,
    trie=None,  # (edge_idx, edge_val, rank_by_id, root, n_nodes)
) -> BpeDeviceTables:
    assert int(ids.max(initial=0)) < (1 << 20), "ids must fit the packed-slot layout"
    assert max_len <= 128, "token depth must fit the packed-slot layout"
    trie_next = rank_by_id = prio2id = None
    trie_root, trie_v = -1, 0
    if trie is not None:
        edge_idx, edge_val, rk, trie_root, n_nodes = trie
        A = table.n_iws
        V = int(ids.max(initial=-1)) + 1
        if with_merges and len(ranks) and float(ranks.max()) < 0.0:
            # merge-priority numbering (see BpeDeviceTables.prio2id): sort
            # vocab entries by (rank desc, id asc); priority p+1 = p-th entry
            # (0 reserved for unknown, which outranks every negative rank)
            order = np.lexsort((ids.astype(np.int64), -ranks))
            prio_of = np.zeros(V, np.int64)
            prio_of[ids[order].astype(np.int64)] = 1 + np.arange(len(order))
            unused = np.flatnonzero(prio_of == 0)  # ids never emitted
            prio_of[unused] = 1 + len(order) + np.arange(len(unused))
            n_prio = 1 + V
            assert n_prio < (1 << 20), "priorities must fit the slot layout"
            shift = n_prio - V  # internal nodes move up by one
            node = edge_idx // A
            ciw = edge_idx % A
            nodes_m = np.where(node < V, prio_of[np.minimum(node, V - 1)],
                               node + shift)
            vals_m = np.where(edge_val < V,
                              prio_of[np.minimum(edge_val, V - 1)],
                              edge_val + shift).astype(np.int32)
            edge_idx = nodes_m * A + ciw
            edge_val = vals_m
            trie_root = (int(prio_of[trie_root]) if trie_root < V
                         else trie_root + shift)
            trie_v = n_prio
            size = (n_nodes + shift) * A
            p2i = np.zeros(n_prio, np.int32)
            p2i[prio_of] = np.arange(V)
            prio2id = jnp.asarray(p2i, jnp.int32)
        else:
            trie_v = V
            size = n_nodes * A
            rank_by_id = jnp.asarray(rk, jnp.float32)
        trie_next = _densify_trie_on_device(edge_idx, edge_val, size)
    return BpeDeviceTables(
        base=jnp.asarray(table.base, jnp.int32),
        owner=jnp.asarray(table.owner, jnp.int32),
        nxt=jnp.asarray(table.nxt, jnp.int32),
        ow=jnp.asarray(table.ow, jnp.int32),
        final=jnp.asarray(table.final),
        ids_tab=jnp.asarray(ids, jnp.int32),
        ranks_tab=jnp.asarray(ranks, jnp.float32),
        trie_next=trie_next,
        rank_by_id=rank_by_id,
        prio2id=prio2id,
        n_slots=table.n_slots,
        max_len=max_len,
        with_merges=with_merges,
        fast=fast,
        id_offset=id_offset,
        trie_root=trie_root,
        trie_v=trie_v,
        trie_a=table.n_iws,
    )


@functools.partial(jax.jit, static_argnames=("size",))
def _scatter_trie(idx, vals, size: int):
    return jnp.full(size, -1, jnp.int32).at[idx].set(vals)


def _densify_trie_on_device(edge_idx, edge_val, size: int) -> jax.Array:
    """Ship the vocabulary trie as CSR and densify with one device scatter.

    The dense gpt2 trie is ~100 MB but holds only ~98k real edges (~0.8 MB
    as (index, value) pairs).  Uploading the dense array through the
    tunneled backend cost ~55 s of every process's first dispatch — the
    round-4 "cold start" was table transfer, not compilation.  The scatter
    builds the dense table ON DEVICE from a ~1.6 MB transfer."""
    return _scatter_trie(
        jnp.asarray(np.asarray(edge_idx, np.int64).astype(np.int32)),
        jnp.asarray(np.asarray(edge_val, np.int32)),
        int(size),
    )


def _float_desc_key(r: jax.Array) -> jax.Array:
    """Map float32 to int32 so ascending int order == descending float order."""
    bits = jax.lax.bitcast_convert_type(r, jnp.int32)
    asc = jnp.where(bits < 0, jnp.int32(~bits), bits ^ jnp.int32(-0x80000000))
    return ~asc  # descending


def _bitonic_swap_j(a: jax.Array, j: int) -> jax.Array:
    """Partner values v[i ^ j] along the last axis (j a power of two)."""
    B, n = a.shape
    r = a.reshape(B, n // (2 * j), 2, j)
    return jnp.flip(r, axis=2).reshape(B, n)


def _bitonic_sort(keys: tuple, payload: tuple = ()) -> tuple:
    """Ascending lexicographic bitonic sort network over the last axis.

    All arrays are (B, n) with n a power of two; ``keys`` order the rows,
    ``payload`` arrays are permuted identically.  Pure min/max + reshape
    stages — orders of magnitude faster on TPU than jax.lax.sort, which
    dominated this kernel's runtime AND compile time.
    """
    arrays = list(keys) + list(payload)
    nk = len(keys)
    n = arrays[0].shape[1]
    assert n & (n - 1) == 0, "bitonic size must be a power of two"
    iota = jnp.arange(n, dtype=jnp.int32)[None, :]
    k = 2
    while k <= n:
        j = k >> 1
        while j >= 1:
            partners = [_bitonic_swap_j(a, j) for a in arrays]
            # lexicographic "self <= partner" over the key arrays
            le = None
            eq = None
            for v, p in zip(arrays[:nk], partners[:nk]):
                lt = v < p
                le = lt if le is None else le | (eq & lt)
                eq = (v == p) if eq is None else eq & (v == p)
            le = le | eq
            up = (iota & k) == 0  # ascending block
            lo_half = (iota & j) == 0
            take_small = lo_half == up
            sel_self = take_small == le  # keep own value when it is on the
            # correct side of the pair ordering
            arrays = [
                jnp.where(sel_self, v, p) for v, p in zip(arrays, partners)
            ]
            j >>= 1
        k <<= 1
    return tuple(arrays)


L_REC = 32  # recorded match-depth slots: matches are stored BY DEPTH, one
# (B, N) slice write per walk step (an earlier per-ordinal K1-slot layout
# needed a 12-wide onehot select every step — ~half the walk's VPU work).
# Tokens deeper than L_REC flag the row for host fallback (none of the
# shipped vocabularies produce one on realistic text; the walk still runs
# to tables.max_len so the flag is exact).


def _walk_impl(
    tables: BpeDeviceTables,
    x_iw: jax.Array,  # int32 (B, N) dense input weights, -1 = no-transition
    is_spm: jax.Array,  # bool (B, N) raw symbol == U+2581
    lengths: jax.Array,  # int32 (B,)
    lw: int | None = None,  # static walk-depth cap (None = min(L, L_REC))
    bounded: bool = False,  # caller guarantees no match can exceed lw
):
    """WALK phase: returns (m_pack, m_rank, slot_overflow).

    m_pack (lw, B, N) int32: slot d holds the match of length d+1
    starting at that position (-1 = none), packed as
      bits 0..19  token id (vocabularies < 2^20, checked at build)
      bit  27     whole-token flag (next symbol is ▁/EOS)
    The match's end position is implicit: pos + d.

    The depth loop is UNROLLED: on the tunneled TPU backend every
    lax.while_loop iteration re-stages the loop-invariant model tables
    (~5 ms/iteration with the 100 MB gpt2 trie — 3x the cost of the
    gather itself), so a static unrolled chain is strictly faster.
    ``bounded=True`` (legal when every packed unit in the batch is known
    to be <= lw symbols and the vocabulary is chunk-safe, so no match can
    cross a unit boundary) skips the deeper-match overflow flag."""
    B, N = x_iw.shape
    L = tables.max_len
    LW = min(L, L_REC) if lw is None else min(lw, L)
    pos = jnp.arange(N, dtype=jnp.int32)
    valid = pos[None, :] < lengths[:, None]  # (B, N)

    # padded symbol / delimiter-or-end lookups for depth-shifted access
    x_pad = jnp.pad(x_iw, ((0, 0), (0, LW + 1)), constant_values=-1)
    posl = jnp.arange(N + LW + 1, dtype=jnp.int32)
    spm_or_end = jnp.pad(is_spm, ((0, 0), (0, LW + 1))) | (
        posl[None, :] >= lengths[:, None]
    )

    nkeys = tables.ids_tab.shape[0]
    use_trie = tables.trie_next is not None
    V = tables.trie_v
    A = tables.trie_a

    init0 = tables.trie_root if use_trie else 0
    # NOTE: comb initial state id is 0 by construction (densify_automaton)
    state = jnp.where(valid & (x_iw >= 0), init0, -1).astype(jnp.int32)
    sum_ow = jnp.zeros((B, N), jnp.int32)
    packs = []
    ranks = []
    for d in range(LW):
        c = x_pad[:, d : d + N]
        if use_trie:
            # vocabulary-trie step: ONE gather; node < V means "final with
            # token id == node index"
            flat = jnp.clip(
                jnp.maximum(state, 0) * A + jnp.maximum(c, 0),
                0,
                tables.trie_next.shape[0] - 1,
            )
            ns = jnp.where(
                (state >= 0) & (c >= 0), tables.trie_next[flat], -1
            )
            fin = (ns >= 0) & (ns < V)
            mid = jnp.maximum(ns, 0)
        else:
            s_safe = jnp.maximum(state, 0)
            c_safe = jnp.maximum(c, 0)
            slot = jnp.clip(tables.base[s_safe] + c_safe, 0, tables.n_slots - 1)
            hit = (tables.owner[slot] == state) & (state >= 0) & (c >= 0)
            ns = jnp.where(hit, tables.nxt[slot], -1)
            sum_ow = sum_ow + jnp.where(hit, tables.ow[slot], 0)
            fin = (ns >= 0) & tables.final[jnp.maximum(ns, 0)]
            key = jnp.clip(sum_ow, 0, nkeys - 1)
            mid = tables.ids_tab[key]

        nxt_spm = spm_or_end[:, d + 1 : d + 1 + N]
        packs.append(
            jnp.where(fin, mid | (nxt_spm.astype(jnp.int32) << 27), -1)
        )
        # priority mode: mid IS the merge priority — no rank gathers at all
        if tables.with_merges and tables.prio2id is None:
            if use_trie:
                ranks.append(tables.rank_by_id[jnp.clip(mid, 0, V - 1)])
            else:
                ranks.append(tables.ranks_tab[jnp.clip(sum_ow, 0, nkeys - 1)])
        state = ns

    m_pack = jnp.stack(packs)
    m_rank = (
        jnp.stack(ranks) if ranks
        else jnp.zeros((1, 1, 1), jnp.float32)
    )
    # a still-alive state at the cap == a potential deeper match
    if L > LW and not bounded:
        slot_overflow = state >= 0
    else:
        slot_overflow = jnp.zeros((B, N), bool)
    return m_pack, m_rank, slot_overflow


def _resolve_impl(
    tables: BpeDeviceTables,
    m_pack: jax.Array,  # int32 (L_REC, B, N) packed match-by-depth slots
    m_rank: jax.Array,  # float32 (L_REC, B, N) or (1,1,1)
    slot_overflow: jax.Array,  # bool (B, N)
    is_spm: jax.Array,
    lengths: jax.Array,
    unk_id: jax.Array,
    a_max: int,
):
    """FILTER+SORT+CLAIM+EMIT phases on the walk's match slots."""
    LR, B, N = m_pack.shape
    pos = jnp.arange(N, dtype=jnp.int32)
    valid = pos[None, :] < lengths[:, None]  # (B, N)
    dslot = jnp.arange(LR, dtype=jnp.int32)[:, None, None]  # (LR, 1, 1)

    # profiling aid: BTL_BPE_PHASE=filter|sort|claim truncates the graph after
    # that phase (outputs keep a live data dependency so nothing is DCE'd)
    _phase = os.environ.get("BTL_BPE_PHASE", "")

    def _phase_out(live):
        # RAW live checksum — do NOT wrap in x*0 / min(x,0): XLA folds both
        # and dead-code-eliminates the entire phase being measured
        z = live.astype(jnp.int32)
        a = jnp.zeros((B, 1), jnp.int32) + z
        return a, a, a, z + jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool)

    valid_slot = m_pack >= 0  # (LR, B, N)
    m_id = m_pack & 0xFFFFF
    m_end = pos[None, None, :] + dslot  # slot d = match of length d+1
    m_whole = valid_slot & (((m_pack >> 27) & 1) == 1)

    # ---------------------------------------------------------------- FILTER
    # all slot-wise ops stay in (LR, B, N) layout (lane dim = N)
    has = jnp.any(valid_slot, axis=0)

    if tables.fast:
        # whole-token optimisation fires for slot d when the start is a ▁,
        # the match ends right before a ▁/EOS, and a SHORTER match exists
        # (matches are enumerated in depth order, so "an earlier match" ==
        # "a valid slot at smaller depth"; …_bpe_t.h:189-206)
        prev_valid = (
            jnp.cumsum(valid_slot.astype(jnp.int32), axis=0) - valid_slot
        ) > 0
        fired = m_whole & is_spm[None] & prev_valid
        dlast = jnp.max(jnp.where(fired, dslot, -1), axis=0)  # (B, N)
        ff = jnp.where(dlast >= 0, pos[None, :] + dlast, pos[None, :])
        survive = valid_slot & (dslot >= dlast[None])
    else:
        ff = jnp.broadcast_to(pos[None, :], (B, N))
        survive = valid_slot

    # visited start positions under sequential fast-forwarding.  Closed form:
    # a skip region (q, ff[q]] hides the positions after a fired whole-token
    # start q, so visited[p] = max_{q<p} ff[q] < p (exclusive cummax).  This
    # is exact unless a fired start q' INSIDE another skip region extends
    # coverage further (ff[q'] > running max) — only possible with vocabulary
    # tokens spanning multiple ▁-words; such documents fall back.
    ff_eff = jnp.where(ff > pos[None, :], ff, -1)
    cummax_incl = jax.lax.cummax(ff_eff, axis=1)
    cover_before = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), cummax_incl[:, :-1]], axis=1
    )
    visited = (cover_before < pos[None, :]) & valid  # (B, N)
    anomaly = jnp.any(
        (ff_eff >= 0) & (cover_before >= pos[None, :]) & (ff_eff > cover_before),
        axis=1,
    )

    survive = survive & visited[None]

    # unknown runs: consecutive visited positions with no match
    unk = visited & ~has
    prev_unk = jnp.pad(unk[:, :-1], ((0, 0), (1, 0)))
    next_unk = jnp.pad(unk[:, 1:], ((0, 0), (0, 1)))
    run_start = unk & ~prev_unk
    run_endpt = unk & ~next_unk
    # run end for each run-start position: reverse cumulative min of endpoint
    # positions (every position between start and endpoint is unk)
    endpos = jnp.where(run_endpt, pos[None, :], INT32_MAX)
    run_end = jnp.flip(
        jax.lax.cummin(jnp.flip(endpos, axis=1), axis=1), axis=1
    )

    # ------------------------------------------------------------------ SORT
    # sort order: (merge-rank desc,) id asc, start asc.  In merge-priority
    # mode the walk already emitted priorities (0 = unknown, ascending ==
    # (rank desc, id asc)) so a single key replicates the full order.
    use_prio = tables.prio2id is not None
    use_rank = tables.with_merges and not use_prio
    n_arcs = jnp.sum(survive, axis=(0, 2)) + jnp.sum(run_start, axis=1)
    arc_overflow = n_arcs > a_max
    max_id = (
        tables.trie_v + 1 if use_prio
        else int(tables.ids_tab.shape[0]) + abs(tables.id_offset) + 2
    )
    depth_bits = max(N - 1, 1).bit_length()  # unknown runs span up to N-1
    dmask = (1 << depth_bits) - 1
    # geometry packs into the low bits; ids pack too when small enough
    packable = (max_id + 2) * N < (1 << (31 - depth_bits))

    if _phase == "filter":
        return _phase_out(
            jnp.sum(survive) + jnp.sum(run_end) + jnp.sum(n_arcs)
        )

    if _gather_mode():
        # TPU: row gathers cost ~9 ns/element, so the former binary-search
        # compaction (log2(NS) take_along_axis passes over (B, a_max)) was
        # the single most expensive stage of the whole kernel.  Instead:
        #   1. PRE-COMPACT the surviving depth slots to K2 ordinals per
        #      position with one-hot sums over the small LR axis — pure
        #      VPU select/add work, no gathers;
        #   2. SORT the compact (B, K2*N + N) key slab directly with the
        #      bitonic min/max network and take the first a_max entries
        #      (invalid keys sort to the end as INT32_MAX).
        K2 = 12  # max surviving matches per start (deeper ones are rare:
        # the whole-token filter already discards shorter-than-dlast slots)
        csum = jnp.cumsum(survive.astype(jnp.int32), axis=0)  # (LR, B, N)
        cnt = csum[-1]  # (B, N)
        k2_overflow = jnp.any(cnt > K2, axis=1)

        ids_safe = jnp.minimum(m_id, jnp.int32(max_id))
        if packable:
            key_full = ((ids_safe * jnp.int32(N) + pos[None, None, :])
                        << depth_bits) | dslot
            per_slot = (key_full,)
        else:
            geo = (pos[None, None, :] << depth_bits) | dslot
            per_slot = (ids_safe, jnp.broadcast_to(geo, (LR, B, N)))
        if use_rank:
            per_slot = (_float_desc_key(m_rank),) + per_slot

        cols = [[] for _ in per_slot]
        for j in range(K2):
            sel = survive & (csum == (j + 1))
            have = cnt >= (j + 1)
            for ki, arr in enumerate(per_slot):
                v = jnp.sum(jnp.where(sel, arr, 0), axis=0)
                cols[ki].append(jnp.where(have, v, INT32_MAX))

        # unknown-run arcs occupy one extra N-wide column block (priority
        # mode: priority 0 — unknown rank 0.0f outranks all negative ranks)
        u_depth = jnp.clip(jnp.minimum(run_end, N - 1) - pos[None, :], 0, dmask)
        unk_c = (jnp.int32(0) if use_prio
                 else jnp.minimum(unk_id, jnp.int32(max_id)))
        if packable:
            u_key = ((unk_c * jnp.int32(N) + pos[None, :]) << depth_bits) | u_depth
            u_cols = (u_key,)
        else:
            u_cols = (
                jnp.broadcast_to(unk_c, (B, N)),
                (pos[None, :] << depth_bits) | u_depth,
            )
        if use_rank:
            u_cols = (_float_desc_key(jnp.zeros((B, N), jnp.float32)),) + u_cols
        for ki, arr in enumerate(u_cols):
            cols[ki].append(jnp.where(run_start, arr, INT32_MAX))

        NS2 = (K2 + 1) * N
        P2 = 1 << (NS2 - 1).bit_length()
        keys = tuple(
            jnp.concatenate(
                c + [jnp.full((B, P2 - NS2), INT32_MAX, jnp.int32)], axis=1
            )
            for c in cols
        )
        skeys = _bitonic_sort(keys)
        skeys = tuple(k[:, :a_max] for k in skeys)
        s_valid = skeys[-1] != INT32_MAX
        if packable:
            skey = skeys[-1]
            sk = jnp.where(s_valid, skey >> depth_bits, 0)
            s_start = sk % jnp.int32(N)
            s_id = sk // jnp.int32(N)
            s_end = s_start + jnp.where(s_valid, skey & dmask, 0)
        else:
            s_id = jnp.where(s_valid, skeys[-2], 0)
            sgeo = jnp.where(s_valid, skeys[-1], 0)
            s_start = sgeo >> depth_bits
            s_end = s_start + (sgeo & dmask)
        fallback_extra = k2_overflow
    else:
        fallback_extra = jnp.zeros((B,), bool)
        # CPU: build flat arc slabs (slot-major: flat index d*N + p), then
        # scatter-compact the valid arcs (scatters are cheap there) and
        # sort only the (B, a_max) slab
        def _flat(a):  # (LR, B, N) -> (B, LR*N)
            return jnp.moveaxis(a, 1, 0).reshape(B, LR * N)

        starts = jnp.concatenate(
            [jnp.broadcast_to(jnp.tile(pos, LR)[None, :], (B, LR * N)),
             jnp.broadcast_to(pos[None, :], (B, N))], axis=1
        )
        ends = jnp.concatenate(
            [_flat(jnp.broadcast_to(m_end, (LR, B, N))),
             jnp.minimum(run_end, N - 1)], axis=1
        )
        unk_slab = (jnp.zeros((B, N), jnp.int32) if use_prio
                    else jnp.broadcast_to(unk_id, (B, N)).astype(jnp.int32))
        ids = jnp.concatenate([_flat(m_id), unk_slab], axis=1)
        ranks = jnp.concatenate(
            [_flat(m_rank) if use_rank
             else jnp.zeros((B, N * LR), jnp.float32),
             jnp.zeros((B, N), jnp.float32)], axis=1
        )
        avalid = jnp.concatenate([_flat(survive), run_start], axis=1)
        slot_pos = jnp.cumsum(avalid.astype(jnp.int32), axis=1) - 1
        keep_arc = avalid & (slot_pos < a_max)
        flat_b2 = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], avalid.shape
        )
        flat_dst = jnp.where(keep_arc, flat_b2 * a_max + slot_pos, B * a_max)

        def compact(src, fill):
            return (
                jnp.full(B * a_max + 1, fill, src.dtype)
                .at[flat_dst.reshape(-1)]
                .set(src.reshape(-1), mode="drop")[: B * a_max]
                .reshape(B, a_max)
            )

        c_start = compact(starts, 0)
        c_end = compact(ends, 0)
        c_id = compact(ids, 0)
        c_valid = compact(avalid, False)
        ckey2 = jnp.where(c_valid, c_id * jnp.int32(N) + c_start, INT32_MAX)
        cidx0 = jnp.broadcast_to(
            jnp.arange(a_max, dtype=jnp.int32)[None, :], (B, a_max)
        )
        if use_rank:
            c_rank = compact(ranks, 0.0)
            key_rank = jnp.where(c_valid, _float_desc_key(c_rank), INT32_MAX)
            _, _, s_idx = jax.lax.sort(
                [key_rank, ckey2, cidx0], dimension=1, num_keys=2
            )
        else:
            _, s_idx = jax.lax.sort([ckey2, cidx0], dimension=1, num_keys=1)
        s_start = jnp.take_along_axis(c_start, s_idx, axis=1)
        s_end = jnp.take_along_axis(c_end, s_idx, axis=1)
        s_id = jnp.take_along_axis(c_id, s_idx, axis=1)
        s_valid = jnp.take_along_axis(c_valid, s_idx, axis=1)

    if _phase == "sort":
        return _phase_out(jnp.sum(s_start) + jnp.sum(s_id) + jnp.sum(s_end))

    # ----------------------------------------------------------------- CLAIM
    W = (N + 1 + 31) // 32
    warange = jnp.arange(W, dtype=jnp.int32)[None, :]  # (1, W)

    def subm(nbits):  # (1 << nbits) - 1 with nbits in [0, 32]
        nb = jnp.clip(nbits, 0, 32)
        nb_sh = jnp.minimum(nb, 31).astype(jnp.uint32)
        return jnp.where(
            nb >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << nb_sh) - 1
        )

    def bit_at(mask, q):  # mask (B, W), q (B,) -> bool
        word = jnp.take_along_axis(mask, (q // 32)[:, None], axis=1)[:, 0]
        return ((word >> (q % 32).astype(jnp.uint32)) & 1) == 1

    # while-loop with a data-dependent bound: arcs are sorted with all
    # invalid slots at the end, so iterate only to the largest per-batch
    # arc count instead of a_max.  The body handles UNROLL consecutive
    # arcs per iteration — per-iteration loop overhead (op issue on a
    # few-KB working set) dominates this stage otherwise.
    UNROLL = 16
    a_pad = -(-a_max // UNROLL) * UNROLL
    if a_pad != a_max:
        padw = ((0, 0), (0, a_pad - a_max))
        s_start_c = jnp.pad(s_start, padw)
        s_end_c = jnp.pad(s_end, padw)
        s_valid_c = jnp.pad(s_valid, padw)
    else:
        s_start_c, s_end_c, s_valid_c = s_start, s_end, s_valid
    limit = jnp.minimum(jnp.max(n_arcs), a_max).astype(jnp.int32)

    def claim_cond(st):
        a, _mask, _claimed = st
        return a < limit

    def claim_step(st):
        a, mask, claimed_acc = st
        stt8 = jax.lax.dynamic_slice(s_start_c, (0, a * UNROLL), (B, UNROLL))
        en8 = jax.lax.dynamic_slice(s_end_c, (0, a * UNROLL), (B, UNROLL))
        vd8 = jax.lax.dynamic_slice(s_valid_c, (0, a * UNROLL), (B, UNROLL))
        claim8 = []
        for u in range(UNROLL):
            stt, en, vd = stt8[:, u], en8[:, u], vd8[:, u]
            q1 = jnp.clip(stt, 0, N)
            q2 = jnp.clip(en + 1, 0, N)
            free1 = ~bit_at(mask, q1)
            free2 = (en + 1 >= lengths) | ~bit_at(mask, q2)
            claim = vd & free1 & free2
            lo = jnp.clip(stt[:, None] + 1 - 32 * warange, 0, 32)
            hi = jnp.clip(en[:, None] + 1 - 32 * warange, 0, 32)
            bits = subm(hi) & ~subm(lo)
            mask = jnp.where(claim[:, None], mask | bits, mask)
            claim8.append(claim)
        claimed_acc = jax.lax.dynamic_update_slice(
            claimed_acc, jnp.stack(claim8, axis=1), (0, a * UNROLL)
        )
        return (a + 1, mask, claimed_acc)

    limit = (limit + UNROLL - 1) // UNROLL
    _, int_mask, claimed = jax.lax.while_loop(
        claim_cond,
        claim_step,
        (
            jnp.int32(0),
            jnp.zeros((B, W), jnp.uint32),
            jnp.zeros((B, a_pad), bool),
        ),
    )
    claimed = claimed[:, :a_max]

    if _phase == "claim":
        return _phase_out(
            jnp.sum(int_mask.astype(jnp.int32)) + jnp.sum(claimed)
        )

    # ------------------------------------------------------------------ EMIT
    # Claimed arcs write (tos, id) at their start; arcs claimed LATER in the
    # claim order overwrite earlier ones at the same start (a larger arc can
    # "swallow" earlier smaller claims — its interior claims become
    # unreachable).  Then tokens are emitted by walking pos 0 -> tos+1 -> …
    # (…_bpe_t.h:274-313).
    keep = claimed & s_valid
    # last-claim-wins per start: the winning arc at start p is the one with
    # the largest claim-order index
    idx = jnp.broadcast_to(jnp.arange(a_max, dtype=jnp.int32)[None, :], (B, a_max))
    if _gather_mode():
        # reduction formulation (TPU: no scatters): win[p] = max over arcs
        # a of (keep[a] and start[a]==p ? a : -1), payloads via a second
        # "value-at-argmax" reduction.  XLA fuses the (B, N, A) broadcasts
        # into the reductions without materializing them.
        start_b = s_start[:, None, :]  # (B, 1, A)
        keep_b = keep[:, None, :]
        p_q = pos[None, :, None]  # (1, N, 1)
        hitm = keep_b & (start_b == p_q)  # (B, N, A)
        win = jnp.max(jnp.where(hitm, idx[:, None, :], -1), axis=2)  # (B, N)
        has_win = win >= 0
        sel = hitm & (idx[:, None, :] == win[:, :, None])
        # priority mode: carry priorities through emit (0 = unknown);
        # translate to ids at the very end (one small gather)
        unk_grid = jnp.int32(0) if use_prio else unk_id
        grid_id = jnp.where(
            has_win, jnp.sum(jnp.where(sel, s_id[:, None, :], 0), axis=2),
            unk_grid,
        )
        grid_tos = jnp.sum(jnp.where(sel, s_end[:, None, :], 0), axis=2)
    else:
        flat_b = jnp.broadcast_to(jnp.arange(B)[:, None], (B, a_max))
        flat_idx = jnp.where(keep, flat_b * N + s_start, B * N)
        win = (
            jnp.full(B * N + 1, -1, jnp.int32).at[flat_idx.reshape(-1)]
            .max(idx.reshape(-1), mode="drop")[: B * N]
            .reshape(B, N)
        )
        has_win = win >= 0
        win_safe = jnp.maximum(win, 0)
        unk_grid = jnp.int32(0) if use_prio else unk_id
        grid_id = jnp.where(
            has_win, jnp.take_along_axis(s_id, win_safe, axis=1), unk_grid
        )
        grid_tos = jnp.where(
            has_win, jnp.take_along_axis(s_end, win_safe, axis=1), 0
        )

    # Emission: the tos-walk visits exactly the claimed starts that are not
    # interior to any claimed arc (claimed arcs cannot partially overlap;
    # same-start claims only ever grow, so the winning arc at a start covers
    # every arc it swallowed — the walk provably lands on non-interior
    # winning starts when every position is covered, which the single-symbol
    # vocabulary coverage guarantees).  No scan needed.
    def interior_bit(mask, p_grid):
        word = jnp.zeros((B, N), jnp.uint32)
        for w in range(W):
            sel = (p_grid // 32) == w
            word = jnp.where(sel, mask[:, w : w + 1], word)
        return ((word >> (p_grid % 32).astype(jnp.uint32)) & 1) == 1

    p_grid = jnp.broadcast_to(pos[None, :], (B, N))
    tok_here = has_win & ~interior_bit(int_mask, p_grid) & valid
    # left-compaction of emitted tokens
    out_slot = jnp.cumsum(tok_here.astype(jnp.int32), axis=1) - 1
    if _gather_mode():
        # sort-based compaction (TPU): one payload-carrying bitonic pass —
        # the former take_along_axis gathers here (~9 ns/element) cost more
        # than the whole sort network that fed them.  Payload 1 packs
        # (id | pos << 20): ids < 2^20 by table-build assert, pos < N <= 2048.
        P2 = 1 << max(1, (N - 1).bit_length())
        padw = ((0, 0), (0, P2 - N))
        ckey = jnp.pad(jnp.where(tok_here, out_slot, INT32_MAX), padw,
                       constant_values=INT32_MAX)
        p1 = jnp.pad(
            grid_id | (jnp.broadcast_to(pos[None, :], (B, N)) << 20), padw
        )
        p2 = jnp.pad(grid_tos, padw)
        skey, sp1, sp2 = _bitonic_sort((ckey,), (p1, p2))
        emitted = skey[:, :N] != INT32_MAX
        raw = sp1[:, :N] & 0xFFFFF
        if use_prio:
            raw = jnp.where(
                raw == 0, unk_id,
                tables.prio2id[jnp.clip(raw, 0, tables.trie_v - 1)],
            )
        out_ids = jnp.where(emitted, raw, 0) + tables.id_offset
        out_starts = jnp.where(emitted, sp1[:, :N] >> 20, 0)
        out_ends = jnp.where(emitted, sp2[:, :N], 0)
        counts = jnp.sum(tok_here, axis=1).astype(jnp.int32)
        fallback = (
            jnp.any(slot_overflow & valid, axis=1)
            | arc_overflow
            | anomaly
            | fallback_extra
        )
        return out_ids, out_starts, out_ends, counts, fallback
    else:
        flat_o = jnp.where(
            tok_here, jnp.arange(B, dtype=jnp.int32)[:, None] * N + out_slot, B * N
        )

        def emit_compact(srcv, fill):
            return (
                jnp.full(B * N + 1, fill, srcv.dtype).at[flat_o.reshape(-1)]
                .set(srcv.reshape(-1), mode="drop")[: B * N]
                .reshape(B, N)
            )

    raw = emit_compact(grid_id, 0)
    if use_prio:
        raw = jnp.where(
            raw == 0, unk_id, tables.prio2id[jnp.clip(raw, 0, tables.trie_v - 1)]
        )
        slots = jnp.cumsum(tok_here.astype(jnp.int32), axis=1)[:, -1:]
        raw = jnp.where(
            jnp.arange(N)[None, :] < slots, raw, 0
        )  # unemitted lanes stay 0, matching the non-priority layout
    out_ids = raw + tables.id_offset
    out_starts = emit_compact(jnp.broadcast_to(pos[None, :], (B, N)), 0)
    out_ends = emit_compact(grid_tos, 0)
    counts = jnp.sum(tok_here, axis=1).astype(jnp.int32)

    fallback = (
        jnp.any(slot_overflow & valid, axis=1)
        | arc_overflow
        | anomaly
        | fallback_extra
    )
    return out_ids, out_starts, out_ends, counts, fallback


bpe_walk = jax.jit(_walk_impl, static_argnames=("lw", "bounded"))
bpe_resolve = jax.jit(_resolve_impl, static_argnames=("a_max",))


def bpe_segment(
    tables: BpeDeviceTables,
    x_iw: jax.Array,  # int32 (B, N) dense input weights, -1 = no-transition
    is_spm: jax.Array,  # bool (B, N) raw symbol == U+2581
    lengths: jax.Array,  # int32 (B,)
    unk_id: jax.Array,  # int32 scalar
    a_max: int,
    lw: int | None = None,  # static walk-depth cap (unit-length class)
    bounded: bool = False,
):
    """Returns (ids, starts, ends, counts, fallback) — see module docstring.

    Deliberately NOT one jit: compiling the match-walk while_loop together
    with its slot-array consumers makes XLA pick layouts/fusions that slow
    the whole kernel substantially and blow the compile time from ~15 s to
    ~470 s on v5lite.  (An earlier claim of ">1000x" runtime difference
    here was a measurement artifact: on the tunneled backend
    block_until_ready can return before queued executions finish, so only
    dispatch->host-read timings are trusted now — see bench.py.)  Two
    back-to-back jit dispatches cost little and keep compiles sane.
    """
    m_pack, m_rank, slot_overflow = bpe_walk(
        tables, x_iw, is_spm, lengths, lw=lw, bounded=bounded
    )
    return bpe_resolve(
        tables, m_pack, m_rank, slot_overflow, is_spm, lengths, unk_id, a_max
    )
