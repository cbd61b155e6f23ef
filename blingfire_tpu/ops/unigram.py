"""Vectorized SentencePiece Unigram-LM Viterbi segmentation for TPU.

Reference semantics: FATokenSegmentationTools_1best_t.h:174-279 — for every
start position walk the vocabulary Mealy automaton; at each final state relax
the best-arc-per-end DP (score = float32 token score + double best[start-1],
strict improvement, starts processed in ascending order); unknown starts add
a -100000 arc of length 1 that merges with a preceding unknown run; backtrace
from the last position.

TPU formulation:
  WALK      — lockstep Mealy walk, UNROLLED over depth (a lax.while_loop
              iteration re-stages its loop-invariant tables on the tunneled
              backend, tripling the cost of each step).  When the automaton
              is small enough, transitions come from a DENSE packed table
              (state × alphabet -> (ow, next, final) in ONE int32), so a
              step costs one transition gather plus one score gather —
              row gathers at ~9 ns/element are the kernel's cost unit, so
              gather COUNT is everything.  Token ids are not touched during
              the walk at all: the walk records the Mealy key (= sum of
              Ows); ids are resolved with one gather per document after the
              backtrace has picked the winning arcs.
  DP        — one scan over positions; carry is a ring buffer of the last L
              best scores (df64 pairs) per document.  Candidate order inside
              a step reproduces the reference's ascending-start iteration.
  BACKTRACE — reverse scan marking visited ends, then a compaction sort.

Scores use two-float32 ("df64") compensated arithmetic to match the
reference's float+double accumulation without software float64.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .dfloat import df_add, df_lt
from .tables import CombTable

INT32_MAX = np.int32(2**31 - 1)
UNK_SCORE = np.float32(-100000.0)
NEG_INF = np.float32(-3.4028235e38)  # -FLT_MAX: reference initial best score

# dense transition table limits: (ow << 16) | ((next + 1) << 1) | final
_DENSE_MAX_ENTRIES = 16 << 20  # 64 MB of int32
_DENSE_MAX_STATE = (1 << 15) - 2
_DENSE_MAX_OW = (1 << 15) - 1


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class UnigramDeviceTables:
    base: jax.Array
    owner: jax.Array
    nxt: jax.Array
    ow: jax.Array
    final: jax.Array
    ids_tab: jax.Array  # int32[nkeys]
    scores_tab: jax.Array  # float32[nkeys]
    dense: jax.Array | None  # int32[n_states * A] packed, or None
    # "wide" slot packing for models whose (states x alphabet) exceeds the
    # dense limits (laser/uri families: A ~ 3.5-7k, ow up to 100k): TWO
    # int32 gathers at the SAME slot index replace the owner/nxt/ow/final
    # quartet — walk cost drops from 6 gathers/step to 4.
    #   wide_a[slot] = owner(17) | final<<17 | ow_low14<<18
    #   wide_b[slot] = (nxt+1)(17) | ow_high<<17
    wide_a: jax.Array | None
    wide_b: jax.Array | None
    n_slots: int = field(metadata=dict(static=True))
    max_len: int = field(metadata=dict(static=True))
    id_offset: int = field(metadata=dict(static=True))
    n_iws: int = field(metadata=dict(static=True), default=0)


_WIDE_OWNER_SENTINEL = (1 << 17) - 1  # empty-slot owner: matches no state


def make_device_tables(
    table: CombTable, ids: np.ndarray, scores: np.ndarray, max_len: int, id_offset: int
) -> UnigramDeviceTables:
    dense = wide_a = wide_b = None
    n_states = int(table.base.shape[0])
    A = int(table.n_iws)
    ow_np = np.asarray(table.ow)
    ow_max = int(ow_np.max(initial=0))
    if (
        n_states * A <= _DENSE_MAX_ENTRIES
        and n_states <= _DENSE_MAX_STATE
        and ow_max <= _DENSE_MAX_OW
    ):
        d = np.zeros(n_states * A, np.int32)
        occ = np.flatnonzero(np.asarray(table.owner) >= 0)
        owner = np.asarray(table.owner)[occ]
        iw = occ - np.asarray(table.base)[owner]
        keep = (iw >= 0) & (iw < A)
        occ, owner, iw = occ[keep], owner[keep], iw[keep]
        nxt = np.asarray(table.nxt)[occ]
        fin = np.where(nxt >= 0, np.asarray(table.final)[np.maximum(nxt, 0)], False)
        val = (
            (ow_np[occ].astype(np.int32) << 16)
            | ((nxt.astype(np.int32) + 1) << 1)
            | fin.astype(np.int32)
        )
        d[owner * A + iw] = np.where(nxt >= 0, val, 0)
        dense = jnp.asarray(d)
    elif n_states < _WIDE_OWNER_SENTINEL and ow_max < (1 << 17):
        n_slots = int(np.asarray(table.owner).shape[0])
        a = np.full(n_slots, _WIDE_OWNER_SENTINEL, np.int32)
        b = np.zeros(n_slots, np.int32)
        occ = np.flatnonzero(np.asarray(table.owner) >= 0)
        owner = np.asarray(table.owner)[occ]
        nxt = np.asarray(table.nxt)[occ]
        fin = np.where(nxt >= 0, np.asarray(table.final)[np.maximum(nxt, 0)], False)
        ow = ow_np[occ].astype(np.int32)
        live = nxt >= 0
        a[occ[live]] = (
            owner[live]
            | (fin[live].astype(np.int32) << 17)
            | ((ow[live] & 0x3FFF) << 18)
        )
        b[occ[live]] = (nxt[live] + 1) | ((ow[live] >> 14) << 17)
        wide_a = jnp.asarray(a)
        wide_b = jnp.asarray(b)
    return UnigramDeviceTables(
        base=jnp.asarray(table.base, jnp.int32),
        owner=jnp.asarray(table.owner, jnp.int32),
        nxt=jnp.asarray(table.nxt, jnp.int32),
        ow=jnp.asarray(table.ow, jnp.int32),
        final=jnp.asarray(table.final),
        ids_tab=jnp.asarray(ids, jnp.int32),
        scores_tab=jnp.asarray(scores, jnp.float32),
        dense=dense,
        wide_a=wide_a,
        wide_b=wide_b,
        n_slots=table.n_slots,
        max_len=max_len,
        id_offset=id_offset,
        n_iws=A,
    )


@functools.partial(jax.jit, static_argnames=("lw",))
def unigram_segment(
    tables: UnigramDeviceTables,
    x_iw: jax.Array,  # int32 (B, N) dense input weights, -1 = no transition
    lengths: jax.Array,  # int32 (B,)
    unk_id: jax.Array,  # int32 scalar
    lw: int | None = None,  # static depth cap: EXACT when no arc can exceed
    # lw symbols (unit-length-classed packed rows, runtime/dedup.py) — both
    # the walk and the DP ring shrink to lw
):
    """Returns (ids, starts, ends, counts) padded to N tokens per doc."""
    B, N = x_iw.shape
    L = tables.max_len if lw is None else min(lw, tables.max_len)
    pos = jnp.arange(N, dtype=jnp.int32)
    valid = pos[None, :] < lengths[:, None]
    nkeys = tables.ids_tab.shape[0]

    x_pad = jnp.pad(x_iw, ((0, 0), (0, L + 1)), constant_values=-1)

    # ------------------------------------------------------------------ WALK
    # unrolled; match at (start p, depth d) covers [p, p+d]; stored by (d, p)
    state = jnp.where(valid & (x_iw >= 0), 0, -1).astype(jnp.int32)
    sum_ow = jnp.zeros((B, N), jnp.int32)
    keys_d = []  # Mealy key (vocab entry index) per depth, -1 = no match
    scores_d = []
    use_dense = tables.dense is not None
    use_wide = tables.wide_a is not None
    A = tables.n_iws
    for d in range(L):
        c = x_pad[:, d : d + N]
        if use_dense:
            flat = jnp.clip(
                jnp.maximum(state, 0) * A + jnp.maximum(c, 0),
                0,
                tables.dense.shape[0] - 1,
            )
            e = jnp.where((state >= 0) & (c >= 0), tables.dense[flat], 0)
            ns = ((e >> 1) & 0x7FFF) - 1
            sum_ow = sum_ow + jnp.where(e != 0, e >> 16, 0)
            fin = (e & 1) == 1
        elif use_wide:
            s_safe = jnp.maximum(state, 0)
            slot = jnp.clip(
                tables.base[s_safe] + jnp.maximum(c, 0), 0, tables.n_slots - 1
            )
            ea = tables.wide_a[slot]
            eb = tables.wide_b[slot]
            hit = ((ea & 0x1FFFF) == state) & (state >= 0) & (c >= 0)
            ns = jnp.where(hit, (eb & 0x1FFFF) - 1, -1)
            ow = ((ea >> 18) & 0x3FFF) | ((eb >> 17) << 14)
            sum_ow = sum_ow + jnp.where(hit, ow, 0)
            fin = hit & (((ea >> 17) & 1) == 1)
        else:
            s_safe = jnp.maximum(state, 0)
            slot = jnp.clip(
                tables.base[s_safe] + jnp.maximum(c, 0), 0, tables.n_slots - 1
            )
            hit = (tables.owner[slot] == state) & (state >= 0) & (c >= 0)
            ns = jnp.where(hit, tables.nxt[slot], -1)
            sum_ow = sum_ow + jnp.where(hit, tables.ow[slot], 0)
            fin = (ns >= 0) & tables.final[jnp.maximum(ns, 0)]
        key = jnp.clip(sum_ow, 0, nkeys - 1)
        keys_d.append(jnp.where(fin, key, -1))
        scores_d.append(
            jnp.where(fin, tables.scores_tab[key], NEG_INF)
        )
        state = ns
    m_key = jnp.stack(keys_d, axis=2)  # (B, N, L) by (start, depth)
    m_score = jnp.stack(scores_d, axis=2)
    has_match = jnp.any(m_key >= 0, axis=2)

    # re-index arcs by END: end_*[b, e, d] = arc starting at e-d of length d+1
    def roll_d(a, fill):
        cols = [jnp.roll(a[:, :, d], d, axis=1) for d in range(L)]
        r = jnp.stack(cols, axis=2)
        dgrid = jnp.arange(L, dtype=jnp.int32)[None, None, :]
        ok = pos[None, :, None] - dgrid >= 0
        return jnp.where(ok, r, fill)

    end_key = roll_d(m_key, -1)
    end_score = jnp.where(end_key >= 0, roll_d(m_score, NEG_INF), NEG_INF)
    end_ok = end_key >= 0

    # -------------------------------------------------------------------- DP
    # candidates per end position, in reference relaxation order:
    # starts ascending == depth DESCENDING, then the unknown arc (start==e).
    # strict-improvement ("<") means the FIRST maximal candidate wins.
    rev = slice(None, None, -1)

    def dp_step(carry, inp):
        # ring: best df64 for positions e-L .. e-1 (ring[k] = best[e-1-k])
        ring_hi, ring_lo, prev_unk, prev_begin = carry
        e, eok, esc, unk_here, vald = inp
        # prev best for depth d arc: best[e-d-1] = ring[d]; e-d-1 < 0 -> 0
        darange = jnp.arange(L, dtype=jnp.int32)[None, :]
        base_hi = jnp.where(e - darange - 1 >= 0, ring_hi, 0.0)  # (B, L)
        base_lo = jnp.where(e - darange - 1 >= 0, ring_lo, 0.0)
        c_hi, c_lo = df_add(base_hi, base_lo, esc)  # (B, L)
        c_hi = jnp.where(eok, c_hi, NEG_INF)
        c_lo = jnp.where(eok, c_lo, 0.0)
        # unknown candidate: start == e, score -1e5 + best[e-1]
        u_hi, u_lo = df_add(
            jnp.where(e >= 1, ring_hi[:, 0], 0.0),
            jnp.where(e >= 1, ring_lo[:, 0], 0.0),
            UNK_SCORE,
        )
        u_hi = jnp.where(unk_here, u_hi, NEG_INF)
        u_lo = jnp.where(unk_here, u_lo, 0.0)

        cand_hi = jnp.concatenate([c_hi[:, rev], u_hi[:, None]], axis=1)  # (B, L+1)
        cand_lo = jnp.concatenate([c_lo[:, rev], u_lo[:, None]], axis=1)
        cand_d = jnp.concatenate(
            [
                jnp.broadcast_to(darange[:, rev], (B, L)),
                jnp.zeros((B, 1), jnp.int32),
            ],
            axis=1,
        )

        # first-maximal candidate (argmax on hi, tie-break lo then first index)
        best_hi = jnp.max(cand_hi, axis=1, keepdims=True)
        is_max_hi = cand_hi == best_hi
        lo_masked = jnp.where(is_max_hi, cand_lo, NEG_INF)
        best_lo = jnp.max(lo_masked, axis=1, keepdims=True)
        winner = jnp.argmax(is_max_hi & (lo_masked == best_lo), axis=1)  # (B,)

        w_hi = jnp.take_along_axis(cand_hi, winner[:, None], 1)[:, 0]
        w_lo = jnp.take_along_axis(cand_lo, winner[:, None], 1)[:, 0]
        w_unk = winner == L  # the unknown candidate slot
        w_d = jnp.take_along_axis(cand_d, winner[:, None], 1)[:, 0]
        begin = e - w_d
        # unknown-run merge (…_1best_t.h:166-169)
        merge = w_unk & (e > 0) & prev_unk
        begin = jnp.where(merge, prev_begin, begin)

        # positions beyond doc length: keep ring shifting but scores at -inf
        w_hi = jnp.where(vald, w_hi, NEG_INF)
        w_lo = jnp.where(vald, w_lo, 0.0)

        ring_hi = jnp.concatenate([w_hi[:, None], ring_hi[:, :-1]], axis=1)
        ring_lo = jnp.concatenate([w_lo[:, None], ring_lo[:, :-1]], axis=1)
        return (ring_hi, ring_lo, w_unk, begin), (w_unk, begin)

    unk_start = ~has_match & valid
    carry0 = (
        jnp.full((B, L), NEG_INF, jnp.float32),
        jnp.zeros((B, L), jnp.float32),
        jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.int32),
    )
    xs = (
        pos,
        jnp.moveaxis(end_ok, 1, 0),
        jnp.moveaxis(end_score, 1, 0),
        unk_start.T,
        valid.T,
    )
    _, (unk_t, begin_t) = jax.lax.scan(dp_step, carry0, xs)
    best_unk = unk_t.T  # (B, N): winning arc at end e is the unknown arc
    best_begin = begin_t.T

    # ------------------------------------------------------------- BACKTRACE
    def bt_step(cur, inp):
        e, bg = inp
        em = e == cur
        cur = jnp.where(em, bg - 1, cur)
        return cur, em

    _, emit_t = jax.lax.scan(
        bt_step,
        lengths - 1,
        (pos[rev], jnp.moveaxis(best_begin, 1, 0)[rev]),
    )
    emit = emit_t[rev].T & valid  # (B, N) marks segment END positions

    # token ids: ONE deferred gather for the winning arcs only — the walk
    # never materializes per-arc ids.  Winner at end e spans [begin, e]:
    # its Mealy key sits at m_key[b, begin, e - begin].
    w_d = jnp.clip(pos[None, :] - best_begin, 0, L - 1)
    flat = (
        jnp.arange(B, dtype=jnp.int32)[:, None] * (N * L)
        + jnp.clip(best_begin, 0, N - 1) * L
        + w_d
    )
    w_key = m_key.reshape(-1)[flat]  # (B, N)
    w_id = jnp.where(
        best_unk, unk_id, tables.ids_tab[jnp.clip(w_key, 0, nkeys - 1)]
    )

    # left-compaction via prefix sum + scatter (sorts are expensive on TPU)
    out_slot = jnp.cumsum(emit.astype(jnp.int32), axis=1) - 1
    flat_o = jnp.where(
        emit, jnp.arange(B, dtype=jnp.int32)[:, None] * N + out_slot, B * N
    )

    def emit_compact(src, fill):
        return (
            jnp.full(B * N + 1, fill, src.dtype).at[flat_o.reshape(-1)]
            .set(src.reshape(-1), mode="drop")[: B * N]
            .reshape(B, N)
        )

    out_ends = emit_compact(jnp.broadcast_to(pos[None, :], (B, N)), 0)
    out_starts = emit_compact(best_begin, 0)
    out_ids = emit_compact(w_id, 0) + tables.id_offset
    counts = jnp.sum(emit, axis=1).astype(jnp.int32)
    return out_ids, out_starts, out_ends, counts
