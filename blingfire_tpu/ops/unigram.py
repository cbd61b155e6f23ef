"""Vectorized SentencePiece Unigram-LM Viterbi segmentation for TPU.

Reference semantics: FATokenSegmentationTools_1best_t.h:174-279 — for every
start position walk the vocabulary Mealy automaton; at each final state relax
the best-arc-per-end DP (score = float32 token score + double best[start-1],
strict improvement, starts processed in ascending order); unknown starts add
a -100000 arc of length 1 that merges with a preceding unknown run; backtrace
from the last position.

TPU formulation:
  WALK      — same lockstep comb-table walk as BPE, but matches are recorded
              by (end, length) — each (start, length) pair is unique, so a
              dense (B, N, L) grid holds every arc with no overflow.
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
    n_slots: int = field(metadata=dict(static=True))
    max_len: int = field(metadata=dict(static=True))
    id_offset: int = field(metadata=dict(static=True))


def make_device_tables(
    table: CombTable, ids: np.ndarray, scores: np.ndarray, max_len: int, id_offset: int
) -> UnigramDeviceTables:
    return UnigramDeviceTables(
        base=jnp.asarray(table.base, jnp.int32),
        owner=jnp.asarray(table.owner, jnp.int32),
        nxt=jnp.asarray(table.nxt, jnp.int32),
        ow=jnp.asarray(table.ow, jnp.int32),
        final=jnp.asarray(table.final),
        ids_tab=jnp.asarray(ids, jnp.int32),
        scores_tab=jnp.asarray(scores, jnp.float32),
        n_slots=table.n_slots,
        max_len=max_len,
        id_offset=id_offset,
    )


@jax.jit
def unigram_segment(
    tables: UnigramDeviceTables,
    x_iw: jax.Array,  # int32 (B, N) dense input weights, -1 = no transition
    lengths: jax.Array,  # int32 (B,)
    unk_id: jax.Array,  # int32 scalar
):
    """Returns (ids, starts, ends, counts) padded to N tokens per doc."""
    B, N = x_iw.shape
    L = tables.max_len
    pos = jnp.arange(N, dtype=jnp.int32)
    valid = pos[None, :] < lengths[:, None]
    nkeys = tables.ids_tab.shape[0]

    x_pad = jnp.pad(x_iw, ((0, 0), (0, L + 1)), constant_values=-1)

    # ------------------------------------------------------------------ WALK
    # match at (start p, depth d) covers [p, p+d]; store by (p, d)
    def walk_cond(st):
        d, state, *_ = st
        return (d < L) & jnp.any(state >= 0)

    def walk_body(st):
        d, state, sum_ow, m_id, m_score, has = st
        c = jax.lax.dynamic_slice(x_pad, (0, d), (B, N))
        s_safe = jnp.maximum(state, 0)
        slot = jnp.clip(tables.base[s_safe] + jnp.maximum(c, 0), 0, tables.n_slots - 1)
        hit = (tables.owner[slot] == state) & (state >= 0) & (c >= 0)
        ns = jnp.where(hit, tables.nxt[slot], -1)
        sum_ow = sum_ow + jnp.where(hit, tables.ow[slot], 0)
        fin = (ns >= 0) & tables.final[jnp.maximum(ns, 0)]
        key = jnp.clip(sum_ow, 0, nkeys - 1)
        m_id = jax.lax.dynamic_update_index_in_dim(
            m_id, jnp.where(fin, tables.ids_tab[key], -1), d, axis=2
        )
        m_score = jax.lax.dynamic_update_index_in_dim(
            m_score, jnp.where(fin, tables.scores_tab[key], NEG_INF), d, axis=2
        )
        has = has | fin
        return (d + 1, ns, sum_ow, m_id, m_score, has)

    init_state = jnp.where(valid & (x_iw >= 0), 0, -1).astype(jnp.int32)
    st0 = (
        jnp.int32(0),
        init_state,
        jnp.zeros((B, N), jnp.int32),
        jnp.full((B, N, L), -1, jnp.int32),
        jnp.full((B, N, L), NEG_INF, jnp.float32),
        jnp.zeros((B, N), bool),
    )
    _, _, _, m_id, m_score, has_match = jax.lax.while_loop(walk_cond, walk_body, st0)

    # re-index arcs by END: end_id[b, e, d] = arc starting at e-d of length d+1
    def roll_d(a):
        cols = [jnp.roll(a[:, :, d], d, axis=1) for d in range(L)]
        return jnp.stack(cols, axis=2)

    end_id = roll_d(m_id)
    end_score = roll_d(m_score)
    # mask arcs whose start wrapped around / is before 0
    dgrid = jnp.arange(L, dtype=jnp.int32)[None, None, :]
    arc_ok = (pos[None, :, None] - dgrid >= 0) & (end_id >= 0)
    end_id = jnp.where(arc_ok, end_id, -1)
    end_score = jnp.where(arc_ok, end_score, NEG_INF)

    # -------------------------------------------------------------------- DP
    # candidates per end position, in reference relaxation order:
    # starts ascending == depth DESCENDING, then the unknown arc (start==e).
    # strict-improvement ("<") means the FIRST maximal candidate wins.
    rev = slice(None, None, -1)

    def dp_step(carry, inp):
        # ring: best df64 for positions e-L .. e-1 (ring[k] = best[e-1-k])
        ring_hi, ring_lo, prev_id, prev_begin = carry
        e, eid, esc, unk_here, vald = inp
        # prev best for depth d arc: best[e-d-1] = ring[d]; e-d-1 < 0 -> 0
        darange = jnp.arange(L, dtype=jnp.int32)[None, :]
        base_hi = jnp.where(e - darange - 1 >= 0, ring_hi, 0.0)  # (B, L)
        base_lo = jnp.where(e - darange - 1 >= 0, ring_lo, 0.0)
        c_hi, c_lo = df_add(base_hi, base_lo, esc)  # (B, L)
        arc_valid = eid >= 0
        c_hi = jnp.where(arc_valid, c_hi, NEG_INF)
        c_lo = jnp.where(arc_valid, c_lo, 0.0)
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
        cand_id = jnp.concatenate([eid[:, rev], jnp.full((B, 1), -1, jnp.int32)], axis=1)
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
        w_id = jnp.take_along_axis(cand_id, winner[:, None], 1)[:, 0]
        w_d = jnp.take_along_axis(cand_d, winner[:, None], 1)[:, 0]
        begin = e - w_d
        # unknown-run merge (…_1best_t.h:166-169)
        merge = (w_id == -1) & (e > 0) & (prev_id == -1)
        begin = jnp.where(merge, prev_begin, begin)

        # positions beyond doc length: keep ring shifting but scores at -inf
        w_hi = jnp.where(vald, w_hi, NEG_INF)
        w_lo = jnp.where(vald, w_lo, 0.0)

        ring_hi = jnp.concatenate([w_hi[:, None], ring_hi[:, :-1]], axis=1)
        ring_lo = jnp.concatenate([w_lo[:, None], ring_lo[:, :-1]], axis=1)
        return (ring_hi, ring_lo, w_id, begin), (w_id, begin)

    unk_start = ~has_match & valid
    carry0 = (
        jnp.full((B, L), NEG_INF, jnp.float32),
        jnp.zeros((B, L), jnp.float32),
        jnp.full((B,), -2, jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )
    xs = (
        pos,
        jnp.moveaxis(end_id, 1, 0),
        jnp.moveaxis(end_score, 1, 0),
        unk_start.T,
        valid.T,
    )
    _, (ids_t, begin_t) = jax.lax.scan(dp_step, carry0, xs)
    best_id = ids_t.T  # (B, N)
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
    raw_id = emit_compact(best_id, 0)
    out_ids = jnp.where(raw_id == -1, unk_id, raw_id) + tables.id_offset
    counts = jnp.sum(emit, axis=1).astype(jnp.int32)
    return out_ids, out_starts, out_ends, counts
