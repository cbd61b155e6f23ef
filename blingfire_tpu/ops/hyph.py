"""Vectorized W2H hyphenation for TPU.

Reference: FAHyphInterpreter_core_t.h:136-267 — every start position walks
the patterns Moore DFA; each final writes its pattern's per-position ops with
first-wins/conflict superposition; word edges are suppressed afterwards.

TPU formulation: rows are words with anchor symbols; the lockstep comb-table
walk fires pattern matches, whose op values are applied with scatter-min +
scatter-max (order-free equivalent of the sequential conflict rule: a
position is CONFLICT iff two distinct non-dont-care ops cover it)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.hyph import HYPH_CONFLICT, HYPH_DONT_CARE, HYPH_NO_HYPH, HYPH_UNKNOWN
from .tables import CombTable

BIG = np.int32(2**30)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HyphDeviceTables:
    base: jax.Array
    owner: jax.Array
    nxt: jax.Array
    final: jax.Array
    moore_ow: jax.Array
    pat_vals: jax.Array  # int32 (n_pats, Lmax) padded with DONT_CARE
    pat_len: jax.Array  # int32 (n_pats,)
    n_slots: int = field(metadata=dict(static=True))
    max_pat: int = field(metadata=dict(static=True))
    min_pat_len: int = field(metadata=dict(static=True))
    no_hyph_len: int = field(metadata=dict(static=True))


def make_device_tables(table: CombTable, moore_ow, i2info: dict, params) -> HyphDeviceTables:
    from ..formats.consts import Param

    n_pats = max(i2info.keys()) + 1 if i2info else 0
    max_pat = max((len(v) for v in i2info.values()), default=1)
    pat_vals = np.full((n_pats, max_pat), HYPH_DONT_CARE, np.int32)
    pat_len = np.zeros(n_pats, np.int32)
    for k, v in i2info.items():
        pat_vals[k, : len(v)] = v
        pat_len[k] = len(v)
    return HyphDeviceTables(
        base=jnp.asarray(table.base, jnp.int32),
        owner=jnp.asarray(table.owner, jnp.int32),
        nxt=jnp.asarray(table.nxt, jnp.int32),
        final=jnp.asarray(table.final),
        moore_ow=jnp.asarray(moore_ow, jnp.int32),
        pat_vals=jnp.asarray(pat_vals),
        pat_len=jnp.asarray(pat_len),
        n_slots=table.n_slots,
        max_pat=max_pat,
        min_pat_len=params.get(Param.MIN_LEN, 3),
        no_hyph_len=params.get(Param.MIN_LEN2, 0),
    )


@jax.jit
def hyph_segment(
    tables: HyphDeviceTables,
    x_iw: jax.Array,  # int32 (B, M) [LANCH, chars..., RANCH, -1 pad] dense iws
    word_len: jax.Array,  # int32 (B,) number of characters (without anchors)
):
    """Returns per-position ops (B, M-2) int32 (reference pOut semantics)."""
    B, M = x_iw.shape
    W = M - 2
    pos = jnp.arange(M, dtype=jnp.int32)
    n2 = word_len + 2

    x_pad = jnp.pad(x_iw, ((0, 0), (0, M + 1)), constant_values=-1)

    # grids for superposition: min and max op value per output position
    vmin0 = jnp.full((B, W), BIG, jnp.int32)
    vmax0 = jnp.full((B, W), -BIG, jnp.int32)

    # valid walk starts: From in [0, n2 - (min_pat_len - 1))
    start_ok = pos[None, :] < jnp.maximum(n2 - (tables.min_pat_len - 1), 0)[:, None]

    def cond(st):
        d, state, *_ = st
        return (d < M) & jnp.any(state >= 0)

    def body(st):
        d, state, vmin, vmax = st
        c = jax.lax.dynamic_slice(x_pad, (0, d), (B, M))
        s_safe = jnp.maximum(state, 0)
        slot = jnp.clip(tables.base[s_safe] + jnp.maximum(c, 0), 0, tables.n_slots - 1)
        hit = (tables.owner[slot] == state) & (state >= 0) & (c >= 0)
        ns = jnp.where(hit, tables.nxt[slot], -1)
        fin = (ns >= 0) & tables.final[jnp.maximum(ns, 0)]
        pid = jnp.where(fin, tables.moore_ow[jnp.maximum(ns, 0)], 0)
        plen = tables.pat_len[jnp.clip(pid, 0, tables.pat_vals.shape[0] - 1)]

        # apply pattern ops: j in [js, je) writes to output index From+j-1;
        # js=1 only for From==0 (skip the left anchor's op slot);
        # je = plen - max(0, From+plen-InSize)  (FAHyphInterpreter:219-224)
        frm = pos[None, :]  # start position of this walk (ext coords)
        je = plen - jnp.maximum(0, frm + plen - word_len[:, None])
        for j in range(tables.max_pat):
            ow = tables.pat_vals[jnp.clip(pid, 0, tables.pat_vals.shape[0] - 1), j]
            oi = frm + j - 1
            ok = (
                fin
                & (j >= jnp.where(frm == 0, 1, 0))
                & (j < je)
                & (ow != HYPH_DONT_CARE)
                & (oi >= 0)
                & (oi < W)
            )
            flat = jnp.where(
                ok, jnp.arange(B, dtype=jnp.int32)[:, None] * W + oi, B * W
            ).reshape(-1)
            vals = jnp.broadcast_to(ow, (B, M)).reshape(-1)
            vmin = _scatter_min(vmin, flat, vals, B, W)
            vmax = _scatter_max(vmax, flat, vals, B, W)
        return (d + 1, ns, vmin, vmax)

    init_state = jnp.where(start_ok, 0, -1).astype(jnp.int32)
    _, _, vmin, vmax = jax.lax.while_loop(
        cond, body, (jnp.int32(0), init_state, vmin0, vmax0)
    )

    out = jnp.where(
        vmin == BIG,
        HYPH_UNKNOWN,
        jnp.where(vmin == vmax, vmin, HYPH_CONFLICT),
    )
    # edge suppression (FAHyphInterpreter:252-263)
    wpos = jnp.arange(W, dtype=jnp.int32)[None, :]
    k = jnp.minimum(tables.no_hyph_len, word_len)[:, None]
    lead = wpos < k
    tail = (wpos >= word_len[:, None] - 1 - k) & (wpos < word_len[:, None] - 1) & (wpos > 0)
    out = jnp.where(lead | tail, HYPH_NO_HYPH, out)
    return out


def _scatter_min(grid, flat, vals, B, W):
    return (
        grid.reshape(-1)
        .at[flat]
        .min(vals, mode="drop")
        .reshape(B, W)
    )


def _scatter_max(grid, flat, vals, B, W):
    return (
        grid.reshape(-1)
        .at[flat]
        .max(vals, mode="drop")
        .reshape(B, W)
    )
