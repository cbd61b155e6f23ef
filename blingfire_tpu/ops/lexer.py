"""Vectorized pattern-lexer pass for TPU.

One `lexer_pass` = the reference's FALexTools_t::Process_int FromPos loop
(FALexTools_t.h:229-397) over a batch of rows:

  WALK — every row position starts a DFA run in lockstep; each step is two
         comb-table lookups (exact input weight, then IW_ANY fallback).  Rows
         carry their own initial state (grammar functions are just different
         entry states).  The deepest final per start is recorded.
  SCAN — the sequential FromPos skip-ahead (greedy, FinalPos-RightCx) as a
         per-row scan, emitting (Tag, From, To, FnId) per visited match.

Anchors are materialised as row symbols: position 0 holds IW_L_ANCHOR, the
position after the last character holds IW_R_ANCHOR, padding is -1 (kills
both lookups).  Regular characters are guarded to >= IW_EPSILON by the host
(FALexTools_t.h:259-261), so they can never match anchor transitions.

The emitted match list per row is order-exact with the reference; nested
function calls are orchestrated by the host runtime level by level.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .tables import CombTable

INT32_MAX = np.int32(2**31 - 1)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LexerDeviceTables:
    base: jax.Array  # int32[n_states]
    owner: jax.Array  # int32[slots]
    nxt: jax.Array  # int32[slots]
    final: jax.Array  # bool[n_states]
    moore_ow: jax.Array  # int32[n_states]
    act_right: jax.Array  # int32[n_acts] RightCx
    act_tag: jax.Array  # int32[n_acts]
    act_fn: jax.Array  # int32[n_acts] (-1 = no function call)
    any_iw: jax.Array  # int32 scalar: dense id of IW_ANY
    n_slots: int = field(metadata=dict(static=True))
    max_token_length: int = field(metadata=dict(static=True))


def make_device_tables(table: CombTable, moore_ow, acts: dict, max_token_length: int):
    """Build device tables; actions densified by rule Ow.

    Only the single-function action shape shipped in every reference model is
    supported on device (LeftCx==0, <=1 function); others fall back to host."""
    n_acts = max(acts.keys()) + 1 if acts else 0
    act_right = np.zeros(n_acts, np.int32)
    act_tag = np.zeros(n_acts, np.int32)
    act_fn = np.full(n_acts, -1, np.int32)
    for k, a in acts.items():
        a = np.asarray(a)
        assert int(a[0]) == 0, "LeftCx != 0 needs host path"
        act_right[k] = int(a[1])
        act_tag[k] = int(a[2])
        fns = []
        if len(a) > 3:
            i = 3 if int(a[2]) == 0 else 4
            # layout: (L, R, Tag [,0, FnIds...]) — the 0 delimiter is the
            # Tag slot itself when Tag==0 (FALexTools_t.h:176-190)
            if int(a[2]) != 0:
                assert int(a[3]) == 0, "unexpected action layout"
            fns = [int(x) for x in a[i:]]
        assert len(fns) <= 1, "multi-function actions need host path"
        if fns:
            act_fn[k] = fns[0]
    any_dense = int(table.sym2iw[0]) if len(table.sym2iw) > 0 else -1
    return LexerDeviceTables(
        base=jnp.asarray(table.base, jnp.int32),
        owner=jnp.asarray(table.owner, jnp.int32),
        nxt=jnp.asarray(table.nxt, jnp.int32),
        final=jnp.asarray(table.final),
        moore_ow=jnp.asarray(moore_ow, jnp.int32),
        act_right=jnp.asarray(act_right),
        act_tag=jnp.asarray(act_tag),
        act_fn=jnp.asarray(act_fn),
        any_iw=jnp.int32(any_dense),
        n_slots=table.n_slots,
        max_token_length=max_token_length,
    )


@jax.jit
def lexer_pass(
    tables: LexerDeviceTables,
    x_ext: jax.Array,  # int32 (B, M): [L_ANCHOR, chars..., R_ANCHOR, -1 pad]
    init_states: jax.Array,  # int32 (B,) per-row initial state
    ext_len: jax.Array,  # int32 (B,) = chars + 2 (anchors)
):
    """Returns (visited, tag, from2, to2, fn) each (B, M) in ext coordinates.

    visited[b, q] marks ext start positions the sequential FromPos loop
    processes AND that matched; from2/to2 are already RightCx-adjusted and
    clamped to [0, InSize-1] in ORIGINAL span coordinates (from = q says the
    match began at original position q-1; the L-anchor start is q=0)."""
    B, M = x_ext.shape
    pos = jnp.arange(M, dtype=jnp.int32)
    L = tables.max_token_length + 1  # letters budget + anchor/R step

    x_pad = jnp.pad(x_ext, ((0, 0), (0, L + 1)), constant_values=-1)
    r_pos = ext_len - 1  # ext index of the R anchor, (B,)

    def step_lookup(state, c):
        s_safe = jnp.maximum(state, 0)
        slot = jnp.clip(tables.base[s_safe] + jnp.maximum(c, 0), 0, tables.n_slots - 1)
        hit = (tables.owner[slot] == state) & (state >= 0) & (c >= 0)
        return jnp.where(hit, tables.nxt[slot], -1)

    def walk_cond(st):
        d, state, *_ = st
        return (d < L) & jnp.any(state >= 0)

    def walk_body(st):
        d, state, fin_pos, fin_ow = st
        c = jax.lax.dynamic_slice(x_pad, (0, d), (B, M))
        # length bound: letters beyond max_token_length only allowed when the
        # consumed symbol is the row's R anchor (FALexTools_t.h:236-241,280)
        at_r = (pos[None, :] + d) == r_pos[:, None]
        ns = step_lookup(state, c)
        ns_any = step_lookup(state, jnp.broadcast_to(tables.any_iw, (B, M)))
        ns = jnp.where(ns == -1, jnp.where(c >= 0, ns_any, -1), ns)
        allowed = (d < tables.max_token_length) | at_r
        ns = jnp.where(allowed, ns, -1)
        fin = (ns >= 0) & tables.final[jnp.maximum(ns, 0)]
        fin_pos = jnp.where(fin, pos[None, :] + d, fin_pos)
        fin_ow = jnp.where(fin, tables.moore_ow[jnp.maximum(ns, 0)], fin_ow)
        return (d + 1, ns, fin_pos, fin_ow)

    valid_start = pos[None, :] < r_pos[:, None]  # starts at 0..r_pos-1
    init = jnp.where(valid_start, init_states[:, None], -1).astype(jnp.int32)
    st0 = (
        jnp.int32(0),
        init,
        jnp.full((B, M), -1, jnp.int32),
        jnp.full((B, M), -1, jnp.int32),
    )
    _, _, fin_pos, fin_ow = jax.lax.while_loop(walk_cond, walk_body, st0)

    # ------------------------------------------------------------------ SCAN
    # matched starts in ext coords; emit spans in ORIGINAL coords
    in_size = ext_len - 2  # original span length
    right = tables.act_right[jnp.maximum(fin_ow, 0)]
    tag = jnp.where(fin_ow >= 0, tables.act_tag[jnp.maximum(fin_ow, 0)], 0)
    fn = jnp.where(fin_ow >= 0, tables.act_fn[jnp.maximum(fin_ow, 0)], -1)

    # original-coordinate FinalPos: ext fin_pos - 1
    fpos_orig = fin_pos - 1
    from_orig = pos[None, :] - 1  # FromPos in original coords (q=0 -> -1)
    from2 = jnp.clip(from_orig, 0, jnp.maximum(in_size - 1, 0)[:, None])
    to2 = jnp.clip(fpos_orig - right, 0, jnp.maximum(in_size - 1, 0)[:, None])

    # sequential skip: next = max(FromPos, FinalPos - RightCx) + 1  (ext +1)
    has = fin_pos >= 0
    skip_to_ext = jnp.where(has, jnp.maximum(from_orig, fpos_orig - right), from_orig)

    def scan_step(nv, inp):
        q, skip_q = inp  # (B,)
        vis = nv == q
        nv = jnp.where(vis, skip_q + 1 + 1, nv)  # orig->ext then advance
        return nv, vis

    _, vis_t = jax.lax.scan(
        scan_step, jnp.zeros(B, jnp.int32), (pos, skip_to_ext.T)
    )
    visited = vis_t.T & valid_start & has
    return visited, tag, from2, to2, fn


@functools.partial(jax.jit, static_argnames=("size",))
def _scatter_dense(idx, vals, size: int):
    return jnp.full(size, -1, jnp.int32).at[idx].set(vals)


def make_dense_sub(table: CombTable, moore_ow, fn_inis: list[int]):
    """Dense finals-first expansion of the sub-token grammar.

    The comb walk costs 5 gathers per step (base/owner/nxt/final/moore_ow);
    with a dense (state, iw) -> next table, finals numbered FIRST (so
    ``fin == ns < n_f``) and the action Ow gathered ONCE from the deepest
    final after the loop, the walk is 1 gather per step — the same trick as
    the BPE vocabulary trie (ops/bpe.py).  Ships as CSR + device scatter.

    Returns (dnext_dev, ow_perm_dev, perm_np, n_f, n_reach) or None when
    the dense table would be unreasonably large."""
    base = np.asarray(table.base)
    owner = np.asarray(table.owner)
    nxt = np.asarray(table.nxt)
    final = np.asarray(table.final)
    A = table.n_iws
    S = table.n_states
    occ = np.flatnonzero(owner >= 0)
    order = np.argsort(owner[occ], kind="stable")
    so = owner[occ][order]
    slot_sorted = occ[order]
    iw_sorted = (occ - base[owner[occ]])[order]
    row = np.searchsorted(so, np.arange(S + 1))
    seen = np.zeros(S, bool)
    stack = [s for s in dict.fromkeys(fn_inis) if 0 <= s < S]
    for s in stack:
        seen[s] = True
    e_src, e_iw, e_dst = [], [], []
    while stack:
        s = stack.pop()
        for k in range(row[s], row[s + 1]):
            d = int(nxt[slot_sorted[k]])
            if d < 0:
                continue
            e_src.append(s)
            e_iw.append(int(iw_sorted[k]))
            e_dst.append(d)
            if not seen[d]:
                seen[d] = True
                stack.append(d)
    reach = np.flatnonzero(seen)
    n_reach = len(reach)
    if n_reach * A > 256_000_000:
        return None
    # finals first
    fin_mask = final[reach]
    ordered = np.concatenate([reach[fin_mask], reach[~fin_mask]])
    n_f = int(fin_mask.sum())
    perm = np.full(S, -1, np.int64)
    perm[ordered] = np.arange(n_reach)
    es = perm[np.asarray(e_src, np.int64)]
    ed = perm[np.asarray(e_dst, np.int64)]
    idx = (es * A + np.asarray(e_iw, np.int64)).astype(np.int64)
    ow_perm = np.zeros(max(n_reach, 1), np.int32)
    ow_perm[perm[ordered]] = np.asarray(moore_ow)[ordered]
    dnext = _scatter_dense(
        jnp.asarray(idx.astype(np.int32)), jnp.asarray(ed.astype(np.int32)),
        int(n_reach * A),
    )
    return dnext, jnp.asarray(ow_perm), perm, n_f, n_reach


@functools.partial(jax.jit, static_argnames=("lw", "n_f", "n_a"))
def wp_subword_pass_dense(
    tables: LexerDeviceTables,
    dnext: jax.Array,  # int32 [n_reach * n_a] dense finals-first next table
    ow_perm: jax.Array,  # int32 [n_reach] Moore Ow by permuted state
    x: jax.Array,
    init_lanes: jax.Array,  # PERMUTED per-lane initial states
    l_iw: jax.Array,
    r_iw: jax.Array,
    lw: int,
    n_f: int,
    n_a: int,
):
    """wp_subword_pass with the 1-gather dense walk (see make_dense_sub)."""
    B, M = x.shape
    pos = jnp.arange(M, dtype=jnp.int32)
    x_pad = jnp.pad(x, ((0, 0), (0, lw + 1)), constant_values=-1)

    is_l = x == l_iw
    valid_start = (x >= 0) & (x != r_iw)

    state = jnp.where(valid_start, init_lanes, -1).astype(jnp.int32)
    fin_pos = jnp.full((B, M), -1, jnp.int32)
    fin_state = jnp.full((B, M), -1, jnp.int32)
    top = dnext.shape[0] - 1
    for d in range(lw):
        c = x_pad[:, d : d + M]
        flat = jnp.clip(
            jnp.maximum(state, 0) * n_a + jnp.maximum(c, 0), 0, top
        )
        ns = jnp.where((state >= 0) & (c >= 0), dnext[flat], -1)
        if d >= tables.max_token_length:
            # letters beyond the token-length bound only via the R anchor
            ns = jnp.where(c == r_iw, ns, -1)
        fin = (ns >= 0) & (ns < n_f)
        fin_pos = jnp.where(fin, pos + d, fin_pos)
        fin_state = jnp.where(fin, ns, fin_state)
        state = ns

    # ONE Ow gather for the deepest final per start (replaces the per-step
    # final[]/moore_ow[] gathers of the comb walk)
    fin_ow = jnp.where(
        fin_state >= 0,
        ow_perm[jnp.clip(fin_state, 0, ow_perm.shape[0] - 1)],
        -1,
    )
    return _wp_emit(tables, x, fin_pos, fin_ow, is_l, valid_start, pos)


def _wp_emit(tables, x, fin_pos, fin_ow, is_l, valid_start, pos):
    """Shared SCAN+EMIT tail of the wp sub-token passes.

    The sequential visited-scan stays a lax.scan: the closed-form cummax
    trick from ops/bpe's filter is NOT safe here — interior continuation
    pieces ("##...") routinely extend past the covering match, which is
    exactly the over-coverage case the bpe closed form flags as an anomaly
    (it would storm WordPiece rows into fallback).  Compaction uses the
    bitonic network instead of jax.lax.sort (the bpe kernels measured
    lax.sort as their single most expensive stage on this backend)."""
    from .bpe import _bitonic_sort

    B, M = x.shape
    right = tables.act_right[jnp.maximum(fin_ow, 0)]
    tag = jnp.where(fin_ow >= 0, tables.act_tag[jnp.maximum(fin_ow, 0)], 0)
    fn = jnp.where(fin_ow >= 0, tables.act_fn[jnp.maximum(fin_ow, 0)], -1)

    from_orig = jnp.where(is_l, pos[None, :], pos[None, :] - 1)
    fpos_orig = fin_pos - 1
    from2 = jnp.clip(from_orig, 0, M - 1)
    to2 = jnp.clip(fpos_orig - right, 0, M - 1)

    has = fin_pos >= 0
    skip_to = jnp.where(has, jnp.maximum(from_orig, fpos_orig - right), from_orig)

    def scan_step(nv, inp):
        q, skip_q = inp
        vis = nv == q
        nv = jnp.where(vis, skip_q + 1 + 1, nv)
        return nv, vis

    _, vis_t = jax.lax.scan(
        scan_step, jnp.zeros(B, jnp.int32), (pos, skip_to.T)
    )
    visited = vis_t.T & valid_start & has

    emit = visited & ((tag != 0) | (fn >= 0))
    lane = (
        (tag + 1)
        | (from2 << 17)
        | (to2 << 24)
        | ((fn >= 0).astype(jnp.int32) << 31)
    )
    key = jnp.where(emit, pos[None, :], INT32_MAX)
    P2 = 1 << max(1, (M - 1).bit_length())
    if P2 != M:
        padw = ((0, 0), (0, P2 - M))
        key = jnp.pad(key, padw, constant_values=INT32_MAX)
        lane = jnp.pad(lane, padw)
    skey, svals = _bitonic_sort((key,), (lane,))
    skey, svals = skey[:, :M], svals[:, :M]
    svals = jnp.where(skey != INT32_MAX, svals, 0)
    counts = jnp.sum(emit, axis=1).astype(jnp.int32)
    return jnp.concatenate(
        [svals, counts[:, None], jnp.zeros((B, 1), jnp.int32)], axis=1
    )


@functools.partial(jax.jit, static_argnames=("lw",))
def wp_subword_pass(
    tables: LexerDeviceTables,
    x: jax.Array,  # int32 (B, M): packed [L w1 R][L w2 R]… unit rows, -1 pad
    init_lanes: jax.Array,  # int32 (B, M): per-lane initial state (unit's fn)
    l_iw: jax.Array,  # int32 scalar: dense id of IW_L_ANCHOR
    r_iw: jax.Array,  # int32 scalar: dense id of IW_R_ANCHOR
    lw: int,  # static walk depth (>= longest unit + 2)
):
    """Sub-token pass over DENSELY PACKED unique word units.

    Each unit carries its own L/R anchors, so one row holds many units; the
    caller guarantees (host precheck) that the sub-grammar has no IW_ANY
    transitions and cannot walk across an R anchor, so matches stay inside
    their unit and the whole row shares one sequential visited-scan.

    The depth loop is UNROLLED (see ops/bpe._walk_impl on while_loop
    invariant re-staging) and skips the IW_ANY fallback lookup entirely —
    one comb gather per step.

    Returns (B, M+2) int32: lanes 0..M-1 = left-compacted matches packed as
    (tag+1) | from<<17 | to<<24 | nested<<31 in row coordinates (the layout
    BtlWpStitch consumes), col M = match count, col M+1 = reserved."""
    B, M = x.shape
    pos = jnp.arange(M, dtype=jnp.int32)
    x_pad = jnp.pad(x, ((0, 0), (0, lw + 1)), constant_values=-1)

    is_l = x == l_iw
    valid_start = (x >= 0) & (x != r_iw)

    state = jnp.where(valid_start, init_lanes, -1).astype(jnp.int32)
    fin_pos = jnp.full((B, M), -1, jnp.int32)
    fin_ow = jnp.full((B, M), -1, jnp.int32)
    for d in range(lw):
        c = x_pad[:, d : d + M]
        s_safe = jnp.maximum(state, 0)
        slot = jnp.clip(
            tables.base[s_safe] + jnp.maximum(c, 0), 0, tables.n_slots - 1
        )
        hit = (tables.owner[slot] == state) & (state >= 0) & (c >= 0)
        ns = jnp.where(hit, tables.nxt[slot], -1)
        if d >= tables.max_token_length:
            # letters beyond the token-length bound only via the R anchor
            # (FALexTools_t.h:236-241)
            ns = jnp.where(c == r_iw, ns, -1)
        fin = (ns >= 0) & tables.final[jnp.maximum(ns, 0)]
        fin_pos = jnp.where(fin, pos + d, fin_pos)
        fin_ow = jnp.where(fin, tables.moore_ow[jnp.maximum(ns, 0)], fin_ow)
        state = ns

    right = tables.act_right[jnp.maximum(fin_ow, 0)]
    tag = jnp.where(fin_ow >= 0, tables.act_tag[jnp.maximum(fin_ow, 0)], 0)
    fn = jnp.where(fin_ow >= 0, tables.act_fn[jnp.maximum(fin_ow, 0)], -1)

    # original (content) coordinates: ext - 1, except L-anchor starts which
    # bind to their unit's first character (from_pos=-1 -> from2=0 in the
    # reference, FALexTools_t.h:297-345)
    from_orig = jnp.where(is_l, pos[None, :], pos[None, :] - 1)
    fpos_orig = fin_pos - 1
    from2 = jnp.clip(from_orig, 0, M - 1)
    to2 = jnp.clip(fpos_orig - right, 0, M - 1)

    has = fin_pos >= 0
    skip_to = jnp.where(has, jnp.maximum(from_orig, fpos_orig - right), from_orig)

    def scan_step(nv, inp):
        q, skip_q = inp
        vis = nv == q
        nv = jnp.where(vis, skip_q + 1 + 1, nv)
        return nv, vis

    _, vis_t = jax.lax.scan(
        scan_step, jnp.zeros(B, jnp.int32), (pos, skip_to.T)
    )
    visited = vis_t.T & valid_start & has

    emit = visited & ((tag != 0) | (fn >= 0))
    lane = (
        (tag + 1)
        | (from2 << 17)
        | (to2 << 24)
        | ((fn >= 0).astype(jnp.int32) << 31)
    )
    # left-compaction: stable sort by (emitted ? position : MAX)
    key = jnp.where(emit, pos[None, :], INT32_MAX)
    skey, svals = jax.lax.sort([key, lane], dimension=1, num_keys=1)
    svals = jnp.where(skey != INT32_MAX, svals, 0)
    counts = jnp.sum(emit, axis=1).astype(jnp.int32)
    return jnp.concatenate(
        [svals, counts[:, None], jnp.zeros((B, 1), jnp.int32)], axis=1
    )
