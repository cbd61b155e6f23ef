"""Device-resident transition tables.

The reference walks packed automata by chasing byte offsets with per-state
binary searches (FARSDfa_pack_triv.cpp:141-399).  That is hostile to a vector
unit, so we repack the dense edge list into a classic *row-displacement*
("comb") table at load time:

    slot        = base[state] + iw
    hit         = owner[slot] == state
    next_state  = nxt[slot]    (if hit)
    ow          = ow[slot]     (if hit)

One step of every stream is then three gathers + a compare — identical work
for thousands of streams, which is exactly what the TPU VPU wants.  Table
size is O(#edges * slack), a few hundred KB for the shipped models, so the
whole table lives in VMEM.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..formats.dfa import DEAD, DenseAutomaton


@dataclass
class CombTable:
    """Row-displaced transition table + per-state metadata."""

    base: np.ndarray  # int32[n_states] displacement per state
    owner: np.ndarray  # int32[slots] owning state per slot (-1 = empty)
    nxt: np.ndarray  # int32[slots] destination state (-1 = dead)
    ow: np.ndarray  # int32[slots] transition output weight
    final: np.ndarray  # bool[n_states]
    sym2iw: np.ndarray  # int32[max_sym+1] raw symbol -> dense iw (-1 absent)
    n_states: int
    n_iws: int
    max_sym: int

    @property
    def n_slots(self) -> int:
        return len(self.owner)


def build_comb_table_cached(aut: DenseAutomaton, model_key: str | None, tag: str) -> CombTable:
    """build_comb_table memoized on the source model's content key."""
    if model_key is None:
        return build_comb_table(aut)
    from ..models import cache

    key = f"{model_key}-comb-{tag}"
    hit = cache.load(key)
    if hit is not None:
        return hit
    t = build_comb_table(aut)
    cache.store(key, t)
    return t


def build_comb_table(aut: DenseAutomaton, fill_factor: float = 1.25) -> CombTable:
    """First-fit displacement packing of the automaton's transition rows."""
    # 1. dense input-weight alphabet
    if aut.iw2iw is not None:
        # DFA was compiled with --remap-iws: edges already use internal iws
        # and the image carries the original->internal map.
        sym2iw = aut.iw2iw
        n_iws = int(sym2iw.max()) + 1 if len(sym2iw) else 0
        n_iws = max(n_iws, int(aut.edge_iw.max()) + 1 if len(aut.edge_iw) else 0)
    else:
        uniq = np.unique(aut.edge_iw)
        n_iws = len(uniq)
        max_sym = int(uniq.max()) if n_iws else 0
        sym2iw = np.full(max_sym + 1, -1, np.int32)
        sym2iw[uniq] = np.arange(n_iws, dtype=np.int32)

    max_sym = len(sym2iw) - 1

    # 2. group edges by state
    n = aut.n_states
    e_iw = (
        aut.edge_iw
        if aut.iw2iw is not None
        else sym2iw[aut.edge_iw]  # remap raw iws to dense ids
    ).astype(np.int64)
    order = np.argsort(aut.edge_src, kind="stable")
    src_sorted = aut.edge_src[order]
    iw_sorted = e_iw[order]
    dst_sorted = aut.edge_dst[order].astype(np.int32)
    ow_sorted = aut.edge_ow[order].astype(np.int32)
    row_ptr = np.searchsorted(src_sorted, np.arange(n + 1))

    # 3. displacement packing, densest rows first.  Dense (multi-transition)
    # rows are placed by first-fit over candidate bases derived from free
    # slots; degree-1 rows then fill the remaining holes exactly, so the
    # table ends up nearly 100% dense.  Bases may be negative (slot = base +
    # iw just has to land in-range for *owned* slots; foreign lookups are
    # clamped and rejected by the owner check).
    degrees = np.diff(row_ptr)
    state_order = np.argsort(-degrees, kind="stable")
    n_edges = len(src_sorted)
    cap = int(n_edges * fill_factor) + 2 * n_iws + 64
    owner = np.full(cap, -1, np.int32)
    base = np.zeros(n, np.int32)
    nxt = np.full(cap, -1, np.int32)
    oww = np.zeros(cap, np.int32)
    occupied = np.zeros(cap, bool)

    free_hint = 0  # all slots below are occupied
    for s in state_order:
        lo, hi = row_ptr[s], row_ptr[s + 1]
        deg = hi - lo
        if deg == 0:
            base[s] = -1 - n_iws  # never hits: all owned lookups clamp+miss
            continue
        iws = iw_sorted[lo:hi]
        while occupied[free_hint]:
            free_hint += 1
        if deg == 1:
            b = free_hint - int(iws[0])
        else:
            # anchor the first iw on free slots; search candidate anchors in
            # vectorized chunks of the occupancy bitmap
            iw0 = int(iws[0])
            rel = (iws - iw0).astype(np.int64)
            chunk = 4096
            cand = -1
            c0 = free_hint
            while cand < 0:
                while c0 + chunk + n_iws + int(rel[-1]) >= cap:
                    grow = cap
                    owner = np.concatenate([owner, np.full(grow, -1, np.int32)])
                    nxt = np.concatenate([nxt, np.full(grow, -1, np.int32)])
                    oww = np.concatenate([oww, np.zeros(grow, np.int32)])
                    occupied = np.concatenate([occupied, np.zeros(grow, bool)])
                    cap += grow
                ok = ~occupied[c0 : c0 + chunk]
                for r in rel[1:]:
                    ok &= ~occupied[c0 + r : c0 + r + chunk]
                hit = np.argmax(ok)
                if ok[hit]:
                    cand = c0 + int(hit)
                else:
                    c0 += chunk
            b = cand - iw0
        base[s] = b
        slots = b + iws
        occupied[slots] = True
        owner[slots] = s
        d = dst_sorted[lo:hi]
        nxt[slots] = np.where(d == DEAD, -1, d)
        oww[slots] = ow_sorted[lo:hi]

    used = (int(occupied.nonzero()[0].max()) + 1 if occupied.any() else 0) + n_iws
    # guarantee base[s] + iw stays in range for ANY probe iw <= n_iws (the
    # "missing symbol" sentinel id n_iws probes one past the real alphabet)
    if n:
        used = max(used, int(base.max()) + n_iws + 1)
    return CombTable(
        base=base,
        owner=owner[:used].copy(),
        nxt=nxt[:used].copy(),
        ow=oww[:used].copy(),
        final=aut.final.copy(),
        sym2iw=sym2iw.astype(np.int32),
        n_states=n,
        n_iws=n_iws,
        max_sym=max_sym,
    )


def verify_comb_table(table: CombTable, aut: DenseAutomaton, samples: int = 5000):
    """Spot-check table lookups against the raw edge list."""
    rng = np.random.default_rng(0)
    n_e = len(aut.edge_src)
    idx = rng.integers(0, n_e, size=min(samples, n_e))
    e_iw = aut.edge_iw if aut.iw2iw is not None else aut.edge_iw
    for i in idx:
        s = int(aut.edge_src[i])
        iw_raw = int(e_iw[i])
        iw = iw_raw if aut.iw2iw is not None else int(table.sym2iw[iw_raw])
        slot = int(table.base[s]) + iw
        assert table.owner[slot] == s, (s, iw)
        want = int(aut.edge_dst[i])
        got = int(table.nxt[slot])
        assert got == (want if want != DEAD else -1)
        assert int(table.ow[slot]) == int(aut.edge_ow[i])


def build_trie_table(
    comb: CombTable,
    ids: np.ndarray,
    ranks: np.ndarray,
    max_entries: int = 96_000_000,
):
    """Vocabulary-trie expansion of a Mealy MPH automaton for 1-gather walks.

    The minimal Mealy automaton shares suffix states, so recovering a token
    id needs the Ow path sum plus an I2Info lookup — several gathers per
    step on device.  Expanding to the (state, path-sum) DAG gives each final
    node a UNIQUE token: number final nodes BY their token id and the device
    walk needs exactly one gather per step (``next[node * A + c]``; a node
    is final iff its index < vocab_size, and then the index IS the id).

    Returns (edge_idx int64[E], edge_val int32[E], rank_by_id float32[V],
    root_idx, n_nodes) or None when the dense table would exceed
    ``max_entries`` slots.  ``edge_idx[k] = node * n_iws + iw`` — the trie
    ships as CSR pairs (~1 MB) and is densified ON DEVICE with one scatter
    (ops/bpe._densify_trie_on_device); uploading the ~100 MB dense gpt2
    table through the tunneled backend cost ~55 s per process (round 5).
    """
    n_iws = comb.n_iws
    nkeys = len(ids)
    V = int(ids.max()) + 1 if nkeys else 0

    # adjacency per state from the comb arrays
    slots = np.nonzero(comb.owner >= 0)[0]
    s_state = comb.owner[slots]
    s_iw = slots - comb.base[s_state]
    s_nxt = comb.nxt[slots]
    s_ow = comb.ow[slots]
    order = np.argsort(s_state, kind="stable")
    s_state, s_iw, s_nxt, s_ow = (
        s_state[order], s_iw[order], s_nxt[order], s_ow[order]
    )
    row_ptr = np.searchsorted(s_state, np.arange(comb.n_states + 1))

    # DFS over (state, sum) with memo; node ids: finals = token id, others
    # allocated past V
    memo: dict[tuple[int, int], int] = {}
    edges: list[tuple[int, int, int]] = []  # (node, iw, child_node)
    next_internal = V
    stack = [(0, 0)]
    root = None

    def node_id(state: int, sm: int) -> int:
        nonlocal next_internal
        key = (state, sm)
        got = memo.get(key)
        if got is not None:
            return got
        if comb.final[state]:
            if not (0 <= sm < nkeys):
                raise ValueError("MPH sum out of range")
            nid = int(ids[sm])
        else:
            nid = next_internal
            next_internal += 1
        memo[key] = nid
        return nid

    root = node_id(0, 0)
    seen = {(0, 0)}
    while stack:
        state, sm = stack.pop()
        nid = node_id(state, sm)
        for k in range(row_ptr[state], row_ptr[state + 1]):
            dst, ow = int(s_nxt[k]), int(s_ow[k])
            if dst < 0:
                continue
            csum = sm + ow
            child = (dst, csum)
            edges.append((nid, int(s_iw[k]), node_id(dst, csum)))
            if child not in seen:
                seen.add(child)
                stack.append(child)
        if len(memo) * n_iws > max_entries:
            return None

    n_nodes = max(next_internal, V)
    if n_nodes * n_iws > max_entries:
        return None
    if edges:
        e = np.asarray(edges, dtype=np.int64)
        edge_idx = e[:, 0] * n_iws + e[:, 1]
        edge_val = e[:, 2].astype(np.int32)
    else:
        edge_idx = np.zeros(0, np.int64)
        edge_val = np.zeros(0, np.int32)
    rank_by_id = np.zeros(max(V, 1), np.float32)
    if nkeys:
        rank_by_id[ids.astype(np.int64)] = ranks
    return edge_idx, edge_val, rank_by_id, root, n_nodes


def build_trie_table_cached(
    comb: CombTable,
    ids: np.ndarray,
    ranks: np.ndarray,
    model_key: str | None,
):
    if model_key is None:
        return build_trie_table(comb, ids, ranks)
    from ..models import cache

    key = f"{model_key}-trie2"  # v2: CSR edge format (round 5)
    hit = cache.load(key)
    if hit is not None:
        return None if hit == "none" else hit
    t = build_trie_table(comb, ids, ranks)
    cache.store(key, t if t is not None else "none")
    return t
