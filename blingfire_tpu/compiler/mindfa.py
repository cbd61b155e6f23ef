"""Minimal acyclic DFA construction + Mealy perfect-hash weights.

Equivalent of the reference's offline `fa_chains2mindfa` (incremental minimal
DFA from sorted chains, FAChains2MinDfa_sort) and `fa_dfa2mph`
(FARSDfa2PerfHash): per-transition output weights such that the sum along an
accept path equals the word's index in symbol-lexicographic order — verified
edge-exact against the shipped gpt2.bin automaton.
"""

from __future__ import annotations

import numpy as np


class _State:
    __slots__ = ("trans", "final", "id")

    def __init__(self):
        self.trans: dict[int, "_State"] = {}
        self.final = False
        self.id = -1


def build_min_dfa(sorted_chains: list[tuple[int, ...]]):
    """Incremental minimal acyclic DFA (Daciuk et al.) from sorted chains.

    Returns (n_states, final bool[n], edges {src: [(iw, dst)]}) with state 0
    initial and ids assigned so the automaton can be emitted in order."""
    root = _State()
    register: dict[tuple, _State] = {}

    def replace_or_register(state: _State):
        # minimize the most recently added child chain
        if not state.trans:
            return
        last_iw = max(state.trans)  # children added in sorted order
        child = state.trans[last_iw]
        replace_or_register(child)
        key = (child.final, tuple(sorted((iw, id(t)) for iw, t in child.trans.items())))
        existing = register.get(key)
        if existing is not None:
            state.trans[last_iw] = existing
        else:
            register[key] = child

    prev: tuple[int, ...] = ()
    for chain in sorted_chains:
        assert chain > prev, "chains must be sorted strictly ascending"
        # common prefix
        cp = 0
        while cp < len(prev) and cp < len(chain) and prev[cp] == chain[cp]:
            cp += 1
        # minimize the diverging suffix of the previous word
        node = root
        path = [root]
        for c in prev[:cp]:
            node = node.trans[c]
            path.append(node)
        replace_or_register(path[cp])
        # add the new suffix
        node = path[cp]
        for c in chain[cp:]:
            nxt = _State()
            node.trans[c] = nxt
            node = nxt
        node.final = True
        prev = chain
    replace_or_register(root)

    # enumerate states (BFS from root, stable by iw)
    states: list[_State] = []
    root.id = 0
    states.append(root)
    qi = 0
    while qi < len(states):
        s = states[qi]
        qi += 1
        for iw in sorted(s.trans):
            t = s.trans[iw]
            if t.id == -1:
                t.id = len(states)
                states.append(t)

    n = len(states)
    final = np.zeros(n, bool)
    edges: dict[int, list[tuple[int, int]]] = {}
    for s in states:
        final[s.id] = s.final
        if s.trans:
            edges[s.id] = [(iw, s.trans[iw].id) for iw in sorted(s.trans)]
    return n, final, edges


def assign_mph_ows(n: int, final: np.ndarray, edges: dict) -> dict:
    """Per-transition Ows: ow(s, c) = final(s) + sum_{c'<c} C(dest(s, c'))."""
    # C(s) = accepted-string count from s, reverse topological
    import collections

    indeg = np.zeros(n, np.int64)
    for es in edges.values():
        for _iw, d in es:
            indeg[d] += 1
    topo = []
    q = collections.deque([s for s in range(n) if indeg[s] == 0])
    while q:
        s = q.popleft()
        topo.append(s)
        for _iw, d in edges.get(s, []):
            indeg[d] -= 1
            if indeg[d] == 0:
                q.append(d)
    assert len(topo) == n, "automaton must be acyclic"
    C = np.zeros(n, np.int64)
    for s in reversed(topo):
        C[s] = (1 if final[s] else 0) + sum(C[d] for _iw, d in edges.get(s, []))

    out: dict[int, list[tuple[int, int, int]]] = {}
    for s, es in edges.items():
        acc = 1 if final[s] else 0
        row = []
        for iw, d in es:  # es sorted by iw
            row.append((iw, d, int(acc)))
            acc += int(C[d])
        out[s] = row
    return out
