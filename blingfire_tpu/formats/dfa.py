"""Packed DFA/Mealy/Moore automaton image decoding and densification.

The reference interprets these images in place, one byte-offset "state" at a
time (blingfireclient.library/src/FARSDfa_pack_triv.cpp:27-399,
FAMealyDfa_pack_triv.cpp:24-244, FAState2Ow_pack_triv.cpp:34-130; authoritative
format spec: blingfirecompile.library/inc/FADfaPack_triv.h:27-93).

We instead decode the image ONCE at load time: enumerate all reachable states
with a BFS over byte offsets, renumber them densely, and emit flat NumPy edge
lists plus per-state reaction arrays.  The TPU runtime then repacks those into
vectorized transition tables; the byte-offset walk never runs at query time.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

import numpy as np

from .consts import TRS_IMPL, TRS_IWIA, TRS_NONE, TRS_PARA, TRS_RANGE
from .packed import ChainsPack, IwMapPack, read_i32, read_u32

# sentinel dense ids
DEAD = -2  # explicit dead transition (FAFsmConst::DFA_DEAD_STATE)
NONE = -1  # no transition

_OW_SIZE = {0: 0, 1: 1, 2: 2, 3: 4}
_SIGNED_DT = {1: "<i1", 2: "<i2", 4: "<i4"}
_UNSIGNED_DT = {1: "<u1", 2: "<u2", 4: "<u4"}


@dataclass
class PackedState:
    """One decoded state of a packed automaton image."""

    offset: int
    final: bool
    iws: np.ndarray  # outgoing input weights (internal alphabet), int32
    dsts: np.ndarray  # destination byte offsets; DEAD for dead transitions
    ow: int | None  # trailing Ow slot (Moore reaction / Mealy ows-chain offset)


class PackedDfaImage:
    """Header-parsed packed automaton image (one LDB dump)."""

    def __init__(self, buf: bytes, base: int):
        self.buf = buf
        self.base = base
        self.dst_size = read_i32(buf, base)
        if not (1 <= self.dst_size <= 4):
            self.dst_size = 3  # TRIV_PACK_DEF_DST_SIZE fallback
        self.ows_offset = read_i32(buf, base + 4)
        raw_count = read_u32(buf, base + 8)
        self.remap_iws = bool(raw_count & 0x80000000)
        self.iw_count = raw_count & 0x7FFFFFFF
        p = base + 12
        self.alphabet_ranges = (
            np.frombuffer(buf, "<i4", self.iw_count, p).reshape(-1, 2).copy()
        )
        p += 4 * self.iw_count
        self.iw2iw: IwMapPack | None = None
        if self.remap_iws:
            iw2iw_size = read_i32(buf, p)
            p += 4
            self.iw2iw = IwMapPack(buf, p)
            p += iw2iw_size
        self.initial = p - base  # state ids are offsets relative to image base
        self.ows: ChainsPack | None = (
            ChainsPack(buf, base + self.ows_offset) if self.ows_offset else None
        )

    # -- state decoding ----------------------------------------------------

    def decode_state(self, state: int) -> PackedState:
        """Decode the state stored at image-relative byte offset `state`."""
        buf = self.buf
        p = self.base + state
        info = buf[p]
        p += 1
        final = bool(info & 0x80)
        iw_size = ((info & 0x18) >> 3) + 1
        ow_size = _OW_SIZE[(info & 0x60) >> 5]
        tr = info & 0x07
        udt = _UNSIGNED_DT[iw_size]

        if tr == TRS_NONE:
            iws = np.empty(0, np.int32)
            dsts = np.empty(0, np.int64)
        elif tr == TRS_IMPL:
            iw = int(np.frombuffer(buf, udt, 1, p)[0])
            p += iw_size
            iws = np.array([iw], np.int32)
            dsts = np.array([state + 1 + iw_size + ow_size], np.int64)
        elif tr == TRS_PARA:
            count = 1 + int(np.frombuffer(buf, udt, 1, p)[0])
            p += iw_size
            iws = np.frombuffer(buf, udt, count, p).astype(np.int32)
            p += iw_size * count
            dsts = self._decode_dsts(p, count)
            p += self.dst_size * count
        elif tr == TRS_IWIA:
            iw_base = int(np.frombuffer(buf, udt, 1, p)[0])
            p += iw_size
            iw_max = int(np.frombuffer(buf, udt, 1, p)[0])
            p += iw_size
            count = iw_max - iw_base + 1
            all_dsts = self._decode_dsts(p, count, zero_is_none=True)
            p += self.dst_size * count
            keep = all_dsts != NONE
            iws = (np.arange(iw_base, iw_max + 1, dtype=np.int32))[keep]
            dsts = all_dsts[keep]
        elif tr == TRS_RANGE:
            count = 1 + int(np.frombuffer(buf, udt, 1, p)[0])
            p += iw_size
            from_iws = np.frombuffer(buf, udt, count, p).astype(np.int64)
            p += iw_size * count
            to_iws = np.frombuffer(buf, udt, count, p).astype(np.int64)
            p += iw_size * count
            range_dsts = self._decode_dsts(p, count)
            p += self.dst_size * count
            widths = (to_iws - from_iws + 1).astype(np.int64)
            iws = np.concatenate(
                [np.arange(f, t + 1, dtype=np.int32) for f, t in zip(from_iws, to_iws)]
            ) if count else np.empty(0, np.int32)
            dsts = np.repeat(range_dsts, widths)
        else:
            raise ValueError(f"bad transition type {tr} at state {state}")

        ow = None
        if ow_size:
            ow = int(np.frombuffer(buf, _SIGNED_DT[ow_size], 1, p)[0])
        return PackedState(state, final, iws, dsts, ow)

    def _decode_dsts(self, p: int, count: int, zero_is_none: bool = False):
        raw = np.frombuffer(self.buf, np.uint8, count * self.dst_size, p)
        raw = raw.reshape(count, self.dst_size).astype(np.int64)
        v = np.zeros(count, np.int64)
        for k in range(self.dst_size):
            v = (v << 8) | raw[:, k]
        sentinel = (1 << (8 * self.dst_size)) - 1
        out = np.where(v == sentinel, DEAD, v)
        if zero_is_none:
            out = np.where(v == 0, NONE, out)
        return out

    def moore_ows(self, st: PackedState) -> np.ndarray | None:
        """Multi-Moore reaction set of a state (FAState2Ows_pack_triv).

        The trailing Ow slot holds an offset into the chains store; the whole
        chain is the state's Ows set (FAState2Ows_pack_triv.cpp:130-170).
        Returns None when the state has no reaction."""
        if st.ow is None or self.ows is None:
            return None
        return self.ows.unpack(st.ow)

    def ow2iw_step(self, state: int, ow1: int) -> tuple[int, int, int]:
        """Reverse-MPH step (FAOw2Iw_pack_triv.cpp:65-265).

        From the state at byte offset `state`, follow the transition whose
        output weight is the largest one <= `ow1` and return
        ``(dest_offset, iw, ow2)``; ``dest_offset`` is -1 when no transition
        qualifies.  Only PARA and IMPL states are valid (MPH automata are
        packed without IWIA/RANGE rows, FAOw2Iw_pack_triv.cpp:250-256)."""
        if state < 0:
            return -1, -1, -1
        st = self.decode_state(state)
        if len(st.iws) == 0:
            return -1, -1, -1
        if st.ow is not None and self.ows is not None:
            ow2, idx = self.ows.get_equal_or_less(st.ow, ow1)
            if idx < 0:
                return -1, -1, -1
        else:
            ow2, idx = 0, 0
        dst = int(st.dsts[idx])
        if dst < 0:  # dead-state sentinel cannot appear in MPH images
            return -1, -1, -1
        return dst, int(st.iws[idx]), ow2

    def mph_chain(self, id_: int, initial: int | None = None) -> list[int] | None:
        """Id -> chain via the reverse-MPH walk
        (FAMphInterpretTools_t.h:125-166).  Returns None when `id_` is out of
        the automaton's perfect-hash range."""
        state = self.initial if initial is None else initial
        ow = id_
        chain: list[int] = []
        while True:
            state, iw, ow2 = self.ow2iw_step(state, ow)
            if state == -1:
                break
            chain.append(iw)
            ow -= ow2
        return chain if ow == 0 else None

    def mealy_ows(self, st: PackedState) -> np.ndarray:
        """Per-transition output weights of a Mealy state.

        The trailing Ow slot holds an offset into the chains store; entry i of
        that chain is the Ow of transition i (FAMealyDfa_pack_triv.cpp:220-243)."""
        if st.ow is None or self.ows is None or len(st.iws) == 0:
            return np.zeros(len(st.iws), np.int32)
        chain = self.ows.unpack(st.ow)
        return chain[: len(st.iws)].astype(np.int32)


class MphMultiMap:
    """MPH-backed multimap (FAMultiMap_pack_mph.cpp:22-93).

    Layout: ``[MaxChainSize:i32][Direction:i32]`` then a Mealy MPH image.
    ``get(key)`` recovers the key-th chain by the inverse-MPH walk
    (FAMphInterpretTools_t.h:127-166 + FAOw2Iw_pack_triv::GetDestIwOw):
    at each state take the transition with the LARGEST Ow <= remaining id,
    subtract, and descend; the id is valid iff the remainder hits zero."""

    DIR_L2R = 0
    DIR_R2L = 1

    def __init__(self, buf: bytes, base: int = 0):
        from .packed import read_i32

        self.max_chain_size = read_i32(buf, base)
        self.direction = read_i32(buf, base + 4)
        if self.max_chain_size <= 0 or self.direction not in (0, 1):
            raise ValueError("bad mph multimap header")
        img = PackedDfaImage(buf, base + 8)
        aut = densify_automaton(img, mealy=True)
        # per state: transitions sorted by Ow for the inverse walk
        self._rows: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for s in range(aut.n_states):
            m = aut.edge_src == s
            ows = aut.edge_ow[m]
            order = np.argsort(ows, kind="stable")
            self._rows.append(
                (ows[order], aut.edge_iw[m][order], aut.edge_dst[m][order])
            )
        self._final = aut.final

    def get(self, key: int) -> list[int] | None:
        if key < 0:
            return None
        state = 0
        rem = key
        chain: list[int] = []
        while state >= 0:
            ows, iws, dsts = self._rows[state]
            i = int(np.searchsorted(ows, rem, side="right")) - 1
            if i < 0:
                break
            chain.append(int(iws[i]))
            rem -= int(ows[i])
            state = int(dsts[i])
            if len(chain) > self.max_chain_size:
                return None
        if rem != 0:
            return None
        if self.direction == self.DIR_R2L:
            chain.reverse()
        return chain


@dataclass
class DenseAutomaton:
    """Flat, device-friendly view of one packed automaton.

    Edge list (src, iw, dst, ow) over densely renumbered states; state 0 is
    the initial state; `dst == DEAD` marks explicit dead transitions."""

    n_states: int
    initial: int
    final: np.ndarray  # bool[n_states]
    moore_ow: np.ndarray  # int32[n_states], -1 where absent
    edge_src: np.ndarray  # int32[n_edges]
    edge_iw: np.ndarray  # int32[n_edges]
    edge_dst: np.ndarray  # int32[n_edges]; DEAD for dead transitions
    edge_ow: np.ndarray  # int32[n_edges] (Mealy), zeros otherwise
    alphabet_ranges: np.ndarray  # (k,2) original-iw [from,to] ranges
    iw2iw: np.ndarray | None  # dense original->internal iw map or None
    state_offsets: np.ndarray  # dense id -> byte offset (for debugging)
    # multi-Moore reaction sets in CSR form (None unless multi_moore=True):
    # state s reacts with ows_val[ows_ptr[s]:ows_ptr[s+1]] (empty = none)
    ows_ptr: np.ndarray | None = None
    ows_val: np.ndarray | None = None

    @property
    def max_iw(self) -> int:
        return int(self.edge_iw.max()) if len(self.edge_iw) else 0


def densify_automaton(
    img: PackedDfaImage, mealy: bool = False, multi_moore: bool = False
) -> DenseAutomaton:
    """BFS-enumerate all reachable states and emit the dense edge list."""
    offset2id: dict[int, int] = {img.initial: 0}
    offsets: list[int] = [img.initial]
    queue: deque[int] = deque([img.initial])
    states: list[PackedState] = []
    ows_list: list[np.ndarray] = []

    while queue:
        off = queue.popleft()
        st = img.decode_state(off)
        states.append(st)
        if mealy:
            ows_list.append(img.mealy_ows(st))
        for d in st.dsts:
            d = int(d)
            if d >= 0 and d not in offset2id:
                offset2id[d] = len(offsets)
                offsets.append(d)
                queue.append(d)

    # NOTE: `states` is in BFS order which matches dense ids because each
    # state is appended exactly when its id is assigned... except the root is
    # id 0 but later-discovered states are decoded in queue order, which is
    # exactly id order (FIFO).  Re-sort defensively by id anyway.
    order = np.argsort([offset2id[s.offset] for s in states], kind="stable")
    states = [states[i] for i in order]
    if mealy:
        ows_list = [ows_list[i] for i in order]

    n = len(states)
    final = np.zeros(n, bool)
    moore_ow = np.full(n, -1, np.int32)
    ows_ptr = ows_val = None
    if multi_moore:
        ows_ptr = np.zeros(n + 1, np.int64)
        sets = [img.moore_ows(st) for st in states]
        ows_ptr[1:] = np.cumsum([0 if v is None else len(v) for v in sets])
        ows_val = (
            np.concatenate([v for v in sets if v is not None and len(v)])
            if any(v is not None and len(v) for v in sets)
            else np.empty(0, np.int32)
        ).astype(np.int32)
    srcs, iws, dsts, ows = [], [], [], []
    for sid, st in enumerate(states):
        final[sid] = st.final
        if not mealy and not multi_moore and st.ow is not None:
            moore_ow[sid] = st.ow
        if len(st.iws) == 0:
            continue
        srcs.append(np.full(len(st.iws), sid, np.int32))
        iws.append(st.iws)
        dsts.append(
            np.array(
                [DEAD if int(d) == DEAD else offset2id[int(d)] for d in st.dsts],
                np.int32,
            )
        )
        ows.append(ows_list[sid] if mealy else np.zeros(len(st.iws), np.int32))

    cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int32)
    return DenseAutomaton(
        n_states=n,
        initial=0,
        final=final,
        moore_ow=moore_ow,
        edge_src=cat(srcs),
        edge_iw=cat(iws),
        edge_dst=cat(dsts),
        edge_ow=cat(ows),
        alphabet_ranges=img.alphabet_ranges,
        iw2iw=img.iw2iw.densify() if img.iw2iw else None,
        state_offsets=np.array(offsets, np.int64),
        ows_ptr=ows_ptr,
        ows_val=ows_val,
    )
