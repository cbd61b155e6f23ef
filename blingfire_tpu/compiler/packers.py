"""Binary packers: write the LDB memory-dump formats.

Produces dumps readable both by this framework's loaders and by the original
reference runtime (formats specified at
blingfirecompile.library/inc/FADfaPack_triv.h:27-93,
blingfireclient.library/src/FAMultiMap_pack.cpp:22-52,
FAMultiMap_pack_fixed.cpp:25-58, FAArray_pack.cpp:27-65,
FAStringArray_pack.cpp:23-49, FAChains_pack_triv.cpp:21-30,
FALDB.cpp:24-116).  The writers always choose simple representation options
(PARA transitions, int32 chain values, flat arrays) — readers support them
all, and table repacking for the TPU happens at load time anyway.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

TRS_PARA = 0x04


def _iw_size_code(max_iw: int) -> tuple[int, int]:
    """(bytes, info-code) with only 1/2/4 allowed (readers use C types)."""
    if max_iw <= 0xFF:
        return 1, 0
    if max_iw <= 0xFFFF:
        return 2, 1
    return 4, 3


def _ow_code(size: int) -> int:
    return {0: 0, 1: 1, 2: 2, 4: 3}[size]


def _le(value: int, size: int) -> bytes:
    return int(value & ((1 << (8 * size)) - 1)).to_bytes(size, "little")


def _be(value: int, size: int) -> bytes:
    return int(value & ((1 << (8 * size)) - 1)).to_bytes(size, "big")


class ChainsWriter:
    """FAChainsPack_triv store: [SizeOfValue:i32][MaxCount:i32] + chains,
    each [Count:<sz>][values:<sz>*Count] little-endian signed."""

    def __init__(self, size_of_value: int = 4):
        self.size_of_value = size_of_value
        self.chunks: list[bytes] = []
        self.offset = 8  # header
        self.max_count = 0
        self._memo: dict[bytes, int] = {}

    def add(self, values) -> int:
        """Append a chain (deduplicated); returns its store offset."""
        sz = self.size_of_value
        data = _le(len(values), sz) + b"".join(_le(int(v), sz) for v in values)
        got = self._memo.get(data)
        if got is not None:
            return got
        off = self.offset
        self.chunks.append(data)
        self.offset += len(data)
        self.max_count = max(self.max_count, len(values))
        self._memo[data] = off
        return off

    def dump(self) -> bytes:
        return (
            struct.pack("<ii", self.size_of_value, self.max_count)
            + b"".join(self.chunks)
        )


def pack_offset_table(offsets) -> bytes:
    """Packed offset table (reader: FAOffsetTable_pack.cpp:24-83).

    Layout: ``[Shift:i32][BaseSize:i32][Count:i32]`` + (when Shift != 0) a
    uint8 delta per index + a big-endian base array indexed by
    ``idx >> Shift``.  Shift is chosen as the largest value in 0..7 whose
    within-block deltas all fit a byte (FAOffsetTablePack::CalcSkipValue
    semantics); offsets must be non-decreasing for compression to apply."""
    offs = [int(o) for o in offsets]
    n = len(offs)
    if n == 0:
        raise ValueError("empty offset table")
    shift = 0
    for cand in range(7, 0, -1):
        mask = (1 << cand) - 1
        base = 0
        ok = True
        for i, o in enumerate(offs):
            if (i & mask) == 0:
                base = o
            else:
                d = o - base
                if d < 0 or d > 0xFF:
                    ok = False
                    break
        if ok:
            shift = cand
            break
    if shift:
        bases = [offs[i] for i in range(0, n, 1 << shift)]
        deltas = bytes((offs[i] - offs[i & ~((1 << shift) - 1)]) & 0xFF for i in range(n))
    else:
        bases = offs
        deltas = b""
    max_base = max(bases)
    base_size = 1 if max_base <= 0xFF else 2 if max_base <= 0xFFFF else (
        3 if max_base <= 0xFFFFFF else 4
    )
    out = struct.pack("<iii", shift, base_size, n)
    out += deltas
    out += b"".join(_be(b, base_size) for b in bases)
    return out


def pack_multimap(mapping: dict[int, list[int]]) -> bytes:
    """FAMultiMap_pack: [MaxKey][SizeOfOffset][offsets BE][pad][chains]."""
    max_key = max(mapping.keys(), default=0)
    chains = ChainsWriter(4)
    offsets = np.zeros(max_key + 1, np.int64)
    for k in sorted(mapping):
        offsets[k] = chains.add(mapping[k]) + 1  # 0 = no mapping
    max_off = int(offsets.max())
    size_of_offset = 1 if max_off <= 0xFF else 2 if max_off <= 0xFFFF else (
        3 if max_off <= 0xFFFFFF else 4
    )
    out = bytearray(struct.pack("<ii", max_key, size_of_offset))
    for v in offsets:
        out += _be(int(v), size_of_offset)
    while len(out) % 4:
        out += b"\0"
    out += chains.dump()
    return bytes(out)


def pack_multimap_fixed(mapping: dict[int, list[int]], size_of_value: int = 4) -> bytes:
    """FAMultiMap_pack_fixed: [SizeOfValue][MaxCount][MinKey][MaxKey] + slots."""
    assert mapping
    min_key = min(mapping)
    max_key = max(mapping)
    max_count = max(len(v) for v in mapping.values())
    out = bytearray(
        struct.pack("<iiii", size_of_value, max_count, min_key, max_key)
    )
    for k in range(min_key, max_key + 1):
        vals = mapping.get(k)
        slot = bytearray()
        if vals is None:
            # unreachable key inside range: store count > max via... the
            # reader treats count > MaxCount as "no mapping"; max_count+1
            # encodes that, but keep it representable
            slot += _le(max_count + 1, size_of_value)
            vals = []
        else:
            slot += _le(len(vals), size_of_value)
        for v in vals:
            slot += _le(int(v), size_of_value)
        while len(slot) < (max_count + 1) * size_of_value:
            slot += b"\0" * size_of_value
            slot = slot[: (max_count + 1) * size_of_value]
        out += slot[: (max_count + 1) * size_of_value]
    return bytes(out)


def pack_array_flat(values: np.ndarray) -> bytes:
    """FAArray_pack flat form: [M=1][SizeOfIndex=0][SizeOfValue][Count]+BE."""
    values = np.asarray(values)
    max_v = int(values.max()) if len(values) else 0
    sz = 1 if max_v <= 0xFF else 2 if max_v <= 0xFFFF else (
        3 if max_v <= 0xFFFFFF else 4
    )
    out = bytearray(struct.pack("<iiii", 1, 0, sz, len(values)))
    for v in values:
        out += _be(int(v), sz)
    return bytes(out)


def pack_string_array(strings: list[bytes]) -> bytes:
    """FAStringArray_pack: [Count][Count+1 offsets][bytes]."""
    out = bytearray(struct.pack("<i", len(strings)))
    off = 0
    for s in strings:
        out += struct.pack("<I", off)
        off += len(s)
    out += struct.pack("<I", off)
    for s in strings:
        out += s
    return bytes(out)


def _alphabet_ranges(iws: np.ndarray) -> list[tuple[int, int]]:
    iws = np.unique(np.asarray(iws))
    ranges = []
    start = prev = int(iws[0])
    for v in iws[1:]:
        v = int(v)
        if v == prev + 1:
            prev = v
        else:
            ranges.append((start, prev))
            start = prev = v
    ranges.append((start, prev))
    return ranges


def pack_mealy_dfa(
    n_states: int,
    initial: int,
    final: np.ndarray,
    edges: dict[int, list[tuple[int, int, int]]],  # src -> [(iw, dst, ow)]
    dst_size: int = 3,
) -> bytes:
    """Packed Mealy automaton image (FADfaPack_triv layout, PARA states).

    State ids are byte offsets; we lay states out in id order with the
    initial state first (required: initial == end of header)."""
    assert initial == 0, "state 0 must be the initial state"
    all_iws = sorted({iw for es in edges.values() for (iw, _d, _o) in es})
    assert all_iws, "empty automaton"
    ranges = _alphabet_ranges(np.array(all_iws))

    ows = ChainsWriter(4)

    # 1. per-state layout: compute sizes, assign offsets
    header_size = 12 + 8 * len(ranges)
    state_meta = []
    for s in range(n_states):
        es = sorted(edges.get(s, []))
        if es:
            max_iw = max(iw for iw, _d, _o in es)
            iw_size, iw_code = _iw_size_code(max_iw)
            ow_off = ows.add([o for _i, _d, o in es])
            ow_size = 1 if ow_off <= 0x7F else 2 if ow_off <= 0x7FFF else 4
            size = 1 + iw_size * (1 + len(es)) + dst_size * len(es) + ow_size
        else:
            iw_size, iw_code, ow_off, ow_size = 1, 0, None, 0
            size = 1
        state_meta.append((es, iw_size, iw_code, ow_off, ow_size, size))

    offsets = np.zeros(n_states, np.int64)
    pos = header_size
    for s in range(n_states):
        offsets[s] = pos
        pos += state_meta[s][5]
    body_end = pos
    ows_offset = body_end

    # 2. emit
    out = bytearray()
    out += struct.pack("<iii", dst_size, ows_offset, 2 * len(ranges))
    for a, b in ranges:
        out += struct.pack("<ii", a, b)
    dead = (1 << (8 * dst_size)) - 1
    for s in range(n_states):
        es, iw_size, iw_code, ow_off, ow_size, _size = state_meta[s]
        if not es:
            info = 0x00 | (iw_code << 3) | (0 << 5)
            if final[s]:
                info |= 0x80
            out += bytes([info])
            continue
        info = TRS_PARA | (iw_code << 3) | (_ow_code(ow_size) << 5)
        if final[s]:
            info |= 0x80
        out += bytes([info])
        out += _le(len(es) - 1, iw_size)
        for iw, _d, _o in es:
            out += _le(iw, iw_size)
        for _iw, d, _o in es:
            out += _be(int(offsets[d]) if d >= 0 else dead, dst_size)
        out += _le(ow_off, ow_size)
    assert len(out) == body_end
    out += ows.dump()
    return bytes(out)


def pack_moore_mdfa(
    n_states: int,
    initial: int,
    final: np.ndarray,
    edges: dict[int, list[tuple[int, int]]],  # src -> [(iw, dst)]
    state_ows: dict[int, list[int]],  # src -> sorted Ows set (absent = none)
    dst_size: int = 3,
    alphabet_ranges: list[tuple[int, int]] | None = None,  # ORIGINAL iw ranges
    iw_map_entries: list[tuple[int, int]] | None = None,  # original -> internal
) -> bytes:
    """Packed multi-Moore automaton (FADfaPack_triv layout, PARA states).

    Like the Mealy image, the trailing Ow slot of a state holds an offset
    into a chains store appended after the body — but here the chain is the
    *state's* Ows set, read back by FAState2Ows_pack_triv::GetOws
    (blingfireclient.library/src/FAState2Ows_pack_triv.cpp:46-170).

    When ``iw_map_entries`` is given the image carries a --remap-iws header
    (alphabet in ORIGINAL iws + packed Iw2Iw map; edges use INTERNAL iws),
    same layout as ``pack_moore_dfa``."""
    assert initial == 0, "state 0 must be the initial state"
    remap = iw_map_entries is not None
    if remap:
        ranges = alphabet_ranges
        iw2iw_dump = pack_iw_map(iw_map_entries)
    else:
        all_iws = sorted({iw for es in edges.values() for (iw, _d) in es})
        assert all_iws, "empty automaton"
        ranges = _alphabet_ranges(np.array(all_iws))
        iw2iw_dump = b""

    ows = ChainsWriter(4)

    header_size = 12 + 8 * len(ranges) + (4 + len(iw2iw_dump) if remap else 0)
    state_meta = []
    for s in range(n_states):
        es = sorted(edges.get(s, []))
        owset = state_ows.get(s)
        if owset is not None:
            ow_off = ows.add(sorted(owset))
            ow_size = 1 if ow_off <= 0x7F else 2 if ow_off <= 0x7FFF else 4
        else:
            ow_off, ow_size = None, 0
        if es:
            max_iw = max(iw for iw, _d in es)
            iw_size, iw_code = _iw_size_code(max_iw)
            size = 1 + iw_size * (1 + len(es)) + dst_size * len(es) + ow_size
        else:
            iw_size, iw_code = 1, 0
            size = 1 + ow_size
        state_meta.append((es, iw_size, iw_code, ow_off, ow_size, size))

    offsets = np.zeros(n_states, np.int64)
    pos = header_size
    for s in range(n_states):
        offsets[s] = pos
        pos += state_meta[s][5]
    body_end = pos

    out = bytearray()
    out += struct.pack(
        "<iiI", dst_size, body_end,
        (0x80000000 if remap else 0) | (2 * len(ranges)),
    )
    for a, b in ranges:
        out += struct.pack("<ii", a, b)
    if remap:
        out += struct.pack("<i", len(iw2iw_dump))
        out += iw2iw_dump
    assert len(out) == header_size
    dead = (1 << (8 * dst_size)) - 1
    for s in range(n_states):
        es, iw_size, iw_code, ow_off, ow_size, _sz = state_meta[s]
        info = (TRS_PARA if es else 0) | (iw_code << 3) | (_ow_code(ow_size) << 5)
        if final[s]:
            info |= 0x80
        out += bytes([info])
        if es:
            out += _le(len(es) - 1, iw_size)
            for iw, _d in es:
                out += _le(iw, iw_size)
            for _iw, d in es:
                out += _be(int(offsets[d]) if d >= 0 else dead, dst_size)
        if ow_size:
            out += _le(ow_off, ow_size)
    assert len(out) == body_end
    out += ows.dump()
    return bytes(out)


def pack_multimap_mph(chains: list[tuple[int, ...]], direction: int = 0) -> bytes:
    """MPH-backed multimap (read side: FAMultiMap_pack_mph.cpp:22-93):
    ``[MaxChainSize:i32][Direction:i32]`` + Mealy MPH image whose key ids are
    the lexicographic ranks of the (direction-adjusted) chains."""
    from .mindfa import assign_mph_ows, build_min_dfa

    assert chains
    stored = [tuple(reversed(c)) if direction == 1 else tuple(c) for c in chains]
    stored = sorted(set(stored))
    n, final, edges = build_min_dfa(stored)
    mealy_edges = assign_mph_ows(n, final, edges)
    img = pack_mealy_dfa(n, 0, final, mealy_edges)
    max_len = max(len(c) for c in stored)
    return struct.pack("<ii", max_len, direction) + img


def pack_iw_map(entries: list[tuple[int, int]]) -> bytes:
    """FAIwMapPack dump: sorted (old_iw, new_iw) pairs -> interval-compressed
    map (read side: blingfireclient.library/src/FAIwMap_pack.cpp:35-88).

    Contiguous old-iw runs become intervals; gaps INSIDE an interval store 0
    (= no mapping); stored values are new_iw + 1."""
    entries = sorted(entries)
    assert entries
    max_new = max(v for _k, v in entries)
    size_of_new = (
        1 if max_new + 1 <= 0xFF else 2 if max_new + 1 <= 0xFFFF else
        3 if max_new + 1 <= 0xFFFFFF else 4
    )
    # build intervals: split when the gap is large enough that a new interval
    # header (12 bytes) is cheaper than storing zeros
    intervals: list[list[tuple[int, int]]] = [[entries[0]]]
    for k, v in entries[1:]:
        if k - intervals[-1][-1][0] <= max(16, 12 // size_of_new):
            intervals[-1].append((k, v))
        else:
            intervals.append([(k, v)])
    out = bytearray()
    out += struct.pack("<ii", size_of_new, len(intervals))
    for iv in intervals:
        out += struct.pack("<i", iv[0][0])
    storage = bytearray()
    for iv in intervals:
        frm = iv[0][0]
        to = iv[-1][0]
        out += struct.pack("<ii", to, len(storage))
        vals = {k: v for k, v in iv}
        for k in range(frm, to + 1):
            v = vals.get(k)
            storage += _be(0 if v is None else v + 1, size_of_new)
    out += storage
    return bytes(out)


def pack_moore_dfa(
    n_states: int,
    final,
    edges: dict[int, list[tuple[int, int]]],  # src -> [(internal_iw, dst)]
    state_ow,  # int array, -1 = no reaction
    alphabet_ranges: list[tuple[int, int]],  # ORIGINAL iw ranges (header)
    iw_map_entries: list[tuple[int, int]],  # original -> internal
    dst_size: int = 3,
) -> bytes:
    """Packed Moore automaton with --remap-iws (FADfaPack_triv layout,
    PARA transitions, inline Ow slot)."""
    iw2iw_dump = pack_iw_map(iw_map_entries)

    header_size = 12 + 8 * len(alphabet_ranges) + 4 + len(iw2iw_dump)
    state_meta = []
    for s in range(n_states):
        es = sorted(edges.get(s, []))
        ow = int(state_ow[s])
        ow_size = 0
        if ow != -1:
            ow_size = 1 if -128 <= ow <= 127 else 2 if -32768 <= ow <= 32767 else 4
        if es:
            max_iw = max(iw for iw, _d in es)
            iw_size, iw_code = _iw_size_code(max_iw)
            size = 1 + iw_size * (1 + len(es)) + dst_size * len(es) + ow_size
        else:
            iw_size, iw_code = 1, 0
            size = 1 + ow_size
        state_meta.append((es, iw_size, iw_code, ow, ow_size, size))

    offsets = []
    pos = header_size
    for s in range(n_states):
        offsets.append(pos)
        pos += state_meta[s][5]
    dead = (1 << (8 * dst_size)) - 1
    assert pos < dead, "image too large for dst_size"

    out = bytearray()
    out += struct.pack("<iiI", dst_size, 0, 0x80000000 | (2 * len(alphabet_ranges)))
    for a, b in alphabet_ranges:
        out += struct.pack("<ii", a, b)
    out += struct.pack("<i", len(iw2iw_dump))
    out += iw2iw_dump
    assert len(out) == header_size
    for s in range(n_states):
        es, iw_size, iw_code, ow, ow_size, _sz = state_meta[s]
        info = (TRS_PARA if es else 0) | (iw_code << 3) | (_ow_code(ow_size) << 5)
        if final[s]:
            info |= 0x80
        out += bytes([info])
        if es:
            out += _le(len(es) - 1, iw_size)
            for iw, _d in es:
                out += _le(iw, iw_size)
            for _iw, d in es:
                out += _be(offsets[d] if d >= 0 else dead, dst_size)
        if ow_size:
            out += _le(ow, ow_size)
    return bytes(out)


def pack_ldb(dumps: list[bytes], validate: bool = True) -> bytes:
    """LDB container: [Count][Offsets] + aligned dumps (+validation dump)."""
    n = len(dumps) + (1 if validate else 0)
    header = 4 + 4 * n
    offsets = []
    blobs = []
    pos = header
    for d in dumps:
        pad = (-pos) % 4
        pos += pad
        blobs.append(b"\0" * pad + d)
        offsets.append(pos)
        pos += len(d)
    if validate:
        pad = (-pos) % 4
        pos += pad
        # CRC over [dump_i start .. dump_{i+1} start) spans including the
        # inter-dump padding (FALDB.cpp:92-103)
        body = b"".join(blobs) + b"\0" * pad
        base = header
        size = 0
        crc = 0
        span_starts = offsets + [pos]
        for i in range(len(dumps)):
            b0 = span_starts[i] - base
            b1 = span_starts[i + 1] - base
            size += b1 - b0
            crc = zlib.crc32(body[b0:b1], crc)
        vdump = struct.pack("<III", 0, size, crc)
        blobs.append(b"\0" * pad + vdump)
        offsets.append(pos)
        pos += len(vdump)
    out = struct.pack("<i", n) + b"".join(struct.pack("<i", o) for o in offsets)
    out += b"".join(blobs)
    return out
