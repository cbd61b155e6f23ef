"""Readers for BlingFire packed (memory-dump) data structures.

These are host-side, NumPy-based decoders of the binary formats produced by
the reference offline compiler.  They are *load-time only*: each reader either
answers point queries (for the scalar oracle / tests) or densifies the whole
structure into flat NumPy arrays for the TPU runtime.

Binary format sources (reference, cited for parity checking — no code copied):
  - chains store:        blingfireclient.library/src/FAChains_pack_triv.cpp:21-30
                         blingfireclient.library/inc/FAChains_pack_triv.h:81-223
  - multimap:            blingfireclient.library/src/FAMultiMap_pack.cpp:22-126
  - fixed multimap:      blingfireclient.library/src/FAMultiMap_pack_fixed.cpp:25-161
  - packed array:        blingfireclient.library/src/FAArray_pack.cpp:27-99
  - string array:        blingfireclient.library/src/FAStringArray_pack.cpp:23-96
  - input-weight remap:  blingfireclient.library/src/FAIwMap_pack.cpp:35-88
                         blingfireclient.library/inc/FAIwMap_pack.h:55-109
  - byte codecs:         blingfireclient.library/inc/FAEncodeUtils.h:387-501
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "read_i32",
    "read_u32",
    "decode_be",
    "ChainsPack",
    "MultiMapPack",
    "MultiMapPackFixed",
    "ArrayPack",
    "StringArrayPack",
    "IwMapPack",
]


def read_i32(buf: bytes, off: int) -> int:
    """Little-endian int32 at byte offset `off`."""
    return int(np.frombuffer(buf, dtype="<i4", count=1, offset=off)[0])


def read_u32(buf: bytes, off: int) -> int:
    return int(np.frombuffer(buf, dtype="<u4", count=1, offset=off)[0])


def decode_be(buf, off: int, nbytes: int) -> int:
    """Big-endian unsigned value of 1..4 bytes (FADecode_1_2_3_4 semantics)."""
    v = 0
    for k in range(nbytes):
        v = (v << 8) | buf[off + k]
    return v


def _decode_be_vec(arr: np.ndarray, nbytes: int) -> np.ndarray:
    """Vectorized big-endian decode of a flat byte array into uint32 values."""
    a = arr.reshape(-1, nbytes).astype(np.uint32)
    v = np.zeros(a.shape[0], dtype=np.uint32)
    for k in range(nbytes):
        v = (v << np.uint32(8)) | a[:, k]
    return v


class ChainsPack:
    """Packed int-chain store: header [SizeOfValue:i32][MaxCount:i32], then
    chains, each `[Count: <sz>][values: <sz> * Count]` at arbitrary offsets.
    Values are *signed* (char/short/int), little-endian, native width."""

    def __init__(self, buf: bytes, base: int = 0):
        self.buf = buf
        self.base = base
        self.size_of_value = read_i32(buf, base)
        self.max_count = read_i32(buf, base + 4)
        if self.size_of_value == 1:
            self._dt = "<i1"
        elif self.size_of_value == 2:
            self._dt = "<i2"
        elif self.size_of_value == 4:
            self._dt = "<i4"
        else:
            raise ValueError(f"bad chains value size {self.size_of_value}")

    def unpack(self, offset: int) -> np.ndarray:
        """Return the whole chain stored at `offset` (relative to the store)."""
        p = self.base + offset
        count = int(np.frombuffer(self.buf, self._dt, 1, p)[0])
        if count < 0:
            raise ValueError(f"negative chain count at {offset}")
        return np.frombuffer(
            self.buf, self._dt, count, p + self.size_of_value
        ).astype(np.int32)

    def unpack_at(self, offset: int, idx: int) -> int:
        p = self.base + offset
        count = int(np.frombuffer(self.buf, self._dt, 1, p)[0])
        if idx >= count or idx < 0:
            return -1
        return int(
            np.frombuffer(self.buf, self._dt, 1, p + self.size_of_value * (1 + idx))[0]
        )

    def get_equal_or_less(self, offset: int, value: int) -> tuple[int, int]:
        """Largest chain element <= value and its index, or (-1, -1).

        Mirrors ``FAChains_pack_triv::GetEqualOrLess``
        (FAChains_pack_triv.h:227-308): the chain is sorted-unique; when
        ``value`` exceeds the stored width's positive range the last element
        is returned without comparison."""
        chain = self.unpack(offset)
        n = len(chain)
        if n == 0:
            return -1, -1
        limit = (0xFF >> 1) if self.size_of_value == 1 else (
            (0xFFFF >> 1) if self.size_of_value == 2 else None
        )
        if limit is not None and value > limit:
            return int(chain[n - 1]), n - 1
        idx = int(np.searchsorted(chain, value, side="right")) - 1
        if idx < 0:
            return -1, -1
        return int(chain[idx]), idx


class OffsetTablePack:
    """Packed state->offset table (FAOffsetTable_pack.cpp:24-83).

    Layout: ``[ShiftValue:i32][BaseSize:i32][OffsetCount:i32]``
    then, when ShiftValue != 0, a per-index uint8 delta array of OffsetCount
    bytes, then a big-endian base array of BaseSize-byte entries indexed by
    ``Idx >> ShiftValue``."""

    def __init__(self, buf: bytes, base: int = 0):
        self.buf = buf
        self.base = base
        self.shift = read_u32(buf, base)
        self.base_size = read_u32(buf, base + 4)
        if not (1 <= self.base_size <= 4):
            raise ValueError(f"bad offset-table base size {self.base_size}")
        self.count = read_u32(buf, base + 8)
        p = base + 12
        self._delta_base = None
        if self.shift:
            self._delta_base = p
            p += self.count
        self._base_arr = p

    def get_offset(self, idx: int) -> int:
        if idx < 0 or idx >= self.count:
            raise IndexError(idx)
        base_idx = idx >> self.shift
        v = decode_be(
            memoryview(self.buf),
            self._base_arr + base_idx * self.base_size,
            self.base_size,
        )
        if self._delta_base is not None:
            v += self.buf[self._delta_base + idx]
        return v

    def densify(self) -> np.ndarray:
        return np.array([self.get_offset(i) for i in range(self.count)], np.int64)


class MultiMapPack:
    """int key -> int array.  Layout: [MaxKey:i32][SizeOfOffset:i32]
    [offsets: SizeOfOffset*(MaxKey+1), big-endian][pad to 4][chains store].
    Stored offset 0 means "no mapping"; otherwise chain lives at offset-1."""

    def __init__(self, buf: bytes, base: int = 0):
        self.buf = buf
        self.base = base
        self.max_key = read_u32(buf, base)
        self.size_of_offset = read_u32(buf, base + 4)
        if not (1 <= self.size_of_offset <= 4):
            raise ValueError(f"bad multimap offset size {self.size_of_offset}")
        self._off_base = base + 8
        values_off = self._off_base + self.size_of_offset * (1 + self.max_key)
        mis = values_off % 4
        if mis:
            values_off += 4 - mis
        self.values = ChainsPack(buf, values_off)

    def _vals_offset(self, key: int) -> int:
        return decode_be(
            memoryview(self.buf),
            self._off_base + key * self.size_of_offset,
            self.size_of_offset,
        )

    def get(self, key: int) -> np.ndarray | None:
        if key < 0 or key > self.max_key:
            return None
        off = self._vals_offset(key)
        if off == 0:
            return None
        return self.values.unpack(off - 1)

    def to_dict(self) -> dict[int, np.ndarray]:
        out = {}
        for k in range(self.max_key + 1):
            v = self.get(k)
            if v is not None:
                out[k] = v
        return out


class MultiMapPackFixed:
    """Fixed-slot multimap: [SizeOfValue:i32][MaxCount:i32][MinKey:i32]
    [MaxKey:i32] then per key a slot of (MaxCount+1) values:
    [Count: <sz>][values...].  Values signed little-endian."""

    def __init__(self, buf: bytes, base: int = 0):
        self.buf = buf
        self.base = base
        self.size_of_value = read_u32(buf, base)
        self.max_count = read_i32(buf, base + 4)
        self.min_key = read_i32(buf, base + 8)
        self.max_key = read_i32(buf, base + 12)
        self._data = base + 16
        self._slot = (self.max_count + 1) * self.size_of_value
        self._dt = {1: "<i1", 2: "<i2", 4: "<i4"}[self.size_of_value]

    def get(self, key: int) -> np.ndarray | None:
        if key < self.min_key or key > self.max_key:
            return None
        p = self._data + self._slot * (key - self.min_key)
        count = int(np.frombuffer(self.buf, self._dt, 1, p)[0])
        if count > self.max_count:
            return None
        return np.frombuffer(
            self.buf, self._dt, count, p + self.size_of_value
        ).astype(np.int32)

    def densify(self) -> tuple[np.ndarray, np.ndarray]:
        """Return (counts, values) dense arrays over [min_key, max_key]:
        counts[k - min_key] and values[k - min_key, :max_count] (int32)."""
        nkeys = self.max_key - self.min_key + 1
        raw = np.frombuffer(
            self.buf, self._dt, nkeys * (self.max_count + 1), self._data
        ).reshape(nkeys, self.max_count + 1)
        counts = raw[:, 0].astype(np.int32)
        values = raw[:, 1:].astype(np.int32)
        return counts, values


class ArrayPack:
    """Packed int array, chunk-dedup or flat.
    [M:i32][SizeOfIndex:i32][SizeOfValue:i32][Count:i32] then either flat
    big-endian values (SizeOfIndex==0, M==1) or an index of chain ids plus
    deduped chains of M values each."""

    def __init__(self, buf: bytes, base: int = 0):
        self.buf = buf
        self.base = base
        self.m = read_i32(buf, base)
        self.size_of_index = read_i32(buf, base + 4)
        self.size_of_value = read_i32(buf, base + 8)
        self.count = read_i32(buf, base + 12)
        if not (1 <= self.m <= 8):
            raise ValueError("bad ArrayPack M")
        self._p = base + 16

    def densify(self) -> np.ndarray:
        mv = np.frombuffer(self.buf, dtype=np.uint8)
        if self.size_of_index == 0:
            flat = mv[self._p : self._p + self.count * self.size_of_value]
            return _decode_be_vec(flat, self.size_of_value).astype(np.int32)
        nchunks = (self.count + self.m - 1) // self.m
        idx_bytes = mv[self._p : self._p + nchunks * self.size_of_index]
        chain_ids = _decode_be_vec(idx_bytes, self.size_of_index)
        data_base = self._p + nchunks * self.size_of_index
        chain_sz = self.m * self.size_of_value
        max_chain = int(chain_ids.max()) + 1 if nchunks else 0
        chain_bytes = mv[data_base : data_base + max_chain * chain_sz]
        chains = _decode_be_vec(chain_bytes, self.size_of_value).reshape(
            max_chain, self.m
        )
        vals = chains[chain_ids].reshape(-1)[: self.count]
        return vals.astype(np.int32)


class StringArrayPack:
    """[Count:i32][Count+1 offsets:i32][bytes] — the i2w lexicon."""

    def __init__(self, buf: bytes, base: int = 0):
        self.buf = buf
        self.base = base
        self.count = read_u32(buf, base)
        self.offsets = np.frombuffer(buf, "<u4", self.count + 1, base + 4)
        self._data = base + 4 + 4 * (self.count + 1)

    def get(self, idx: int) -> bytes | None:
        if idx < 0 or idx >= self.count:
            return None
        b, e = int(self.offsets[idx]), int(self.offsets[idx + 1])
        return bytes(self.buf[self._data + b : self._data + e])

    def densify(self) -> tuple[np.ndarray, np.ndarray]:
        """(offsets u32[count+1], bytes u8[total]) for device residency."""
        total = int(self.offsets[-1])
        data = np.frombuffer(self.buf, np.uint8, total, self._data)
        return self.offsets.astype(np.uint32), data.copy()


class IwMapPack:
    """Old input weight -> new (dense) input weight, interval-compressed:
    [SizeOfNewIw:i32][IntervalCount:i32][FromIw:i32 * N][(ToIw, Offset):i32 * 2N]
    [new-iw storage: big-endian SizeOfNewIw values, value 0 = no mapping,
    else NewIw+1]."""

    def __init__(self, buf: bytes, base: int = 0):
        self.buf = buf
        self.base = base
        self.size_of_new_iw = read_i32(buf, base)
        self.interval_count = read_i32(buf, base + 4)
        p = base + 8
        self.from_iw = np.frombuffer(buf, "<i4", self.interval_count, p)
        p += 4 * self.interval_count
        pairs = np.frombuffer(buf, "<i4", 2 * self.interval_count, p).reshape(-1, 2)
        self.to_iw = pairs[:, 0]
        self.interval_offset = pairs[:, 1]
        self._storage = p + 8 * self.interval_count

    def get_new_iw(self, old_iw: int) -> int:
        i = int(np.searchsorted(self.from_iw, old_iw, side="right")) - 1
        if i < 0:
            return -1
        if old_iw > self.to_iw[i]:
            return -1
        off = (
            self._storage
            + int(self.interval_offset[i])
            + (old_iw - int(self.from_iw[i])) * self.size_of_new_iw
        )
        v = decode_be(memoryview(self.buf), off, self.size_of_new_iw)
        return v - 1 if v != 0 else -1

    def densify(self, max_old_iw: int | None = None) -> np.ndarray:
        """Dense old->new map as int32 (-1 where absent), length max_old_iw+1."""
        if self.interval_count == 0:
            return np.full(1, -1, dtype=np.int32)
        hi = int(self.to_iw[-1]) if max_old_iw is None else max_old_iw
        out = np.full(hi + 1, -1, dtype=np.int32)
        mv = np.frombuffer(self.buf, dtype=np.uint8)
        for i in range(self.interval_count):
            lo, to = int(self.from_iw[i]), min(int(self.to_iw[i]), hi)
            if to < lo:
                continue
            n = to - lo + 1
            start = self._storage + int(self.interval_offset[i])
            raw = mv[start : start + n * self.size_of_new_iw]
            vals = _decode_be_vec(raw, self.size_of_new_iw).astype(np.int64)
            out[lo : to + 1] = np.where(vals != 0, vals - 1, -1).astype(np.int32)
        return out
