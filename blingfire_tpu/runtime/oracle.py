"""Scalar reference engines ("oracle") over dense model tables.

This is a bit-exact, host-side re-implementation of the reference runtime
semantics, used for (a) golden parity against the shipped reference binaries
and (b) validating the vectorized TPU kernels on arbitrary corpora.  It is not
the production path.

Semantics sources:
  - SP pipeline:  blingfiretools/blingfiretokdll/blingfiretokdll.cpp:1349-1535
  - unigram LM:   blingfireclient.library/inc/FATokenSegmentationTools_1best_t.h:117-279
  - BPE:          .../FATokenSegmentationTools_1best_bpe_t.h:125-316
  - BPE+merges:   .../FATokenSegmentationTools_1best_bpe_with_merges_t.h:150-316
  - normalize:    blingfireclient.library/inc/FAUtils_cl.h:312-436
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..formats.consts import SP_DELIMITER, TokAlgo, UNK_SCORE, is_whitespace
from ..formats.dfa import DEAD, DenseAutomaton
from ..models.loader import CharMap, SegmenterModel


class TransitionIndex:
    """CSR-ish (state, iw) -> (dst, ow) lookup over a dense automaton."""

    def __init__(self, aut: DenseAutomaton):
        self.aut = aut
        order = np.lexsort((aut.edge_iw, aut.edge_src))
        self.src = aut.edge_src[order]
        self.iw = aut.edge_iw[order]
        self.dst = aut.edge_dst[order]
        self.ow = aut.edge_ow[order]
        self.row_ptr = np.searchsorted(self.src, np.arange(aut.n_states + 1))

    def step(self, state: int, iw: int) -> tuple[int, int]:
        """Return (dst, ow); dst=-1 if no transition, DEAD(-2) if dead."""
        if state < 0:
            return -1, -1
        lo, hi = self.row_ptr[state], self.row_ptr[state + 1]
        i = lo + np.searchsorted(self.iw[lo:hi], iw)
        if i < hi and self.iw[i] == iw:
            return int(self.dst[i]), int(self.ow[i])
        return -1, -1


@dataclass
class Arc:
    start: int
    end: int
    id: int
    rank: float = 0.0


def _utf8_size(b0: int) -> int:
    """FAUtf8Size of a lead byte (FAUtf8Utils.cpp:23-41)."""
    if b0 & 0x80 == 0:
        return 1
    if b0 & 0xE0 == 0xC0:
        return 2
    if b0 & 0xF0 == 0xE0:
        return 3
    if b0 & 0xF8 == 0xF0:
        return 4
    return 0


def utf8_to_utf32(data: bytes) -> tuple[list[int], list[int]] | None:
    """FAStrUtf8ToArray: strict UTF-8 decode (shortest form, no surrogates),
    BOM stripped, returns (codepoints, byte offsets) or None when invalid
    (FAUtf8Utils.cpp:199-288)."""
    if data[:3] == b"\xef\xbb\xbf":
        base = 3
    else:
        base = 0
    cps: list[int] = []
    offs: list[int] = []
    i = base
    n = len(data)
    while i < n:
        b0 = data[i]
        if b0 & 0x80 == 0:
            cps.append(b0)
            offs.append(i)
            i += 1
            continue
        if b0 & 0xE0 == 0xC0:
            cnt, ch = 2, b0 & 0x1F
        elif b0 & 0xF0 == 0xE0:
            cnt, ch = 3, b0 & 0x0F
        elif b0 & 0xF8 == 0xF0:
            cnt, ch = 4, b0 & 0x07
        else:
            return None
        if i + cnt > n:
            return None
        ret = ch
        for k in range(1, cnt):
            bk = data[i + k]
            if bk & 0xC0 != 0x80:
                return None
            ret = (ret << 6) | (bk & 0x3F)
        # shortest-form check
        if ret <= 0x7F:
            exp = 1
        elif ret <= 0x7FF:
            exp = 2
        elif ret <= 0xFFFF:
            exp = 3
        elif ret <= 0x10FFFF:
            exp = 4
        else:
            exp = 0
        if exp != cnt:
            return None
        if 0xD800 <= ret <= 0xDFFF:
            return None
        cps.append(ret)
        offs.append(i)
        i += cnt
    return cps, offs


def utf8_as_bytes(data: bytes) -> tuple[list[int], list[int]]:
    """FAStrUtf8AsBytesToArray: raw bytes (BOM stripped)."""
    base = 3 if data[:3] == b"\xef\xbb\xbf" else 0
    return list(data[base:]), list(range(base, len(data)))


def normalize(chars: list[int], charmap: CharMap) -> tuple[list[int], list[int]]:
    """FANormalize: per-char 1->N charmap expansion, offsets recorded."""
    out: list[int] = []
    offs: list[int] = []
    for i, c in enumerate(chars):
        norm = charmap.get(c)
        if norm is None:
            out.append(c)
            offs.append(i)
        elif 1 <= len(norm) <= 10:
            for v in norm:
                out.append(int(v))
                offs.append(i)
        # len 0 or > 10: character dropped (FAUtils_cl.h:324-363 emits nothing)
    return out, offs


def squeeze_whitespace(
    chars: list[int], offs: list[int] | None = None
) -> tuple[list[int], list[int] | None]:
    """Whitespace runs -> single U+2581, trailing delimiter trimmed
    (blingfiretokdll.cpp:1452-1496)."""
    out: list[int] = []
    oo: list[int] = [] if offs is not None else None
    for i, c in enumerate(chars):
        if not is_whitespace(c):
            out.append(c)
            if oo is not None:
                oo.append(offs[i])
        elif not out or out[-1] != SP_DELIMITER:
            out.append(SP_DELIMITER)
            if oo is not None:
                oo.append(offs[i])
    if len(out) > 1 and out[-1] == SP_DELIMITER:
        out.pop()
        if oo is not None:
            oo.pop()
    return out, oo


class SegmenterOracle:
    """Scalar implementation of all [pos-dict] segmentation algorithms."""

    def __init__(self, model: SegmenterModel):
        self.m = model
        self.trans = TransitionIndex(model.aut)
        self.final = model.aut.final

    # -- arc population (shared mealy walk) --------------------------------

    def _walk_matches(self, seq: list[int], start: int):
        """Yield (end, sum_ow) for every final reached from `start`."""
        state = self.m.aut.initial
        sum_ow = 0
        for i in range(start, len(seq)):
            state, ow = self.trans.step(state, seq[i])
            if state == -1:
                return
            sum_ow += ow
            if state >= 0 and self.final[state]:
                yield i, sum_ow

    def _info(self, key: int) -> tuple[int, float]:
        k = key - self.m.i2info_min_key
        return int(self.m.i2info_ids[k]), float(self.m.i2info_scores[k])

    # -- unigram LM (FATokenSegmentationTools_1best_t.h:174-279) -----------

    def unigram(self, seq: list[int], unk_id: int) -> list[tuple[int, int, int]]:
        n = len(seq)
        if n <= 0:
            return []
        best_begin = [-1] * n
        best_id = [-1] * n
        best_score = [-np.inf] * n

        for start in range(n):
            token_unknown = True
            for end, sum_ow in self._walk_matches(seq, start):
                tid, score_f = self._info(sum_ow)
                prev = best_score[start - 1] if start > 0 else 0.0
                cand = np.float64(np.float32(score_f)) + prev
                if best_score[end] < cand:
                    best_begin[end] = start
                    best_id[end] = tid
                    best_score[end] = cand
                token_unknown = False
            if token_unknown:
                end = start
                prev = best_score[start - 1] if start > 0 else 0.0
                cand = UNK_SCORE + prev
                if best_score[end] < cand:
                    best_begin[end] = start
                    best_id[end] = -1
                    best_score[end] = cand
                    if start > 0 and best_id[start - 1] == -1:
                        best_begin[end] = best_begin[start - 1]

        out: list[tuple[int, int, int]] = []
        end = n - 1
        while end >= 0:
            start = best_begin[end]
            tid = best_id[end]
            out.append((tid if tid != -1 else unk_id, start, end))
            end = start - 1
        out.reverse()
        return out

    # -- BPE family (…_bpe_t.h / …_bpe_with_merges_t.h) --------------------

    def _bpe_arcs(self, seq: list[int], unk_id: int, fast: bool) -> list[Arc]:
        arcs: list[Arc] = []
        n = len(seq)
        start = 0
        while start < n:
            token_unknown = True
            token_start = seq[start] == SP_DELIMITER
            arc_count_at_start = len(arcs)
            fast_forward = start
            for end, sum_ow in self._walk_matches(seq, start):
                tid, rank = self._info(sum_ow)
                apply_opt = (
                    fast
                    and token_start
                    and (seq[end + 1] == SP_DELIMITER if end < n - 1 else True)
                    and arc_count_at_start < len(arcs)
                )
                if not apply_opt:
                    arcs.append(Arc(start, end, tid, rank))
                else:
                    del arcs[arc_count_at_start:]
                    arcs.append(Arc(start, end, tid, rank))
                    fast_forward = end
                token_unknown = False
            if token_unknown:
                if arcs and arcs[-1].id == unk_id:
                    arcs[-1].end = start
                else:
                    arcs.append(Arc(start, start, unk_id, 0.0))
            if fast:
                start = fast_forward
            start += 1
        return arcs

    def _bpe_resolve(
        self, arcs: list[Arc], n: int, unk_id: int
    ) -> list[tuple[int, int, int]]:
        tos = [0] * n
        ids = [unk_id] * n
        intermediate = [0] * n
        for a in arcs:
            if intermediate[a.start] == 0 and (
                a.end + 1 == n or intermediate[a.end + 1] == 0
            ):
                tos[a.start] = a.end
                ids[a.start] = a.id
                for j in range(a.start + 1, a.end + 1):
                    intermediate[j] = 1
        out: list[tuple[int, int, int]] = []
        start = 0
        while start < n:
            out.append((ids[start], start, tos[start]))
            start = tos[start] + 1
        return out

    def bpe(self, seq: list[int], unk_id: int, fast: bool) -> list[tuple[int, int, int]]:
        n = len(seq)
        if n <= 0:
            return []
        arcs = self._bpe_arcs(seq, unk_id, fast)
        arcs.sort(key=lambda a: (a.id, a.start))
        return self._bpe_resolve(arcs, n, unk_id)

    def bpe_with_merges(
        self, seq: list[int], unk_id: int, fast: bool
    ) -> list[tuple[int, int, int]]:
        n = len(seq)
        if n <= 0:
            return []
        arcs = self._bpe_arcs(seq, unk_id, fast)
        # bigger ranks first, then smaller ids, then left-most
        arcs.sort(key=lambda a: (-a.rank, a.id, a.start))
        return self._bpe_resolve(arcs, n, unk_id)

    # -- dispatcher --------------------------------------------------------

    def process(self, seq: list[int], unk_id: int) -> list[tuple[int, int, int]]:
        algo = self.m.tok_algo
        if algo in (TokAlgo.BPE, TokAlgo.BPE_OPT):
            return self.bpe(seq, unk_id, fast=algo == TokAlgo.BPE_OPT)
        if algo == TokAlgo.BPE_OPT_WITH_MERGES:
            return self.bpe_with_merges(seq, unk_id, fast=True)
        return self.unigram(seq, unk_id)


class SpTokenizerOracle:
    """Full TextToIds pipeline for [pos-dict] ("sentence piece") models
    (blingfiretokdll.cpp:1349-1535)."""

    def __init__(self, model: SegmenterModel):
        self.m = model
        self.seg = SegmenterOracle(model)

    def text_to_ids(
        self, text: bytes | str, max_len: int | None = None, unk_id: int = 0
    ) -> list[int]:
        ids_offsets = self.text_to_ids_with_offsets(text, max_len, unk_id)
        return ids_offsets[0]

    def text_to_ids_with_offsets(
        self, text: bytes | str, max_len: int | None = None, unk_id: int = 0
    ) -> tuple[list[int], list[int], list[int]]:
        if isinstance(text, str):
            text = text.encode("utf-8")
        if len(text) == 0:
            return [], [], []

        # 1. decode (+ dummy ▁ prefix)
        if self.m.use_raw_bytes:
            chars, offs = utf8_as_bytes(text)
        else:
            dec = utf8_to_utf32(text)
            if dec is None:
                return [], [], []
            chars, offs = dec
        if len(chars) == 0 or len(chars) > len(text):
            return [], [], []
        if not self.m.no_dummy_prefix:
            chars = [SP_DELIMITER] + chars
            offs = [-1] + offs

        # 2. charmap normalization
        if self.m.charmap is not None:
            norm, norm_offs = normalize(chars, self.m.charmap)
            if len(norm) <= 0 or len(norm) > 2 * (len(text) + 1):
                return [], [], []
            chars, char_offs = norm, norm_offs
            use_norm = True
        else:
            char_offs = list(range(len(chars)))
            use_norm = False

        # 3. whitespace runs -> ▁
        chars, char_offs = squeeze_whitespace(chars, char_offs)

        # 4. segmentation + id offset
        triples = self.seg.process(chars, unk_id)
        ids = [tid + self.m.id_offset for tid, _f, _t in triples]
        starts, ends = [], []
        for _tid, f, t in triples:
            from_off = offs[char_offs[f]]
            to_off = offs[char_offs[t]]
            starts.append(from_off)
            # end offset points at the LAST byte of the final character
            # (blingfiretokdll.cpp:1525-1528)
            sz = _utf8_size(text[to_off]) if 0 <= to_off < len(text) else 0
            ends.append(to_off + (sz - 1 if sz > 0 else 0))
        if max_len is not None:
            ids, starts, ends = ids[:max_len], starts[:max_len], ends[:max_len]
        return ids, starts, ends
