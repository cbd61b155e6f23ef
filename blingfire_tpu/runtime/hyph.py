"""W2H hyphenation engine (TeX-style packed patterns).

Reference: blingfirecompile.library/inc/FAHyphInterpreter_core_t.h:136-267 and
blingfiretokdll.cpp:824-911 (WordHyphenationWithModel).
"""

from __future__ import annotations

import numpy as np

from ..models.loader import HyphModel
from ..formats.consts import Param
from .oracle import TransitionIndex

HYPH_CONFLICT = -2
HYPH_UNKNOWN = -1
HYPH_NO_HYPH = 0
HYPH_DONT_CARE = 7  # FAFsmConst.h:345-357

MAX_WORD_SIZE = 300


class HyphEngine:
    def __init__(self, model: HyphModel):
        self.m = model
        self.trans = TransitionIndex(model.aut)
        self.final = model.aut.final
        self.moore_ow = model.aut.moore_ow
        self.iw2iw = model.aut.iw2iw
        p = model.params
        self.left_anchor = p.get(Param.LEFT_ANCHOR, 1)
        self.right_anchor = p.get(Param.RIGHT_ANCHOR, 2)
        self.min_pat_len = p.get(Param.MIN_LEN, 3)
        self.no_hyph_len = p.get(Param.MIN_LEN2, 0)
        self.ignore_case = bool(p.get(Param.IGNORE_CASE, 0))

    def _dest(self, state: int, raw_iw: int) -> int:
        if state < 0:
            return -1
        if self.iw2iw is not None:
            if raw_iw < 0 or raw_iw >= len(self.iw2iw):
                return -1
            iw = int(self.iw2iw[raw_iw])
            if iw == -1:
                return -1
        else:
            iw = raw_iw
        dst, _ = self.trans.step(state, iw)
        return dst

    def process(self, word: list[int]) -> list[int] | None:
        """Per-position hyphenation ops, or None on error."""
        n = len(word)
        if n > MAX_WORD_SIZE:
            return None
        seq = [self.left_anchor] + list(word) + [self.right_anchor]
        if self.ignore_case:
            # case fold before charmap (FAHyphInterpreter_core_t.h:165-170)
            from .casefold import to_lower

            for i in range(1, n + 1):
                seq[i] = to_lower(seq[i])
        if self.m.charmap is not None:
            cm = self.m.charmap
            for i in range(1, n + 1):
                v = cm.get(seq[i])
                if v is not None and len(v) == 1:
                    seq[i] = int(v[0])
        n2 = n + 2
        out = [HYPH_UNKNOWN] * n
        js = 1
        for frm in range(0, n2 - (self.min_pat_len - 1)):
            state = self.m.aut.initial
            for i in range(frm, n2):
                state = self._dest(state, seq[i])
                if state == -1:
                    break
                if state >= 0 and self.final[state]:
                    pat_id = int(self.moore_ow[state])
                    pat = self.m.i2info.get(pat_id)
                    assert pat is not None
                    je = len(pat)
                    oob = frm + len(pat) - n
                    if oob > 0:
                        je -= oob
                    for j in range(js, je):
                        ow = int(pat[j])
                        if ow == HYPH_DONT_CARE:
                            continue
                        oi = frm + j - 1
                        cur = out[oi]
                        if cur == HYPH_UNKNOWN:
                            out[oi] = ow
                        elif cur != ow:
                            out[oi] = HYPH_CONFLICT
            js = 0
        k = min(self.no_hyph_len, n)
        for i in range(k):
            out[i] = HYPH_NO_HYPH
            j = n - i - 2
            if j > 0:
                out[j] = HYPH_NO_HYPH
        return out


class HyphTpu:
    """Batched device hyphenation over one [w2h] model."""

    def __init__(self, model):
        from ..ops import hyph as hyph_ops
        from ..ops.tables import build_comb_table

        self.engine = HyphEngine(model)
        self.model = model
        self.comb = build_comb_table(model.aut)
        self.tables = hyph_ops.make_device_tables(
            self.comb, model.aut.moore_ow, model.i2info, model.params
        )
        self._sym2iw = self.comb.sym2iw
        self._n_iws = self.comb.n_iws

    def _map_raw(self, raw: "np.ndarray"):
        import numpy as np

        m = self._sym2iw
        idx = np.clip(raw, 0, len(m) - 1)
        v = np.where((raw >= 0) & (raw < len(m)), m[idx], -1)
        return np.where(v < 0, self._n_iws, v).astype(np.int32)

    # row count per dispatch: big batches use the fixed ROWS shape; small
    # ones a pow2 size, so the jit cache stays bounded
    ROWS = 4096

    @staticmethod
    def _round_pow2(n: int, lo: int = 64) -> int:
        b = lo
        while b < n:
            b *= 2
        return b

    def process_batch(self, words: list[list[int]], bucket: int = 32):
        """Per-position ops for a batch of words (codepoint lists).

        Hyphenation is a pure per-word content function, so words are
        DEDUPED first (Zipf: a realistic corpus repeats most words) and
        each distinct word hits the device once."""
        import jax.numpy as jnp
        import numpy as np

        from ..ops import hyph as hyph_ops

        out: list[list[int] | None] = [None] * len(words)
        uniq: dict[tuple, int] = {}
        inst: list[int] = []  # word idx -> unique idx (-1 oversize)
        for w in words:
            if len(w) > MAX_WORD_SIZE:
                inst.append(-1)  # caller falls back / errors like the reference
                continue
            key = tuple(w)
            u = uniq.setdefault(key, len(uniq))
            inst.append(u)
        if not uniq:
            return out
        uwords = [list(k) for k in uniq]
        W = bucket
        while W < max(len(w) for w in uwords):
            W *= 2
        eng = self.engine
        cm = self.model.charmap
        U = len(uwords)
        results: list[list[int]] = [None] * U  # type: ignore
        for lo in range(0, U, self.ROWS):
            part = uwords[lo : lo + self.ROWS]
            B = self.ROWS if U > self.ROWS else self._round_pow2(len(part))
            x = np.full((B, W + 2), -1, np.int32)
            wl = np.zeros(B, np.int32)
            for k, w in enumerate(part):
                if eng.ignore_case:
                    from .casefold import to_lower

                    w = [to_lower(c) for c in w]
                if cm is not None:
                    w = list(w)
                    for j, c in enumerate(w):
                        v = cm.get(c)
                        if v is not None and len(v) == 1:
                            w[j] = int(v[0])
                seq = [eng.left_anchor] + list(w) + [eng.right_anchor]
                x[k, : len(seq)] = self._map_raw(np.asarray(seq, np.int32))
                wl[k] = len(w)
            res = np.asarray(
                hyph_ops.hyph_segment(self.tables, jnp.asarray(x), jnp.asarray(wl))
            )
            for k in range(len(part)):
                results[lo + k] = res[k, : wl[k]].tolist()
        for i, u in enumerate(inst):
            if u >= 0:
                out[i] = results[u]
        return out
