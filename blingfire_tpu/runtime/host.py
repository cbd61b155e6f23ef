"""Host-side batching runtime: text prep, padding, device dispatch, fallback.

The device kernels consume fixed-shape batches of *squeezed, alphabet-dense*
symbol streams; everything byte-fiddly (UTF-8 handling, BOM, dummy prefix,
whitespace squeeze, offset superposition) happens here, vectorized in NumPy
(to be lowered to the native C++ loader).  Semantics mirror
blingfiretokdll.cpp:1349-1535.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..formats.consts import SP_DELIMITER, TokAlgo
from ..models.loader import Model, SegmenterModel
from ..ops import bpe as bpe_ops
from ..ops.tables import build_comb_table
from .oracle import SpTokenizerOracle

_WS_SMALL = None


def _ws_table() -> np.ndarray:
    """Dense whitespace-class table up to 0xFEFF (blingfiretokdll.h:16-21)."""
    global _WS_SMALL
    if _WS_SMALL is None:
        t = np.zeros(0xFF00, bool)
        t[: 0x21] = True
        t[0xA0] = True
        t[0x2000:0x2010] = True
        t[0x202F] = True
        t[0x205F] = True
        t[0x2060] = True
        t[0x2420] = True
        t[0x2424] = True
        t[0x3000] = True
        t[0xFEFF] = True
        _WS_SMALL = t
    return _WS_SMALL


def _is_ws(sym: np.ndarray) -> np.ndarray:
    t = _ws_table()
    small = sym < len(t)
    return np.where(small, t[np.minimum(sym, len(t) - 1)], False)


def decode_utf8(data: bytes) -> tuple[np.ndarray, np.ndarray] | None:
    """Strict UTF-8 -> (codepoints, byte offsets), or None when invalid.

    Vectorized equivalent of FAStrUtf8ToArray (FAUtf8Utils.cpp:199-288)."""
    if data[:3] == b"\xef\xbb\xbf":
        data = data[3:]
        base = 3
    else:
        base = 0
    b = np.frombuffer(data, np.uint8)
    n = len(b)
    if n == 0:
        return np.empty(0, np.int32), np.empty(0, np.int32)
    is_lead1 = b < 0x80
    is_lead2 = (b & 0xE0) == 0xC0
    is_lead3 = (b & 0xF0) == 0xE0
    is_lead4 = (b & 0xF8) == 0xF0
    is_cont = (b & 0xC0) == 0x80
    lead = is_lead1 | is_lead2 | is_lead3 | is_lead4
    if not (lead | is_cont).all():
        return None
    sizes = np.where(is_lead1, 1, np.where(is_lead2, 2, np.where(is_lead3, 3, 4)))
    starts = np.flatnonzero(lead)
    if len(starts) == 0 or starts[0] != 0:
        return None
    sz = sizes[starts]
    if (starts + sz != np.append(starts[1:], n)).any():
        return None
    b32 = b.astype(np.int32)
    cp = np.where(
        is_lead1[starts],
        b32[starts],
        np.where(
            is_lead2[starts],
            b32[starts] & 0x1F,
            np.where(is_lead3[starts], b32[starts] & 0x0F, b32[starts] & 0x07),
        ),
    )
    for k in (1, 2, 3):
        sel = sz > k
        idx = np.minimum(starts + k, n - 1)
        cp = np.where(sel, (cp << 6) | (b32[idx] & 0x3F), cp)
    # shortest form + surrogate checks
    minv = np.array([0, 0, 0x80, 0x800, 0x10000], np.int32)
    if (cp < minv[sz]).any() or (cp > 0x10FFFF).any():
        return None
    if ((cp & np.int32(-2048)) == 0xD800).any():  # surrogate range mask 0xFFFFF800
        return None
    return cp, (starts + base).astype(np.int32)


def _utf8_char_sizes(data: bytes) -> np.ndarray:
    b = np.frombuffer(data, np.uint8)
    return np.where(
        b < 0x80,
        1,
        np.where(
            (b & 0xE0) == 0xC0,
            2,
            np.where((b & 0xF0) == 0xE0, 3, np.where((b & 0xF8) == 0xF0, 4, 0)),
        ),
    ).astype(np.int32)


@dataclass
class PreparedDoc:
    syms: np.ndarray  # int32 squeezed raw symbols
    offs: np.ndarray  # int32 original byte offset per symbol (-1 = prefix)
    ok: bool  # False => invalid input (API returns 0 tokens)


def prepare_sp_doc(data: bytes, model: SegmenterModel) -> PreparedDoc:
    """decode -> dummy prefix -> charmap normalize -> whitespace squeeze."""
    empty = PreparedDoc(np.empty(0, np.int32), np.empty(0, np.int32), False)
    if len(data) == 0:
        return empty
    if model.use_raw_bytes:
        base = 3 if data[:3] == b"\xef\xbb\xbf" else 0
        syms = np.frombuffer(data, np.uint8)[base:].astype(np.int32)
        offs = np.arange(base, len(data), dtype=np.int32)
    else:
        dec = decode_utf8(data)
        if dec is None:
            return empty
        syms, offs = dec
    if len(syms) == 0 or len(syms) > len(data):
        return empty
    if not model.no_dummy_prefix:
        syms = np.concatenate([np.array([SP_DELIMITER], np.int32), syms])
        offs = np.concatenate([np.array([-1], np.int32), offs])

    if model.charmap is not None:
        cm = model.charmap
        in_range = (syms >= cm.min_key) & (syms <= cm.max_key)
        idx = np.where(in_range, syms - cm.min_key, 0)
        counts = np.where(in_range, cm.counts[idx], -1)
        # count > slot capacity => map Get fails => identity
        # (FAMultiMap_pack_fixed.cpp:86-88 -> FANormalize identity branch);
        # count == 0 or count > 10 => character dropped entirely
        # (FAUtils_cl.h:324-363: no branch emits)
        counts = np.where(counts > cm.values.shape[1], -1, counts)
        reps = np.where(
            counts == -1, 1, np.where((counts >= 1) & (counts <= 10), counts, 0)
        )
        total = int(reps.sum())
        out = np.empty(total, np.int32)
        out_off = np.repeat(offs, reps)
        pos = np.cumsum(reps) - reps
        ident = counts == -1
        out[pos[ident]] = syms[ident]
        multi = ~ident
        if multi.any():
            mpos = pos[multi]
            mvals = cm.values[idx[multi]]
            mreps = reps[multi]
            for j in range(int(mreps.max()) if len(mreps) else 0):
                sel = mreps > j
                out[mpos[sel] + j] = mvals[sel, j]
        syms, offs = out, out_off

    # whitespace squeeze (blingfiretokdll.cpp:1462-1496)
    ws = _is_ws(syms)
    prev_ws = np.concatenate([[False], ws[:-1]])
    prev_sym = np.concatenate([[np.int32(-1)], syms[:-1]])
    emit = ~ws | ((~prev_ws) & (prev_sym != SP_DELIMITER))
    if len(emit):
        emit[0] = True
    out = np.where(ws, SP_DELIMITER, syms)[emit]
    offs = offs[emit]
    if len(out) > 1 and out[-1] == SP_DELIMITER:
        out = out[:-1]
        offs = offs[:-1]
    return PreparedDoc(out.astype(np.int32), offs.astype(np.int32), True)


class SpTokenizer:
    """Batched TPU tokenizer for [pos-dict] ("sentence piece") models:
    byte/char BPE, BPE-with-merges, and unigram LM."""

    def __init__(self, model: Model, max_doc_symbols: int = 512, a_max: int | None = None):
        from ..utils import ensure_compile_cache

        ensure_compile_cache()
        assert model.seg is not None, "model has no [pos-dict] section"
        seg = model.seg
        self.model = model
        self.seg = seg
        from ..ops.tables import build_comb_table_cached
        self.comb = build_comb_table_cached(seg.aut, model.source_key, 'seg')
        self.max_token_len = _max_token_len(seg.aut)
        self.is_bpe = seg.tok_algo in (
            TokAlgo.BPE,
            TokAlgo.BPE_OPT,
            TokAlgo.BPE_OPT_WITH_MERGES,
        )
        if self.is_bpe:
            from ..ops.tables import build_trie_table_cached

            trie = build_trie_table_cached(
                self.comb, seg.i2info_ids, seg.i2info_scores, model.source_key
            )
            self.tables = bpe_ops.make_device_tables(
                self.comb,
                seg.i2info_ids,
                seg.i2info_scores,
                max_len=self.max_token_len,
                with_merges=seg.tok_algo == TokAlgo.BPE_OPT_WITH_MERGES,
                fast=seg.tok_algo in (TokAlgo.BPE_OPT, TokAlgo.BPE_OPT_WITH_MERGES),
                id_offset=seg.id_offset,
                trie=trie,
            )
        else:
            from ..ops import unigram as uni_ops

            self.tables = uni_ops.make_device_tables(
                self.comb,
                seg.i2info_ids,
                seg.i2info_scores,
                max_len=self.max_token_len,
                id_offset=seg.id_offset,
            )
        self.n_doc = max_doc_symbols
        # arc budget: every surviving arc of every non-whole-matched word
        # competes in the claim; unusual words ("Supercalifragilistic…")
        # produce ~5 arcs/position, so 2*N overflowed real text into
        # fallback.  4*N covers everything seen on realistic corpora; docs
        # beyond it still fall back correctly.
        self.a_max = a_max or max_doc_symbols * 4
        self._oracle = SpTokenizerOracle(seg)
        self._sym2iw = self.comb.sym2iw
        self._chunk_safe = self._compute_chunk_safe()
        # unique-word-unit device path (runtime/dedup.py): exact whenever
        # chunking is (same vocabulary property), and 5-10x cheaper on
        # realistic text; callers may force it off per call
        self.dedup_units = self._chunk_safe
        self._units = None

    def _unit_runner(self):
        if self._units is None:
            from .dedup import UnitRunner

            self._units = UnitRunner(self)
        return self._units

    def _classic_rows(self, x, spm, lengths, idxs, unk_id: int):
        """Classic doc-row device pass over a subset of prepped rows (docs
        the unit path declined).  Returns ({row -> ids list}, dev_fb)."""
        import jax.numpy as jnp

        Bp = _round_up_pow2(len(idxs))
        xs = np.full((Bp, x.shape[1]), -1, np.int32)
        ss = np.zeros((Bp, x.shape[1]), bool)
        ls = np.zeros(Bp, np.int32)
        xs[: len(idxs)] = x[idxs]
        ss[: len(idxs)] = spm[idxs]
        ls[: len(idxs)] = lengths[idxs]
        if self.is_bpe:
            ids, _st, _en, counts, dev_fb = bpe_ops.bpe_segment(
                self.tables, jnp.asarray(xs), jnp.asarray(ss),
                jnp.asarray(ls), jnp.int32(unk_id), self.a_max,
            )
            dev_fb = np.asarray(dev_fb)
        else:
            from ..ops import unigram as uni_ops

            ids, _st, _en, counts = uni_ops.unigram_segment(
                self.tables, jnp.asarray(xs), jnp.asarray(ls), jnp.int32(unk_id)
            )
            dev_fb = np.zeros(Bp, bool)
        ids = np.asarray(ids)
        counts = np.asarray(counts)
        return (
            {i: ids[k, : counts[k]].tolist() for k, i in enumerate(idxs)},
            {i: bool(dev_fb[k]) for k, i in enumerate(idxs)},
        )

    def _compute_chunk_safe(self) -> bool:
        """True when documents may be split at ▁ boundaries without changing
        the result: (a) no vocabulary piece has an INTERNAL ▁ (no ▁-labeled
        transition leaves a non-initial state), so no arc can cross a split,
        and (b) the single piece "▁" is accepted, so an unknown run can never
        span a boundary.  Under (a)+(b) both the BPE greedy resolution and
        the unigram Viterbi factorize exactly at every ▁ (every path passes
        through the boundary, and all candidate scores beyond it share the
        same prefix score)."""
        comb = self.comb
        m = comb.sym2iw
        if SP_DELIMITER >= len(m):
            return False
        spm_iw = int(m[SP_DELIMITER])
        if spm_iw < 0:
            return False
        occ = np.flatnonzero(comb.owner >= 0)
        iw = occ - comb.base[comb.owner[occ]]
        if np.any((iw == spm_iw) & (comb.owner[occ] != 0)):
            return False  # internal-▁ pieces exist: splits can cut an arc
        slot = int(comb.base[0]) + spm_iw
        if not (0 <= slot < comb.n_slots) or comb.owner[slot] != 0:
            return False
        dst = int(comb.nxt[slot])
        return dst >= 0 and bool(comb.final[dst])

    def _split_chunks(self, syms: np.ndarray) -> list[np.ndarray] | None:
        """Greedy whitespace-safe windowing: each chunk <= n_doc symbols and
        every chunk after the first starts at a ▁.  None when a single word
        exceeds the window (host oracle territory)."""
        N = self.n_doc
        n = len(syms)
        pos = np.flatnonzero(syms == SP_DELIMITER)
        chunks: list[np.ndarray] = []
        start = 0
        while n - start > N:
            cand = pos[(pos > start) & (pos <= start + N)]
            if len(cand) == 0:
                return None
            split = int(cand[-1])
            chunks.append(syms[start:split])
            start = split
        chunks.append(syms[start:n])
        return chunks

    def _encode_overflow(
        self, docs: list[bytes], unk_id: int, max_rows: int = 4096
    ) -> list[list[int] | None]:
        """Device-path ids for docs longer than the window (SURVEY §5 long-doc
        handling): prep the full symbol stream, split at ▁ boundaries, run the
        chunks as extra rows, stitch ids in order.  None entries = host oracle
        (unsafe model, giant single word, invalid input, device fallback)."""
        results: list[list[int] | None] = [None] * len(docs)
        if not self._chunk_safe:
            return results
        per_doc: list[tuple[int, list[np.ndarray]]] = []
        for i, d in enumerate(docs):
            p = prepare_sp_doc(d, self.seg)
            if not p.ok:
                continue
            chunks = self._split_chunks(p.syms)
            if chunks is not None:
                per_doc.append((i, chunks))
        flat = [(i, c) for i, chunks in per_doc for c in chunks]
        if not flat:
            return results

        import jax.numpy as jnp

        N = self.n_doc
        m = self._sym2iw
        ids_rows: list[np.ndarray | None] = []
        fb_rows: list[bool] = []
        for lo in range(0, len(flat), max_rows):
            part = flat[lo : lo + max_rows]
            B = _round_up_pow2(len(part))
            x = np.full((B, N), -1, np.int32)
            spm = np.zeros((B, N), bool)
            lengths = np.zeros(B, np.int32)
            for r, (_i, c) in enumerate(part):
                n = len(c)
                x[r, :n] = np.where(c < len(m), m[np.minimum(c, len(m) - 1)], -1)
                spm[r, :n] = c == SP_DELIMITER
                lengths[r] = n
            if self.is_bpe:
                ids, _st, _en, counts, dev_fb = bpe_ops.bpe_segment(
                    self.tables, jnp.asarray(x), jnp.asarray(spm),
                    jnp.asarray(lengths), jnp.int32(unk_id), self.a_max,
                )
                dev_fb = np.asarray(dev_fb)
            else:
                from ..ops import unigram as uni_ops

                ids, _st, _en, counts = uni_ops.unigram_segment(
                    self.tables, jnp.asarray(x), jnp.asarray(lengths),
                    jnp.int32(unk_id),
                )
                dev_fb = np.zeros(B, bool)
            ids = np.asarray(ids)
            counts = np.asarray(counts)
            for r in range(len(part)):
                fb_rows.append(bool(dev_fb[r]))
                ids_rows.append(ids[r, : counts[r]])

        row = 0
        for i, chunks in per_doc:
            k = len(chunks)
            if any(fb_rows[row : row + k]):
                row += k
                continue  # device fallback on some chunk: host oracle
            results[i] = np.concatenate(ids_rows[row : row + k]).tolist()
            row += k
        return results

    def _prep_batch(self, docs: list[bytes], force_numpy: bool = False):
        from .. import native

        if not force_numpy and native.available():
            x, spm, lengths, _so, status = native.prep_sp_batch(
                docs,
                self.n_doc,
                self._sym2iw,
                self.seg.use_raw_bytes,
                self.seg.no_dummy_prefix,
                self.seg.charmap,
            )
            fallback = status == 2
            offs: list = [None] * len(docs)
            return x, spm, lengths, offs, fallback

        B = len(docs)
        N = self.n_doc
        x = np.full((B, N), -1, np.int32)
        spm = np.zeros((B, N), bool)
        lengths = np.zeros(B, np.int32)
        offs = []
        fallback = np.zeros(B, bool)
        for i, d in enumerate(docs):
            p = prepare_sp_doc(d, self.seg)
            if not p.ok:
                offs.append(None)
                continue
            if len(p.syms) > N:
                fallback[i] = True
                offs.append(None)
                continue
            n = len(p.syms)
            s = p.syms
            m = self._sym2iw
            iw = np.where(s < len(m), m[np.minimum(s, len(m) - 1)], -1)
            x[i, :n] = iw
            spm[i, :n] = s == SP_DELIMITER
            lengths[i] = n
            offs.append(p.offs)
        return x, spm, lengths, offs, fallback

    def _native_units_ok(self) -> bool:
        """True when the native unique-unit fast path can serve this model."""
        from .. import native

        return (
            self._chunk_safe
            and native.available()
            and self._unit_runner().compact_ok
        )

    def _native_fallback_handle(self):
        """Lazy native-runtime model handle for fallback documents (the host
        C++ engine is ~100x the Python oracle and handles any length; parity
        vs the reference .so is covered by tests/test_native_runtime.py)."""
        if not hasattr(self, "_nfb_handle"):
            self._nfb_handle = None
            path = getattr(self.model, "source_path", None)
            if path is not None:
                from .. import native

                rt = native.get_runtime()
                if rt is not None:
                    h = rt.LoadModel(path.encode())
                    if h:
                        self._nfb_handle = (rt, h)
        return self._nfb_handle

    def _fallback_ids(self, d: bytes, unk_id: int) -> list[int]:
        """Host-path ids for one fallback document."""
        nfb = self._native_fallback_handle()
        if nfb is not None:
            import ctypes

            rt, h = nfb
            cap = len(d) + 16
            arr = np.empty(cap, np.int32)
            n = rt.TextToIds(
                ctypes.c_void_p(h), d, len(d),
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                cap, unk_id,
            )
            if 0 <= n <= cap:
                return arr[:n].tolist()
        return self._oracle.text_to_ids(d, unk_id=unk_id)

    def _patch_fallbacks(self, chunk, ids, bounds, need, status, unk_id, c):
        """Replace the (rare) fallback docs' empty spans in a flat result:
        invalid -> 0 ids, rest -> native host engine (oracle when no
        toolchain).  Returns updated (ids, bounds)."""
        repl: dict[int, list[int]] = {}
        need_idx = np.flatnonzero(need)
        for k in need_idx:
            k = int(k)
            d = chunk[k]
            if len(d) == 0:
                repl[k] = []
                c.invalid_docs += 1
            else:
                repl[k] = self._fallback_ids(d, unk_id)
                c.fallback_docs += 1
        cnt = np.diff(bounds)
        for k, v in repl.items():
            cnt[k] = len(v)
        nb = np.zeros(len(bounds), np.int64)
        np.cumsum(cnt, out=nb[1:])
        out = np.empty(int(nb[-1]), np.int32)
        ks = sorted(repl)
        prev = 0
        for k in ks:
            if k > prev:  # untouched run [prev, k): counts unchanged
                out[nb[prev] : nb[k]] = ids[bounds[prev] : bounds[k]]
            out[nb[k] : nb[k + 1]] = repl[k]
            prev = k + 1
        n = len(cnt)
        if prev < n:
            out[nb[prev] : nb[n]] = ids[bounds[prev] : bounds[n]]
        return out, nb

    def encode_corpus_flat(
        self,
        docs: list[bytes | str],
        unk_id: int = 0,
        batch_docs: int = 16384,
        counters=None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Production corpus tokenization.

        Returns (ids, bounds): document i's token ids are
        ``ids[bounds[i]:bounds[i+1]]`` — the flat-buffer analog of the
        reference C API's ids-into-caller-array contract
        (blingfiretokdll.cpp:1097-1101).  The whole pipeline is batched:
        native C++ prep/dedup/packing, bucketed fixed-shape device passes,
        one asynchronous d2h per chunk, and a native C++ stitch; no per-doc
        Python runs except for fallback documents."""
        from . import metrics

        c = counters or metrics.global_counters()
        docs_b = [d.encode("utf-8") if isinstance(d, str) else d for d in docs]
        if not (self.dedup_units and self._native_units_ok()):
            out = self.encode_corpus(
                docs_b, unk_id=unk_id, batch_docs=batch_docs, counters=c
            )
            bounds = np.zeros(len(out) + 1, np.int64)
            np.cumsum([len(r) for r in out], out=bounds[1:])
            ids = (
                np.concatenate([np.asarray(r, np.int32) for r in out])
                if bounds[-1]
                else np.zeros(0, np.int32)
            )
            return ids.astype(np.int32, copy=False), bounds

        from .. import native

        runner = self._unit_runner()
        parts: list[tuple[np.ndarray, np.ndarray]] = []
        inflight: list = []
        # cross-batch unit cache: dedup is cumulative over this call — later
        # batches dispatch only units never resolved before (on real corpora
        # the distinct-unit stream dries up fast).  Fresh per call: a corpus
        # run never reuses results from a previous corpus.
        ucache = native.UnitCache()

        def collect(entry):
            chunk, state = entry
            with metrics.stage("collect", c):
                ids, bounds, need, status = runner.collect_docs(state)
                if need.any():
                    ids, bounds = self._patch_fallbacks(
                        chunk, ids, bounds, need, status, unk_id, c
                    )
                c.tokens_out += int(bounds[-1])
                parts.append((ids, bounds))

        for chunk in _batches_by_bytes(docs_b, batch_docs):
            with metrics.stage("dispatch", c):
                state = runner.dispatch_docs(chunk, unk_id, cache=ucache)
                c.dispatched_rows += state[0].n_rows
            c.docs_in += len(chunk)
            c.batches += 1
            inflight.append((chunk, state))
            if len(inflight) > 2:
                collect(inflight.pop(0))
        while inflight:
            collect(inflight.pop(0))
        c.bytes_in += sum(map(len, docs_b))
        c.cache_units = ucache.stats()["units"]

        if len(parts) == 1:
            return parts[0]
        total = sum(len(i) for i, _b in parts)
        ids = np.empty(total, np.int32)
        bounds = np.empty(len(docs_b) + 1, np.int64)
        bounds[0] = 0
        t = 0
        d = 0
        for pi, pb in parts:
            ids[t : t + len(pi)] = pi
            nb = len(pb) - 1
            bounds[d + 1 : d + 1 + nb] = pb[1:] + t
            t += len(pi)
            d += nb
        return ids, bounds

    def encode_batch(
        self, docs: list[bytes | str], unk_id: int = 0, dedup: bool | None = None
    ) -> list[list[int]]:
        docs_b = [d.encode("utf-8") if isinstance(d, str) else d for d in docs]
        use_units = self.dedup_units if dedup is None else (dedup and self._chunk_safe)
        if use_units and self._native_units_ok():
            runner = self._unit_runner()
            ids, bounds, need, status = runner.encode_docs(docs_b, unk_id)
            if need.any():
                from . import metrics

                ids, bounds = self._patch_fallbacks(
                    docs_b, ids, bounds, need, status, unk_id,
                    metrics.global_counters(),
                )
            return [
                ids[bounds[i] : bounds[i + 1]].tolist()
                for i in range(len(docs_b))
            ]
        x, spm, lengths, _offs, pre_fb = self._prep_batch(docs_b)
        x, spm, lengths = np.asarray(x), np.asarray(spm), np.asarray(lengths)

        if use_units:
            uout, need = self._unit_runner().encode(x, spm, lengths, unk_id)
            classic_idx = [
                i for i in range(len(docs_b))
                if need[i] and not pre_fb[i] and lengths[i] > 0
            ]
        else:
            uout, need = [None] * len(docs_b), np.ones(len(docs_b), bool)
            classic_idx = [
                i for i in range(len(docs_b)) if not pre_fb[i] and lengths[i] > 0
            ]
        cls_ids, cls_fb = (
            self._classic_rows(x, spm, lengths, classic_idx, unk_id)
            if classic_idx
            else ({}, {})
        )

        # long docs: whitespace-safe chunked device pass (host oracle only
        # when that too declines)
        over_idx = [i for i in range(len(docs_b)) if pre_fb[i]]
        chunked = (
            self._encode_overflow([docs_b[i] for i in over_idx], unk_id)
            if over_idx
            else []
        )
        over_map = dict(zip(over_idx, chunked))
        out: list[list[int]] = []
        for i, d in enumerate(docs_b):
            if pre_fb[i]:
                got = over_map.get(i)
                out.append(
                    got if got is not None
                    else self._oracle.text_to_ids(d, unk_id=unk_id)
                )
            elif lengths[i] == 0:
                # invalid UTF-8 / empty input: the reference returns 0 ids
                out.append([] if not d else self._oracle.text_to_ids(d, unk_id=unk_id))
            elif not need[i]:
                out.append(uout[i])
            elif i in cls_ids and not cls_fb[i]:
                out.append(cls_ids[i])
            else:
                out.append(self._oracle.text_to_ids(d, unk_id=unk_id))
        return out


    def encode_corpus(
        self,
        docs: list[bytes | str],
        unk_id: int = 0,
        batch_docs: int = 2048,
        counters=None,
    ) -> list[list[int]]:
        """Streaming corpus tokenization: fixed-shape batches are dispatched
        back to back (JAX dispatch is async, so host prep of batch k+1
        overlaps device compute of batch k).

        When the native unique-unit path serves this model, this is a
        compatibility wrapper over :meth:`encode_corpus_flat` (per-doc
        Python lists are NOT the production output format)."""
        import jax
        import jax.numpy as jnp

        from . import metrics

        c = counters or metrics.global_counters()
        docs_b = [d.encode("utf-8") if isinstance(d, str) else d for d in docs]
        if self.dedup_units and self._native_units_ok():
            ids, bounds = self.encode_corpus_flat(
                docs_b, unk_id=unk_id, batch_docs=batch_docs, counters=c
            )
            return [
                ids[bounds[i] : bounds[i + 1]].tolist()
                for i in range(len(docs_b))
            ]
        out: list[list[int]] = [None] * len(docs_b)  # type: ignore

        inflight = []

        use_units = self.dedup_units

        def finish_doc(k, i, d, pre_fb, row, fb, over_map):
            if pre_fb[k]:
                got = over_map.get(k)
                if got is not None:
                    c.chunked_docs += 1
                    out[i] = got
                    c.tokens_out += len(got)
                else:
                    c.fallback_docs += 1
                    out[i] = self._oracle.text_to_ids(d, unk_id=unk_id)
            elif fb:
                c.fallback_docs += 1
                out[i] = self._oracle.text_to_ids(d, unk_id=unk_id)
            elif len(d) == 0:
                c.invalid_docs += 1
                out[i] = []
            else:
                out[i] = row
                c.tokens_out += len(row)

        def collect(entry):
            idxs, docs_chunk, pre_fb, prepped, handles = entry
            with metrics.stage("collect", c):
                over_idx = [k for k in range(len(idxs)) if pre_fb[k]]
                chunked = (
                    self._encode_overflow(
                        [docs_chunk[k] for k in over_idx], unk_id
                    )
                    if over_idx
                    else []
                )
                over_map = dict(zip(over_idx, chunked))
                if use_units:
                    uout, need = self._unit_runner().collect(handles)
                    x, spm, lengths = prepped
                    classic_idx = [
                        k for k in range(len(idxs))
                        if need[k] and not pre_fb[k] and lengths[k] > 0
                    ]
                    cls_ids, cls_fb = (
                        self._classic_rows(x, spm, lengths, classic_idx, unk_id)
                        if classic_idx
                        else ({}, {})
                    )
                    for k, i in enumerate(idxs):
                        d = docs_chunk[k]
                        if len(d) == 0 and not pre_fb[k]:
                            finish_doc(k, i, d, pre_fb, None, False, over_map)
                        elif not pre_fb[k] and not need[k]:
                            finish_doc(k, i, d, pre_fb, uout[k], False, over_map)
                        elif k in cls_ids:
                            finish_doc(
                                k, i, d, pre_fb, cls_ids[k], cls_fb[k], over_map
                            )
                        else:
                            finish_doc(k, i, d, pre_fb, None, True, over_map)
                else:
                    if self.is_bpe:
                        ids, counts, dev_fb = (
                            np.asarray(handles[0]),
                            np.asarray(handles[3]),
                            np.asarray(handles[4]),
                        )
                    else:
                        ids, counts = np.asarray(handles[0]), np.asarray(handles[3])
                        dev_fb = np.zeros(len(idxs), bool)
                    for k, i in enumerate(idxs):
                        finish_doc(
                            k, i, docs_chunk[k], pre_fb,
                            ids[k, : counts[k]].tolist(), dev_fb[k], over_map,
                        )

        for start in range(0, len(docs_b), batch_docs):
            chunk = docs_b[start : start + batch_docs]
            idxs = list(range(start, start + len(chunk)))
            if len(chunk) < batch_docs:  # keep shapes jit-cache stable
                chunk = chunk + [b""] * (batch_docs - len(chunk))
            with metrics.stage("prep", c):
                x, spm, lengths, _offs, pre_fb = self._prep_batch(chunk)
                x, spm, lengths = np.asarray(x), np.asarray(spm), np.asarray(lengths)
            with metrics.stage("dispatch", c):
                if use_units:
                    handles = self._unit_runner().dispatch(x, spm, lengths, unk_id)
                elif self.is_bpe:
                    handles = bpe_ops.bpe_segment(
                        self.tables,
                        jnp.asarray(x),
                        jnp.asarray(spm),
                        jnp.asarray(lengths),
                        jnp.int32(unk_id),
                        self.a_max,
                    )
                else:
                    from ..ops import unigram as uni_ops

                    handles = uni_ops.unigram_segment(
                        self.tables,
                        jnp.asarray(x),
                        jnp.asarray(lengths),
                        jnp.int32(unk_id),
                    )
            c.bytes_in += sum(len(d) for d in chunk)
            c.docs_in += len(chunk)
            c.batches += 1
            inflight.append((idxs, chunk, pre_fb, (x, spm, lengths), handles))
            if len(inflight) > 2:  # keep a small pipeline
                collect(inflight.pop(0))
        while inflight:
            collect(inflight.pop(0))
        return out


def _round_up_pow2(n: int, lo: int = 8) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _batches_by_bytes(
    docs_b: list[bytes], max_docs: int, target_bytes: int = 2 << 20
) -> list[list[bytes]]:
    """Greedy batching by TOTAL BYTES (capped at max_docs documents).

    Per-batch fixed costs (dispatch trace, tunnel d2h latency, analyze call)
    are ~75 ms; corpora of tiny documents (dictionary lines, log records)
    batched by document count alone produce sub-MB batches whose fixed costs
    dominate the whole pipeline.  Vectorized: the r4 per-doc Python loop
    cost ~1 s alone on a 2M-doc corpus."""
    n = len(docs_b)
    if n == 0:
        return []
    cs = np.zeros(n + 1, np.int64)
    np.cumsum(np.fromiter((len(d) for d in docs_b), np.int64, n), out=cs[1:])
    out: list[list[bytes]] = []
    i = 0
    while i < n:
        j = int(np.searchsorted(cs, cs[i] + target_bytes, side="left"))
        j = min(max(j, i + 1), i + max_docs, n)
        out.append(docs_b[i:j])
        i = j
    return out


# Backwards-compatible alias
BpeTokenizer = SpTokenizer


def _max_token_len(aut) -> int:
    """Longest accepted string = longest path to a final state (DAG)."""
    import collections

    n = aut.n_states
    dst = np.where(aut.edge_dst < 0, n, aut.edge_dst)
    indeg = np.zeros(n + 1, np.int64)
    np.add.at(indeg, dst, 1)
    order = np.argsort(aut.edge_src, kind="stable")
    src_s = aut.edge_src[order]
    dst_s = dst[order]
    row = np.searchsorted(src_s, np.arange(n + 2))
    depth = np.zeros(n + 1, np.int64)
    q = collections.deque([s for s in range(n + 1) if indeg[s] == 0])
    visited = 0
    while q:
        s = q.popleft()
        visited += 1
        if s < n:
            for ei in range(row[s], row[s + 1]):
                d = dst_s[ei]
                depth[d] = max(depth[d], depth[s] + 1)
                indeg[d] -= 1
                if indeg[d] == 0:
                    q.append(d)
    if visited != n + 1:
        # cyclic automaton (not a finite vocab) — cap at the product limit
        return 300
    return int(depth.max())
