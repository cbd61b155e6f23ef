"""Batched TPU lexer runtime: level-by-level orchestration of lexer_pass.

The device kernel (ops/lexer.py) executes one grammar "function" over a batch
of rows; this module drives whole documents through it: level 0 tokenizes the
text, matched actions that _call functions enqueue their spans as new rows
for the next level (repacked into fresh buckets), and results are stitched
back in the reference's depth-first emission order
(FALexTools_t.h:329-382, single-function actions).

Products built on top: TextToWords, TextToSentences, WordPiece TextToIds —
batched equivalents of blingfiretokdll.cpp:163-582 and :1097-1314.
"""

from __future__ import annotations

import functools

import numpy as np

from ..formats.consts import Iw, WBD_IGNORE_TAG, WBD_WORD_TAG, is_whitespace
from ..models.loader import Model
from ..ops import lexer as lexer_ops
from ..ops.tables import build_comb_table
from .lexer import LexerEngine, LexerOracleApi, _cps_to_utf8, _first_non_ws
from .host import decode_utf8


@functools.cache
def _pack5():
    """jit that fuses lexer_pass's five outputs into one int32 array so each
    dispatch costs a single d2h (the tunnel charges ~25-45 ms per read)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def pack(vis, tag, f2, t2, fn):
        return jnp.concatenate(
            [vis.astype(jnp.int32), tag, f2, t2, fn], axis=1
        )

    return pack


class LexerTpu:
    """Device-backed lexer for one [wbd] model."""

    def __init__(self, model: Model, buckets: tuple[int, ...] = (32, 128, 512)):
        assert model.wbd is not None
        self.model = model
        self.wbd = model.wbd
        self.engine = LexerEngine(model.wbd)  # reuse fn2ini + scalar fallback
        from ..ops.tables import build_comb_table_cached
        self.comb = build_comb_table_cached(model.wbd.aut, model.source_key, 'wbd')
        self.tables = lexer_ops.make_device_tables(
            self.comb,
            model.wbd.aut.moore_ow,
            model.wbd.acts,
            model.wbd.max_token_length,
        )
        self.buckets = tuple(sorted(buckets))
        self.max_depth = model.wbd.max_depth
        # dense raw-symbol -> internal iw map (post guard)
        iw2iw = model.wbd.aut.iw2iw
        assert iw2iw is not None, "[wbd] DFA is expected to be iw-remapped"
        self._iw2iw = iw2iw
        self._n_iws = self.comb.n_iws
        self._lanchor = self._map_raw(np.array([Iw.L_ANCHOR], np.int32))[0]
        self._ranchor = self._map_raw(np.array([Iw.R_ANCHOR], np.int32))[0]
        # span-content -> assembled triple list (see process_docs docstring)
        self._flat_cache: dict = {}

    def _map_raw(self, raw: np.ndarray) -> np.ndarray:
        """original iw -> dense internal iw; missing -> n_iws sentinel (still
        ANY-fallback-able on device), never -1 (which kills the lane)."""
        m = self._iw2iw
        idx = np.clip(raw, 0, len(m) - 1)
        v = np.where((raw >= 0) & (raw < len(m)), m[idx], -1)
        return np.where(v < 0, self._n_iws, v).astype(np.int32)

    def encode_chars(self, cps: np.ndarray) -> np.ndarray:
        """guard control weights, case-fold, then remap (FALexTools_t.h:259-264)."""
        guarded = np.where(cps < int(Iw.EPSILON), int(Iw.EPSILON), cps)
        if self.wbd.ignore_case:
            from .casefold import str_lower

            guarded = str_lower(guarded)
        return self._map_raw(guarded)

    # -- batched multi-level processing ------------------------------------

    # rows per dispatch for each bucket width: FIXED shapes so the jit cache
    # holds exactly len(buckets) programs (pow2-rounded row counts churned
    # dozens of recompiles per corpus before)
    BUCKET_ROWS = {32: 2048, 128: 512, 512: 64}

    def process_docs(self, docs_cps: list[np.ndarray]) -> list[list[int]]:
        """Run the full grammar over documents (utf32 codepoint arrays).
        Returns the reference-ordered (tag, from, to) triple list per doc.

        Spans are MEMOIZED on (initial state, remaining depth budget, symbol
        content): a span's matches — and its fully assembled depth-first
        triple list — are content functions, so each distinct document and
        each distinct _call sub-span (typically a word: Zipf-repeated) hits
        the device exactly once per cache lifetime."""
        import jax.numpy as jnp

        cache = self._flat_cache
        if len(cache) > 300_000:
            cache.clear()
        md = self.max_depth

        def key_of(init: int, rem: int, seq: np.ndarray):
            return (init, rem, seq.tobytes())

        # spans whose matches were computed this call, in discovery order
        # (children are discovered after their parent, so reversed order
        # assembles bottom-up); value: (tags, los, his, child_keys)
        span_order: list = []
        matches: dict = {}
        queued: set = set()

        doc_keys = []
        level: list[tuple] = []  # (key, seq, raw, init, rem)
        for c in docs_cps:
            cps = np.asarray(c, np.int32)
            seq = self.encode_chars(cps)
            k = key_of(0, md - 1, seq)
            doc_keys.append(k)
            if k not in cache and k not in queued:
                queued.add(k)
                level.append((k, seq, cps, 0, md - 1))

        while level:
            nxt: list[tuple] = []
            groups: dict[int, list[int]] = {}
            for si, (_k, seq, _raw, _init, _rem) in enumerate(level):
                bucket = next((b for b in self.buckets if len(seq) <= b), -1)
                groups.setdefault(bucket, []).append(si)

            for bucket, idxs in sorted(groups.items()):
                if bucket == -1:  # oversize: scalar engine, memoized too
                    for si in idxs:
                        k, seq, raw, init, rem = level[si]
                        cache[k] = self._scalar_flat(raw, init, md - rem)
                    continue
                M = bucket + 2
                rows = self.BUCKET_ROWS[bucket]
                for off in range(0, len(idxs), rows):
                    part = idxs[off : off + rows]
                    x = np.full((rows, M), -1, np.int32)
                    init = np.zeros(rows, np.int32)
                    elen = np.full(rows, 2, np.int32)
                    for r, si in enumerate(part):
                        seq = level[si][1]
                        n = len(seq)
                        x[r, 0] = self._lanchor
                        x[r, 1 : n + 1] = seq
                        x[r, n + 1] = self._ranchor
                        init[r] = level[si][3]
                        elen[r] = n + 2
                    packed = np.asarray(
                        _pack5()(
                            *lexer_ops.lexer_pass(
                                self.tables,
                                jnp.asarray(x),
                                jnp.asarray(init),
                                jnp.asarray(elen),
                            )
                        )
                    )
                    vis = packed[: len(part), :M] != 0
                    tagm = packed[: len(part), M : 2 * M]
                    f2m = packed[: len(part), 2 * M : 3 * M]
                    t2m = packed[: len(part), 3 * M : 4 * M]
                    fnm = packed[: len(part), 4 * M : 5 * M]
                    ks, qs = np.nonzero(vis)  # row-major: in-row match order
                    bounds = np.searchsorted(ks, np.arange(len(part) + 1))
                    for r, si in enumerate(part):
                        k, seq, raw, _initv, rem = level[si]
                        sel = qs[bounds[r] : bounds[r + 1]]
                        tags = tagm[r, sel]
                        los = f2m[r, sel]
                        his = t2m[r, sel]
                        fns = fnm[r, sel]
                        child_keys: list = [None] * len(sel)
                        if rem > 0:
                            for j in np.flatnonzero(fns >= 0):
                                lo, hi = int(los[j]), int(his[j])
                                fini = self.engine.fn2ini[int(fns[j])]
                                cseq = seq[lo : hi + 1]
                                ck = key_of(fini, rem - 1, cseq)
                                child_keys[j] = ck
                                if ck not in cache and ck not in queued:
                                    queued.add(ck)
                                    nxt.append(
                                        (ck, cseq, raw[lo : hi + 1], fini, rem - 1)
                                    )
                        matches[k] = (tags, los, his, child_keys)
                        span_order.append(k)
            level = nxt

        # -- bottom-up assembly (children appear after parents in order) ----
        empty = np.zeros((0, 3), np.int32)
        for k in reversed(span_order):
            tags, los, his, child_keys = matches[k]
            if not any(ck is not None for ck in child_keys):
                keep = tags != 0
                flat = np.stack([tags[keep], los[keep], his[keep]], axis=1)
                cache[k] = flat.astype(np.int32)
                continue
            parts = []
            for j in range(len(tags)):
                if tags[j] != 0:
                    parts.append(
                        np.array([[tags[j], los[j], his[j]]], np.int32)
                    )
                ck = child_keys[j]
                if ck is not None:
                    cf = cache[ck]
                    if len(cf):
                        parts.append(cf + np.array([0, los[j], los[j]], np.int32))
            cache[k] = np.concatenate(parts) if parts else empty

        return [cache[k].ravel().tolist() for k in doc_keys]

    def _scalar_flat(self, raw: np.ndarray, init: int, depth: int) -> np.ndarray:
        """Fallback for oversized spans: scalar engine (emits flat triples
        already in depth-first order, span-relative)."""
        out: list[int] = []
        self.engine._process_int(
            init, 0, raw.tolist(), 0, len(raw), out, 1 << 30, depth, False
        )
        return np.asarray(out, np.int32).reshape(-1, 3)


class WordsTpu:
    """Batched TextToWords / TextToSentences."""

    def __init__(self, model: Model, **opts):
        self.lex = LexerTpu(model, **opts)

    def _decode_all(self, docs: list[bytes]):
        seqs = []
        for d in docs:
            dec = decode_utf8(d)
            if dec is None:
                seqs.append(None)
                continue
            cps = np.where(dec[0] == 0, 0x20, dec[0])
            seqs.append(cps)
        return seqs

    def text_to_words_batch(self, docs: list[bytes | str]) -> list[str | None]:
        docs_b = [d.encode("utf-8") if isinstance(d, str) else d for d in docs]
        seqs = self._decode_all(docs_b)
        todo = [(i, s) for i, s in enumerate(seqs) if s is not None and len(s)]
        triples = self.lex.process_docs([s for _, s in todo])
        out: list[str | None] = [None] * len(docs_b)
        for (i, cps), res in zip(todo, triples):
            words = []
            for k in range(0, len(res), 3):
                if res[k] == WBD_IGNORE_TAG:
                    continue
                f, t = res[k + 1], res[k + 2]
                words.append(_cps_to_utf8(cps[f : t + 1]).replace(" ", "_"))
            out[i] = " ".join(words)
        for i, (d, s) in enumerate(zip(docs_b, seqs)):
            if len(d) == 0:
                out[i] = ""
        return out

    def text_to_sentences_batch(self, docs: list[bytes | str]) -> list[str | None]:
        docs_b = [d.encode("utf-8") if isinstance(d, str) else d for d in docs]
        seqs = self._decode_all(docs_b)
        todo = [(i, s) for i, s in enumerate(seqs) if s is not None and len(s)]
        triples = self.lex.process_docs([s for _, s in todo])
        out: list[str | None] = [None] * len(docs_b)
        for (i, cps), res in zip(todo, triples):
            cl = cps.tolist()
            n = len(cl)
            sents = []
            prev_end = -1
            spans = [
                (res[k + 2]) for k in range(0, len(res), 3)
            ]
            for to in spans:
                frm = prev_end + 1
                prev_end = to
                delta = _first_non_ws(cl, frm, to + 1)
                if delta < to + 1 - frm:
                    sents.append(_cps_to_utf8(cl[frm + delta : to + 1]).replace("\n", " "))
            if prev_end + 1 < n:
                frm = prev_end + 1
                delta = _first_non_ws(cl, frm, n)
                if delta < n - frm:
                    sents.append(_cps_to_utf8(cl[frm + delta : n]).replace("\n", " "))
            out[i] = "\n".join(sents)
        for i, d in enumerate(docs_b):
            if len(d) == 0:
                out[i] = ""
        return out


class WordPieceTpu:
    """Batched WordPiece TextToIds (bert models)."""

    def __init__(self, model: Model, **opts):
        self.lex = LexerTpu(model, **opts)
        self.charmap = model.wbd.charmap

    def text_to_ids_batch(
        self, docs: list[bytes | str], unk_id: int = 0
    ) -> list[list[int]]:
        from .oracle import normalize

        docs_b = [d.encode("utf-8") if isinstance(d, str) else d for d in docs]
        seqs = []
        for d in docs_b:
            dec = decode_utf8(d)
            if dec is None or len(dec[0]) == 0 or len(dec[0]) > len(d):
                seqs.append(None)
                continue
            cps = dec[0]
            if self.charmap is not None:
                norm, _ = normalize(cps.tolist(), self.charmap)
                if len(norm) <= 0 or len(norm) > len(d):
                    seqs.append(None)
                    continue
                cps = np.asarray(norm, np.int32)
            seqs.append(cps)
        todo = [(i, s) for i, s in enumerate(seqs) if s is not None]
        triples = self.lex.process_docs([s for _, s in todo])
        out: list[list[int]] = [[] for _ in docs_b]
        for (i, _s), res in zip(todo, triples):
            out[i] = _stitch_wordpiece(res, unk_id)
        return out


def _stitch_wordpiece(res: list[int], unk_id: int) -> list[int]:
    """The wp id-emission loop (blingfiretokdll.cpp:1210-1311)."""
    out: list[int] = []
    i = 0
    n = len(res)
    while i < n:
        tag = res[i]
        if tag == WBD_IGNORE_TAG:
            i += 3
            continue
        if tag == WBD_WORD_TAG:
            tok_from, tok_to = res[i + 1], res[i + 2]
            j = i + 3
            num_sub = 0
            covered = False
            if j < n:
                expected = tok_from
                while j < n and res[j] > WBD_IGNORE_TAG and expected == res[j + 1]:
                    expected = res[j + 2] + 1
                    num_sub += 1
                    j += 3
                if num_sub > 0 and expected - 1 == tok_to:
                    for k in range(num_sub):
                        out.append(res[i + (k + 1) * 3])
                    covered = True
            if not covered:
                out.append(unk_id)
            i = j - 3
        i += 3
    return out
