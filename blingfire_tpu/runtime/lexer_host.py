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

from dataclasses import dataclass

import numpy as np

from ..formats.consts import Iw, WBD_IGNORE_TAG, WBD_WORD_TAG, is_whitespace
from ..models.loader import Model
from ..ops import lexer as lexer_ops
from ..ops.tables import build_comb_table
from .lexer import LexerEngine, LexerOracleApi, _cps_to_utf8, _first_non_ws
from .host import decode_utf8


@dataclass
class _Row:
    doc: int  # document index
    seq: np.ndarray  # guarded dense-iw symbols of the span
    raw: np.ndarray  # raw codepoints of the span (for scalar fallback)
    init: int  # initial state
    offset: int  # span start in document coordinates
    depth: int


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

    def process_docs(self, docs_cps: list[np.ndarray]) -> list[list[int]]:
        """Run the full grammar over documents (utf32 codepoint arrays).
        Returns the reference-ordered (tag, from, to) triple list per doc."""
        import jax.numpy as jnp

        rows = [
            _Row(
                i,
                self.encode_chars(np.asarray(c, np.int32)),
                np.asarray(c, np.int32),
                0,
                0,
                1,
            )
            for i, c in enumerate(docs_cps)
        ]
        # match-tree nodes: (tag, from, to, children); tag 0 nodes are
        # placeholders that keep nested-function emission order
        trees: list[list] = [[] for _ in docs_cps]
        row_sink: list[list] = [trees[r.doc] for r in rows]

        depth = 1
        while rows and depth <= self.max_depth:
            next_rows: list[_Row] = []
            next_sinks: list[list] = []
            groups: dict[int, list[int]] = {}
            for ri in range(len(rows)):
                n = len(rows[ri].seq)
                bucket = next((b for b in self.buckets if n <= b), -1)
                groups.setdefault(bucket, []).append(ri)

            for bucket, idxs in sorted(groups.items()):
                if bucket == -1:
                    for ri in idxs:
                        self._scalar_row(rows[ri], row_sink[ri])
                    continue
                M = bucket + 2
                B = _round_up(len(idxs))
                x = np.full((B, M), -1, np.int32)
                init = np.zeros(B, np.int32)
                elen = np.full(B, 2, np.int32)
                for k, ri in enumerate(idxs):
                    r = rows[ri]
                    n = len(r.seq)
                    x[k, 0] = self._lanchor
                    x[k, 1 : n + 1] = r.seq
                    x[k, n + 1] = self._ranchor
                    init[k] = r.init
                    elen[k] = n + 2
                vis, tag, f2, t2, fn = lexer_ops.lexer_pass(
                    self.tables, jnp.asarray(x), jnp.asarray(init), jnp.asarray(elen)
                )
                vis = np.asarray(vis)
                tag = np.asarray(tag)
                f2 = np.asarray(f2)
                t2 = np.asarray(t2)
                fn = np.asarray(fn)
                for k, ri in enumerate(idxs):
                    r = rows[ri]
                    sink = row_sink[ri]
                    for q in np.flatnonzero(vis[k]):
                        node_tag = int(tag[k, q])
                        lo = int(f2[k, q])
                        hi = int(t2[k, q])
                        children: list = []
                        sink.append((node_tag, lo + r.offset, hi + r.offset, children))
                        fid = int(fn[k, q])
                        if fid >= 0 and depth < self.max_depth:
                            fini = self.engine.fn2ini[fid]
                            next_rows.append(
                                _Row(
                                    r.doc,
                                    r.seq[lo : hi + 1],
                                    r.raw[lo : hi + 1],
                                    fini,
                                    r.offset + lo,
                                    depth + 1,
                                )
                            )
                            next_sinks.append(children)
            rows = next_rows
            row_sink = next_sinks
            depth += 1

        out: list[list[int]] = []
        for t in trees:
            flat: list[int] = []
            self._flatten(t, flat)
            out.append(flat)
        return out

    def _flatten(self, nodes, flat):
        for tag, f, t, children in nodes:
            if tag != 0:
                flat.extend((tag, f, t))
            self._flatten(children, flat)

    def _scalar_row(self, row: _Row, sink) -> None:
        """Fallback for oversized rows: scalar engine (emits flat triples
        already in depth-first order)."""
        out: list[int] = []
        self.engine._process_int(
            row.init,
            row.offset,
            row.raw.tolist(),
            0,
            len(row.raw),
            out,
            1 << 30,
            row.depth,
            False,
        )
        for i in range(0, len(out), 3):
            sink.append((out[i], out[i + 1], out[i + 2], []))


def _round_up(n: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return b


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
