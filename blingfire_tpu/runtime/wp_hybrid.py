"""WordPiece hybrid production path (bert-class [wbd] models).

Division of labour mirroring the [pos-dict] unique-unit pipeline
(native/prep.cpp + runtime/dedup.py):

  C++   — per doc: UTF-8 decode, charmap normalize, LEVEL-0 lexer scan
          (words/ignores; sub-token functions are NOT recursed), intern of
          each function span — typically a word, Zipf-repeated — once per
          batch (runtime.cpp::BtlWpAnalyze).
  TPU   — the sub-token pass over UNIQUE words only, densely packed with
          per-unit anchors into 128-wide rows (ops/lexer.py::wp_subword_pass);
          one compact int32 output per chunk, d2h started asynchronously.
  C++   — per-unit coverage check + flat per-doc id emission
          (runtime.cpp::BtlWpStitch).

Packing many words into one row is only sound when the sub-grammar cannot
walk across an R anchor and has no IW_ANY transitions; `_fn_pack_safe`
verifies both on the comb table at load.  Documents the hybrid cannot serve
(oversize words, nested sub-functions, multi-function actions) fall back to
the native C++ TextToIds — same semantics, host-only.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..formats.consts import Iw
from ..models.loader import Model
from ..ops import lexer as lexer_ops

MAX_UNIT = 40  # longest word the device path handles (fallback beyond)
LW_CLASSES = (16, MAX_UNIT)  # unit-length classes -> walk depth lw = len + 2
ROW_W = 128

from .dedup import (  # shared bucket decomposition + d2h grouping
    BIG_BUCKET,
    GROUP_CHUNKS,
    PACK_ROWS,
    ROW_BUCKETS,
    _row_chunks,
)


class WpUnitCache:
    """Cross-batch (word -> sub-token ids) cache for the hybrid path."""

    def __init__(self, rt):
        self._rt = rt
        self._handle = rt.BtlWpCacheNew()

    def stats(self) -> dict:
        s = np.zeros(4, np.int64)
        self._rt.BtlWpCacheStats(self._handle,
                                 s.ctypes.data_as(ctypes.c_void_p))
        return {"units": int(s[0]), "resolved": int(s[1]),
                "arena_ids": int(s[2]), "bytes": int(s[3])}

    def close(self):
        if self._handle is not None:
            self._rt.BtlWpCacheFree(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class WordPieceHybrid:
    """Batched TextToIds for one WordPiece model, native+device hybrid."""

    def __init__(self, model: Model, model_path: str | None = None):
        from .. import native
        from ..ops.tables import build_comb_table_cached
        from .lexer import LexerEngine

        from ..utils import ensure_compile_cache

        ensure_compile_cache()
        assert model.wbd is not None
        self.model = model
        self.wbd = model.wbd
        self.engine = LexerEngine(model.wbd)
        self.comb = build_comb_table_cached(model.wbd.aut, model.source_key, "wbd")
        self.tables = lexer_ops.make_device_tables(
            self.comb,
            model.wbd.aut.moore_ow,
            model.wbd.acts,
            model.wbd.max_token_length,
        )
        iw2iw = model.wbd.aut.iw2iw
        assert iw2iw is not None
        self._iw2iw = iw2iw
        self._n_iws = self.comb.n_iws
        self._l_iw = int(self._map_raw(np.array([Iw.L_ANCHOR], np.int32))[0])
        self._r_iw = int(self._map_raw(np.array([Iw.R_ANCHOR], np.int32))[0])
        self._rt = native.get_runtime()
        self._nh = None
        if self._rt is not None:
            self._rt.BtlWpAnalyzeC.restype = ctypes.c_void_p
            self._rt.BtlWpAnalyzeC.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ]
            self._rt.BtlWpCacheNew.restype = ctypes.c_void_p
            self._rt.BtlWpCacheNew.argtypes = []
            self._rt.BtlWpCacheFree.restype = None
            self._rt.BtlWpCacheFree.argtypes = [ctypes.c_void_p]
            self._rt.BtlWpCacheStats.restype = None
            self._rt.BtlWpCacheStats.argtypes = [ctypes.c_void_p,
                                                 ctypes.c_void_p]
            self._rt.BtlWpUnits.restype = None
            self._rt.BtlWpUnits.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 3
            self._rt.BtlWpStitch.restype = ctypes.c_int64
            self._rt.BtlWpStitch.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ]
            self._rt.BtlWpFree.restype = None
            self._rt.BtlWpFree.argtypes = [ctypes.c_void_p]
            if model_path is not None:
                h = self._rt.LoadModel(model_path.encode())
            else:
                img = model.ldb.image
                self._img_buf = ctypes.create_string_buffer(img, len(img))
                h = self._rt.SetModel(self._img_buf, len(img))
            self._nh = h if h else None
        self._safe = self._nh is not None and self._fn_pack_safe()
        self.big_ready = False  # 2048-row programs live (progressive warm)
        # dense finals-first sub-grammar (1 gather/step; ops/lexer.py)
        self._dense = None
        if self._safe:
            inis = [s for s in self.engine.fn2ini[1:]
                    if s is not None and s >= 0]
            self._dense = lexer_ops.make_dense_sub(
                self.comb, model.wbd.aut.moore_ow, inis
            )

    def _map_raw(self, raw: np.ndarray) -> np.ndarray:
        m = self._iw2iw
        idx = np.clip(raw, 0, len(m) - 1)
        v = np.where((raw >= 0) & (raw < len(m)), m[idx], -1)
        return np.where(v < 0, self._n_iws, v).astype(np.int32)

    def _fn_pack_safe(self) -> bool:
        """Dense word packing + no-ANY walk are sound iff, over the states
        reachable from the sub-function initial states: (a) no transition is
        labelled IW_ANY, (b) every R-anchor destination is a dead end, and
        (c) the tag ids fit the 17-bit lane field."""
        comb = self.comb
        inis = [s for s in self.engine.fn2ini[1:] if s is not None and s >= 0]
        if not inis:
            return False
        if int(np.asarray(self.tables.act_tag).max(initial=0)) + 1 >= (1 << 17):
            return False
        any_iw = int(comb.sym2iw[0]) if len(comb.sym2iw) else -1
        base = np.asarray(comb.base)
        owner = np.asarray(comb.owner)
        nxt = np.asarray(comb.nxt)
        n_states = len(base)
        seen = np.zeros(n_states, bool)
        stack = list(dict.fromkeys(inis))
        for s in stack:
            seen[s] = True
        occ = np.flatnonzero(owner >= 0)
        occ_iw = occ - base[owner[occ]]
        # state -> its occupied slots (grouped)
        order = np.argsort(owner[occ], kind="stable")
        so = owner[occ][order]
        slot_sorted = occ[order]
        iw_sorted = occ_iw[order]
        row = np.searchsorted(so, np.arange(n_states + 1))
        while stack:
            s = stack.pop()
            for k in range(row[s], row[s + 1]):
                iw = int(iw_sorted[k])
                d = int(nxt[slot_sorted[k]])
                if d < 0:
                    continue
                if iw == any_iw and any_iw >= 0:
                    return False
                if iw == self._r_iw:
                    # R destination must be a dead end
                    if row[d] != row[d + 1]:
                        return False
                    continue
                if not seen[d]:
                    seen[d] = True
                    stack.append(d)
        return True

    def available(self) -> bool:
        return self._safe

    # ------------------------------------------------------------------ run

    def new_cache(self):
        """Cross-batch word cache handle (runtime.cpp::WpCache)."""
        return WpUnitCache(self._rt)

    def _device_pass(self, bx, bi, lw: int):
        import jax.numpy as jnp

        if self._dense is not None:
            dnext, ow_perm, _perm, n_f, _n_reach = self._dense
            return lexer_ops.wp_subword_pass_dense(
                self.tables, dnext, ow_perm, bx, bi,
                jnp.int32(self._l_iw), jnp.int32(self._r_iw), lw,
                n_f, self._n_iws,
            )
        return lexer_ops.wp_subword_pass(
            self.tables, bx, bi,
            jnp.int32(self._l_iw), jnp.int32(self._r_iw), lw,
        )

    def dispatch(self, docs_b: list[bytes], cache=None):
        import jax.numpy as jnp

        rt = self._rt
        B = len(docs_b)
        blob = b"".join(docs_b)
        doc_off = np.zeros(B + 1, np.int64)
        np.cumsum([len(d) for d in docs_b], out=doc_off[1:])
        counts = np.zeros(5, np.int64)
        h = rt.BtlWpAnalyzeC(
            cache._handle if cache is not None else None,
            ctypes.c_void_p(self._nh), ctypes.c_char_p(blob),
            doc_off.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(B),
            ctypes.c_int(MAX_UNIT), counts.ctypes.data_as(ctypes.c_void_p),
        )
        assert h, "BtlWpAnalyze failed"
        U, S, I, cap = (int(c) for c in counts[:4])
        u_syms = np.empty(max(S, 1), np.int32)
        u_soff = np.empty(U + 1, np.int32)
        u_fn = np.empty(max(U, 1), np.int32)
        rt.BtlWpUnits(
            ctypes.c_void_p(h),
            u_syms.ctypes.data_as(ctypes.c_void_p),
            u_soff.ctypes.data_as(ctypes.c_void_p),
            u_fn.ctypes.data_as(ctypes.c_void_p),
        )

        # ---- dense packing into ROW_W-wide rows, by unit-length class ----
        # Units are grouped by EXACT ext length: a row of ext-e units holds
        # floor(ROW_W / e) of them at stride e, so the whole layout is a few
        # dozen pure-numpy scatters (a per-unit Python loop here cost more
        # than the device pass on low-redundancy corpora).
        ulen = np.diff(u_soff)
        ext = ulen + 2
        u_row = np.zeros(max(U, 1), np.int32)
        u_off = np.zeros(max(U, 1), np.int32)
        fn2ini_arr = np.array(
            [f if f is not None and f >= 0 else -1
             for f in self.engine.fn2ini] or [-1],
            np.int32,
        )
        if self._dense is not None:
            # dense walk uses PERMUTED state ids (finals first)
            perm = self._dense[2]
            ok = (fn2ini_arr >= 0) & (fn2ini_arr < len(perm))
            fn2ini_arr = np.where(
                ok, perm[np.clip(fn2ini_arr, 0, len(perm) - 1)], -1
            ).astype(np.int32)
        iw_flat = self._map_raw(u_syms[:S]) if S else u_syms[:0]

        blocks_x: list[np.ndarray] = []
        blocks_i: list[np.ndarray] = []
        class_rows: list[tuple[int, int, int]] = []  # (row_lo, row_hi, lw)
        base_row = 0
        for cap_len in LW_CLASSES:
            lo_row = base_row
            members = np.flatnonzero(
                (ulen <= cap_len)
                & (ulen > (0 if cap_len == LW_CLASSES[0] else LW_CLASSES[0]))
            )
            for e in np.unique(ext[members]) if len(members) else []:
                grp = members[ext[members] == e]
                e = int(e)
                per = ROW_W // e
                nrows = -(-len(grp) // per)
                k = np.arange(len(grp))
                r = (k // per).astype(np.int32)
                o = ((k % per) * e).astype(np.int32)
                u_row[grp] = base_row + r
                u_off[grp] = o
                X = np.full((nrows, ROW_W), -1, np.int32)
                I = np.full((nrows, ROW_W), -1, np.int32)
                X[r, o] = self._l_iw
                X[r, o + e - 1] = self._r_iw
                starts = u_soff[grp]
                for j in range(e - 2):
                    X[r, o + 1 + j] = iw_flat[starts + j]
                finis = fn2ini_arr[np.clip(u_fn[grp], 0, len(fn2ini_arr) - 1)]
                for j in range(e):
                    I[r, o + j] = finis
                blocks_x.append(X)
                blocks_i.append(I)
                base_row += nrows
            class_rows.append((lo_row, base_row, cap_len + 2))
        R = base_row
        px = (np.concatenate(blocks_x) if blocks_x
              else np.zeros((0, ROW_W), np.int32))
        pinit = (np.concatenate(blocks_i) if blocks_i
                 else np.zeros((0, ROW_W), np.int32))

        # progressive-bucket dispatches (see runtime/dedup.py): 512-row
        # chunks immediately, 2048-row chunks for large regions once the
        # background-loaded big programs are live; outputs flow through
        # fixed-shape transfers (groups of four 512s, or one 2048).
        # rowmap[packed row] = row index within the concatenated transfers.
        chunks = []  # (out_handle, packed_lo, n_valid, rows)
        use_big = self.big_ready
        for lo_row, hi_row, lw in class_rows:
            lo = lo_row
            while lo < hi_row:
                left = hi_row - lo
                if use_big and left >= BIG_BUCKET:
                    b = BIG_BUCKET
                else:
                    b = _row_chunks(left)[0]
                n = min(b, left)
                bx = np.full((b, ROW_W), -1, np.int32)
                bi = np.full((b, ROW_W), -1, np.int32)
                bx[:n] = px[lo : lo + n]
                bi[:n] = pinit[lo : lo + n]
                out = self._device_pass(jnp.asarray(bx), jnp.asarray(bi), lw)
                chunks.append((out, lo, n, b))
                lo += n
        rowmap = np.zeros(max(R, 1), np.int32)
        pending = []
        dev = 0
        i = 0
        while i < len(chunks):
            out, plo, n, b = chunks[i]
            if b == BIG_BUCKET:
                rowmap[plo : plo + n] = dev + np.arange(n, dtype=np.int32)
                dev += b
                hcat = out
                i += 1
            else:
                grp = []
                while (i < len(chunks) and chunks[i][3] != BIG_BUCKET
                       and len(grp) < GROUP_CHUNKS):
                    oo, pl, nn, bb = chunks[i]
                    grp.append(oo)
                    rowmap[pl : pl + nn] = dev + np.arange(nn, dtype=np.int32)
                    dev += bb
                    i += 1
                dev += (GROUP_CHUNKS - len(grp)) * PACK_ROWS
                while len(grp) < GROUP_CHUNKS:
                    grp.append(grp[0])
                hcat = jnp.concatenate(grp, axis=0)
            try:
                hcat.copy_to_host_async()
            except Exception:
                pass
            pending.append(hcat)
        return (h, B, rowmap[u_row] if R else u_row, u_off, pending)

    def collect(self, state, unk_id: int, docs_b: list[bytes]):
        h, B, u_row, u_off, pending = state
        rt = self._rt
        if pending:
            rows = (
                np.asarray(pending[0]) if len(pending) == 1
                else np.concatenate([np.asarray(o) for o in pending], axis=0)
            )
        else:
            rows = np.zeros((0, ROW_W + 2), np.int32)
        rows = np.ascontiguousarray(rows)
        cap = int(sum(len(d) for d in docs_b)) + B + 16
        out_ids = np.empty(cap, np.int32)
        bounds = np.empty(B + 1, np.int64)
        need = np.empty(B, np.uint8)
        t = rt.BtlWpStitch(
            ctypes.c_void_p(h), rows.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(rows.shape[0]), ctypes.c_int(ROW_W + 2),
            u_row.ctypes.data_as(ctypes.c_void_p),
            u_off.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(unk_id),
            out_ids.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(cap),
            bounds.ctypes.data_as(ctypes.c_void_p),
            need.ctypes.data_as(ctypes.c_void_p),
        )
        rt.BtlWpFree(ctypes.c_void_p(h))
        assert t >= 0, "BtlWpStitch capacity exceeded"
        ids = out_ids[:t]
        n_fb = int(need.sum())
        if n_fb:
            ids, bounds = self._patch_native(docs_b, ids, bounds, need, unk_id)
        return ids, bounds, n_fb

    def _patch_native(self, docs_b, ids, bounds, need, unk_id):
        """Fallback docs run the full native TextToIds (host C++)."""
        rt = self._rt
        buf = np.empty(1 << 16, np.int32)
        repl = {}
        for k in np.flatnonzero(need):
            d = docs_b[int(k)]
            n = rt.TextToIds(
                ctypes.c_void_p(self._nh), ctypes.c_char_p(d),
                ctypes.c_int(len(d)),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.c_int(len(buf)), ctypes.c_int(unk_id),
            )
            repl[int(k)] = buf[:n].tolist()
        cnt = np.diff(bounds)
        for k, v in repl.items():
            cnt[k] = len(v)
        nb = np.zeros(len(bounds), np.int64)
        np.cumsum(cnt, out=nb[1:])
        out = np.empty(int(nb[-1]), np.int32)
        prev = 0
        for k in sorted(repl):
            if k > prev:
                out[nb[prev] : nb[k]] = ids[bounds[prev] : bounds[k]]
            out[nb[k] : nb[k + 1]] = repl[k]
            prev = k + 1
        n = len(cnt)
        if prev < n:
            out[nb[prev] : nb[n]] = ids[bounds[prev] : bounds[n]]
        return out, nb

    def encode_corpus_flat(
        self, docs, unk_id: int = 0, batch_docs: int = 16384, counters=None
    ):
        """(ids, bounds) over the whole corpus — the flat-buffer contract of
        encode_corpus_flat on the [pos-dict] side."""
        from . import metrics

        c = counters or metrics.global_counters()
        docs_b = [d.encode("utf-8") if isinstance(d, str) else d for d in docs]
        parts = []
        inflight = []
        ucache = self.new_cache()  # cumulative dedup over this call

        def do_collect(entry):
            chunk, state = entry
            with metrics.stage("collect", c):
                ids, bounds, n_fb = self.collect(state, unk_id, chunk)
                c.fallback_docs += n_fb
                c.tokens_out += int(bounds[-1])
                parts.append((ids, bounds))

        from .host import _batches_by_bytes

        for chunk in _batches_by_bytes(docs_b, batch_docs):
            with metrics.stage("dispatch", c):
                state = self.dispatch(chunk, cache=ucache)
            c.docs_in += len(chunk)
            c.batches += 1
            inflight.append((chunk, state))
            if len(inflight) > 2:
                do_collect(inflight.pop(0))
        while inflight:
            do_collect(inflight.pop(0))
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

    def text_to_ids_batch(self, docs, unk_id: int = 0) -> list[list[int]]:
        ids, bounds = self.encode_corpus_flat(docs, unk_id=unk_id)
        return [
            ids[bounds[i] : bounds[i + 1]].tolist() for i in range(len(docs))
        ]

    def warm(self, buckets=ROW_BUCKETS, background_big: bool = True):
        """Progressive warm (see runtime/dedup.py::UnitRunner.warm): the
        512-row programs load eagerly, the 2048-row set in a daemon
        thread; dispatch upgrades large regions once they are live."""
        import threading

        import jax.numpy as jnp

        def one(b, cap_len):
            bx = np.full((b, ROW_W), -1, np.int32)
            np.asarray(
                self._device_pass(
                    jnp.asarray(bx), jnp.asarray(bx), cap_len + 2
                )
            )

        for cap_len in LW_CLASSES:
            for b in buckets:
                one(b, cap_len)

        if background_big and not self.big_ready:
            def load_big():
                try:
                    for cap_len in LW_CLASSES:
                        one(BIG_BUCKET, cap_len)
                    self.big_ready = True
                except Exception:
                    pass

            t = threading.Thread(target=load_big, daemon=True)
            t.start()
            self._big_thread = t

    def warm_all(self):
        """Blocking warm of both bucket sets (benchmarks)."""
        import jax.numpy as jnp

        self.warm(background_big=False)
        for cap_len in LW_CLASSES:
            bx = np.full((BIG_BUCKET, ROW_W), -1, np.int32)
            np.asarray(
                self._device_pass(jnp.asarray(bx), jnp.asarray(bx),
                                  cap_len + 2)
            )
        self.big_ready = True
