"""Unique-word-unit deduplication for the [pos-dict] device path.

Natural text is Zipfian: a 1 MB batch holds ~180k word instances but only
~15k distinct words.  Since no shipped vocabulary has a piece with an
INTERNAL ▁ (SpTokenizer._chunk_safe — the same property that licenses
long-document chunking), both the BPE greedy resolution and the unigram
Viterbi factorize exactly at every ▁: a document's ids are the
concatenation of its word-units' ids.  So the device only needs to
tokenize each DISTINCT unit once.

The unique units are REPACKED back-to-back into dense rows of the same
width as the document path (N = tok.n_doc):

    doc rows:   (B, 128)  symbols walked       ~2.1 M lanes, mostly pad
    packed rows:(R, 128)  every lane a unique-unit symbol   ~0.05 M lanes

a ~40x lane reduction per input byte — decisive on TPU, where per-lane
table gathers are the bottleneck (measured ~9 ns/lane regardless of table
size: the gather lowering, not HBM bandwidth, is the limit).  Dense rows
also keep the kernel's (K1, B, N) slot arrays at N=128, avoiding the
8x minor-dimension padding a narrow per-unit layout would pay.

Packing safety: a row boundary inside a ▁-run is never needed — units are
whole.  A unit may follow another in a row only if it STARTS with ▁ (the
join point is then a chunk-safe split: any piece crossing it would carry
an internal ▁).  Units without a leading ▁ (document-initial words) are
placed at row offset 0 only.  Unknown runs cannot leak across a join
either: chunk-safety guarantees the single piece "▁" is accepted, so a
▁-initial unit never starts unmatched.  Units longer than UNIT_MAX route
their whole document through the classic doc-row path.

A "unit" is a maximal `▁-run + non-▁-run` block (reference semantics: the
whole-string resolution of FATokenSegmentationTools_1best_bpe_t.h:238-296
equals per-unit resolution under _chunk_safe).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..ops import bpe as bpe_ops

UNIT_MAX = 64  # longest unit the NUMPY dedup path handles (p99.9 of real text)
PACK_ROWS = 512  # rows per dispatch (fixed shape -> one compile per kernel)

# Native fast path: packed rows are dispatched in fixed-size chunks.
# PROGRESSIVE buckets (round 5): every distinct (rows, lw) shape is a
# separate compiled executable, and loading one onto the tunneled device
# costs ~3-5 s REGARDLESS of a warm persistent compile cache — twelve
# eagerly-loaded shapes made every process pay ~60 s of warmup.  warm()
# loads the three 512-row programs eagerly (~8 s, usable immediately) and
# the three 2048-row programs from a BACKGROUND thread; once those are
# live, large regions dispatch at 2048 rows, which amortizes the ~0.8 ms
# fixed cost of every gather op 4x (the dominant device cost at 512x128
# operands — the per-element 8.3 ns is secondary at this size).
ROW_BUCKETS = (512,)
BIG_BUCKET = 2048
GROUP_CHUNKS = 4  # 512-chunks device-concatenated per d2h transfer; a
# 2048-chunk is its own transfer (same (2048, N+2) shape either way)
ID_SHIFT = 21  # compact lane layout: (id + 1) | (start << ID_SHIFT)
LW_CLASSES = (8, 16)  # packed-row region walk depths (= prep.cpp BTL_LW1/BTL_LW2)
SHORT_LW = 16  # backwards-compat alias for the widest short class


@dataclass
class UnitBatch:
    """Host-side decomposition of a prepped (x, spm, lengths) batch."""

    # per unique unit (deduped), padded to UNIT_MAX
    u_x: np.ndarray  # (U, UNIT_MAX) int32
    u_len: np.ndarray  # (U,) int32
    u_spm0: np.ndarray  # (U,) bool — unit starts with ▁ (may share a row)
    # per unit instance (doc-major order)
    inst_unit: np.ndarray  # (I,) int32 -> unique unit index
    inst_doc: np.ndarray  # (I,) int32 -> batch row
    # docs that cannot take the unit path (contain a unit > UNIT_MAX)
    classic: np.ndarray  # (B,) bool


def split_units(x: np.ndarray, spm: np.ndarray, lengths: np.ndarray) -> UnitBatch:
    """Vectorized unit decomposition + dedup of a prepped batch."""
    B, N = x.shape
    pos = np.arange(N)
    valid = pos[None, :] < lengths[:, None]
    prev_spm = np.pad(spm[:, :-1], ((0, 0), (1, 0)), constant_values=False)
    start = valid & ((pos[None, :] == 0) | (spm & ~prev_spm))

    sb, sp = np.nonzero(start)  # instance -> (doc, start pos), row-major
    classic = np.zeros(B, bool)
    if len(sb) == 0:
        z = np.zeros(0, np.int32)
        return UnitBatch(
            np.zeros((0, UNIT_MAX), np.int32), z, np.zeros(0, bool), z, z, classic
        )
    # unit length: distance to the next start in the same doc, else doc end
    next_sp = np.empty_like(sp)
    next_sp[:-1] = np.where(sb[:-1] == sb[1:], sp[1:], lengths[sb[:-1]])
    next_sp[-1] = lengths[sb[-1]]
    ulen = next_sp - sp

    classic[sb[ulen > UNIT_MAX]] = True
    keep = ~classic[sb]
    sb, sp, ulen = sb[keep], sp[keep], ulen[keep]

    # gather instance symbol rows (I, UNIT_MAX)
    xp = np.pad(x, ((0, 0), (0, UNIT_MAX)), constant_values=-1)
    cols = sp[:, None] + np.arange(UNIT_MAX)[None, :]
    inside = np.arange(UNIT_MAX)[None, :] < ulen[:, None]
    i_x = np.where(inside, xp[sb[:, None], cols], -1).astype(np.int32)
    i_spm0 = spm[sb, sp]

    u_idx, inv = _dedup_rows(i_x, ulen)
    return UnitBatch(
        u_x=i_x[u_idx],
        u_len=ulen[u_idx].astype(np.int32),
        u_spm0=i_spm0[u_idx],
        inst_unit=inv.astype(np.int32).reshape(-1),
        inst_doc=sb.astype(np.int32),
        classic=classic,
    )


def _dedup_rows(i_x: np.ndarray, ulen: np.ndarray):
    """Exact row dedup via hash-sort: ~20x faster than np.unique(axis=0),
    whose void-dtype sort on 260-byte keys cost ~400 ms per 4k-doc batch.

    Returns (u_idx — first instance of each unique row, inv — instance ->
    unique index).  Exact: equal hashes are confirmed by comparing the
    actual rows of adjacent sorted instances."""
    I = len(ulen)
    # vectorized polynomial hash over (symbols, length)
    h = ulen.astype(np.uint64)
    mult = np.uint64(0x9E3779B97F4A7C15)
    for j in range(i_x.shape[1]):
        h = h * mult + (i_x[:, j].astype(np.uint64) + np.uint64(1))
    order = np.argsort(h, kind="stable")
    hs = h[order]
    xs = i_x[order]
    ls = ulen[order]
    diff = np.ones(I, bool)
    if I > 1:
        same_h = hs[1:] == hs[:-1]
        # only hash-equal neighbours need the exact row compare
        same_row = same_h & (ls[1:] == ls[:-1]) & (xs[1:] == xs[:-1]).all(axis=1)
        diff[1:] = ~same_row
    group = np.cumsum(diff) - 1  # sorted-instance -> unique index
    inv = np.empty(I, np.int64)
    inv[order] = group
    u_idx = order[diff]
    return u_idx, inv


def pack_units(ub: UnitBatch, N: int):
    """Greedy dense packing of unique units into N-wide rows.

    Returns (px (R, N) int32, plen (R,), u_row (U,), u_off (U,)).
    Non-▁-initial units are placed at row offset 0 only (see module doc)."""
    U = len(ub.u_len)
    u_row = np.zeros(U, np.int32)
    u_off = np.zeros(U, np.int32)
    # order: non-▁ units first (each opens a row), then ▁ units fill on
    order = np.concatenate(
        [np.flatnonzero(~ub.u_spm0), np.flatnonzero(ub.u_spm0)]
    )
    n_open = int((~ub.u_spm0).sum())
    row = -1
    cur = N + 1
    for j, u in enumerate(order):
        ln = int(ub.u_len[u])
        if j < n_open or cur + ln > N:
            row += 1
            cur = 0
        u_row[u] = row
        u_off[u] = cur
        cur += ln
    R = row + 1
    px = np.full((R, N), -1, np.int32)
    plen = np.zeros(R, np.int32)
    np.maximum.at(plen, u_row, u_off + ub.u_len)
    # scatter unit symbols: row-major flat targets
    inside = np.arange(UNIT_MAX)[None, :] < ub.u_len[:, None]
    flat_dst = (
        u_row[:, None].astype(np.int64) * N
        + u_off[:, None]
        + np.arange(UNIT_MAX)[None, :]
    )
    px.reshape(-1)[flat_dst[inside]] = ub.u_x[inside]
    return px, plen, u_row, u_off


# Tiny device helpers so each dispatch costs exactly one h2d (x) and one
# d2h (packed result) — the tunnel charges ~25-45 ms latency per transfer.
# (Deliberately NOT fused with the walk/resolve programs: see bpe_segment's
# docstring on XLA layout pessimization.)


@functools.cache
def _helpers():
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("spm_iw",))
    def derive_spm(x, spm_iw: int):
        # prep maps the raw ▁ symbol to a single iw: is_spm ≡ x == spm_iw
        return x == jnp.int32(spm_iw)

    @jax.jit
    def pack_out(ids, starts, counts, fb):
        return jnp.concatenate(
            [ids, starts, counts[:, None], fb.astype(jnp.int32)[:, None]],
            axis=1,
        )

    @jax.jit
    def pack_out_compact(ids, starts, counts, fb):
        # one int32 per token lane: (id + 1) | (start << ID_SHIFT); trailing
        # columns carry the per-row token count and device-fallback flag.
        # Halves the d2h bytes vs separate id/start planes — the tunnel
        # charges ~25-50 ms per transfer, so bytes AND transfer count matter.
        lane = (ids + 1) | (starts << ID_SHIFT)
        return jnp.concatenate(
            [lane, counts[:, None], fb.astype(jnp.int32)[:, None]], axis=1
        )

    return derive_spm, pack_out, pack_out_compact


def _row_chunks(n_rows: int) -> list[int]:
    """Split n_rows into bucketed chunk sizes.

    Greedy: emit the largest bucket that fits while more than the smallest
    bucket remains, then one rounding bucket for the tail.  Padding rows
    cost real walk gathers (~9 ns/lane/step), so tight decomposition beats
    one big rounded-up dispatch: 1490 rows -> [1024, 512] (3% waste), not
    [2048] (27%)."""
    out = []
    left = max(n_rows, 1)
    while left > 0:
        ge = [b for b in ROW_BUCKETS if b >= left]
        le = [b for b in ROW_BUCKETS if b <= left]
        if ge and (ge[0] - left) <= ROW_BUCKETS[0]:
            out.append(ge[0])  # rounding waste no worse than a min bucket
            break
        if le:
            out.append(le[-1])
            left -= le[-1]
        else:
            out.append(ROW_BUCKETS[0])
            break
    return out


class UnitRunner:
    """Dispatches densely-packed unique units through the BPE/unigram device
    kernels and stitches per-document id sequences.

    dispatch() is async (returns device handles); collect() reads them, so
    a caller can pipeline host prep of batch k+1 with device compute of
    batch k exactly like the classic path."""

    def __init__(self, tok):
        from ..formats.consts import SP_DELIMITER

        self.tok = tok  # SpTokenizer
        self.big_ready = False  # 2048-row programs live (progressive warm)
        m = tok._sym2iw
        self.spm_iw = int(m[SP_DELIMITER]) if SP_DELIMITER < len(m) else -2
        # compact-lane packing requires every emitted id + 1 to fit below
        # 1 << ID_SHIFT and starts to fit in the remaining bits
        n_ids = int(tok.tables.ids_tab.shape[0])
        self.compact_ok = (
            tok.n_doc <= (1 << (31 - ID_SHIFT))
            and n_ids + abs(tok.seg.id_offset) + 2 < (1 << ID_SHIFT)
        )

    def _kernel(self, xd, ld, unk_id, lw: int | None = None,
                bounded: bool = False):
        """One fixed-shape device pass over packed unit rows."""
        import jax.numpy as jnp

        derive_spm, _po, _poc = _helpers()
        tok = self.tok
        if tok.is_bpe:
            ids, st, _en, counts, fb = bpe_ops.bpe_segment(
                tok.tables, xd, derive_spm(xd, self.spm_iw), ld,
                jnp.int32(unk_id), tok.a_max, lw=lw, bounded=bounded,
            )
        else:
            from ..ops import unigram as uni_ops

            # bounded unit rows cap the walk AND the DP ring at the unit
            # length class — exact for the same chunk-safety reason as BPE
            ids, st, _en, counts = uni_ops.unigram_segment(
                tok.tables, xd, ld, jnp.int32(unk_id),
                lw=lw if bounded else None,
            )
            fb = jnp.zeros(xd.shape[0], bool)
        return ids, st, counts, fb

    def warm(self, buckets=ROW_BUCKETS, unk_id: int = 0,
             background_big: bool = True):
        """Compile (or load from the persistent cache) every 512-row shape
        the fast path can dispatch, so no compile lands inside a timed
        region; then load the 2048-row programs from a BACKGROUND thread —
        dispatch_docs switches large regions to the big bucket the moment
        they are live (progressive warmup: a process is productive after
        the small set, ~8 s, and reaches peak throughput ~15 s later
        without ever blocking on the large executables)."""
        import concurrent.futures
        import threading

        import jax.numpy as jnp

        _ds, _po, pack_out_compact = _helpers()
        N = self.tok.n_doc
        variants = [(b, lw, True) for lw in LW_CLASSES for b in buckets]
        variants += [(b, LW_CLASSES[1], False) for b in buckets]

        def one(v):
            b, lw, bounded = v
            bx = np.full((b, N), -1, np.int32)
            bl = np.zeros(b, np.int32)
            ids, st, counts, fb = self._kernel(
                jnp.asarray(bx), jnp.asarray(bl), unk_id, lw=lw, bounded=bounded
            )
            np.asarray(pack_out_compact(ids, st, counts, fb))

        # first variant alone: it also pays one-time costs (table upload /
        # densify, helper compiles) that must not be raced
        one(variants[0])
        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(one, variants[1:]))

        if background_big and not self.big_ready:
            big = [(BIG_BUCKET, lw, True) for lw in LW_CLASSES]
            big += [(BIG_BUCKET, LW_CLASSES[1], False)]

            def load_big():
                try:
                    for v in big:
                        one(v)
                    self.big_ready = True
                except Exception:
                    pass  # big bucket stays off; 512 path is complete

            t = threading.Thread(target=load_big, daemon=True)
            t.start()
            self._big_thread = t

    def warm_all(self, unk_id: int = 0):
        """Blocking warm of BOTH bucket sets (benchmarks; production uses
        the progressive warm())."""
        self.warm(unk_id=unk_id, background_big=False)
        import jax.numpy as jnp

        _ds, _po, pack_out_compact = _helpers()
        N = self.tok.n_doc
        for v in ([(BIG_BUCKET, lw, True) for lw in LW_CLASSES]
                  + [(BIG_BUCKET, LW_CLASSES[1], False)]):
            b, lw, bounded = v
            bx = np.full((b, N), -1, np.int32)
            bl = np.zeros(b, np.int32)
            ids, st, counts, fb = self._kernel(
                jnp.asarray(bx), jnp.asarray(bl), unk_id, lw=lw, bounded=bounded
            )
            np.asarray(pack_out_compact(ids, st, counts, fb))
        self.big_ready = True

    # ---------------------------------------------------------------- native
    # Production path: prep + unit split + dedup + packing in one C++ call
    # (native/prep.cpp::btl_units_analyze), bucketed fixed-shape dispatches,
    # ONE compact d2h per chunk started asynchronously at dispatch time, and
    # a single C++ stitch that writes flat per-doc ids.

    def dispatch_docs(self, docs_b: list[bytes], unk_id: int, cache=None):
        import jax.numpy as jnp

        from .. import native

        _ds, _po, pack_out_compact = _helpers()
        tok = self.tok
        N = tok.n_doc
        assert self.compact_ok and unk_id < (1 << 20)
        nu = native.units_analyze(
            docs_b, N, tok._sym2iw, self.spm_iw,
            tok.seg.use_raw_bytes, tok.seg.no_dummy_prefix, tok.seg.charmap,
            cache=cache,
        )
        # length-class regions hold only SPM-initial units no longer than
        # their class depth: the short unrolled walks are exact there
        # (bounded by the unit length).  Region B (non-SPM-initial + long
        # units, ~5% of rows) walks the SAME depth-16 class UNBOUNDED: a
        # live state at the cap flags the row for fallback (exact), and the
        # region shares the LR-16 resolve executable instead of loading the
        # large LR-32 program — the single biggest warm cost (round 5).
        parts = [
            (0, nu.split_rows1, LW_CLASSES[0], True),
            (nu.split_rows1, nu.split_rows, LW_CLASSES[1], True),
            (nu.split_rows, nu.n_rows, LW_CLASSES[1], False),
        ]
        # chunk descriptors in packed-row order: (out_handle, n_valid, rows)
        chunks: list[tuple] = []
        use_big = self.big_ready
        for plo, phi, lw, bounded in parts:
            if phi <= plo:
                continue
            lo = plo
            while lo < phi:
                left = phi - lo
                if use_big and left >= BIG_BUCKET:
                    b = BIG_BUCKET
                else:
                    b = _row_chunks(left)[0]
                n = min(b, left)
                bx = np.full((b, N), -1, np.int32)
                blen = np.zeros(b, np.int32)
                bx[:n] = nu.px[lo : lo + n]
                blen[:n] = nu.plen[lo : lo + n]
                ids, st, counts, fb = self._kernel(
                    jnp.asarray(bx), jnp.asarray(blen), unk_id,
                    lw=lw, bounded=bounded,
                )
                chunks.append((pack_out_compact(ids, st, counts, fb), n, b))
                lo += n
        # Few d2h transfers per batch: 512-row chunk outputs are
        # device-concatenated in FIXED-SHAPE groups of GROUP_CHUNKS (a
        # varying group shape would compile a fresh concat per batch);
        # a 2048-row chunk is its own same-shape transfer.  The stitch maps
        # packed rows to transfer rows via row_map (padding rows skipped).
        pending = []
        row_map_parts = []
        dev = 0  # rows already assigned in the concatenated transfer order
        i = 0
        while i < len(chunks):
            h, n, b = chunks[i]
            if b == BIG_BUCKET:
                row_map_parts.append(dev + np.arange(n, dtype=np.int32))
                dev += b
                i += 1
            else:
                grp = []
                while (i < len(chunks) and chunks[i][2] != BIG_BUCKET
                       and len(grp) < GROUP_CHUNKS):
                    hh, nn, bb = chunks[i]
                    grp.append(hh)
                    row_map_parts.append(dev + np.arange(nn, dtype=np.int32))
                    dev += bb
                    i += 1
                pad = GROUP_CHUNKS - len(grp)
                dev += pad * PACK_ROWS
                while len(grp) < GROUP_CHUNKS:
                    grp.append(grp[0])  # same-shape dummy
                h = jnp.concatenate(grp, axis=0)
            try:
                h.copy_to_host_async()
            except Exception:
                pass  # backends without async d2h: the read below blocks
            pending.append(h)
        row_map = (
            np.concatenate(row_map_parts) if row_map_parts
            else np.zeros(0, np.int32)
        )
        return nu, pending, row_map

    def collect_docs(self, state):
        """Returns (flat ids int32, bounds int64 (B+1,), need_fb bool (B,),
        status uint8 (B,) — 0 ok / 1 invalid / 2 overflow)."""
        nu, pending, row_map = state
        if nu.n_rows == 0 or not pending:
            rows = np.zeros((0, nu.n_sym + 2), np.int32)
            ids, bounds, need = nu.stitch(rows, ID_SHIFT)
            return ids, bounds, need, nu.status
        rows = (
            np.asarray(pending[0]) if len(pending) == 1
            else np.concatenate([np.asarray(h) for h in pending], axis=0)
        )
        ids, bounds, need = nu.stitch(
            np.ascontiguousarray(rows), ID_SHIFT, row_map=row_map
        )
        return ids, bounds, need, nu.status

    def encode_docs(self, docs_b: list[bytes], unk_id: int):
        return self.collect_docs(self.dispatch_docs(docs_b, unk_id))

    # ----------------------------------------------------------------- numpy
    # Portable fallback (no C++ toolchain): the original x/spm/lengths-based
    # decomposition with host-side stitching.

    def dispatch(self, x, spm, lengths, unk_id: int):
        import jax.numpy as jnp

        derive_spm, pack_out, _poc = _helpers()
        tok = self.tok
        N = tok.n_doc
        ub = split_units(np.asarray(x), np.asarray(spm), np.asarray(lengths))
        px, plen, u_row, u_off = pack_units(ub, N)
        pending = []  # (row offset, packed device handle)
        for lo in range(0, len(px), PACK_ROWS):
            bx = np.full((PACK_ROWS, N), -1, np.int32)
            blen = np.zeros(PACK_ROWS, np.int32)
            n = min(PACK_ROWS, len(px) - lo)
            bx[:n] = px[lo : lo + n]
            blen[:n] = plen[lo : lo + n]
            xd = jnp.asarray(bx)
            ld = jnp.asarray(blen)
            if tok.is_bpe:
                ids, st, _en, counts, fb = bpe_ops.bpe_segment(
                    tok.tables, xd, derive_spm(xd, self.spm_iw), ld,
                    jnp.int32(unk_id), tok.a_max,
                )
            else:
                from ..ops import unigram as uni_ops

                ids, st, _en, counts = uni_ops.unigram_segment(
                    tok.tables, xd, ld, jnp.int32(unk_id)
                )
                fb = jnp.zeros(PACK_ROWS, bool)
            pending.append((lo, pack_out(ids, st, counts, fb)))
        return ub, (u_row, u_off), pending

    def collect(self, state):
        """Returns (out_ids: list[list[int] | None], need_classic (B,) bool).
        None entries are docs that must take the classic/fallback path."""
        ub, (u_row, u_off), pending = state
        tok = self.tok
        N = tok.n_doc
        U = len(ub.u_len)
        B = len(ub.classic)
        R = (u_row.max() + 1) if U else 0

        row_ids = np.zeros((R, N), np.int32)
        row_starts = np.zeros((R, N), np.int32)
        row_counts = np.zeros(R, np.int32)
        row_fb = np.zeros(R, bool)
        for lo, h in pending:
            packed = np.asarray(h)  # (PACK_ROWS, 2N+2): ids | starts | counts | fb
            n = min(PACK_ROWS, R - lo)
            row_ids[lo : lo + n] = packed[:n, :N]
            row_starts[lo : lo + n] = packed[:n, N : 2 * N]
            row_counts[lo : lo + n] = packed[:n, 2 * N]
            row_fb[lo : lo + n] = packed[:n, 2 * N + 1] != 0

        out: list = [None] * B
        need = ub.classic.copy()
        if U == 0:
            for i in range(B):
                if not need[i]:
                    out[i] = []
            return out, need

        # token -> unit assignment: tokens are position-ordered within each
        # row, so global keys (row*N + start) are sorted row-major; each
        # unit's token span is a binary search over them
        tmask = np.arange(N)[None, :] < row_counts[:, None]
        t_ids = np.concatenate([row_ids[tmask], np.zeros(1, np.int32)])  # +sentinel
        t_keys = (
            np.repeat(np.arange(R, dtype=np.int64) * N, row_counts) + row_starts[tmask]
        )
        u_lo = u_row.astype(np.int64) * N + u_off
        t0 = np.searchsorted(t_keys, u_lo)
        t1 = np.searchsorted(t_keys, u_lo + ub.u_len)
        counts = (t1 - t0).astype(np.int32)
        fb = row_fb[u_row]

        # docs with any flagged unit go classic
        need[ub.inst_doc[fb[ub.inst_unit]]] = True

        ok = ~need[ub.inst_doc]
        inst_u = ub.inst_unit[ok]
        inst_d = ub.inst_doc[ok]
        inst_counts = counts[inst_u]
        # per-instance id rows gathered from the flat token array (C-speed)
        gcols = t0[inst_u, None] + np.arange(UNIT_MAX)[None, :]
        gmask = np.arange(UNIT_MAX)[None, :] < inst_counts[:, None]
        flat = t_ids[np.minimum(gcols, len(t_ids) - 1)][gmask]
        # instances are doc-major (np.nonzero row-major), so per-doc spans
        # are contiguous: split at doc boundaries
        doc_tok = np.zeros(B + 1, np.int64)
        np.add.at(doc_tok, inst_d + 1, inst_counts)
        bounds = np.cumsum(doc_tok)
        for i in range(B):
            if not need[i]:
                out[i] = flat[bounds[i] : bounds[i + 1]].tolist()
        return out, need

    def encode(self, x, spm, lengths, unk_id: int):
        """Synchronous dispatch+collect."""
        return self.collect(self.dispatch(x, spm, lengths, unk_id))
