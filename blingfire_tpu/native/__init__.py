"""ctypes bindings for the native host runtime (libbtl_host.so).

Builds on first import if the shared library is missing; falls back to the
NumPy implementation when no compiler is available."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libbtl_host.so")
_lib = None


def _ensure_built() -> bool:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(
        os.path.join(_DIR, "prep.cpp")
    ):
        return True
    try:
        subprocess.run(
            ["make", "-s", "-C", _DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib():
    global _lib
    if _lib is None and _ensure_built():
        lib = ctypes.cdll.LoadLibrary(_SO)
        lib.btl_prep_sp_batch.restype = ctypes.c_int
        lib.btl_version.restype = ctypes.c_int
        lib.btl_units_analyze_c.restype = ctypes.c_void_p
        lib.btl_units_analyze_c.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.btl_ucache_new.restype = ctypes.c_void_p
        lib.btl_ucache_new.argtypes = []
        lib.btl_ucache_free.restype = None
        lib.btl_ucache_free.argtypes = [ctypes.c_void_p]
        lib.btl_ucache_stats.restype = None
        lib.btl_ucache_stats.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.btl_units_emit.restype = None
        lib.btl_units_emit.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_void_p, ctypes.c_void_p]
        lib.btl_units_stitch_m.restype = ctypes.c_int64
        lib.btl_units_stitch_m.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.btl_units_free.restype = None
        lib.btl_units_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def prep_sp_batch(
    docs: list[bytes],
    n_sym: int,
    sym2iw: np.ndarray,
    use_raw_bytes: bool,
    no_dummy_prefix: bool,
    charmap=None,  # loader.CharMap or None
    want_offsets: bool = False,
):
    """Native equivalent of runtime.host prep over a whole batch.

    Returns (x_iw, is_spm, lengths, sym_off|None, status) where status is
    0 ok / 1 invalid-input / 2 overflow per document."""
    lib = get_lib()
    assert lib is not None
    B = len(docs)
    blob = b"".join(docs)
    doc_off = np.zeros(B + 1, np.int64)
    np.cumsum([len(d) for d in docs], out=doc_off[1:])
    x = np.empty((B, n_sym), np.int32)
    spm = np.empty((B, n_sym), np.uint8)
    lengths = np.empty(B, np.int32)
    status = np.empty(B, np.uint8)
    sym_off = np.empty((B, n_sym), np.int32) if want_offsets else None

    sym2iw = np.ascontiguousarray(sym2iw, np.int32)
    if charmap is not None:
        cm_counts = np.ascontiguousarray(charmap.counts, np.int32)
        cm_values = np.ascontiguousarray(charmap.values, np.int32)
        cm_width = charmap.values.shape[1]
        cm_min, cm_max = charmap.min_key, charmap.max_key
        cc = cm_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        cv = cm_values.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    else:
        cc = None
        cv = None
        cm_width = cm_min = cm_max = 0

    i32p = ctypes.POINTER(ctypes.c_int32)
    rc = lib.btl_prep_sp_batch(
        ctypes.c_char_p(blob),
        doc_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int(B),
        ctypes.c_int(1 if use_raw_bytes else 0),
        ctypes.c_int(1 if no_dummy_prefix else 0),
        cc,
        cv,
        ctypes.c_int(cm_width),
        ctypes.c_int(cm_min),
        ctypes.c_int(cm_max),
        sym2iw.ctypes.data_as(i32p),
        ctypes.c_int64(len(sym2iw)),
        ctypes.c_int(n_sym),
        x.ctypes.data_as(i32p),
        spm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lengths.ctypes.data_as(i32p),
        sym_off.ctypes.data_as(i32p) if sym_off is not None else None,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    assert rc == 0
    return x, spm.astype(bool), lengths, sym_off, status


class NativeUnits:
    """One batch's unique-unit decomposition held in native state.

    Produced by :func:`units_analyze`; ``px``/``plen``/``status`` are the
    device inputs, :meth:`stitch` consumes the device's packed output rows
    and returns (flat_ids, bounds, need_fb).  The native state is freed by
    stitch (or by GC)."""

    def __init__(self, handle, n_docs: int, n_sym: int, counts):
        self._handle = handle
        self.n_docs = n_docs
        self.n_sym = n_sym
        self.n_units = int(counts[0])
        self.n_instances = int(counts[1])
        self.n_rows = int(counts[2])
        self.total_syms = int(counts[3])
        # rows [0, split_rows1) hold only SPM-initial units <= 8 symbols,
        # rows [split_rows1, split_rows) units of 9..16 symbols (prep.cpp
        # BTL_LW1/BTL_LW2); the device walks each region at its class depth
        self.split_rows = int(counts[4])
        self.split_rows1 = int(counts[5])
        # units packed into THIS batch's rows (== n_units without a shared
        # cache; the cross-batch cache-miss count with one)
        self.n_local = int(counts[6]) if len(counts) > 6 else self.n_units
        lib = get_lib()
        self.px = np.empty((max(self.n_rows, 1), n_sym), np.int32)
        self.plen = np.zeros(max(self.n_rows, 1), np.int32)
        self.status = np.empty(n_docs, np.uint8)
        lib.btl_units_emit(
            handle,
            self.px.ctypes.data_as(ctypes.c_void_p),
            self.plen.ctypes.data_as(ctypes.c_void_p),
            self.status.ctypes.data_as(ctypes.c_void_p),
        )

    def stitch(self, rows: np.ndarray, shift: int,
               row_map: np.ndarray | None = None):
        """rows: (rows_n, n_sym+2) int32 packed device output.  row_map maps
        packed row r -> its row index in ``rows`` (None = identity).
        Returns (ids int32 (T,), bounds int64 (n_docs+1,), need_fb bool (n_docs,))."""
        assert self._handle is not None, "stitch called twice"
        assert rows.dtype == np.int32 and rows.shape[1] == self.n_sym + 2
        rows = np.ascontiguousarray(rows)
        if row_map is not None:
            row_map = np.ascontiguousarray(row_map, np.int32)
            assert len(row_map) >= self.n_rows
        lib = get_lib()
        cap = self.total_syms + 16
        out_ids = np.empty(cap, np.int32)
        bounds = np.empty(self.n_docs + 1, np.int64)
        need = np.empty(self.n_docs, np.uint8)
        t = lib.btl_units_stitch_m(
            self._handle,
            rows.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(rows.shape[0]),
            row_map.ctypes.data_as(ctypes.c_void_p)
            if row_map is not None else None,
            ctypes.c_int(shift),
            out_ids.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(cap),
            bounds.ctypes.data_as(ctypes.c_void_p),
            need.ctypes.data_as(ctypes.c_void_p),
        )
        self.close()
        assert t >= 0, "stitch capacity exceeded (total_syms bound violated)"
        return out_ids[:t], bounds, need.astype(bool)

    def close(self):
        if self._handle is not None:
            get_lib().btl_units_free(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class UnitCache:
    """Cross-batch unit->ids cache (prep.cpp::BtlUnitCache).

    Pass to :func:`units_analyze` to make the unique-unit dedup CUMULATIVE
    over a corpus: a batch only packs units never resolved before; the
    stitch stores fresh resolutions and reads recurring units straight from
    the cache.  Batches sharing a cache must be stitched in dispatch order
    (encode_corpus_flat's in-order pipeline guarantees this)."""

    def __init__(self):
        lib = get_lib()
        assert lib is not None
        self._handle = lib.btl_ucache_new()

    def stats(self) -> dict:
        s = np.zeros(4, np.int64)
        get_lib().btl_ucache_stats(self._handle,
                                   s.ctypes.data_as(ctypes.c_void_p))
        return {"units": int(s[0]), "resolved": int(s[1]),
                "arena_ids": int(s[2]), "bytes": int(s[3])}

    def close(self):
        if self._handle is not None:
            get_lib().btl_ucache_free(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def units_analyze(
    docs: list[bytes],
    n_sym: int,
    sym2iw: np.ndarray,
    spm_iw: int,
    use_raw_bytes: bool,
    no_dummy_prefix: bool,
    charmap=None,
    cache: UnitCache | None = None,
) -> NativeUnits:
    """Full native prep -> unit split -> dedup -> dense packing for a batch."""
    lib = get_lib()
    assert lib is not None
    B = len(docs)
    blob = b"".join(docs)
    doc_off = np.zeros(B + 1, np.int64)
    np.cumsum([len(d) for d in docs], out=doc_off[1:])
    sym2iw = np.ascontiguousarray(sym2iw, np.int32)
    if charmap is not None:
        cm_counts = np.ascontiguousarray(charmap.counts, np.int32)
        cm_values = np.ascontiguousarray(charmap.values, np.int32)
        cm_width = charmap.values.shape[1]
        cm_min, cm_max = charmap.min_key, charmap.max_key
        cc = cm_counts.ctypes.data_as(ctypes.c_void_p)
        cv = cm_values.ctypes.data_as(ctypes.c_void_p)
    else:
        cc = cv = None
        cm_width = cm_min = cm_max = 0
    counts = np.zeros(7, np.int64)
    handle = lib.btl_units_analyze_c(
        cache._handle if cache is not None else None,
        ctypes.c_char_p(blob),
        doc_off.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(B),
        ctypes.c_int(1 if use_raw_bytes else 0),
        ctypes.c_int(1 if no_dummy_prefix else 0),
        cc,
        cv,
        ctypes.c_int(cm_width),
        ctypes.c_int(cm_min),
        ctypes.c_int(cm_max),
        sym2iw.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(len(sym2iw)),
        ctypes.c_int(int(spm_iw)),
        ctypes.c_int(n_sym),
        counts.ctypes.data_as(ctypes.c_void_p),
    )
    assert handle, "btl_units_analyze failed"
    nu = NativeUnits(handle, B, n_sym, counts)
    nu._cache_ref = cache  # keep the cache alive while the state lives
    return nu


# -- full native host runtime (libbtf_runtime.so, reference-compatible C ABI) --

_RT_SO = os.path.join(_DIR, "libbtf_runtime.so")
_rt = None


def get_runtime():
    """ctypes handle to the native C-ABI runtime (TextToIds/Words/... family).

    Lazily builds from runtime.cpp, installs the full-Unicode casefold table,
    and returns the loaded library — or None when no compiler is available."""
    global _rt
    if _rt is not None:
        return _rt
    if not os.path.exists(_RT_SO) or os.path.getmtime(_RT_SO) < os.path.getmtime(
        os.path.join(_DIR, "runtime.cpp")
    ):
        try:
            subprocess.run(
                ["make", "-s", "-C", _DIR, "libbtf_runtime.so"],
                check=True,
                capture_output=True,
                timeout=180,
            )
        except Exception:
            return None
    lib = ctypes.cdll.LoadLibrary(_RT_SO)
    lib.LoadModel.restype = ctypes.c_void_p
    lib.LoadModel.argtypes = [ctypes.c_char_p]
    lib.SetModel.restype = ctypes.c_void_p
    from ..runtime.casefold import tolower_table

    table = np.ascontiguousarray(tolower_table(), dtype=np.int32)
    lib.SetCaseFoldTable(
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(table)
    )
    lib._casefold_table = table  # keep the buffer alive
    _rt = lib
    return _rt
