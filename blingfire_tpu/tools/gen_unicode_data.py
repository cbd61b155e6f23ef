"""Generate the Unicode case-folding / diacritics-normalization data file.

The framework's case folding (``runtime/casefold.py``) is built from Python's
``unicodedata`` (simple, 1:1 case mappings), but the reference engines
(``FAUtf32Utils.cpp:45-76``, reference ``FALexTools_t.h:263``) bake in tables
from an older Unicode version plus two deliberate fast-path quirks
(0xC0-0xDE => +0x20 maps MULTIPLICATION SIGN x->/ and 0xE0-0xFE => -0x20 maps
DIVISION SIGN back).  For bit-exact ``ignore-case`` behavior we record where
the reference's mapping *deviates* from our unicodedata-derived base and ship
only that delta (``blingfire_tpu/data/unicode_compat.npz``).

The diacritics normalization maps (reference
``FANormalizeDiacriticsMap{Preserve,Prod,Remove}.cxx``, interpreted by
``FAStrUtf8Normalize``, ``FAUtf8Utils.cpp:580-676``) have no unicodedata
analog: the API is *defined by* its mapping table.  We record the behavioral
map (cp -> up to 2 output cps, nontrivial entries only) by probing the
reference shared library per codepoint.

This script is a one-time offline generator; the framework never loads the
reference library.  Run:  python -m blingfire_tpu.tools.gen_unicode_data
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from blingfire_tpu.runtime.casefold import (
    CASE_MAX,
    _base_tolower,
    _base_toupper,
)

REF_SO = "/root/reference/dist-pypi/blingfire/libblingfiretokdll.so"
OUT = os.path.join(os.path.dirname(__file__), "..", "data", "unicode_compat.npz")

# mangled C++ symbols (int -> int / bool)
SYM_TOLOWER = "_ZN9BlingFire14FAUtf32ToLowerEi"
SYM_TOUPPER = "_ZN9BlingFire14FAUtf32ToUpperEi"
SYM_NORMALIZE = "_ZN9BlingFire18FAStrUtf8NormalizeEPKciPcii"


def _probe_case(lib, sym: str) -> np.ndarray:
    fn = getattr(lib, sym)
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_int]
    out = np.arange(CASE_MAX, dtype=np.int32)
    for cp in range(CASE_MAX):
        out[cp] = fn(cp)
    return out


def _probe_normalize(lib, algo: int) -> dict[int, tuple[int, ...]]:
    fn = getattr(lib, SYM_NORMALIZE)
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
    ]
    buf = ctypes.create_string_buffer(32)
    mapping: dict[int, tuple[int, ...]] = {}
    # the map covers cp < 0xFFFF only (FAUtf8Utils.cpp:637)
    for cp in range(0xFFFF):
        if 0xD800 <= cp <= 0xDFFF:  # unencodable surrogates
            continue
        s = chr(cp).encode("utf-8")
        n = fn(s, len(s), buf, 32, algo)
        if n < 0:
            continue
        got = tuple(ord(c) for c in buf.raw[:n].decode("utf-8"))
        if got != (cp,):
            mapping[cp] = got
    return mapping


def _delta(base: np.ndarray, ref: np.ndarray):
    idx = np.nonzero(base != ref)[0].astype(np.int32)
    return idx, ref[idx]


def main() -> None:
    lib = ctypes.cdll.LoadLibrary(REF_SO)

    arrays: dict[str, np.ndarray] = {}

    for name, base_fn, sym in (
        ("lower", _base_tolower, SYM_TOLOWER),
        ("upper", _base_toupper, SYM_TOUPPER),
    ):
        base = base_fn()
        ref = _probe_case(lib, sym)
        cps, outs = _delta(base, ref)
        arrays[f"{name}_delta_cp"] = cps
        arrays[f"{name}_delta_out"] = outs
        print(f"to{name}: {len(cps)} deviations from unicodedata base")

    for name, algo in (("preserve", 1), ("prod", 0), ("remove", 2)):
        m = _probe_normalize(lib, algo)
        cps = np.array(sorted(m), dtype=np.int32)
        out1 = np.array([m[c][0] if len(m[c]) > 0 else -1 for c in cps], np.int32)
        out2 = np.array([m[c][1] if len(m[c]) > 1 else -1 for c in cps], np.int32)
        arrays[f"diac_{name}_cp"] = cps
        arrays[f"diac_{name}_out1"] = out1
        arrays[f"diac_{name}_out2"] = out2
        print(f"diacritics[{name}]: {len(cps)} nontrivial entries")

    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    np.savez_compressed(os.path.abspath(OUT), **arrays)
    print(f"wrote {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
