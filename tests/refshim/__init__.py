"""Build + bind the reference-engine parity shim (test-only oracle).

Compiles the ORIGINAL reference client library sources plus shim.cpp into a
shared library on first use (cached by mtime) and exposes typed ctypes
wrappers for the legacy engines.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_build", "librefshim.so")
_SRC = os.path.join(_DIR, "shim.cpp")
_REF = "/root/reference"

_lib_cache = None


_SRC_IO = os.path.join(_DIR, "shim_io.cpp")

# compile-library sources the IO shim needs (disjoint from the client
# library's own FAAllocator/FAException/FAMsg/FAUtils_cl, which are already
# linked in)
_COMPILE_SRCS = [
    "FAParseTree.cpp",
    "FAAutIOTools.cpp",
    "FAMapIOTools.cpp",
    "FARSDfa_wo_ro.cpp",
    "FARSNfa_wo_ro.cpp",
    "FAMealyDfa.cpp",
    "FAMealyNfa.cpp",
    "FAState2Ow.cpp",
    "FAState2Ows.cpp",
    "FAMultiMap_ar.cpp",
    "FAChain2Num_hash.cpp",
    "FAStringTokenizer.cpp",
    "FAUtils.cpp",
    "FAEncoder_pref.cpp",
    "FARSDfa_ro.cpp",
    "FAMultiMap_judy.cpp",
    "FAMap_std.cpp",
    "FANfaDelta_wo_ro.cpp",
    "FANfaDelta_ro.cpp",
]


def build() -> str:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    newest_src = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC_IO))
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < newest_src:
        import glob

        srcs = sorted(glob.glob(f"{_REF}/blingfireclient.library/src/*.cpp"))
        cmd = [
            "g++", "-shared", "-fPIC", "-O1", "-std=c++11",
            "-DNDEBUG", "-DBLING_FIRE_NOAP", "-DBLING_FIRE_NOWINDOWS",
            f"-I{_REF}/blingfireclient.library/inc",
            f"-I{_REF}/blingfirecompile.library/inc",
            _SRC,
            _SRC_IO,
            *srcs,
            *[f"{_REF}/blingfirecompile.library/src/{s}" for s in _COMPILE_SRCS],
            "-o", _SO,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def lib() -> ctypes.CDLL:
    global _lib_cache
    if _lib_cache is None:
        so = ctypes.cdll.LoadLibrary(build())
        c_ip = ctypes.POINTER(ctypes.c_int32)
        c_fp = ctypes.POINTER(ctypes.c_float)
        so.Shim_LoadMorph.restype = ctypes.c_void_p
        so.Shim_LoadMorph.argtypes = [ctypes.c_char_p]
        so.Shim_FreeMorph.argtypes = [ctypes.c_void_p]
        so.Shim_Wg.restype = ctypes.c_int
        so.Shim_Wg.argtypes = [ctypes.c_void_p, ctypes.c_int, c_ip,
                               ctypes.c_int, c_ip, ctypes.c_int]
        so.Shim_WgProb.restype = ctypes.c_int
        so.Shim_WgProb.argtypes = [ctypes.c_void_p, ctypes.c_int, c_ip,
                                   ctypes.c_int, c_ip, c_fp, ctypes.c_int]
        so.Shim_TagDictId.restype = ctypes.c_int
        so.Shim_TagDictId.argtypes = [ctypes.c_void_p, c_ip, ctypes.c_int]
        so.Shim_TagDictInfo.restype = ctypes.c_int
        so.Shim_TagDictInfo.argtypes = [ctypes.c_void_p, c_ip, ctypes.c_int,
                                        c_ip, ctypes.c_int]
        so.Shim_T2P.restype = ctypes.c_float
        so.Shim_T2P.argtypes = [ctypes.c_void_p, ctypes.c_int]
        so.Shim_Ts2P.restype = ctypes.c_float
        so.Shim_Ts2P.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        so.Shim_Hmm.restype = ctypes.c_int
        so.Shim_Hmm.argtypes = [ctypes.c_void_p, c_ip, c_ip, ctypes.c_int,
                                ctypes.c_int, c_ip, ctypes.c_int]
        so.Shim_LoadStemmer.restype = ctypes.c_void_p
        so.Shim_LoadStemmer.argtypes = [ctypes.c_char_p]
        so.Shim_FreeStemmer.argtypes = [ctypes.c_void_p]
        so.Shim_Stem.restype = ctypes.c_int
        so.Shim_Stem.argtypes = [ctypes.c_void_p, ctypes.c_int, c_ip,
                                 ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                 c_ip, ctypes.c_int]
        so.Shim_W2PInt.restype = ctypes.c_int
        so.Shim_W2PInt.argtypes = [ctypes.c_void_p, c_ip, ctypes.c_int]
        so.Shim_W2PProb.restype = ctypes.c_float
        so.Shim_W2PProb.argtypes = [ctypes.c_void_p, c_ip, ctypes.c_int]
        so.Shim_LoadWbd.restype = ctypes.c_void_p
        so.Shim_LoadWbd.argtypes = [ctypes.c_char_p]
        so.Shim_FreeWbd.argtypes = [ctypes.c_void_p]
        so.Shim_RegexpTags.restype = ctypes.c_int
        so.Shim_RegexpTags.argtypes = [ctypes.c_void_p, c_ip, ctypes.c_int,
                                       c_ip, c_ip, ctypes.c_int]
        so.Shim_LoadWre.restype = ctypes.c_void_p
        so.Shim_LoadWre.argtypes = [ctypes.c_char_p]
        so.Shim_FreeWre.argtypes = [ctypes.c_void_p]
        so.Shim_Wre.restype = ctypes.c_int
        so.Shim_Wre.argtypes = [ctypes.c_void_p, c_ip, c_ip, c_ip, c_ip,
                                ctypes.c_int, c_ip, ctypes.c_int, c_ip]
        so.Shim_Transform.restype = ctypes.c_int
        so.Shim_Transform.argtypes = [ctypes.c_int, ctypes.c_int,
                                      ctypes.c_char_p, c_ip, ctypes.c_int,
                                      c_ip, ctypes.c_int]
        so.Shim_AutTxtRoundTrip.restype = ctypes.c_int
        so.Shim_AutTxtRoundTrip.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
        ]
        so.Shim_MapTxtRoundTrip.restype = ctypes.c_int
        so.Shim_MapTxtRoundTrip.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
        ]
        _lib_cache = so
    return _lib_cache


AUT_KIND = {"rs-dfa": 1, "mealy-dfa": 2, "moore-dfa": 3, "moore-mdfa": 4,
            "rs-nfa": 5, "mealy-nfa": 6}
MAP_KIND = {"mmap": 1, "chain2num": 2, "arr": 3}


def aut_roundtrip(kind: str, text: str) -> str:
    """Feed textual FSM to the reference reader, return the reference
    printer's output (raises on parse failure)."""
    data = text.encode()
    buf = ctypes.create_string_buffer(max(4 * len(data) + 1024, 1 << 16))
    n = lib().Shim_AutTxtRoundTrip(AUT_KIND[kind], data, len(data), buf, len(buf))
    if n < 0:
        raise ValueError(f"reference FAAutIOTools rejected the text ({n})")
    return buf.raw[:n].decode()


def map_roundtrip(kind: str, text: str) -> str:
    data = text.encode()
    buf = ctypes.create_string_buffer(max(4 * len(data) + 1024, 1 << 16))
    n = lib().Shim_MapTxtRoundTrip(MAP_KIND[kind], data, len(data), buf, len(buf))
    if n < 0:
        raise ValueError(f"reference FAMapIOTools rejected the text ({n})")
    return buf.raw[:n].decode()


def _arr(seq) -> np.ndarray:
    return np.asarray(list(seq), np.int32)


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class RefMorph:
    """Reference FAMorphLDB-backed engines over a compiled .bin image."""

    def __init__(self, image: bytes):
        self._img = ctypes.create_string_buffer(image, len(image))
        self._h = lib().Shim_LoadMorph(self._img)
        assert self._h

    def wg(self, word, which=0, max_out=512):
        w = _arr(word)
        out = np.zeros(max_out, np.int32)
        n = lib().Shim_Wg(self._h, which, _ip(w), len(w), _ip(out), max_out)
        return None if n < 0 else out[:n].tolist()

    def wg_prob(self, word, which=2, max_out=512):
        w = _arr(word)
        tags = np.zeros(max_out, np.int32)
        probs = np.zeros(max_out, np.float32)
        n = lib().Shim_WgProb(
            self._h, which, _ip(w), len(w), _ip(tags),
            probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_out)
        if n < 0:
            return None
        return tags[:n].tolist(), probs[:n].copy()

    def tag_dict_id(self, word):
        w = _arr(word)
        return lib().Shim_TagDictId(self._h, _ip(w), len(w))

    def tag_dict_info(self, word, max_out=512):
        w = _arr(word)
        out = np.zeros(max_out, np.int32)
        n = lib().Shim_TagDictInfo(self._h, _ip(w), len(w), _ip(out), max_out)
        return None if n < 0 else out[:n].tolist()

    def t2p(self, tag) -> float:
        return lib().Shim_T2P(self._h, tag)

    def ts2p(self, t1, t2) -> float:
        return lib().Shim_Ts2P(self._h, t1, t2)

    def hmm(self, words, max_tags=64):
        flat = _arr([c for w in words for c in w])
        lens = _arr([len(w) for w in words])
        out = np.zeros(len(words) + 2, np.int32)
        n = lib().Shim_Hmm(self._h, _ip(flat), _ip(lens), len(words),
                           max_tags, _ip(out), len(out))
        return None if n < 0 else out[:n].tolist()

    def wre(self, words, tags, dcts=None, max_out=4096):
        # WRE parsing needs its own handle (Shim_LoadWre binds the parser
        # conf keeper; the morph handle does not)
        if not hasattr(self, "_wre_h"):
            self._wre_h = lib().Shim_LoadWre(self._img)
        flat = _arr([c for w in words for c in w])
        lens = _arr([len(w) for w in words])
        tg = _arr(tags)
        dc = _arr(dcts) if dcts is not None else None
        out = np.zeros(max_out, np.int32)
        out_len = np.zeros(1, np.int32)
        n = lib().Shim_Wre(self._wre_h, _ip(flat), _ip(lens), _ip(tg),
                           _ip(dc) if dc is not None else None, len(words),
                           _ip(out), max_out, _ip(out_len))
        if n < 0:
            return None
        return n, out[: out_len[0]].tolist()


class RefStemmer:
    def __init__(self, image: bytes):
        self._img = ctypes.create_string_buffer(image, len(image))
        self._h = lib().Shim_LoadStemmer(self._img)
        assert self._h

    def stem(self, op, word, t1=-1, t2=-1, max_out=4096):
        w = _arr(word)
        out = np.zeros(max_out, np.int32)
        n = lib().Shim_Stem(self._h, op, _ip(w), len(w), t1, t2,
                            _ip(out), max_out)
        return None if n < 0 else out[:n].tolist()

    def w2p_int(self, word):
        w = _arr(word)
        return lib().Shim_W2PInt(self._h, _ip(w), len(w))

    def w2p_prob(self, word) -> float:
        w = _arr(word)
        return lib().Shim_W2PProb(self._h, _ip(w), len(w))


class RefWbd:
    def __init__(self, image: bytes):
        self._img = ctypes.create_string_buffer(image, len(image))
        self._h = lib().Shim_LoadWbd(self._img)
        assert self._h

    def regexp_tags(self, text, max_out=1024):
        t = _arr(text)
        tags = np.zeros(max_out, np.int32)
        scores = np.zeros(max_out, np.int32)
        n = lib().Shim_RegexpTags(self._h, _ip(t), len(t), _ip(tags),
                                  _ip(scores), max_out)
        return None if n < 0 else (tags[:n].tolist(), scores[:n].tolist())


def transform(kind: int, seq, delim: int = -1, pref_img: bytes | None = None,
              max_out: int = 4096):
    s = _arr(seq)
    out = np.zeros(max_out, np.int32)
    n = lib().Shim_Transform(kind, delim, pref_img, _ip(s), len(s),
                             _ip(out), max_out)
    return None if n < 0 else out[:n].tolist()
