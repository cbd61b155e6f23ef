"""Test-only ctypes bindings to the prebuilt reference shared library.

Used exclusively to mint golden outputs for parity tests; the framework
itself never touches this library.  Mirrors the reference's own Python
binding approach (reference dist-pypi/blingfire/__init__.py).
"""

from __future__ import annotations

import ctypes
import functools
import os

import numpy as np

REF_SO = "/root/reference/dist-pypi/blingfire/libblingfiretokdll.so"
LDB_DIR = "/root/reference/ldbsrc/ldb"


@functools.lru_cache(maxsize=1)
def _lib():
    lib = ctypes.cdll.LoadLibrary(REF_SO)
    lib.LoadModel.restype = ctypes.c_void_p
    lib.LoadModel.argtypes = [ctypes.c_char_p]
    lib.SetModel.restype = ctypes.c_void_p
    return lib


@functools.lru_cache(maxsize=32)
def load_model(name: str):
    path = os.path.join(LDB_DIR, name)
    h = _lib().LoadModel(ctypes.c_char_p(path.encode()))
    assert h, f"reference LoadModel failed for {path}"
    return h


def text_to_ids(
    handle, text: bytes | str, max_len: int = 1024, unk_id: int = 0
) -> np.ndarray:
    if isinstance(text, str):
        text = text.encode("utf-8")
    ids = np.zeros(max_len, dtype=np.int32)
    out_count = _lib().TextToIds(
        ctypes.c_void_p(handle),
        ctypes.c_char_p(text),
        ctypes.c_int(len(text)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(max_len),
        ctypes.c_int(unk_id),
    )
    return ids[: min(out_count, max_len)]


def text_to_ids_with_offsets(
    handle, text: bytes | str, max_len: int = 1024, unk_id: int = 0
):
    if isinstance(text, str):
        text = text.encode("utf-8")
    ids = np.zeros(max_len, dtype=np.int32)
    starts = np.zeros(max_len, dtype=np.int32)
    ends = np.zeros(max_len, dtype=np.int32)
    out_count = _lib().TextToIdsWithOffsets(
        ctypes.c_void_p(handle),
        ctypes.c_char_p(text),
        ctypes.c_int(len(text)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(max_len),
        ctypes.c_int(unk_id),
    )
    n = min(out_count, max_len)
    return ids[:n], starts[:n], ends[:n]


def text_to_words(text: bytes | str, handle=None, max_out: int = 1 << 16) -> str:
    if isinstance(text, str):
        text = text.encode("utf-8")
    out = ctypes.create_string_buffer(max_out)
    if handle is None:
        n = _lib().TextToWords(
            ctypes.c_char_p(text), ctypes.c_int(len(text)), out, ctypes.c_int(max_out)
        )
    else:
        n = _lib().TextToWordsWithModel(
            ctypes.c_char_p(text),
            ctypes.c_int(len(text)),
            out,
            ctypes.c_int(max_out),
            ctypes.c_void_p(handle),
        )
    if n <= 0:
        return ""
    return out.raw[: n - 1].decode("utf-8", errors="replace")


def text_to_sentences(text: bytes | str, handle=None, max_out: int = 1 << 16) -> str:
    if isinstance(text, str):
        text = text.encode("utf-8")
    out = ctypes.create_string_buffer(max_out)
    if handle is None:
        n = _lib().TextToSentences(
            ctypes.c_char_p(text), ctypes.c_int(len(text)), out, ctypes.c_int(max_out)
        )
    else:
        n = _lib().TextToSentencesWithModel(
            ctypes.c_char_p(text),
            ctypes.c_int(len(text)),
            out,
            ctypes.c_int(max_out),
            ctypes.c_void_p(handle),
        )
    if n <= 0:
        return ""
    return out.raw[: n - 1].decode("utf-8", errors="replace")


def _with_offsets(fname, text, handle, max_out=1 << 16):
    if isinstance(text, str):
        text = text.encode("utf-8")
    out = ctypes.create_string_buffer(max_out)
    starts = np.zeros(max_out, np.int32)
    ends = np.zeros(max_out, np.int32)
    fn = getattr(_lib(), fname)
    n = fn(
        ctypes.c_char_p(text),
        ctypes.c_int(len(text)),
        out,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(max_out),
        ctypes.c_void_p(handle),
    )
    if n <= 0:
        return "", [], []
    s = out.raw[: n - 1].decode("utf-8", errors="replace")
    cnt = len(s.split(" " if "Words" in fname else "\n")) if s else 0
    return s, starts[:cnt].tolist(), ends[:cnt].tolist()


def text_to_words_with_offsets(text, handle):
    return _with_offsets("TextToWordsWithOffsetsWithModel", text, handle)


def text_to_sentences_with_offsets(text, handle):
    return _with_offsets("TextToSentencesWithOffsetsWithModel", text, handle)


def ids_to_text(handle, ids, skip_special: bool = True, max_out: int = 1 << 16) -> str:
    arr = np.asarray(ids, dtype=np.int32)
    out = ctypes.create_string_buffer(max_out)
    n = _lib().IdsToText(
        ctypes.c_void_p(handle),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(len(arr)),
        out,
        ctypes.c_int(max_out),
        ctypes.c_bool(skip_special),
    )
    if n <= 0:
        return ""
    return out.raw[: n - 1].decode("utf-8", errors="replace")


def word_hyphenation(
    handle, text: bytes | str, uhy: int = 0x2012, max_out: int = 1 << 16
) -> str:
    if isinstance(text, str):
        text = text.encode("utf-8")
    out = ctypes.create_string_buffer(max_out)
    n = _lib().WordHyphenationWithModel(
        ctypes.c_char_p(text),
        ctypes.c_int(len(text)),
        out,
        ctypes.c_int(max_out),
        ctypes.c_void_p(handle),
        ctypes.c_int(uhy),
    )
    if n <= 0:
        return ""
    return out.raw[: n - 1].decode("utf-8", errors="replace")


def normalize_spaces(
    text: bytes | str, u_space: int = 0x2581, max_out: int = 1 << 16
) -> str:
    if isinstance(text, str):
        text = text.encode("utf-8")
    out = ctypes.create_string_buffer(max_out)
    n = _lib().NormalizeSpaces(
        ctypes.c_char_p(text),
        ctypes.c_int(len(text)),
        out,
        ctypes.c_int(max_out),
        ctypes.c_int(u_space),
    )
    if n <= 0:
        return ""
    # NormalizeSpaces returns the payload size (terminator not counted)
    return out.raw[:n].decode("utf-8", errors="replace")
