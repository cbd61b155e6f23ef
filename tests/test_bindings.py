"""Symbol-level verification of the C# and WASM binding sources.

The CI image has no dotnet/mono or emscripten, so the bindings cannot be
compiled here.  What CAN be verified — and is the part that actually breaks
in practice — is the FFI contract: every native entry point a binding
declares must exist in libbtf_runtime.so with the exact exported name
(reference analogs: nuget/lib/BlingFireUtils.cs DllImports,
wasm/blingfire_wrapper.js Module["_..."] calls).

Also exercises, through ctypes, the exact call shapes the C# helpers rely
on (two-pass IdsToText sizing, NUL-terminated outputs) so the marshaling
assumptions in BlingFireTpuUtils.cs stay honest.
"""

from __future__ import annotations

import ctypes
import os
import re
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SO = os.path.join(ROOT, "blingfire_tpu", "native", "libbtf_runtime.so")
CSHARP = os.path.join(ROOT, "bindings", "csharp", "BlingFireTpuUtils.cs")
WASM_MK = os.path.join(ROOT, "bindings", "wasm", "Makefile")
WASM_JS = os.path.join(ROOT, "bindings", "wasm", "blingfire_tpu_wrapper.mjs")
LDB = "/root/reference/ldbsrc/ldb"


def _exported_symbols() -> set[str]:
    out = subprocess.run(
        ["nm", "-D", "--defined-only", SO], capture_output=True, text=True, check=True
    ).stdout
    return {line.split()[-1] for line in out.splitlines() if " T " in line}


def test_csharp_entrypoints_resolve():
    src = open(CSHARP).read()
    syms = _exported_symbols()
    # EntryPoint="X" overrides; otherwise the extern function's own name
    entries = set(re.findall(r'EntryPoint\s*=\s*"(\w+)"', src))
    for m in re.finditer(
        r"\[DllImport\((?![^\]]*EntryPoint)[^\]]*\)\]\s*(?:public\s+|static\s+|extern\s+)+"
        r"[\w<>\[\]]+\s+(\w+)\(",
        src,
    ):
        entries.add(m.group(1))
    assert len(entries) >= 19, f"parser found too few entry points: {sorted(entries)}"
    missing = entries - syms
    assert not missing, f"C# DllImport entry points missing from the .so: {sorted(missing)}"


def test_wasm_exports_resolve():
    syms = _exported_symbols()
    mk = open(WASM_MK).read()
    exports_m = re.search(r"^EXPORTS\s*:=\s*((?:[^\n\\]|\\\n)*)", mk, re.M)
    assert exports_m, "EXPORTS block not found in wasm Makefile"
    exports = {
        s.strip().lstrip("_")
        for s in exports_m.group(1).replace("\\\n", "").split(",")
        if s.strip()
    }
    exports -= {"malloc", "free"}  # provided by emscripten, not our runtime
    missing = exports - syms
    assert not missing, f"wasm EXPORTS missing from the runtime: {sorted(missing)}"

    # every _Name() the JS wrapper calls must be in the Makefile's EXPORTS
    js_calls = {
        m.group(1).lstrip("_")
        for m in re.finditer(r"(?:\bm|this\.m)\.(_\w+)\(", open(WASM_JS).read())
    }
    not_exported = js_calls - exports - {"malloc", "free"}
    assert not not_exported, f"wrapper calls not in EXPORTS: {sorted(not_exported)}"


@pytest.fixture(scope="module")
def rt():
    lib = ctypes.CDLL(SO)
    lib.LoadModel.restype = ctypes.c_void_p
    lib.LoadModel.argtypes = [ctypes.c_char_p]
    lib.IdsToText.restype = ctypes.c_int
    lib.IdsToText.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_bool,
    ]
    lib.FreeModel.argtypes = [ctypes.c_void_p]
    return lib


def test_idstotext_two_pass_sizing(rt):
    """The C# IdsToText helper probes with (null, 0) then fetches — the
    native side must tolerate the null buffer and report the same size."""
    h = rt.LoadModel(f"{LDB}/gpt2.i2w".encode())
    assert h
    try:
        ids = (ctypes.c_int32 * 3)(15496, 612, 995)  # "Hello my world"-ish ids
        needed = rt.IdsToText(h, ids, 3, None, 0, True)
        assert needed > 1
        buf = ctypes.create_string_buffer(needed)
        actual = rt.IdsToText(h, ids, 3, buf, needed, True)
        assert actual == needed
        text = buf.raw[: actual - 1].decode("utf-8")
        assert len(text) == actual - 1 and text.strip()
        assert buf.raw[actual - 1] == 0  # NUL-terminated as C# assumes
    finally:
        rt.FreeModel(h)


def test_text_to_words_nul_terminated(rt):
    """GetWords/GetSentences split `actual-1` bytes — verify the contract."""
    rt.TextToWords.restype = ctypes.c_int
    rt.SetDefaultModels.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    # mirror of the C# SetDefaultModels helper: load wbd/sbd then install
    wbd = rt.LoadModel(f"{LDB}/wbd.bin".encode())
    sbd = rt.LoadModel(f"{LDB}/sbd.bin".encode())
    assert wbd and sbd
    rt.SetDefaultModels(wbd, sbd)
    s = "Hello world!".encode()
    buf = ctypes.create_string_buffer(1024)
    actual = rt.TextToWords(s, len(s), buf, 1024)
    assert actual > 1
    assert buf.raw[actual - 1] == 0
    assert buf.raw[: actual - 1].decode() == "Hello world !"
