"""MPH-backed multimap: pack + inverse-MPH read, cross-runtime.

``pack_multimap_mph`` images are decoded by our ``MphMultiMap`` reader and
by the ORIGINAL reference class (``FAMultiMap_pack_mph::Get`` via its
mangled symbols) and must agree on every id, including out-of-range ones.
"""

from __future__ import annotations

import ctypes
import random

import pytest

import reference_lib as ref
from blingfire_tpu.compiler.packers import pack_multimap_mph
from blingfire_tpu.formats.dfa import MphMultiMap

CTOR = "_ZN9BlingFire19FAMultiMap_pack_mphC1Ev"
SET_IMAGE = "_ZN9BlingFire19FAMultiMap_pack_mph8SetImageEPKh"
GET = "_ZNK9BlingFire19FAMultiMap_pack_mph3GetEiPii"
GET_MAX = "_ZNK9BlingFire19FAMultiMap_pack_mph11GetMaxCountEv"


def _ref_mph(img: bytes):
    lib = ref._lib()
    obj = ctypes.create_string_buffer(512)
    ctor = getattr(lib, CTOR)
    ctor.argtypes = [ctypes.c_void_p]
    ctor(obj)
    buf = ctypes.create_string_buffer(img, len(img))
    set_image = getattr(lib, SET_IMAGE)
    set_image.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    set_image(obj, buf)
    get = getattr(lib, GET)
    get.restype = ctypes.c_int
    get.argtypes = [ctypes.c_void_p, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_int32), ctypes.c_int]

    def fn(key):
        out = (ctypes.c_int32 * 512)()
        n = get(obj, key, out, 512)
        return None if n < 0 else list(out[:n])

    return fn, obj, buf  # keep buffers alive


def _rand_chains(rng: random.Random, n: int):
    out = set()
    while len(out) < n:
        ln = rng.randint(1, 9)
        out.add(tuple(rng.randrange(1, 500) for _ in range(ln)))
    return sorted(out)


@pytest.mark.parametrize("seed,direction", [(0, 0), (1, 0), (2, 1), (3, 1)])
def test_mph_multimap_cross_runtime(seed, direction):
    rng = random.Random(seed)
    chains = _rand_chains(rng, 60)
    img = pack_multimap_mph(chains, direction=direction)

    ours = MphMultiMap(img, 0)
    theirs, _o, _b = _ref_mph(img)

    stored = sorted({tuple(reversed(c)) if direction else c for c in chains})
    expect = [list(reversed(s)) if direction else list(s) for s in stored]

    for key in range(len(stored)):
        got = ours.get(key)
        assert got == expect[key], (key, got, expect[key])
        assert theirs(key) == got, key
    # out-of-range keys fail identically
    for key in (len(stored), len(stored) + 5, 10 ** 6):
        assert ours.get(key) is None
        assert theirs(key) is None
    assert ours.get(-1) is None


def test_mph_multimap_prefix_keys():
    """keys that are strict prefixes of other keys must still invert."""
    chains = [(1,), (1, 2), (1, 2, 3), (1, 3), (2,)]
    img = pack_multimap_mph(chains)
    ours = MphMultiMap(img, 0)
    theirs, _o, _b = _ref_mph(img)
    for key, want in enumerate(sorted(chains)):
        assert ours.get(key) == list(want)
        assert theirs(key) == list(want)
