"""Reverse-MPH (FAOw2Iw_pack_triv) reader + OffsetTablePack round-trip.

The reverse walk is cross-checked against the ORIGINAL reference class on the
shipped gpt2/xlnet Mealy images: the reference ``FAOw2Iw_pack_triv`` is driven
through its mangled C++ symbols on the very same dump bytes.
"""

from __future__ import annotations

import ctypes
import random

import numpy as np
import pytest

import reference_lib as ref
from blingfire_tpu.compiler.packers import pack_offset_table
from blingfire_tpu.formats.consts import Param
from blingfire_tpu.formats.dfa import PackedDfaImage
from blingfire_tpu.formats.ldb import LdbContainer
from blingfire_tpu.formats.packed import OffsetTablePack

CTOR = "_ZN9BlingFire17FAOw2Iw_pack_trivC1Ev"
SET_IMAGE = "_ZN9BlingFire17FAOw2Iw_pack_triv8SetImageEPKh"
GET_DEST = "_ZNK9BlingFire17FAOw2Iw_pack_triv11GetDestIwOwEiiPiS1_"


class _RefOw2Iw:
    def __init__(self, img: bytes):
        lib = ref._lib()
        self._obj = ctypes.create_string_buffer(256)
        ctor = getattr(lib, CTOR)
        ctor.argtypes = [ctypes.c_void_p]
        ctor(self._obj)
        self._buf = ctypes.create_string_buffer(img, len(img))
        set_image = getattr(lib, SET_IMAGE)
        set_image.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        set_image(self._obj, self._buf)
        self._get = getattr(lib, GET_DEST)
        self._get.restype = ctypes.c_int
        self._get.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]

    def step(self, state: int, ow1: int):
        iw = ctypes.c_int32(-1)
        ow2 = ctypes.c_int32(-1)
        dst = self._get(self._obj, state, ow1, ctypes.byref(iw), ctypes.byref(ow2))
        if dst == -1:
            return -1, -1, -1
        return dst, iw.value, ow2.value


def _seg_fsm_image(model_name: str) -> bytes:
    ldb = LdbContainer.from_file(f"/root/reference/ldbsrc/ldb/{model_name}")
    from blingfire_tpu.formats.consts import Func

    params = dict(ldb.section_params(Func.POS_DICT))
    off = ldb.dump(params[Param.FSM])
    nxt_off = min(
        (o for o in ldb.dump_offsets if o > off),
        default=len(ldb.image),
    )
    return bytes(ldb.image[off:nxt_off])


@pytest.mark.parametrize("model", ["gpt2.bin", "xlnet.bin"])
def test_ow2iw_steps_match_reference(model):
    img = _seg_fsm_image(model)
    mine = PackedDfaImage(img, 0)
    theirs = _RefOw2Iw(img)

    rng = random.Random(7)
    # breadth of coverage: chains for the first ids + random deep ids
    ids = list(range(64)) + [rng.randrange(0, 200000) for _ in range(64)]
    for id_ in ids:
        state, ow = mine.initial, id_
        for _ in range(64):
            got = mine.ow2iw_step(state, ow)
            exp = theirs.step(state, ow)
            assert got == exp, (model, id_, state, ow)
            if got[0] == -1:
                break
            state = got[0]
            ow -= got[2]


@pytest.mark.parametrize("model", ["gpt2.bin"])
def test_mph_chain_inverts_mph_id(model):
    """GetChain(GetId(chain)) == chain for vocabulary entries."""
    img = _seg_fsm_image(model)
    mine = PackedDfaImage(img, 0)

    # forward MPH: accumulate per-transition Ows along accept paths
    def get_id(chain):
        state, total = mine.initial, 0
        for c in chain:
            st = mine.decode_state(state)
            pos = np.searchsorted(st.iws, c)
            if pos >= len(st.iws) or st.iws[pos] != c:
                return -1
            ows = mine.mealy_ows(st)
            total += int(ows[pos]) if len(ows) else 0
            state = int(st.dsts[pos])
        return total if mine.decode_state(state).final else -1

    rng = random.Random(3)
    checked = 0
    for id_ in [rng.randrange(0, 50000) for _ in range(200)]:
        chain = mine.mph_chain(id_)
        if chain is None:
            continue
        assert get_id(chain) == id_
        checked += 1
    assert checked > 100


def test_offset_table_roundtrip():
    rng = random.Random(11)
    for trial in range(20):
        n = rng.randint(1, 400)
        offs = np.cumsum(rng.choices(range(0, 90), k=n)).tolist()
        img = pack_offset_table(offs)
        rd = OffsetTablePack(img, 0)
        assert rd.densify().tolist() == offs
    # incompressible case: huge jumps force shift=0
    offs = [0, 100000, 200000]
    img = pack_offset_table(offs)
    rd = OffsetTablePack(img, 0)
    assert rd.shift == 0
    assert rd.densify().tolist() == offs
