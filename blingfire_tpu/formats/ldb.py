"""LDB container parsing.

An LDB ``.bin`` file is ``[DumpCount:i32][Offsets:i32 * DumpCount]`` followed
by the dumps themselves; dump 0 is always a packed multimap holding the
compiled configuration (section id -> parameter/value int stream).  The last
dump optionally holds CRC32 validation data.

Reference: blingfireclient.library/src/FALDB.cpp:24-191.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

import numpy as np

from .consts import BOOLEAN_PARAMS, Func, Param
from .packed import MultiMapPack, read_i32

MAX_LDB_DUMP_COUNT = 256

# Per-section valueless ("flag") parameters, mirroring each conf keeper's
# parsing switch.
SECTION_FLAG_PARAMS: dict[int, frozenset] = {
    int(Func.WBD): frozenset({Param.IGNORE_CASE}),
    int(Func.POS_DICT): frozenset(
        {Param.NO_TR, Param.IGNORE_CASE, Param.USE_BYTE_ENCODING, Param.NO_DUMMY_PREFIX}
    ),
    int(Func.W2H): frozenset({Param.IGNORE_CASE, Param.NORMALIZE}),
    int(Func.I2W): frozenset(),
    int(Func.GLOBAL): BOOLEAN_PARAMS,
}


@dataclass
class LdbContainer:
    image: bytes
    dump_offsets: list[int] = field(default_factory=list)
    conf: dict[int, np.ndarray] = field(default_factory=dict)

    @classmethod
    def from_bytes(cls, image: bytes, validate: bool = True) -> "LdbContainer":
        count = read_i32(image, 0)
        if not (0 <= count <= MAX_LDB_DUMP_COUNT):
            raise ValueError(f"bad LDB dump count {count}")
        offsets = [read_i32(image, 4 + 4 * i) for i in range(count)]
        conf_mm = MultiMapPack(image, offsets[0]) if count else None
        conf = conf_mm.to_dict() if conf_mm else {}
        ldb = cls(image=image, dump_offsets=offsets, conf=conf)
        if validate and ldb.get_value(Func.GLOBAL, Param.VERIFY_LDB_BIN):
            ldb._validate()
        return ldb

    @classmethod
    def from_file(cls, path: str, validate: bool = True) -> "LdbContainer":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read(), validate=validate)

    def dump(self, num: int) -> int:
        """Byte offset of dump `num` inside the image."""
        if not (0 <= num < len(self.dump_offsets)):
            raise IndexError(f"dump {num} out of range")
        return self.dump_offsets[num]

    def section(self, func: int) -> np.ndarray | None:
        return self.conf.get(int(func))

    def get_value(self, func: int, param: int) -> int | None:
        """Decode one parameter from a section's (param [value]) int stream.

        Boolean parameters occupy a single slot and mean 1-if-present
        (FALDB.cpp:149-191)."""
        vals = self.section(func)
        if vals is None:
            return 1 if param in BOOLEAN_PARAMS else None
        i = 0
        n = len(vals)
        while i < n:
            p = int(vals[i])
            boolean = p in BOOLEAN_PARAMS
            if not boolean:
                i += 1
                if i >= n:
                    raise ValueError("truncated conf stream")
            if p == int(param):
                return 1 if boolean else int(vals[i])
            i += 1
        return 0 if param in BOOLEAN_PARAMS else None

    def section_params(
        self, func: int, flags: frozenset | None = None
    ) -> dict[int, int]:
        """All (param -> value) pairs of a section; flag params map to 1.

        Which parameters are valueless flags is decided by each section's
        config keeper, not globally — e.g. [pos-dict] treats
        use-byte-encoding / no-dummy-prefix as flags
        (FADictConfKeeper.cpp:72-91) while [wbd] only treats ignore-case so
        (FAWbdConfKeeper.cpp:90-93)."""
        if flags is None:
            flags = SECTION_FLAG_PARAMS.get(int(func), BOOLEAN_PARAMS)
        vals = self.section(func)
        out: dict[int, int] = {}
        if vals is None:
            return out
        i = 0
        n = len(vals)
        while i < n:
            p = int(vals[i])
            if p in flags:
                out[p] = 1
            else:
                i += 1
                out[p] = int(vals[i])
            i += 1
        return out

    def _validate(self) -> None:
        """CRC32 check over all data dumps (FALDB.cpp:67-116).

        The validation dump is the last one and holds
        [version:u32][size:u32][hash:u32]; version 0 is the only format."""
        if len(self.dump_offsets) < 2:
            raise ValueError("validation requested but <2 dumps present")
        voff = self.dump_offsets[-1]
        version = int(np.frombuffer(self.image, "<u4", 1, voff)[0])
        if version != 0:
            return
        exp_size = int(np.frombuffer(self.image, "<u4", 1, voff + 4)[0])
        exp_hash = int(np.frombuffer(self.image, "<u4", 1, voff + 8)[0])
        size = 0
        crc = 0
        for i in range(len(self.dump_offsets) - 1):
            b, e = self.dump_offsets[i], self.dump_offsets[i + 1]
            if e < b:
                raise ValueError("LDB dumps out of order")
            size += e - b
            crc = zlib.crc32(self.image[b:e], crc)
        if size != exp_size or crc != exp_hash:
            raise ValueError(
                f"LDB validation failed: size {size}!={exp_size} "
                f"or crc {crc:#x}!={exp_hash:#x}"
            )
