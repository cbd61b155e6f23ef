"""Load a BlingFire ``.bin`` LDB model into dense, device-friendly tables.

Mirrors the section probing of the reference product layer
(blingfiretools/blingfiretokdll/blingfiretokdll.cpp:918-1048) and the config
keepers (blingfireclient.library/src/FADictConfKeeper.cpp:57-228,
FAWbdConfKeeper.cpp:56-232), but the output is flat NumPy arrays rather than
in-place image interpreters.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..formats.consts import Func, MapMode, Param, TokAlgo, FsmType, MAX_ARR_SIZE
from ..formats.dfa import DenseAutomaton, PackedDfaImage, densify_automaton
from ..formats.ldb import LdbContainer
from ..formats.packed import (
    ArrayPack,
    MultiMapPack,
    MultiMapPackFixed,
    StringArrayPack,
)


@dataclass
class CharMap:
    """Charmap-driven 1->N character normalization table (dense)."""

    min_key: int
    max_key: int
    counts: np.ndarray  # int32[nkeys]
    values: np.ndarray  # int32[nkeys, max_count]

    def get(self, c: int) -> np.ndarray | None:
        if c < self.min_key or c > self.max_key:
            return None
        i = c - self.min_key
        n = int(self.counts[i])
        if n > self.values.shape[1]:
            return None
        return self.values[i, :n]


@dataclass
class SegmenterModel:
    """[pos-dict] section: MPH Mealy vocab automaton + id/score info."""

    aut: DenseAutomaton
    k2i_count: int
    i2info_ids: np.ndarray  # int32[nkeys] token id per MPH index
    i2info_scores: np.ndarray  # float32[nkeys] score / merge rank
    i2info_min_key: int
    i2info_counts: np.ndarray  # int32[nkeys] raw entry counts (1=bpe, 2=unigram)
    charmap: CharMap | None
    tok_algo: TokAlgo
    id_offset: int
    use_raw_bytes: bool
    no_dummy_prefix: bool


@dataclass
class WbdModel:
    """[wbd] section: Moore pattern lexer (rules automaton + actions)."""

    aut: DenseAutomaton
    acts: dict[int, np.ndarray]  # rule Ow -> action int stream
    act_data: dict[int, np.ndarray] | None
    charmap: CharMap | None
    params: dict[int, int]

    @property
    def max_depth(self) -> int:
        return self.params.get(Param.DEPTH, 2)

    @property
    def max_token_length(self) -> int:
        return self.params.get(Param.MAX_LENGTH, 300)

    @property
    def word_tag(self) -> int:
        return self.params.get(Param.WORD, 0)

    @property
    def ignore_tag(self) -> int:
        return self.params.get(Param.IGNORE, 0)

    @property
    def ignore_case(self) -> bool:
        return bool(self.params.get(Param.IGNORE_CASE, 0))


@dataclass
class HyphModel:
    """[w2h] section: hyphenation patterns automaton + per-pattern ops."""

    aut: DenseAutomaton
    i2info: dict[int, np.ndarray]
    charmap: CharMap | None
    params: dict[int, int]


@dataclass
class I2wModel:
    offsets: np.ndarray  # uint32[count+1]
    data: np.ndarray  # uint8[total]
    min_token_id: int
    max_token_id: int

    @property
    def count(self) -> int:
        return len(self.offsets) - 1

    def get(self, idx: int) -> bytes | None:
        if idx < 0 or idx >= self.count:
            return None
        b, e = int(self.offsets[idx]), int(self.offsets[idx + 1])
        return self.data[b:e].tobytes()


@dataclass
class Model:
    """One loaded .bin model, all sections densified."""

    ldb: LdbContainer
    wbd: WbdModel | None = None
    seg: SegmenterModel | None = None
    w2h: HyphModel | None = None
    i2w: I2wModel | None = None
    extra: dict = field(default_factory=dict)
    source_key: str | None = None  # content hash, used for derived-table caching
    source_path: str | None = None  # .bin file path (None for load_bytes)

    @property
    def has_seg(self) -> bool:
        return self.seg is not None


def _load_charmap(ldb: LdbContainer, dump_num: int) -> CharMap:
    mm = MultiMapPackFixed(ldb.image, ldb.dump(dump_num))
    counts, values = mm.densify()
    return CharMap(mm.min_key, mm.max_key, counts, values)


def _load_seg(ldb: LdbContainer, params: dict[int, int]) -> SegmenterModel:
    fsm_type = params.get(Param.FSM_TYPE, FsmType.MEALY_DFA)
    if fsm_type != FsmType.MEALY_DFA:
        raise NotImplementedError("[pos-dict] with non-Mealy FSM")
    img = PackedDfaImage(ldb.image, ldb.dump(params[Param.FSM]))
    aut = densify_automaton(img, mealy=True)

    k2i = ArrayPack(ldb.image, ldb.dump(params[Param.ARRAY]))

    map_mode = params.get(Param.MAP_MODE, MapMode.PACK_TRIV)
    mm_off = ldb.dump(params[Param.MULTI_MAP])
    if map_mode == MapMode.PACK_FIXED:
        mm = MultiMapPackFixed(ldb.image, mm_off)
        counts, values = mm.densify()
        min_key = mm.min_key
    elif map_mode == MapMode.PACK_TRIV:
        mmp = MultiMapPack(ldb.image, mm_off)
        d = mmp.to_dict()
        nkeys = mmp.max_key + 1
        width = max((len(v) for v in d.values()), default=1)
        counts = np.zeros(nkeys, np.int32)
        values = np.zeros((nkeys, width), np.int32)
        for k, v in d.items():
            counts[k] = len(v)
            values[k, : len(v)] = v
        min_key = 0
    else:
        raise NotImplementedError(f"[pos-dict] multimap mode {map_mode}")

    ids = values[:, 0].astype(np.int32)
    # entry 1, when present, is an IEEE-754 float stored in an int slot
    # (FATokenSegmentationTools_1best_t.h:122-127)
    if values.shape[1] > 1:
        scores = values[:, 1].view(np.float32).copy()
    else:
        scores = np.zeros(len(ids), np.float32)

    charmap = (
        _load_charmap(ldb, params[Param.CHARMAP]) if Param.CHARMAP in params else None
    )

    return SegmenterModel(
        aut=aut,
        k2i_count=k2i.count,
        i2info_ids=ids,
        i2info_scores=scores,
        i2info_min_key=min_key,
        i2info_counts=counts,
        charmap=charmap,
        tok_algo=TokAlgo(params.get(Param.TOKENIZATION_TYPE, TokAlgo.DEFAULT)),
        id_offset=params.get(Param.ID_OFFSET, 0),
        use_raw_bytes=bool(params.get(Param.USE_BYTE_ENCODING, 0)),
        no_dummy_prefix=bool(params.get(Param.NO_DUMMY_PREFIX, 0)),
    )


def _load_wbd(ldb: LdbContainer, params: dict[int, int]) -> WbdModel:
    img = PackedDfaImage(ldb.image, ldb.dump(params[Param.FSM]))
    aut = densify_automaton(img, mealy=False)
    acts = MultiMapPack(ldb.image, ldb.dump(params[Param.MULTI_MAP])).to_dict()
    act_data = (
        MultiMapPack(ldb.image, ldb.dump(params[Param.ACT_DATA])).to_dict()
        if Param.ACT_DATA in params
        else None
    )
    charmap = (
        _load_charmap(ldb, params[Param.CHARMAP]) if Param.CHARMAP in params else None
    )
    return WbdModel(aut=aut, acts=acts, act_data=act_data, charmap=charmap, params=params)


def _load_w2h(ldb: LdbContainer, params: dict[int, int]) -> HyphModel:
    img = PackedDfaImage(ldb.image, ldb.dump(params[Param.FSM]))
    aut = densify_automaton(img, mealy=False)
    i2info = MultiMapPack(ldb.image, ldb.dump(params[Param.MULTI_MAP])).to_dict()
    charmap = (
        _load_charmap(ldb, params[Param.CHARMAP]) if Param.CHARMAP in params else None
    )
    return HyphModel(aut=aut, i2info=i2info, charmap=charmap, params=params)


def _load_i2w(ldb: LdbContainer, params: dict[int, int]) -> I2wModel:
    sa = StringArrayPack(ldb.image, ldb.dump(params[Param.STRING_ARRAY]))
    offsets, data = sa.densify()
    return I2wModel(
        offsets=offsets,
        data=data,
        min_token_id=params.get(Param.TOKENID_MIN, 0),
        max_token_id=params.get(Param.TOKENID_MAX, MAX_ARR_SIZE),
    )


def load_bytes(image: bytes, validate: bool = True, use_cache: bool = True) -> Model:
    from . import cache

    key = cache.content_key(image, "model") if use_cache else None
    if key:
        hit = cache.load(key)
        if hit is not None:
            hit.source_key = key
            return hit
    ldb = LdbContainer.from_bytes(image, validate=validate)
    model = Model(ldb=ldb)
    if (p := ldb.section_params(Func.WBD)):
        model.wbd = _load_wbd(ldb, p)
    if (p := ldb.section_params(Func.POS_DICT)):
        model.seg = _load_seg(ldb, p)
    if (p := ldb.section_params(Func.W2H)):
        model.w2h = _load_w2h(ldb, p)
    if (p := ldb.section_params(Func.I2W)):
        model.i2w = _load_i2w(ldb, p)
    if key:
        cache.store(key, model)
        model.source_key = key
    return model


def load_model(path: str, validate: bool = True, use_cache: bool = True) -> Model:
    with open(path, "rb") as f:
        model = load_bytes(f.read(), validate=validate, use_cache=use_cache)
    model.source_path = path
    return model
