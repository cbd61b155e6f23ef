"""[pos-dict] model compiler: vocabulary -> loadable .bin / .i2w.

Replaces the reference's offline pipeline
  fa_line2chain_unicode | sort | fa_chains2mindfa | fa_dfa2mph |
  fa_fsm2fsm_pack ... | fa_merge_dumps          (scripts/fa_build_dict:211-218,
  ldbsrc/Makefile.gnu:157-165,444-451)
with a single host-side builder.  The emitted container is readable by both
this framework and the original runtime.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from ..formats.consts import Func, Param, TokAlgo
from .mindfa import assign_mph_ows, build_min_dfa
from .packers import (
    pack_array_flat,
    pack_ldb,
    pack_mealy_dfa,
    pack_multimap,
    pack_multimap_fixed,
    pack_string_array,
)


@dataclass
class VocabEntry:
    chain: tuple[int, ...]  # symbol sequence (bytes or codepoints; ▁=0x2581)
    id: int
    score: float


@dataclass
class DictModelSpec:
    entries: list[VocabEntry]
    tok_algo: TokAlgo = TokAlgo.DEFAULT
    id_offset: int = 0
    use_byte_encoding: bool = False
    no_dummy_prefix: bool = False
    charmap: dict[int, list[int]] | None = None
    validate: bool = True


def _conf_stream(spec: DictModelSpec) -> list[int]:
    """[pos-dict] parameter stream in keeper-readable order
    (FADictConfKeeper.cpp:57-228: flags have no value slot)."""
    s: list[int] = []
    if spec.tok_algo != TokAlgo.DEFAULT:
        s += [Param.TOKENIZATION_TYPE, int(spec.tok_algo)]
    if spec.id_offset:
        s += [Param.ID_OFFSET, spec.id_offset]
    if spec.use_byte_encoding:
        s += [Param.USE_BYTE_ENCODING]
    if spec.no_dummy_prefix:
        s += [Param.NO_DUMMY_PREFIX]
    s += [Param.FSM_TYPE, 7]  # TYPE_MEALY_DFA
    s += [Param.MAP_MODE, 3]  # MODE_PACK_FIXED
    s += [Param.FSM, 1, Param.ARRAY, 2, Param.MULTI_MAP, 3]
    if spec.charmap is not None:
        s += [Param.CHARMAP, 4]
    return s


def compile_dict_model(spec: DictModelSpec) -> bytes:
    """Build a complete [pos-dict] LDB .bin image."""
    entries = sorted(spec.entries, key=lambda e: e.chain)
    chains = [e.chain for e in entries]
    n, final, edges = build_min_dfa(chains)
    mealy = assign_mph_ows(n, final, edges)
    fsm_dump = pack_mealy_dfa(n, 0, final, mealy)

    k2i_dump = pack_array_flat(np.arange(len(entries), dtype=np.int64))

    i2info = {
        i: [int(e.id), int(np.float32(e.score).view(np.int32))]
        for i, e in enumerate(entries)
    }
    i2info_dump = pack_multimap_fixed(i2info, size_of_value=4)

    conf_map: dict[int, list[int]] = {int(Func.POS_DICT): _conf_stream(spec)}
    if spec.validate:
        conf_map[int(Func.GLOBAL)] = [int(Param.VERIFY_LDB_BIN)]
    conf_dump = pack_multimap(conf_map)

    dumps = [conf_dump, fsm_dump, k2i_dump, i2info_dump]
    if spec.charmap is not None:
        dumps.append(pack_multimap_fixed(spec.charmap, size_of_value=4))
    return pack_ldb(dumps, validate=spec.validate)


def compile_i2w_model(
    strings: list[bytes],
    token_id_min: int | None = None,
    token_id_max: int | None = None,
    validate: bool = True,
) -> bytes:
    """Build an [i2w] LDB (detokenization lexicon)."""
    stream: list[int] = []
    if token_id_min is not None:
        stream += [Param.TOKENID_MIN, token_id_min]
    if token_id_max is not None:
        stream += [Param.TOKENID_MAX, token_id_max]
    stream += [Param.STRING_ARRAY, 1]
    conf_map = {int(Func.I2W): stream}
    if validate:
        conf_map[int(Func.GLOBAL)] = [int(Param.VERIFY_LDB_BIN)]
    dumps = [pack_multimap(conf_map), pack_string_array(strings)]
    return pack_ldb(dumps, validate=validate)


# -- vocabulary importers ---------------------------------------------------


def vocab_from_pos_dict_lines(
    lines, input_enc: str = "utf-8"
) -> list[VocabEntry]:
    """Parse `token \\t WORD_ID_n \\t score` lines (ldbsrc pos.dict.utf8).

    input_enc 'dec' means tokens are space-separated decimal symbol values
    (the --input-enc=DEC byte mode of fa_line2chain_unicode)."""
    out = []
    for ln in lines:
        if isinstance(ln, bytes):
            ln = ln.decode("utf-8")
        ln = ln.rstrip("\n")
        if not ln:
            continue
        tok, wid, score = ln.split("\t")
        if input_enc.lower() == "dec":
            chain = tuple(int(x) for x in tok.split(" "))
        else:
            chain = tuple(ord(c) for c in tok)
        assert wid.startswith("WORD_ID_")
        out.append(VocabEntry(chain, int(wid[8:]), float(score)))
    return out


def vocab_from_hf_gpt2(vocab_json: dict, merges: list[str] | None = None):
    """HF GPT-2 byte-level vocab -> byte chains with U+2581 space marks.

    Equivalent of ldbsrc/gpt2/export_vocab.py semantics: tokens are byte
    sequences via the GPT-2 byte<->unicode table, Ġ (0x20) becomes ▁
    (symbol 0x2581), ids are shifted +1 (id-offset -1 at runtime), score
    is -(id+1) (or the merge rank for with-merges models)."""
    # GPT-2 byte encoder table
    bs = list(range(33, 127)) + list(range(161, 173)) + list(range(174, 256))
    cs = bs[:]
    m = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + m)
            m += 1
    uni2byte = {chr(c): b for b, c in zip(bs, cs)}

    entries = []
    for tok, tid in vocab_json.items():
        bb = [uni2byte[ch] for ch in tok if ch in uni2byte]
        if len(bb) != len(tok):
            continue  # specials like <|endoftext|>
        chain = tuple(0x2581 if b == 0x20 else b for b in bb)
        if not chain:
            continue
        entries.append(VocabEntry(chain, tid + 1, -float(tid + 1)))
    return entries
