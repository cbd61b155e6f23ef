"""Constants shared with the BlingFire LDB binary format.

Numeric values must match the reference enums exactly
(blingfireclient.library/inc/FAFsmConst.h:15-416) because they are baked into
shipped .bin files.  Only the subsets actually used by the LDB runtime are
reproduced here.
"""

from __future__ import annotations

import enum


class FsmType(enum.IntEnum):
    # FAFsmConst.h:20-33
    RS_NFA = 0
    POS_RS_NFA = 1
    RS_DFA = 2
    MOORE_DFA = 3
    MOORE_MULTI_DFA = 4
    MULTI_MAP = 5
    MEALY_NFA = 6
    MEALY_DFA = 7
    ARRAY = 8
    FLOAT_ARRAY = 9
    STRING_ARRAY = 10


class MapMode(enum.IntEnum):
    # FAFsmConst.h:36-42
    INT = 0
    PACK_TRIV = 1
    PACK_MPH = 2
    PACK_FIXED = 3


class Iw(enum.IntEnum):
    # special input weights, FAFsmConst.h:68-75
    ANY = 0
    L_ANCHOR = 1
    R_ANCHOR = 2
    EPSILON = 3
    EOS = 4


# FAFsmConst.h:78-81
DFA_DEAD_STATE = -2

# transition representation codes in the packed-state info byte
# (FAFsmConst.h:364-371)
TRS_NONE = 0x00
TRS_IMPL = 0x02
TRS_PARA = 0x04
TRS_IWIA = 0x06
TRS_RANGE = 0x01


class Func(enum.IntEnum):
    # LDB section ids, FAFsmConst.h:152-190
    W2T = 0
    W2B = 1
    B2W = 2
    W2W = 3
    TRS = 4
    W2S = 5
    WRE = 6
    WT2B = 7
    B2WT = 8
    WTT2W = 9
    TAG_DICT = 10
    W2H = 11
    POS_DICT = 12
    B2T = 13
    T2TB = 14
    TB2T = 15
    W2TP = 16
    W2TPL = 17
    W2TPR = 18
    WBD = 19
    GLOBAL = 20
    W2H_ALT = 21
    T2P = 22
    TT2P = 23
    TTT2P = 24
    NORM_RULES = 25
    NORM_DICT = 26
    EMIT = 27
    OIC_RULES = 28
    CSS_RULES = 29
    W2V = 30
    W2P = 31
    N2TP = 32
    LAD = 33
    U2L = 34
    I2W = 35


class Param(enum.IntEnum):
    # runtime container parameter ids, FAFsmConst.h:193-273
    IN_TR = 0
    OUT_TR = 1
    FSM = 2
    RSDFA = 3
    STATE2OW = 4
    STATE2OWS = 5
    ACTS = 6
    FOLLOW = 7
    POS2BEGINBR = 8
    POS2ENDBR = 9
    REVERSE = 10
    DIRECTION = 11
    TRIM = 12
    REDUP_DELIM = 13
    PREF_DELIM = 14
    PREF_FSM = 15
    MAP_MODE = 16
    MIN_LEN = 17
    NO_TR = 18
    UCF_DELIM = 19
    TOKEN_TYPE = 20
    FSM_COUNT = 21
    IGNORE_CASE = 22
    DEFAULT_TAG = 23
    ARRAY = 24
    MULTI_MAP = 25
    FSM_TYPE = 26
    LEFT_ANCHOR = 27
    RIGHT_ANCHOR = 28
    TYPE = 29
    TAG_OW_BASE = 30
    DICT_MODE = 31
    MIN_LEN2 = 32
    MIN_LEN3 = 33
    HYPH_TYPE = 34
    NORMALIZE = 35
    MAX_PROB = 36
    DO_W2B = 37
    DEPTH = 38
    MAX_TAG = 39
    LOG_SCALE = 40
    FLOAT_ARRAY = 41
    WORD = 42
    PUNKT = 43
    EOS = 44
    EOP = 45
    USE_NFST = 46
    CHARMAP = 47
    WRE_CONF = 48
    SUFFIX_FSM = 49
    MIN_UNI_PROB = 50
    XWORD = 51
    SEG = 52
    IGNORE = 53
    ORDER = 54
    MIN_ORDER = 55
    UNKNOWN = 56
    MAX_COUNT = 57
    RATIO = 58
    RATIO2 = 59
    C2S_MAP = 60
    S2L_MAP = 61
    SCRIPT_MIN = 62
    SCRIPT_MAX = 63
    MAX_DISTANCE = 64
    MAX_PASS_COUNT = 65
    MAX_SCORE = 66
    THRESHOLD = 67
    ACT_DATA = 68
    MAX_LENGTH = 69
    VERIFY_LDB_BIN = 70
    TOKENIZATION_TYPE = 71
    ID_OFFSET = 72
    USE_BYTE_ENCODING = 73
    NO_DUMMY_PREFIX = 74
    STRING_ARRAY = 75
    TOKENID_MIN = 76
    TOKENID_MAX = 77


# parameters encoded with no value slot (FALDB.cpp:136-147)
BOOLEAN_PARAMS = frozenset(
    {
        Param.REVERSE,
        Param.NO_TR,
        Param.IGNORE_CASE,
        Param.DICT_MODE,
        Param.NORMALIZE,
        Param.LOG_SCALE,
        Param.USE_NFST,
        Param.DO_W2B,
        Param.VERIFY_LDB_BIN,
    }
)


class Dir(enum.IntEnum):
    # word reading direction (FAFsmConst.h:122-125)
    L2R = 0
    R2L = 1
    AFF = 2


class Tr(enum.IntEnum):
    # word transformation types (FAFsmConst.h:130-136)
    HYPH_REDUP = 0
    HYPH_REDUP_REV = 1
    PREFIX = 2
    PREFIX_REV = 3
    UCF = 4
    UCF_REV = 5


# WRE token-type bit mask (FAFsmConst.h:93-96)
WRE_TT_TEXT = 1
WRE_TT_TAGS = 2
WRE_TT_DCTS = 4
WRE_TT_DEFAULT = WRE_TT_TEXT | WRE_TT_TAGS | WRE_TT_DCTS

# WRE types (FAFsmConst.h:101-104)
WRE_TYPE_RS = 0
WRE_TYPE_MOORE = 1
WRE_TYPE_MEALY = 2

# WRE packed-conf int indices (FAFsmConst.h:109-117)
WRE_CONF_WRE_TYPE = 0
WRE_CONF_TOKEN_TYPE = 1
WRE_CONF_TAG_OW_BASE = 2
WRE_CONF_TXT_DIG = 3
WRE_CONF_DCT_DIG = 4
WRE_CONF_FSM1 = 5
WRE_CONF_FSM2 = 6
WRE_CONF_TRBR = 7
WRE_CONF_COUNT = 8

# log-prob clamps (FAFsmConst.h:360-361)
MIN_LOG_PROB = -80.0
MAX_LOG_PROB = 0.0


class TokAlgo(enum.IntEnum):
    # FAFsmConst.h:403-415
    DEFAULT = 0
    WORDPIECE = 1
    UNIGRAM_LM = 2
    BPE = 3
    BPE_OPT = 4
    BPE_OPT_WITH_MERGES = 5


class NormAlgo(enum.IntEnum):
    # FAFsmConst.h:396-399 (diacritics normalization, FAStrUtf8Normalize)
    DEFAULT = 0
    PRESERVE_DIACRITICS = 1
    REMOVE_DIACRITICS = 2


# product-level constants (blingfiretokdll.cpp:39-40, blingfiretokdll.h:10-14)
WBD_WORD_TAG = 1
WBD_IGNORE_TAG = 4
SP_DELIMITER = 0x2581  # U+2581 LOWER ONE EIGHTH BLOCK, the SentencePiece space
DEFAULT_HYPHEN = 0x2012
UNK_SCORE = -100000.0  # FATokenSegmentationTools_1best_t.h:97

# FALimits.h:23-47
MAX_ARR_SIZE = 1_000_000_000
MAX_WORD_LEN = 300
MAX_TAG = 65535


def is_whitespace(c: int) -> bool:
    """The product whitespace class (blingfiretokdll.h:16-21)."""
    return (
        c <= 0x20
        or c == 0xA0
        or (0x2000 <= c <= 0x200F)
        or c == 0x202F
        or c == 0x205F
        or c == 0x2060
        or c == 0x2420
        or c == 0x2424
        or c == 0x3000
        or c == 0xFEFF
    )
