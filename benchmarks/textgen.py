"""Deterministic realistic-corpus generator for benchmarks.

Approximates a sentence-split web/wiki corpus (the reference's published
numbers are over 2.05M wiki lines, ldbsrc/xlnet/README.TXT:44-53): mostly
English prose with Zipf-ish word frequencies, plus numeric, European-language,
URL/identifier, and CJK/emoji lines.  Zero egress environment => synthetic.
"""

from __future__ import annotations

import random

_COMMON = (
    "the of and to in a is that for it as was with be by on not he this are "
    "at from his they which or had her she an were there been one all we can "
    "has more their but who if would about when will no out them so what up "
    "said its time into only new some could these two may then other do first "
    "any my now such like our over man even most made after also did many "
    "before must through years where much your way well down should because "
    "each just those people how too little state good very make world still "
    "own see men work long here get both between life being under never day "
    "same another know while last might us great old year off come since "
    "against go came right used take three"
).split()

_TOPIC = (
    "government committee infrastructure development research university "
    "published machine learning applications medicine economic implications "
    "policy rural areas tokenization throughput measured bandwidth stock "
    "futures report technology shares gains indexes negotiator empathy "
    "firmness deals others considered impossible president minister election "
    "company quarter revenue growth market analysts expect officials announced "
    "agreement international community climate energy production history "
    "century population region capital language culture music film series "
    "season players championship score defeat victory scientists discovered "
    "species environment temperature software version released features users "
    "security network protocol algorithm database compression encryption"
).split()

_GERMAN = (
    "der die das und ist mit nicht von für über während Komitee "
    "Infrastruktur bespricht schnelle Entwicklung Geschäftsführer "
    "Donaudampfschifffahrtsgesellschaft Straßenbahn Müller größte "
    "Fußballspieler Universität Wissenschaft Regierung Verhandlung"
).split()

_FRENCH = (
    "le la les et dans une pour est avec été après années français "
    "développement économique gouvernement université recherche société "
    "créé déjà où même très élection présidée château naïveté cœur"
).split()

_SPANISH = (
    "el la los y en una por es con fue después años español desarrollo "
    "económico gobierno universidad investigación sociedad rápido zorro "
    "marrón salta sobre perro perezoso mientras comité discute"
).split()

_CJK = list("公司发布了新的人工智能系统研究人员在大学进行了实验政府宣布新政策经济增长数据显示日本語の自然言語処理技術が進歩した한국어자연어처리기술")

_PUNCT_END = [".", ".", ".", ".", "!", "?", '."', ".'"]


def _english_line(rng: random.Random, max_bytes: int) -> str:
    words = []
    n = rng.randint(8, 18)
    for i in range(n):
        pool = _TOPIC if rng.random() < 0.35 else _COMMON
        w = rng.choice(pool)
        if i == 0:
            w = w.capitalize()
        elif rng.random() < 0.04:
            w = w.capitalize()
        if rng.random() < 0.06:
            w = w + ","
        if rng.random() < 0.05:
            w = str(rng.randint(0, 2100)) if rng.random() < 0.7 else f"{rng.random()*100:.1f}%"
        words.append(w)
    return (" ".join(words) + rng.choice(_PUNCT_END))[:max_bytes]


def _euro_line(rng: random.Random, max_bytes: int) -> str:
    pool = rng.choice([_GERMAN, _FRENCH, _SPANISH])
    n = rng.randint(7, 14)
    s = " ".join(rng.choice(pool) for _ in range(n))
    return (s[0].upper() + s[1:] + ".")


def _numeric_line(rng: random.Random, max_bytes: int) -> str:
    parts = []
    for _ in range(rng.randint(5, 10)):
        r = rng.random()
        if r < 0.3:
            parts.append(f"{rng.random()*1000:.2f}")
        elif r < 0.5:
            parts.append(f"${rng.randint(1, 999)},{rng.randint(100, 999)}")
        elif r < 0.7:
            parts.append(f"{rng.randint(1900, 2026)}")
        else:
            parts.append(rng.choice(_COMMON))
    return (" ".join(parts) + ".")[:max_bytes]


def _url_line(rng: random.Random, max_bytes: int) -> str:
    host = rng.choice(["example.com", "en.wikipedia.org", "github.io", "news.site.net"])
    path = "/".join(rng.choice(_TOPIC) for _ in range(rng.randint(1, 3)))
    s = f"See https://{host}/{path}?id={rng.randint(1, 9999)} and contact {rng.choice(_COMMON)}@{host} for details."
    return s[:max_bytes]


def _cjk_line(rng: random.Random, max_bytes: int) -> str:
    s = "".join(rng.choice(_CJK) for _ in range(rng.randint(8, 20)))
    if rng.random() < 0.3:
        s += " " + rng.choice(["🙂", "🚀", "②", "—"])
    return s


def corpus_lines(n: int, seed: int = 0, max_bytes: int = 120) -> list[bytes]:
    """n sentence-like lines, each at most max_bytes UTF-8 bytes."""
    rng = random.Random(seed)
    out = []
    gens = [
        (_english_line, 0.68),
        (_euro_line, 0.12),
        (_numeric_line, 0.10),
        (_url_line, 0.05),
        (_cjk_line, 0.05),
    ]
    for _ in range(n):
        r = rng.random()
        acc = 0.0
        for g, p in gens:
            acc += p
            if r < acc:
                line = g(rng, max_bytes)
                break
        else:
            line = _english_line(rng, max_bytes)
        b = line.encode("utf-8")
        while len(b) > max_bytes:  # truncate at a char boundary
            line = line[:-1]
            b = line.encode("utf-8")
        out.append(b)
    return out
