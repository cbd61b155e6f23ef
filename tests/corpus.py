"""Shared test corpus: diverse lines exercising tokenizer edge cases."""

from __future__ import annotations

import random

EDGE_CASES = [
    "hello world",
    "Hello, World!",
    " ",
    "  ",
    "\t\n  \t",
    "a",
    "I saw a girl with a \ttelescope.",
    "Sergei Alonichau I saw a girl with a \ttelescope.",
    "This is a test of the emergency broadcast system.",
    "don't can't won't it's",
    "3.14159 2,000,000 $5.99 100%",
    "e-mail user@example.com http://www.example.com/path?q=1",
    "naïve café résumé façade",
    "ÉPPLE Épple épple",
    "Привет мир",  # Cyrillic
    "你好世界",  # Chinese
    "こんにちは世界",  # Japanese
    "안녕하세요 세계",  # Korean
    "مرحبا بالعالم",  # Arabic
    "שלום עולם",  # Hebrew
    "Ελληνικά κείμενο",  # Greek
    "हिन्दी पाठ",  # Devanagari
    "🙂 emoji 🚀 test 🎉",
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝕞𝕒𝕥𝕙",  # SMP codepoints
    "mixed中文and English",
    "trailing space ",
    " leading space",
    "  double  spaces  everywhere  ",
    "hyphen-ated multi-word-token",
    "ALL CAPS TEXT HERE",
    "CamelCaseIdentifier snake_case_name kebab-case-name",
    "(parens) [brackets] {braces} <angles>",
    'quotes "double" \'single\' `back`',
    "semi;colon co:lon el...lipsis",
    "x y z　w",  # exotic whitespace
    "a▁b",  # literal U+2581 in input
    "▁",
    "ab\x01cd\x02ef",  # control chars
    "supercalifragilisticexpialidocious pneumonoultramicroscopicsilicovolcanoconiosis",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    "ab" * 100,
    "word " * 50,
    "ÃÂÃÂÃÂÃÂ",  # mojibake (common in gpt2 vocab)
    "1234567890" * 10,
    "!@#$%^&*()_+-=[]{}|;:,.<>?/~`",
    "\x7f\x7f",
    "Ｆｕｌｌｗｉｄｔｈ ｔｅｘｔ",
    "ǅungla ǈljubljana",  # titlecase digraphs
    "ﬁ ﬂ ﬀ ligatures",
    "ß ẞ İ ı",  # tricky case folds
    "é combining acute",
    "\x00embedded null",
]


def random_lines(n: int, seed: int = 0, max_len: int = 200) -> list[str]:
    """Random printable/unicode soup lines for fuzz parity."""
    rng = random.Random(seed)
    pools = [
        "abcdefghijklmnopqrstuvwxyz ABCDEFGHIJKLMNOPQRSTUVWXYZ  .,!?'\"-",
        "0123456789 +-*/=%$#@&",
        "αβγδε абвгд 中文字 ひらがな 한국어",
        " \t  　",
        "🙂🚀🎉𝔘𝕞",
    ]
    lines = []
    for _ in range(n):
        ln = rng.randint(1, max_len)
        parts = []
        while sum(len(p) for p in parts) < ln:
            pool = rng.choice(pools)
            k = rng.randint(1, 12)
            parts.append("".join(rng.choice(pool) for _ in range(k)))
        lines.append("".join(parts)[:max_len])
    return lines


def full_corpus(n_random: int = 300, seed: int = 0) -> list[str]:
    return EDGE_CASES + random_lines(n_random, seed=seed)
