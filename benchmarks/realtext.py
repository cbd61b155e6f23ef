"""Real (non-synthetic) benchmark corpus, assembled from the reference
repository's own text: READMEs, docs, and the xlnet SentencePiece dictionary
(real tokens with heavy Unicode).  VERDICT r3 weak #7: synthetic Zipf text
flatters the dedup ratio; this corpus has far lower redundancy.
"""

from __future__ import annotations

import glob
import os

_REF = "/root/reference"


def real_lines(max_bytes: int = 3 << 20) -> list[bytes]:
    """Deterministic list of real text lines (UTF-8 bytes), ~max_bytes total."""
    files: list[str] = [os.path.join(_REF, "README.md")]
    files += sorted(glob.glob(os.path.join(_REF, "doc", "*.txt")))
    files += sorted(glob.glob(os.path.join(_REF, "ldbsrc", "*", "README.TXT")))
    files += sorted(glob.glob(os.path.join(_REF, "nuget", "**", "*.md"),
                              recursive=True))
    # real vocabulary text: one line per sentencepiece entry (token \t id \t p)
    files.append(os.path.join(_REF, "ldbsrc", "xlnet", "pos.dict.utf8"))
    out: list[bytes] = []
    total = 0
    for f in files:
        try:
            data = open(f, "rb").read()
        except OSError:
            continue
        for ln in data.split(b"\n"):
            ln = ln.strip()
            if not ln:
                continue
            out.append(ln)
            total += len(ln)
            if total >= max_bytes:
                return out
    return out
