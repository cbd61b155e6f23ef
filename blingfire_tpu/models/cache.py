"""Disk cache for densified model tables.

Parsing a packed .bin into dense tables (BFS state enumeration + comb table
packing) costs seconds in the host loader; production processes load models
often.  Densified results are content-addressed (sha1 of the .bin bytes +
format version) and memoized under $BLINGFIRE_TPU_CACHE
(~/.cache/blingfire_tpu by default).  The cache is a trusted local artifact
directory, equivalent to the reference's compiled .bin distribution model."""

from __future__ import annotations

import hashlib
import os
import pickle

CACHE_VERSION = 3


def cache_dir() -> str:
    d = os.environ.get("BLINGFIRE_TPU_CACHE")
    if not d:
        d = os.path.join(os.path.expanduser("~"), ".cache", "blingfire_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def content_key(data: bytes, tag: str = "") -> str:
    h = hashlib.sha1()
    h.update(f"v{CACHE_VERSION}:{tag}:".encode())
    h.update(data)
    return h.hexdigest()


def load(key: str):
    path = os.path.join(cache_dir(), key + ".pkl")
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception:
        return None


def store(key: str, obj) -> None:
    path = os.path.join(cache_dir(), key + ".pkl")
    tmp = path + f".tmp{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
