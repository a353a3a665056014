"""Hashing used across the engine, oracle and tests.

The engine hashes URLs **JVM-side** with ``F.xxhash64`` (whole-stage
codegen, no Python round-trip) — at 10^10 frontier rows a Python hash
would dominate the epoch. The sequential single-node oracle
(:mod:`crawler_spark.oracle`) must produce bit-identical hashes, so this
module carries a pure-Python XXH64 implementation with Spark's fixed
seed (42). ``test_hashing.py`` locks the two together.

Reference analog: the reference keeps raw URL strings in a Clojure set
(``crawl.clj:125-129``); hashing to int64 is what makes the membership
structure shardable at 10^10 scale (SURVEY.md §1.1 "visited set").
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = 0xFFFFFFFFFFFFFFFF

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    acc = _rotl(acc, 31)
    return (acc * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _MASK


def xxhash64(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Canonical XXH64 over *data*; defaults to Spark's seed (42).

    Returns the value as a **signed** int64 to match Spark's LongType.
    """
    n = len(data)
    idx = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while idx + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[idx : idx + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[idx + 8 : idx + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[idx + 16 : idx + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[idx + 24 : idx + 32], "little"))
            idx += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while idx + 8 <= n:
        h ^= _round(0, int.from_bytes(data[idx : idx + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _MASK
        idx += 8
    if idx + 4 <= n:
        h ^= (int.from_bytes(data[idx : idx + 4], "little") * _P1) & _MASK
        h = ((_rotl(h, 23) * _P2) + _P3) & _MASK
        idx += 4
    while idx < n:
        h ^= (data[idx] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        idx += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def url_hash(url: str) -> int:
    """Oracle-side hash of one URL == Spark ``F.xxhash64(url)``."""
    return xxhash64(url.encode("utf-8"))


def mix64(x: int) -> int:
    """splitmix64 finalizer — deterministic integer mixing used by the
    synthetic-web generator (pure function of ids, SURVEY.md §7 step 1).
    Kept simple enough to restate in ANSI SQL for the DuckDB oracle."""
    x &= _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)
