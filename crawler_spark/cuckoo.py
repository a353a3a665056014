"""Partitioned cuckoo-filter URL-seen segments (the north_rule's
"bloom/cuckoo" alternative to ``seen.py``'s bloom).

Same two-stage architecture as the bloom path — one filter segment per
``partition_id`` bucket, candidates co-grouped with their own segment
only, filter positives verified by the exact scan-only anti-join — so
membership stays EXACT and no node ever holds the whole filter. What the
cuckoo variant adds over bloom:

* **deletion**: a fingerprint can be removed (bloom bits cannot be
  unset), which is what a recrawl/TTL-expiry path needs — expire a URL
  and it becomes fetchable again without rebuilding the filter;
* bounded, slot-addressed storage (4 × uint16 fingerprints per bucket ≈
  8 bits/key at 95% load vs the bloom's ~13 bits/key for the same FPR
  class).

Insertion is the *deterministic bounded-round* variant of partial-key
cuckoo hashing (Fan et al., "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT'14): each key has two candidate buckets
(``i2 = i1 XOR H(fp)``); each round tries to place still-homeless keys
into free slots of their current candidate (vectorized: one
first-per-bucket scatter per slot lane), then switches them to the
alternate bucket. Keys still homeless after the round budget go to an
explicit overflow **stash** checked on lookup — no random-walk eviction,
no RNG, so segment content is a pure function of the inserted key set
(order-insensitive within a batch by construction of the scatter), which
the engine's determinism guarantees rely on. All hot-path math is
numpy over Arrow batches; no per-row Python.

Segment wire format (the ``bits`` binary column of
``BLOOM_SEGMENT_SCHEMA``): ``b"CKF1" | n_buckets u32le | stash_len u32le
| slots uint16le[n_buckets*4] | stash uint16le[stash_len]``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schema import BLOOM_SEGMENT_SCHEMA

MAGIC = b"CKF1"
SLOTS = 4  # fingerprints per bucket
MAX_ROUNDS = 16


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    """Nonzero 16-bit fingerprints (0 marks an empty slot)."""
    fp = (hashes.astype(np.uint64) >> np.uint64(48)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _i1(hashes: np.ndarray, n_buckets: int) -> np.ndarray:
    return (hashes.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)


def _alt(bucket: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """i XOR H(fp) — n_buckets must be a power of two so XOR stays in
    range (asserted at encode time)."""
    with np.errstate(over="ignore"):
        h = fp.astype(np.uint64) * np.uint64(0x5BD1E9955BD1E995)
        h ^= h >> np.uint64(47)
    return (bucket ^ (h % np.uint64(n_buckets)).astype(np.int64)) & (n_buckets - 1)


def empty_segment(n_buckets: int) -> tuple:
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    return np.zeros((n_buckets, SLOTS), dtype=np.uint16), np.zeros(0, np.uint16)


def encode_segment(slots: np.ndarray, stash: np.ndarray) -> bytes:
    n_buckets = slots.shape[0]
    return (
        MAGIC
        + int(n_buckets).to_bytes(4, "little")
        + int(len(stash)).to_bytes(4, "little")
        + slots.astype("<u2").tobytes()
        + stash.astype("<u2").tobytes()
    )


def decode_segment(blob: bytes) -> tuple:
    if blob[:4] != MAGIC:
        raise ValueError("not a cuckoo segment")
    n_buckets = int.from_bytes(blob[4:8], "little")
    stash_len = int.from_bytes(blob[8:12], "little")
    off = 12
    slots = np.frombuffer(
        blob[off : off + n_buckets * SLOTS * 2], dtype="<u2"
    ).reshape(n_buckets, SLOTS).copy()
    off += n_buckets * SLOTS * 2
    stash = np.frombuffer(blob[off : off + stash_len * 2], dtype="<u2").copy()
    return slots, stash


def insert(slots: np.ndarray, stash: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Insert all *hashes*; returns the (possibly grown) stash. Mutates
    *slots* in place. Deterministic: keys are processed in sorted
    (hash) order so batch composition, not arrival order, decides
    placement."""
    n_buckets = slots.shape[0]
    order = np.argsort(hashes, kind="stable")
    hs = hashes[order]
    fp = _fingerprints(hs)
    b1 = _i1(hs, n_buckets)
    cur = b1.copy()
    pending = np.ones(len(hs), dtype=bool)
    for _round in range(MAX_ROUNDS):
        if not pending.any():
            break
        for s in range(SLOTS):
            idx = np.flatnonzero(pending)
            if len(idx) == 0:
                break
            tgt = cur[idx]
            free = slots[tgt, s] == 0
            # first pending key per distinct free bucket wins this lane
            tgt_free = tgt[free]
            idx_free = idx[free]
            _uniq, first = np.unique(tgt_free, return_index=True)
            slots[tgt_free[first], s] = fp[idx_free[first]]
            pending[idx_free[first]] = False
        # homeless keys try their alternate bucket next round
        idx = np.flatnonzero(pending)
        cur[idx] = _alt(cur[idx], fp[idx], n_buckets)
    if pending.any():
        stash = np.concatenate([stash, fp[pending]])
    return stash


def lookup(slots: np.ndarray, stash: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    n_buckets = slots.shape[0]
    fp = _fingerprints(hashes)
    b1 = _i1(hashes, n_buckets)
    b2 = _alt(b1, fp, n_buckets)
    hit = (slots[b1] == fp[:, None]).any(axis=1)
    hit |= (slots[b2] == fp[:, None]).any(axis=1)
    if len(stash):
        hit |= np.isin(fp, stash)
    return hit


def delete(slots: np.ndarray, stash: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Remove one stored occurrence per hash (the cuckoo capability bloom
    lacks). Returns the new stash; mutates *slots*. Deleting a key that
    was never inserted may evict a fingerprint-colliding key — standard
    cuckoo-filter contract: only delete what you inserted."""
    n_buckets = slots.shape[0]
    fp = _fingerprints(hashes)
    b1 = _i1(hashes, n_buckets)
    b2 = _alt(b1, fp, n_buckets)
    done = np.zeros(len(hashes), dtype=bool)
    for bucket in (b1, b2):
        for s in range(SLOTS):
            idx = np.flatnonzero(~done & (slots[bucket, s] == fp))
            if len(idx) == 0:
                continue
            tgt = bucket[idx]
            # one deletion per slot cell: first claimant per bucket wins
            _uniq, first = np.unique(tgt, return_index=True)
            slots[tgt[first], s] = 0
            done[idx[first]] = True
    rest = fp[~done]
    if len(rest) and len(stash):
        keep = np.ones(len(stash), dtype=bool)
        for f in rest:  # stash is tiny (overflow only)
            cand = np.flatnonzero(keep & (stash == f))
            if len(cand):
                keep[cand[0]] = False
        stash = stash[keep]
    return stash


def build_cuckoo_segments(
    new_rows: DataFrame,
    existing_segments: DataFrame | None,
    n_buckets: int,
) -> DataFrame:
    """Cuckoo segments for *new_rows* (url_seen-shaped: partition_id,
    url_hash, ...), merged into *existing_segments*. One Arrow task per
    bucket; merging decodes the standing segment and inserts only the
    new fingerprints — O(new) per epoch like the bloom OR-merge."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["partition_id"].iloc[0])
        slots, stash = empty_segment(n_buckets)
        stash = insert(slots, stash, pdf["url_hash"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "partition_id": [pid],
                "bits": [encode_segment(slots, stash)],
                "n_items": [len(pdf)],
            }
        )

    if existing_segments is None:
        return new_rows.groupBy("partition_id").applyInPandas(
            build, BLOOM_SEGMENT_SCHEMA
        )

    def merge(key, new: pd.DataFrame, seg: pd.DataFrame) -> pd.DataFrame:
        if len(seg) == 0:
            if len(new) == 0:  # unreachable via cogroup; typed for safety
                return pd.DataFrame(
                    {
                        "partition_id": pd.Series([], dtype="int32"),
                        "bits": pd.Series([], dtype=object),
                        "n_items": pd.Series([], dtype="int64"),
                    }
                )
            return build(new)
        slots, stash = decode_segment(bytes(seg["bits"].iloc[0]))
        n = int(seg["n_items"].iloc[0])
        if len(new):
            stash = insert(slots, stash, new["url_hash"].to_numpy(np.int64))
            n += len(new)
        return pd.DataFrame(
            {
                "partition_id": [int(key[0])],
                "bits": [encode_segment(slots, stash)],
                "n_items": [n],
            }
        )

    return (
        new_rows.groupBy("partition_id")
        .cogroup(existing_segments.groupBy("partition_id"))
        .applyInPandas(merge, BLOOM_SEGMENT_SCHEMA)
    )


def delete_from_cuckoo_segments(
    segments: DataFrame,
    expired_rows: DataFrame,
) -> DataFrame:
    """Remove the fingerprints of *expired_rows* (url_seen-shaped:
    partition_id, url_hash) from their segments — the deletion capability
    the engine's TTL-recrawl path needs and bloom bitmaps cannot offer.
    Segments with no expired rows pass through byte-identical; the whole
    operation is O(expired) like the insert merge."""

    def dele(key, rows: pd.DataFrame, seg: pd.DataFrame) -> pd.DataFrame:
        if len(seg) == 0:  # expired rows for a bucket with no segment
            return pd.DataFrame(
                {
                    "partition_id": pd.Series([], dtype="int32"),
                    "bits": pd.Series([], dtype=object),
                    "n_items": pd.Series([], dtype="int64"),
                }
            )
        blob = bytes(seg["bits"].iloc[0])
        n = int(seg["n_items"].iloc[0])
        if len(rows) == 0:
            return pd.DataFrame(
                {"partition_id": [int(key[0])], "bits": [blob], "n_items": [n]}
            )
        slots, stash = decode_segment(blob)
        stash = delete(slots, stash, rows["url_hash"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "partition_id": [int(key[0])],
                "bits": [encode_segment(slots, stash)],
                "n_items": [max(0, n - len(rows))],
            }
        )

    return (
        expired_rows.groupBy("partition_id")
        .cogroup(segments.groupBy("partition_id"))
        .applyInPandas(dele, BLOOM_SEGMENT_SCHEMA)
    )


def cuckoo_anti_join_seen(
    candidates: DataFrame,
    url_seen: DataFrame,
    segments: DataFrame | None,
    broadcast_probe: bool = True,
) -> DataFrame:
    """Drop-in twin of ``seen.anti_join_seen`` backed by cuckoo segments:
    filter-negative rows are definitely new and skip the exact join;
    positives verify exactly. Membership semantics stay exact."""
    from .seen import _anti_join_scan_only

    if segments is None:
        return _anti_join_scan_only(candidates, url_seen, broadcast_probe)

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
    )

    def flag(key, cand: pd.DataFrame, seg: pd.DataFrame) -> pd.DataFrame:
        cand = cand.copy()
        if len(seg) == 0:
            cand["maybe_seen"] = False
            return cand
        slots, stash = decode_segment(bytes(seg["bits"].iloc[0]))
        cand["maybe_seen"] = lookup(
            slots, stash, cand["url_hash"].to_numpy(np.int64)
        )
        return cand

    flagged = (
        candidates.groupBy("partition_id")
        .cogroup(segments.groupBy("partition_id"))
        .applyInPandas(flag, out_schema)
    )
    flagged = flagged.localCheckpoint(eager=False)
    definite_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    survivors = _anti_join_scan_only(maybe, url_seen, broadcast_probe)
    return definite_new.unionByName(survivors)
