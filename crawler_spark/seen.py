"""URL-seen: partitioned bloom segments + exact anti-join.

The reference's URL-seen is one Clojure set on one heap
(``crawl.clj:125-129``) — at 10^10 URLs that is ~terabytes of strings.
Here membership is a two-stage structure (SURVEY.md §7 step 3):

* ``url_seen`` table ``(partition_id, url_hash, url)`` bucketed by
  ``partition_id = pmod(url_hash, n_buckets)``;
* one **bloom segment** (binary bitmap row) per bucket. Candidates are
  co-grouped with *their own segment only* (``cogroup`` on partition_id),
  so no node ever needs the whole filter — the full filter at 10^10 keys
  would be ~12 GB and unbroadcastable, but one segment is a few MB.
* Bloom negatives are **definitely new** and skip the expensive exact
  join entirely; bloom positives (true dups + false positives) go through
  an exact ``left_anti`` join on the bucketed table, which preserves the
  north_rule's *exact* URL-seen semantics — the bloom is only a traffic
  reducer for the anti-join shuffle.

Segments are OR-mergeable (bloom union property), so each epoch builds
bits only for its newly-enqueued rows and ORs them into the standing
segments — O(new) per epoch, not O(seen).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schema import BLOOM_SEGMENT_SCHEMA

BLOOM_K = 7  # hash probes per key


def bucket_expr(url_hash_col, n_buckets: int):
    return F.pmod(url_hash_col, F.lit(n_buckets)).cast("int")


def _positions(hashes: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, BLOOM_K) bit positions via double hashing h1 + i*h2."""
    h = hashes.astype(np.uint64)
    with np.errstate(over="ignore"):
        h2 = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        h2 = h2 ^ (h2 >> np.uint64(33))
        i = np.arange(BLOOM_K, dtype=np.uint64)[None, :]
        return ((h[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bits, pos >> 3, (np.uint8(1) << (pos & 7).astype(np.uint8)))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(n,k) positions → (n,) bool: all k bits set."""
    probe = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return probe.all(axis=1)


def build_segments(
    new_rows: DataFrame,
    existing_segments: DataFrame | None,
    m_bits: int,
) -> DataFrame:
    """Bloom bits for *new_rows* (url_seen-shaped), OR-merged with
    *existing_segments*. Runs one Arrow-vectorized task per bucket."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["partition_id"].iloc[0])
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        _set_bits(bits, _positions(pdf["url_hash"].to_numpy(np.int64), m_bits))
        return pd.DataFrame(
            {"partition_id": [pid], "bits": [bits.tobytes()], "n_items": [len(pdf)]}
        )

    fresh = new_rows.groupBy("partition_id").applyInPandas(build, BLOOM_SEGMENT_SCHEMA)
    if existing_segments is None:
        return fresh

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m_bits // 8, dtype=np.uint8)
        for b in pdf["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame(
            {
                "partition_id": [int(pdf["partition_id"].iloc[0])],
                "bits": [acc.tobytes()],
                "n_items": [int(pdf["n_items"].sum())],
            }
        )

    # touched-bucket-only maintenance: segments whose bucket has no
    # fresh rows pass through UNCHANGED (one broadcast anti-join on the
    # batch's distinct bucket ids) — only touched buckets enter the
    # Arrow merge stage. Merging ALL segments per epoch is O(total
    # filter bytes): a ~17 GB/epoch Python pass at 10^10 keys for a
    # quota-bounded batch that touches a handful of buckets.
    touched_ids = new_rows.select("partition_id").distinct()
    untouched = existing_segments.join(
        F.broadcast(touched_ids), "partition_id", "left_anti"
    )
    touched = existing_segments.join(
        F.broadcast(touched_ids), "partition_id", "left_semi"
    )
    merged = (
        touched.unionByName(fresh)
        .groupBy("partition_id")
        .applyInPandas(merge, BLOOM_SEGMENT_SCHEMA)
    )
    return untouched.unionByName(merged)


def _anti_join_scan_only(
    probe: DataFrame, url_seen: DataFrame, broadcast_probe: bool
) -> DataFrame:
    """Exact anti-join shaped so the 10^10-row seen table is only ever
    SCANNED, never shuffled: the batch-bounded probe side broadcasts into
    a left_semi over url_seen (streaming BroadcastHashJoin → the tiny hit
    set), then the probe anti-joins the broadcast hits. A plain
    ``probe.join(url_seen, ..., "left_anti")`` would shuffle the ENTIRE
    seen table every epoch — at 10^10 rows that one exchange dominates
    the job. broadcast_probe=False falls back to the shuffle join for
    pathological probe sizes (probe is quota-bounded in the engine, so
    the broadcast path is the default)."""
    keys = ["url_hash", "url"]
    if not broadcast_probe:
        return probe.join(url_seen.select(*keys), keys, "left_anti")
    hits = url_seen.select(*keys).join(
        F.broadcast(probe.select(*keys).distinct()), keys, "left_semi"
    )
    return probe.join(F.broadcast(hits), keys, "left_anti")


def anti_join_seen(
    candidates: DataFrame,
    url_seen: DataFrame,
    segments: DataFrame | None,
    m_bits: int,
    broadcast_probe: bool = True,
) -> DataFrame:
    """Rows of *candidates* whose url is NOT in *url_seen* (exact).

    candidates must carry (partition_id, url_hash, url). With segments,
    bloom-negative rows bypass the exact membership test entirely; bloom
    positives (true dups + false positives) go through the scan-only
    exact join. Without segments: every candidate probes.
    """
    if segments is None:
        return _anti_join_scan_only(candidates, url_seen, broadcast_probe)

    from pyspark.sql import types as T

    # NB: df.schema returns the live cached StructType — .add() would
    # mutate the input DataFrame's schema; build a fresh one instead.
    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
    )

    def flag(key, cand: pd.DataFrame, seg: pd.DataFrame) -> pd.DataFrame:
        if len(seg) == 0:
            cand = cand.copy()
            cand["maybe_seen"] = False
            return cand
        bits = np.frombuffer(seg["bits"].iloc[0], dtype=np.uint8)
        pos = _positions(cand["url_hash"].to_numpy(np.int64), m_bits)
        cand = cand.copy()
        cand["maybe_seen"] = _test_bits(bits, pos)
        return cand

    flagged = (
        candidates.groupBy("partition_id")
        .cogroup(segments.groupBy("partition_id"))
        .applyInPandas(flag, out_schema)
    )
    # both branches below reference this subtree — without materializing
    # it once, the Arrow cogroup (the per-epoch bloom probe) executes
    # TWICE per action (and 4x in redirect-closure epochs). Lazy local
    # checkpoint = cache on first use + lineage cut; the RDD-level blocks
    # are context-cleaned when the epoch's plan goes out of scope
    # (a plan-keyed .persist() here would leak one batch per epoch).
    flagged = flagged.localCheckpoint(eager=False)
    definite_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    survivors = _anti_join_scan_only(maybe, url_seen, broadcast_probe)
    return definite_new.unionByName(survivors)
