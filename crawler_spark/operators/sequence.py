"""Scalable global sequence assignment.

The reference gets insertion order for free from its sequential FIFO
(``crawl.clj:90,134,178``). A distributed engine must *specify* that
order (SURVEY.md §7 "hard parts"): here, a total order on unique
``order_cols`` becomes a contiguous int64 sequence without ever funneling
data through one partition:

1. ``repartitionByRange`` on the order columns (range partition ids are
   ordered, so partition p holds a contiguous slice of the total order);
2. count rows per partition (tiny aggregate) → per-partition offsets;
3. ``row_number`` windowed **per partition** (parallel, no global sort on
   a single reducer) + broadcast-joined offset.

The resulting sequence depends only on the total order, not on where the
range boundaries land — PROVIDED every consumer sees the same boundaries
as the counts job, which is why the partitioned batch is localCheckpoint
-frozen before offsets are baked (range sampling reseeds per execution).
This is the two-phase trick used by every distributed zip-with-index; at
10^10 rows nothing here exceeds per-partition work + one tiny aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__seq_pid"


def with_global_seq(
    df: DataFrame,
    order_cols: list,
    seq_col: str = "seq",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``seq_col`` = start, start+1, ... following the total order of
    *order_cols* (which must be unique per row)."""
    spark = df.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    d = df.repartitionByRange(parts, *[F.col(c) for c in order_cols]).withColumn(
        _PID, F.spark_partition_id()
    )
    # FREEZE the range partitioning before baking offsets from it:
    # RangePartitioner samples with a per-execution seed, so without
    # this the counts job and any later action could see DIFFERENT
    # boundaries — the stale offset map would then duplicate/skip seqs.
    # localCheckpoint materializes the partitioned batch once; every
    # consumer (counts, the window below, all downstream state tables)
    # reads that same frozen layout.
    d = d.localCheckpoint(eager=True)
    counts = d.groupBy(_PID).count().collect()
    offsets, acc = {}, start
    for row in sorted(counts, key=lambda r: r[_PID]):
        offsets[row[_PID]] = acc
        acc += row["count"]
    offmap = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = Window.partitionBy(_PID).orderBy(*[F.col(c) for c in order_cols])
    return (
        d.withColumn(seq_col, F.row_number().over(w) - 1 + offmap[F.col(_PID)])
        .withColumn(seq_col, F.col(seq_col).cast("long"))
        .drop(_PID)
    )
