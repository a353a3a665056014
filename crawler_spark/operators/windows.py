"""Ranking / sampling window operators (SURVEY.md §2.5 W1-W7).

The reference implements all of these as sort + first/take on in-memory
seqs; here each is a window spec, so Spark executes them partition-
parallel per group with no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame, group_cols: list, order_cols: list, k: int = 1, rank_col: str = "rank"
) -> DataFrame:
    """W1/W7: best-k rows per group (rich_extractor.clj:124-131 top-score
    xpath; take 10/20 caps, rich_char_extractor.clj:320-326)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def min_numeric_pick(
    df: DataFrame, group_cols: list, text_col: str, rank_col: str = "rank"
) -> DataFrame:
    """W2: per group, the row whose text parses as the smallest integer —
    the reference's 'next page = smallest numeric anchor' rule
    (crawl.clj:361-380). Non-numeric rows are excluded."""
    numeric = df.filter(F.col(text_col).rlike("^[0-9]+$"))
    w = Window.partitionBy(*group_cols).orderBy(
        # try_cast: a >19-digit anchor text passes the digit regex but
        # overflows an ANSI-mode cast — rank it by text instead of dying
        F.col(text_col).try_cast("long").asc_nulls_last(), F.col(text_col).asc()
    )
    return numeric.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) == 1
    )


def above_mean_filter(
    df: DataFrame, group_cols: list, score_col: str, factor: float = 1.0
) -> DataFrame:
    """A7: keep rows with score ≥ factor · group mean (mean-richness
    threshold, rich_extractor.clj:146-156; leaf test uses factor=0.75)."""
    w = Window.partitionBy(*group_cols)
    return (
        df.withColumn("__mean", F.avg(score_col).over(w))
        .filter(F.col(score_col) >= F.lit(factor) * F.col("__mean"))
        .drop("__mean")
    )


def running_sum(df: DataFrame, group_cols: list, order_cols: list, value_col: str,
                out_col: str = "running") -> DataFrame:
    """W5 frame: cumulative sum over (unbounded preceding → current row),
    the normalized-score sampling accumulator (utils.clj:86-104)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def seeded_sample_per_group(
    df: DataFrame, group_cols: list, n: int, seed_cols: list, rank_col: str = "samp_rank"
) -> DataFrame:
    """W6: deterministic 'random' take-n per group — order by a hash of
    seed columns instead of rand() so oracle and engine agree
    (utils.clj:279-298 random-take, made reproducible per SURVEY §7)."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.xxhash64(*[F.col(c) for c in seed_cols]).asc()
    )
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= n)


def weighted_pick_per_group(
    df: DataFrame, group_cols: list, weight_col: str, seed_cols: list,
    hash_col: str | None = None,
) -> DataFrame:
    """W5: proportional-to-weight pick: u = hash-uniform in [0, total);
    winner = first row (in hash order) whose running weight exceeds u
    (utils.clj:86-104 sample-proportionally, deterministic).

    ``hash_col`` names a precomputed seed-hash column to use instead of
    ``xxhash64(seed_cols)`` — the oracled registry query passes an
    md5-based hash both engines can restate (DuckDB has no xxhash64).
    Hash ties break by the seed columns themselves, so the winner is
    deterministic even under hash collisions."""
    seed_hash = (
        F.col(hash_col) if hash_col
        else F.xxhash64(*[F.col(c) for c in seed_cols])
    )
    order = [seed_hash.asc()] + [F.col(c).asc() for c in seed_cols]
    w_run = (
        Window.partitionBy(*group_cols).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    d = (
        df.withColumn("__run", F.sum(weight_col).over(w_run))
        .withColumn("__tot", F.sum(weight_col).over(w_all))
        .withColumn(
            "__u",
            (F.pmod(F.min(seed_hash).over(w_all), F.lit(10**9))
             / F.lit(10**9)) * F.col("__tot"),
        )
        # all-zero-weight group: every __run == __u == 0, the strict
        # comparison matches nothing and the group would silently vanish
        # — the reference's sample always returns an element, so fall
        # back to the first row in hash order
        .withColumn(
            "__rk", F.row_number().over(Window.partitionBy(*group_cols).orderBy(*order))
        )
        .filter(
            (F.col("__run") > F.col("__u"))
            | ((F.col("__tot") == 0) & (F.col("__rk") == 1))
        )
        .drop("__rk")
    )
    # tie-break equal running sums (zero-weight rows after the crossing
    # point) by the same hash order — keeps the winner deterministic
    w_rank = Window.partitionBy(*group_cols).orderBy(F.col("__run").asc(), *order)
    return (
        d.withColumn("__rn", F.row_number().over(w_rank))
        .filter(F.col("__rn") == 1)
        .drop("__run", "__tot", "__u", "__rn")
    )
