"""Sources & sinks (SURVEY.md §2.1 S1-S9 mapped to Spark readers/writers).

Reference persistence is pretty-printed EDN text re-read with
``clojure.core/read`` (``model.clj:13-16``, ``main.clj:40-85``) — an
unsplittable single-file format. Here everything is columnar:

* S4/S5 (.state/.model/.corpus files) → parquet snapshot tables
  (engine.py handles the commit protocol; Iceberg on a real cluster);
* S6 (corpus→JSON, ``corpus.clj:82-90``) → ``write_corpus_json``;
* S7 (gzip text sink, ``misc.clj:27-32``) → parquet+zstd, free;
* S8 (line-file URL seed lists, ``misc.clj:13-25``) → ``read_seed_list``.

S1-S3 (live HTTP fetch + cache) have no sandbox equivalent: fetch is the
corpus-lookup join (SURVEY.md §2.1), the cache IS the corpus table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_seed_list(spark: SparkSession, path: str) -> DataFrame:
    """One URL per line; blank lines and #-comments skipped; returns
    (url, ord) preserving file order (oracle needs seed order)."""
    from pyspark.sql import Window

    lines = spark.read.text(path).select(F.trim("value").alias("url"))
    lines = lines.filter((F.col("url") != "") & ~F.col("url").startswith("#"))
    w = Window.orderBy(F.monotonically_increasing_id())
    return lines.withColumn("ord", F.row_number().over(w) - 1)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Driver-provided parquet tables (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite",
                partition_by: list | None = None, compression: str = "zstd") -> None:
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    getattr(w, fmt)(path)


def write_corpus_json(df: DataFrame, path: str) -> None:
    """S6: corpus → JSON lines (zstd), binary columns hex-encoded so the
    output is valid JSON."""
    cols = []
    for f_ in df.schema.fields:
        if f_.dataType.simpleString() == "binary":
            cols.append(F.hex(F.col(f_.name)).alias(f_.name))
        else:
            cols.append(F.col(f_.name))
    df.select(*cols).write.mode("overwrite").option("compression", "gzip").json(path)
