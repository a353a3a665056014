"""Iceberg adapter: graceful degradation in this sandbox (no runtime
jars), explicit production path."""

import pytest

from crawler_spark.sources import iceberg


def test_unavailable_in_sandbox(spark):
    assert iceberg.iceberg_available(spark) is False


def test_create_raises_with_guidance(spark):
    with pytest.raises(RuntimeError, match="parquet snapshot protocol"):
        iceberg.create_state_tables(spark)


def test_ddl_carries_bucketing():
    assert "bucket(64, url_hash)" in iceberg.FRONTIER_DDL
    assert "PARTITIONED BY (partition_id)" in iceberg.URL_SEEN_DDL
