"""Driver contract for the crawler_spark engine.

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2; ``oracle_sql()`` carries the DuckDB-runnable ANSI-SQL
equivalent (same aliases, same rounding) for the side-by-side
correctness gate. Crawl-graph operators run over a deterministic
synthetic link graph derived *inside the query* from the ``documents``
table by pure integer arithmetic, so the SQL oracle sees the identical
graph (20 hosts, 4 links/page incl. a boilerplate home link, planted
javascript/nofollow/digit-anchor links).

Conventions keeping the two engines hash-identical:
* every float output is ``round(x, 4)`` (or money as integer cents);
* string→int hashing is first-15-hex-chars-of-md5 (``conv`` in Spark,
  ``('0x'||…)::BIGINT`` in DuckDB) — no engine-private hash functions;
* ranking ties always broken by an id column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_HOSTS = 20

# ---------------------------------------------------------------------------
# shared synthetic crawl graph over `documents` (Spark side)
# ---------------------------------------------------------------------------


def _read(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _url_expr(tgt, tgt_host):
    return F.concat(
        F.lit("http://host"), tgt_host.cast("string"), F.lit(".test/p/"), tgt.cast("string")
    )


def _links_df(spark, sf_dir: str) -> DataFrame:
    """Synthetic out-link table: (doc_id, src_host, j, tgt, tgt_host,
    is_js, nofollow, text, xpath, href). Pure arithmetic on doc_id —
    restated 1:1 in SQL by _LINKS_CTE."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    j = F.explode(F.array(*[F.lit(x) for x in range(4)])).alias("j")
    d = docs.select("doc_id", j)
    tgt = F.when(F.col("j") == 3, F.col("doc_id") % N_HOSTS).otherwise(
        (F.col("doc_id") * (F.col("j") + 2) + 7 * F.col("j") + 1) % n
    )
    out = d.select(
        "doc_id",
        (F.col("doc_id") % N_HOSTS).alias("src_host"),
        "j",
        tgt.cast("long").alias("tgt"),
    )
    out = out.withColumn("tgt_host", F.col("tgt") % N_HOSTS)
    out = out.withColumn(
        "is_js",
        (F.col("j") < 3) & ((F.col("doc_id") * 7 + F.col("j")) % 13 == 0),
    ).withColumn(
        "nofollow",
        (F.col("j") < 3) & ((F.col("doc_id") * 3 + F.col("j")) % 11 == 0),
    )
    out = out.withColumn(
        "text",
        F.when(
            (F.col("doc_id") + F.col("j")) % 6 == 0,
            ((F.col("doc_id") * 5 + F.col("j")) % 20 + 1).cast("string"),
        ).otherwise(F.concat(F.lit("w"), ((F.col("doc_id") + F.col("j")) % 50).cast("string"))),
    ).withColumn(
        "xpath",
        F.when(F.col("j") == 3, F.lit("xpnav")).otherwise(
            F.concat(F.lit("xp"), ((F.col("doc_id") * 2 + F.col("j")) % 4).cast("string"))
        ),
    )
    return out.withColumn("href", _url_expr(F.col("tgt"), F.col("tgt_host")))


_LINKS_CTE = f"""
links AS (
  SELECT d.doc_id,
         d.doc_id % {N_HOSTS} AS src_host,
         j.j,
         CAST(CASE WHEN j.j = 3 THEN d.doc_id % {N_HOSTS}
              ELSE (d.doc_id * (j.j + 2) + 7 * j.j + 1) % (SELECT count(*) FROM documents)
              END AS BIGINT) AS tgt,
         CAST(CASE WHEN j.j = 3 THEN d.doc_id % {N_HOSTS}
              ELSE (d.doc_id * (j.j + 2) + 7 * j.j + 1) % (SELECT count(*) FROM documents)
              END AS BIGINT) % {N_HOSTS} AS tgt_host,
         (j.j < 3 AND (d.doc_id * 7 + j.j) % 13 = 0) AS is_js,
         (j.j < 3 AND (d.doc_id * 3 + j.j) % 11 = 0) AS nofollow,
         CASE WHEN (d.doc_id + j.j) % 6 = 0
              THEN CAST((d.doc_id * 5 + j.j) % 20 + 1 AS VARCHAR)
              ELSE 'w' || CAST((d.doc_id + j.j) % 50 AS VARCHAR) END AS text,
         CASE WHEN j.j = 3 THEN 'xpnav'
              ELSE 'xp' || CAST((d.doc_id * 2 + j.j) % 4 AS VARCHAR) END AS xpath
  FROM documents d, (VALUES (0), (1), (2), (3)) j(j)
),
links2 AS (
  SELECT *, 'http://host' || CAST(tgt_host AS VARCHAR) || '.test/p/' || CAST(tgt AS VARCHAR) AS href
  FROM links
)
"""

# text normalization shared by dedup/textstats oracles (must mirror
# crawler_spark.operators.dedup.normalize_text exactly; 'g' = global)
_NORM = (
    r"trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', ' ', 'g'), '\s+', ' ', 'g'))"
)
_H61 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"

_SHINGLES_CTE = f"""
norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
toks AS (SELECT doc_id, string_split(t, ' ') AS ts FROM norm),
sh AS (SELECT DISTINCT doc_id, ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS s
       FROM toks JOIN generate_series(0, 2000) g(i) ON i <= len(ts) - 4)
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _cents(col):
    return F.round(col * 100).cast("long")


def q_pricing_summary(spark, sf_dir):
    """A2/A3 analog — TPC-H Q1-style pricing summary."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_cents"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_price_cents"),
            F.round(F.avg("l_discount") * 10000).cast("long").alias("avg_disc_fp"),
            F.count("*").alias("n_rows"),
        )
    )


def q_join_agg(spark, sf_dir):
    """J2 hash-lookup join: orders ⋈ customer → per-segment totals."""
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).alias("sum_price_cents"),
        )
    )


def q_anti_join(spark, sf_dir):
    """J1 anti-join: customers with no order above 400k (a plain
    customers-without-orders anti-join is vacuously empty in this data
    — every customer has orders)."""
    o = _read(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = _read(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


def q_semi_join(spark, sf_dir):
    """J3 semi-join: parts referenced by at least one lineitem."""
    p = _read(spark, sf_dir, "part")
    li = _read(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select("p_partkey", "p_brand")


def q_top_order_per_customer(spark, sf_dir):
    """W1 top-1 per group."""
    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", _cents(F.col("o_totalprice")).alias("top_price_cents"))
    )


def q_topk_lineitems(spark, sf_dir):
    """W7 take-k caps: top-3 lineitems per order by price (orders < 500)."""
    li = _read(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("l_orderkey", "l_linenumber", "rnk")
    )


def q_running_sum(spark, sf_dir):
    """W5 running-sum frame over events (users < 50)."""
    ev = _read(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


def q_mean_variance(spark, sf_dir):
    """A5 mean·variance score per group."""
    li = _read(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.avg("l_quantity"), 4).alias("mean_qty"),
        F.round(F.var_pop("l_quantity"), 4).alias("var_qty"),
        F.round(F.avg("l_quantity") * F.var_pop("l_quantity"), 2).alias("score"),
    )


def q_above_mean(spark, sf_dir):
    """A7 mean-richness filter: orders ≥ their customer's mean price."""
    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("m", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") >= F.col("m"))
        .select("o_orderkey")
    )


def q_count_ranked(spark, sf_dir):
    """A11 cluster-size ranks: orders per priority."""
    o = _read(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(F.count("*").alias("n"))


def q_first_event_per_user(spark, sf_dir):
    """P11 distinct-by: earliest event per user."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id")
    )


def q_tumbling_hourly(spark, sf_dir):
    """Event-time tumbling window agg (streaming twin in streaming/)."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "win_start"
        ),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias("sum_value_fp"),
    )


def q_stream_tumbling_hourly(spark, sf_dir):
    """§2.10 driver-oracled THROUGH Structured Streaming: the same
    hourly tumbling aggregate as tumbling_hourly, but executed as a real
    streaming query (parquet file source → window() agg → memory sink,
    Trigger.AvailableNow). Complete output mode makes every window emit
    deterministically regardless of watermark progress, so the batch
    DuckDB oracle hashes it exactly. Reference: the loop-state counters
    of crawl.clj:323 as a continuous query."""
    import os
    import shutil
    import tempfile
    import uuid

    from crawler_spark.streaming.frontier_stream import stream_tumbling_hourly

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # the file-stream source wants a directory (basePath), so stage the
    # events data into scratch — on a cluster this would be the landing
    # directory new fetch-result files arrive in. Handles both a single
    # parquet file and a directory-style dataset; the staging dir is
    # removed once the AvailableNow trigger drains (the memory sink
    # holds the result, the source is no longer read).
    stage = tempfile.mkdtemp(prefix="stream_events_")
    try:
        if os.path.isdir(path):
            for part in os.listdir(path):
                if part.endswith(".parquet"):
                    shutil.copy(os.path.join(path, part), stage)
        else:
            shutil.copy(path, stage)
        src = spark.readStream.schema(schema).parquet(stage)
        name = "stream_hourly_" + uuid.uuid4().hex[:8]
        q = (
            stream_tumbling_hourly(src)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return spark.table(name)


def q_stream_politeness_throttle(spark, sf_dir):
    """§2.10 custom stateful operator DRIVER-ORACLED through a REAL
    streaming execution: the applyInPandasWithState per-host token
    bucket drains the events table (one AvailableNow batch, quota 5 per
    host, FIFO by event_id) — the released set is exactly the first 5
    urls per host, which DuckDB states as a quota window. The multi-
    trigger timeout/backlog behavior keeps its pytest gate
    (tests/test_streaming.py)."""
    import os
    import shutil
    import tempfile
    import uuid

    from crawler_spark.streaming.frontier_stream import (
        stream_politeness_throttle,
    )

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stage = tempfile.mkdtemp(prefix="stream_throttle_")
    try:
        if os.path.isdir(path):
            for part in os.listdir(path):
                if part.endswith(".parquet"):
                    shutil.copy(os.path.join(path, part), stage)
        else:
            shutil.copy(path, stage)
        src = spark.readStream.schema(schema).parquet(stage)
        urls = src.select(
            F.concat(
                F.lit("host"), (F.col("user_id") % N_HOSTS).cast("string")
            ).alias("host"),
            F.concat(
                F.lit("http://host"),
                (F.col("user_id") % N_HOSTS).cast("string"),
                F.lit(".test/e/"),
                F.col("event_id").cast("string"),
            ).alias("url"),
            "event_id",
        )
        name = "stream_throttle_" + uuid.uuid4().hex[:8]
        q = (
            stream_politeness_throttle(
                urls, quota_per_trigger=5, drain_interval_ms=None,
                order_col="event_id",
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return spark.table(name)


def q_stream_seen_dedup(spark, sf_dir):
    """§2.10 streaming URL-seen with a WATERMARK TTL, driver-oracled
    through a REAL multi-batch streaming run: four staged files drain
    one-per-trigger (maxFilesPerTrigger=1, ascending mtimes → pinned
    batch order), and `stream_seen_dedup` must (a) collapse identical
    intra-batch duplicates, (b) drop cross-batch re-arrivals while the
    key's state lives, (c) drop too-late rows (t + delay ≤ operator
    watermark), and (d) RE-ADMIT a url once the watermark passes
    first_seen + delay — the streaming twin of the batch engine's TTL
    recrawl. The event lattice (10 urls × 4 batches, times chosen so
    every rule fires non-vacuously, incl. the one-batch eviction lag:
    batch 2's dups are dropped even though batch 1's watermark already
    passed their expiry, and batch 3 re-admits) is a pure integer
    formula; DuckDB restates the committed-watermark sequence and the
    unrolled microbatch recurrence. A wrong dedup, a missed late
    filter, an early/late eviction, or a scrambled batch order all
    break the hash."""
    import os
    import shutil
    import tempfile
    import uuid

    from crawler_spark.streaming.frontier_stream import stream_seen_dedup

    def batch_rows(b):
        rows = []
        for u in range(10):
            if b == 0:
                ts = [100 + u, 100 + u]  # identical intra-batch dup
            elif b == 1:
                # dup re-arrivals; u=9 is the watermark advancer (t=500)
                t = 200 + u if u < 5 else (500 if u == 9 else 210 + u)
                ts = [t, t]
            elif b == 2:
                ts = [600 + u, 600 + u]  # evicted only at END of this batch
            else:
                ts = [700 + u, 300 + u]  # re-admit + a too-late straggler
            rows.extend((f"u{u}", t) for t in ts)
        return rows

    stage = tempfile.mkdtemp(prefix="stream_seen_")
    try:
        for b in range(4):
            df = spark.createDataFrame(
                batch_rows(b), "url string, t long"
            ).withColumn(
                "event_time", F.timestamp_seconds(F.col("t") + 1_000_000)
            )
            tmp = tempfile.mkdtemp()
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(
                p for p in os.listdir(tmp) if p.endswith(".parquet")
            )
            dst = os.path.join(stage, f"b{b}.parquet")
            shutil.copy(os.path.join(tmp, part), dst)
            os.utime(dst, (1000.0 * (b + 1), 1000.0 * (b + 1)))
            shutil.rmtree(tmp, ignore_errors=True)
        src = (
            spark.readStream.schema(
                "url string, t long, event_time timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        name = "stream_seen_" + uuid.uuid4().hex[:8]
        q = (
            stream_seen_dedup(src, delay="60 seconds")
            .select("url", "t")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return spark.table(name)


def q_json_props(spark, sf_dir):
    """Semi-structured column handling: parse events.props JSON, bucket
    by its 'k' field (the schemaless-map part of the reference's data
    model, SURVEY.md §1.2, as JSON-string columns)."""
    ev = _read(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy((k % 10).alias("k_bucket")).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias("sum_value_fp"),
    )


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30 min) per user: session count + events."""
    from crawler_spark.operators.sessionize import sessionize

    ev = _read(spark, sf_dir, "events")
    s = sessionize(ev)
    return s.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"), F.count("*").alias("n_events")
    )


def q_token_counts(spark, sf_dir):
    from crawler_spark.operators.textstats import token_count

    d = _read(spark, sf_dir, "documents")
    return token_count(d, "text", "doc_id").select(
        F.col("id").alias("doc_id"), "n_tokens", "n_subwords", "n_chars_raw"
    )


def q_text_quality(spark, sf_dir):
    from crawler_spark.operators.textstats import quality_score

    d = _read(spark, sf_dir, "documents")
    q = quality_score(d, "text", "doc_id")
    return q.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        F.round("punct_ratio", 4).alias("punct_ratio"),
        F.round("stop_ratio", 4).alias("stop_ratio"),
        F.round("quality", 4).alias("quality"),
    )


def q_lang_id(spark, sf_dir):
    from crawler_spark.operators.textstats import lang_id

    d = _read(spark, sf_dir, "documents")
    return lang_id(d, "text", "doc_id").select(F.col("id").alias("doc_id"), "pred_lang")


def q_doc_fingerprint(spark, sf_dir):
    from crawler_spark.operators.textstats import doc_fingerprint

    d = _read(spark, sf_dir, "documents")
    return doc_fingerprint(d, "text", "doc_id").select(
        F.col("id").alias("doc_id"), "fingerprint"
    )


def q_dedup_exact(spark, sf_dir):
    from crawler_spark.operators.dedup import exact_dedup

    d = _read(spark, sf_dir, "documents")
    return exact_dedup(d, "text", "doc_id").select(F.col("id").alias("doc_id"), "dup_of")


def q_ngram_jaccard(spark, sf_dir):
    """df_cap=3 is deliberately BELOW this corpus's max shingle document
    frequency (4), so the hot-shingle guard — the thing that stops one
    boilerplate shingle on 10⁶ docs from creating 10¹² join rows at scale
    — is actually exercised and restated in the oracle, not a no-op."""
    from crawler_spark.operators.dedup import ngram_jaccard_pairs

    d = _read(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(d, "text", "doc_id", threshold=0.2, df_cap=3)
    return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def q_minhash_signatures(spark, sf_dir):
    from crawler_spark.operators.dedup import minhash_signatures

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return minhash_signatures(d, "text", "doc_id", num_hashes=8).select(
        F.col("id").alias("doc_id"), "hash_idx", "minhash"
    )


def q_simhash(spark, sf_dir):
    from crawler_spark.operators.dedup import simhash

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return simhash(d, "text", "doc_id", bits=16).select(
        F.col("id").alias("doc_id"), "simhash"
    )


def q_phash_neardup(spark, sf_dir):
    """Banded phash Hamming pairs vs brute-force SQL oracle — cross-checks
    the pigeonhole banding. Synthetic structured phash from doc_id."""
    from crawler_spark.operators.dedup import phash_neardup_pairs

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    base = F.col("doc_id") % 40
    ph = (base * F.lit(1 << 20) + base * base).cast("long")
    df = d.select("doc_id", ph.alias("ph"))
    return phash_neardup_pairs(df, "ph", "doc_id", max_hamming=8)


def q_embed_topk(spark, sf_dir):
    from crawler_spark.operators.similarity import brute_force_topk

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 5)
    out = brute_force_topk(emb, q, k=5)
    return out.select("q_id", "n_id", F.round("cosine", 4).alias("cosine"), "rank")


def q_embed_lsh_bucket(spark, sf_dir):
    from crawler_spark.operators.similarity import hyperplane_bucket_expr

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return emb.select(
        "vec_id", hyperplane_bucket_expr(F.col("embedding"), n_planes=6).alias("bucket")
    )


def q_embed_cosine_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.35 ≈ the 99.9th
    percentile of this corpus's pair distances — its max is 0.49, so a
    production 0.95-style threshold would be vacuously empty here):
    the dense-vector member of the dedup family.

    LSH-blocked (4 planes × 4 tables, deterministic hyperplanes restated
    in the oracle) + exact cosine verify — the round-1 all-pairs
    nested-loop join was the one scale-killer in the dedup family; this
    plan is equi-join only (asserted by the plan sweep, which now also
    rejects BroadcastNestedLoopJoin)."""
    from crawler_spark.operators.similarity import cosine_neardup_pairs

    emb = _read(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    pairs = cosine_neardup_pairs(
        emb, "embedding", "vec_id", threshold=0.35, n_planes=4, n_tables=4
    )
    return pairs.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


def q_token_overlap_consec(spark, sf_dir):
    """SO2/SO3 set ops: distinct-token overlap between doc i and i+1."""
    d = _read(spark, sf_dir, "documents")
    from crawler_spark.operators.dedup import normalize_text

    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(normalize_text(F.col("text")), " "))).alias("tok"),
    ).filter(F.col("tok") != "")
    a = toks.alias("a")
    b = toks.select((F.col("doc_id") - 1).alias("doc_id"), F.col("tok")).alias("b")
    inter = a.join(b, ["doc_id", "tok"]).groupBy("doc_id").agg(F.count("*").alias("n_common"))
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    nxt = sizes.select((F.col("doc_id") - 1).alias("doc_id"), F.col("sz").alias("sz_next"))
    return (
        sizes.join(nxt, "doc_id")
        .join(inter, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            (F.col("sz") + F.col("sz_next") - F.coalesce("n_common", F.lit(0))).alias("n_union"),
        )
    )


# ---- crawl-graph queries ----


def q_link_extract(spark, sf_dir):
    """P4-P6 link pipeline: drop javascript/nofollow, keep same-host."""
    l = _links_df(spark, sf_dir)
    return (
        l.filter(~F.col("is_js") & ~F.col("nofollow") & (F.col("tgt_host") == F.col("src_host")))
        .select("doc_id", "href", "xpath")
    )


def q_html_extract(spark, sf_dir):
    """P1/P2/P9 front door on REAL markup: build an HTML body per document
    (structure derived from doc_id, so the oracle can state the expected
    parse in closed form), run the stdlib-parser mapInPandas stage, and
    emit every anchor with its generalized xpath. The xpath strings below
    follow the reference's tag/id/class rules exactly
    (dom.clj:101-199, pinned by dom_test.clj — see crawler_spark/dom.py)."""
    from crawler_spark.dom import anchors_from_html

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    item = lambda j: F.concat(  # noqa: E731
        F.lit(f'<a href="/p/'),
        (F.col("doc_id") * 3 + j).cast("string"),
        F.lit(f'" class="item{j}">t{j} '),
        (F.col("doc_id") + j).cast("string"),
        F.lit("</a>"),
    )
    html = F.concat(
        F.lit('<html><body><script>var x = "<a href=\'no\'>n</a>";</script><div id="nav'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('" class="menu-bar'),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(' lnk">'),
        item(0),
        item(1),
        item(2),
        F.lit('<a href="/skip/'),
        F.col("doc_id").cast("string"),
        F.lit('" rel="nofollow">x</a></div></body></html>'),
    )
    pages = d.select("doc_id", html.alias("html"))
    return anchors_from_html(pages, "html", ("doc_id",))


def q_html_extract_positioned(spark, sf_dir):
    """Sibling-position xpath variant (dom.clj:134-199 child-position +
    tag-id-class-node: first class only, 0-based index among same-tag
    same-raw-class siblings appended as a predicate) on real markup —
    distinguishes the class-less anchors the tag/id/class form collapses.
    Pinned strings: tests/test_dom.py positioned tests."""
    from crawler_spark.dom import anchors_from_html

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    html = F.concat(
        F.lit('<html><body><div class="menu-bar'),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(' lnk"><a href="/p/'),
        (F.col("doc_id") * 3).cast("string"),
        F.lit('" class="item0">t0</a><a href="/p/'),
        (F.col("doc_id") * 3 + 1).cast("string"),
        F.lit('" class="item1">t1</a><a href="/skip/'),
        F.col("doc_id").cast("string"),
        F.lit('" rel="nofollow">x</a><a href="/x/'),
        F.col("doc_id").cast("string"),
        F.lit('">p</a></div></body></html>'),
    )
    pages = d.select("doc_id", html.alias("html"))
    return anchors_from_html(pages, "html", ("doc_id",), positioned=True)


def q_date_indexed_detect(spark, sf_dir):
    """Golden-fixture eval DRIVER-ORACLED: the reference's 26 REAL saved
    forum/board pages (resources/date-indexed-data, results.html
    publishes 17/20 at threshold 0.7) through the date-indexed record
    detector (crawler_spark/operators/date_records.py — this detector
    reaches 19/20 + 1 negative FP). Deterministic: same bytes, same
    parser, same patterns every run, so the oracle pins the exact
    per-page verdicts as literal rows. Input is the fixture set itself
    (sf-independent — real markup is the entire point)."""
    from crawler_spark.operators.date_records import detect_date_indexed

    det = detect_date_indexed(_fixture_pages(spark), "html", ("label", "page"))
    return det.select(
        "label", "page",
        F.substring("best_group", 1, 1).alias("group_kind"),
        F.regexp_extract(
            F.substring_index("best_group", "/", -1), r"^([a-z0-9]+)", 1
        ).alias("record_tag"),
        "n_records", "n_dated",
        F.round(F.col("date_ratio") * 10000).cast("long").alias("ratio_fp"),
        "detected",
    )


def _fixture_pages(spark):
    import glob
    import os

    fixdir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "date-indexed",
    )
    rows = []
    for label in ("positive", "negative"):
        for f in sorted(glob.glob(os.path.join(fixdir, label, "*.html"))):
            rows.append(
                (label, os.path.basename(f)[:-5],
                 open(f, encoding="utf-8", errors="replace").read())
            )
    return spark.createDataFrame(rows, "label string, page string, html string")


def q_diverse_records_detect(spark, sf_dir):
    """The reference's SECOND published golden-fixture eval
    (output_diversity_and_outlier.html: date-free diversity+outlier
    record detection, "best record 1.5x away from the mean", published
    17-18/20), DRIVER-ORACLED over the same 26 real pages. This
    detector reaches 20/20 positives + 1 negative FP and recovers
    topix_west_helena_ar, the date detector's one miss. Deterministic
    ⇒ verdicts pinned as literal rows."""
    from crawler_spark.operators.date_records import detect_diverse_records

    det = detect_diverse_records(
        _fixture_pages(spark), "html", ("label", "page")
    )
    return det.select(
        "label", "page",
        F.substring("best_group", 1, 1).alias("group_kind"),
        F.regexp_extract(
            F.substring_index("best_group", "/", -1), r"^([a-z0-9]+)", 1
        ).alias("record_tag"),
        "n_records", "cv_permille", "mass", "detected",
    )


def q_fixture_anchor_stats(spark, sf_dir):
    """P1-P9 on REAL markup, DRIVER-ORACLED: anchor extraction + both
    xpath generalization forms over the reference's 26 saved pages —
    per page: anchor count, nofollow count, distinct flat xpaths
    (tag/id/class) and distinct positioned xpaths (sibling-position
    form). Deterministic parser ⇒ verdicts pinned as literal rows.
    The two forms diverge instructively on real pages: reddit's
    per-record unique classes (id-t3_xxx) make the flat form MORE
    granular (282 vs 141) while class-less tables make the positioned
    form more granular (hn_front 138 vs 7)."""
    from crawler_spark.dom import anchors_from_html

    pages = _fixture_pages(spark)
    flat = (
        anchors_from_html(pages, "html", ("label", "page"))
        .groupBy("label", "page")
        .agg(
            F.count("*").alias("n_anchors"),
            F.sum(F.col("nofollow").cast("int")).alias("n_nofollow"),
            F.countDistinct("xpath").alias("n_xpaths"),
        )
    )
    pos = (
        anchors_from_html(pages, "html", ("label", "page"), positioned=True)
        .groupBy("label", "page")
        .agg(F.countDistinct("xpath").alias("n_xpaths_positioned"))
    )
    return flat.join(pos, ["label", "page"])


def q_url_seen_antijoin(spark, sf_dir):
    """J1 URL-seen: candidates minus seen (seen = docs with id%3==0)."""
    l = q_link_extract(spark, sf_dir).select("href").distinct()
    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    seen = d.select(_url_expr(F.col("doc_id"), F.col("doc_id") % N_HOSTS).alias("href"))
    return l.join(seen, "href", "left_anti")


def q_politeness_quota(spark, sf_dir):
    """PO1 politeness window: first 5 pages per host by doc_id."""
    d = _read(spark, sf_dir, "documents")
    w = Window.partitionBy("host").orderBy("doc_id")
    return (
        d.select("doc_id", (F.col("doc_id") % N_HOSTS).alias("host"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )


def q_host_page_counts(spark, sf_dir):
    """A2 frequencies: pages per host."""
    d = _read(spark, sf_dir, "documents")
    return d.groupBy((F.col("doc_id") % N_HOSTS).alias("host")).agg(
        F.count("*").alias("n_pages")
    )


def q_pagination_pick(spark, sf_dir):
    """W2 smallest-numeric-anchor pagination pick per (host, xpath)."""
    l = _links_df(spark, sf_dir).filter(~F.col("is_js"))
    digits = l.filter(F.col("text").rlike("^[0-9]+$"))
    w = Window.partitionBy("src_host", "xpath").orderBy(
        F.col("text").cast("long").asc(), F.col("doc_id").asc(), F.col("j").asc()
    )
    return (
        digits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("src_host", "xpath", F.col("text").cast("long").alias("page_no"), "href")
    )


def q_xpath_char_score(spark, sf_dir):
    """A3 char score per xpath."""
    l = _links_df(spark, sf_dir).filter(~F.col("is_js"))
    return l.groupBy("xpath").agg(
        F.sum(F.length("text")).alias("char_score"), F.count("*").alias("href_count")
    )


def q_template_incidence(spark, sf_dir):
    """P10/A8 template learning: (xpath, href) on ≥5 distinct pages."""
    l = _links_df(spark, sf_dir).filter(~F.col("is_js"))
    return (
        l.groupBy("xpath", "href")
        .agg(F.countDistinct("doc_id").alias("incidence"))
        .filter(F.col("incidence") >= 5)
    )


def q_dominated_prune(spark, sf_dir):
    """J4 subset-containment prune over per-page xpath href-sets."""
    from crawler_spark.operators.xpath_model import dominated_xpath_prune

    l = (
        _links_df(spark, sf_dir)
        .filter(~F.col("is_js"))
        .select(F.col("doc_id").cast("string").alias("page_url"), "xpath", "href")
        .distinct()
    )
    out = dominated_xpath_prune(l)
    return out.select(
        F.col("page_url").cast("long").alias("doc_id"), "xpath", F.col("n").alias("n_hrefs")
    )


def q_enum_scores(spark, sf_dir):
    """A6 enum-candidate score per xpath."""
    l = _links_df(spark, sf_dir).filter(~F.col("is_js")).select(
        F.col("doc_id").alias("page_url"), "xpath", "href"
    )
    from crawler_spark.operators.xpath_model import enum_candidate_score

    out = enum_candidate_score(l)
    return out.select(
        "xpath",
        "total_hrefs",
        "df",
        F.round(F.col("score") * 10000).cast("long").alias("score_fp"),
    )


def q_yield_estimate(spark, sf_dir):
    """A9 per-xpath max per-page yield."""
    l = _links_df(spark, sf_dir).filter(~F.col("is_js")).select(
        F.col("doc_id").alias("page_url"), "xpath", "href"
    )
    from crawler_spark.operators.xpath_model import yield_estimate

    return yield_estimate(l, None).select("xpath", "max_yield")


def q_signature_cosine_consec(spark, sf_dir):
    """C5 page-signature cosine between consecutive pages (docs < 300)."""
    from crawler_spark.operators.xpath_model import page_signature, signature_cosine

    l = (
        _links_df(spark, sf_dir)
        .filter(~F.col("is_js") & (F.col("doc_id") < 300))
        .select(F.col("doc_id").alias("page_url"), "xpath", "href")
    )
    sig = page_signature(l)
    out = signature_cosine(sig, sig).filter(F.col("pb") == F.col("pa") + 1)
    return out.select(
        F.col("pa").alias("doc_id"), F.round("cosine", 4).alias("cosine")
    )


def q_signature_sims(spark, sf_dir):
    """C5 COMPLETE: all five reference signature similarities + the
    combined score (page.clj:15-154) between consecutive pages
    (docs < 300), ORACLED. The pair set is bounded up front (consecutive
    ids, both pages with a non-empty signature) before any signature
    math — no O(P²) self-join. operators/xpath_model.py:signature_sims
    documents the reference's broken manhattan norm (page.clj:44-58)
    and the implemented intent."""
    from crawler_spark.operators.xpath_model import signature_sims

    l = (
        _links_df(spark, sf_dir)
        .filter(~F.col("is_js") & (F.col("doc_id") < 300))
        .select(F.col("doc_id").alias("page_url"), "xpath", "href")
    )
    ids = l.select(F.col("page_url").alias("pa")).distinct()
    pairs = ids.join(
        ids.select((F.col("pa") - 1).alias("pa"), F.col("pa").alias("pb")),
        "pa",
    )
    out = signature_sims(l, pairs)
    return out.select(
        F.col("pa").alias("doc_id"),
        F.round("cosine", 4).alias("cosine"),
        F.round("cardinality", 4).alias("cardinality"),
        F.round("combined", 4).alias("combined"),
        F.round("manhattan", 4).alias("manhattan"),
        F.round("weighted_cosine", 4).alias("weighted_cosine"),
        F.round("edit_sim", 4).alias("edit_sim"),
    )


def q_connected_components(spark, sf_dir):
    """C6 single-linkage clustering as connected components over a
    deterministic edge list."""
    from crawler_spark.operators.clustering import connected_components

    d = _read(spark, sf_dir, "documents")
    e1 = d.filter((F.col("doc_id") % 37 == 0) & (F.col("doc_id") > 0)).select(
        (F.col("doc_id") - 1).alias("id_a"), F.col("doc_id").alias("id_b")
    )
    e2 = d.filter(F.col("doc_id") % 53 == 0).select(
        F.col("doc_id").alias("id_a"), ((F.col("doc_id") * 2 + 1) % 500).alias("id_b")
    )
    return connected_components(e1.unionByName(e2)).select("id", "component")


def q_char_freq_cosine(spark, sf_dir):
    """C4 char-frequency cosine between consecutive documents."""
    from crawler_spark.operators.similarity import char_freq_cosine_consec

    d = _read(spark, sf_dir, "documents")
    out = char_freq_cosine_consec(d, "text", "doc_id")
    return out.select(F.col("id").alias("doc_id"), F.round("cosine", 4).alias("cosine"))


def q_leaf_features(spark, sf_dir):
    """A12 classifier features + C8 rule-based leaf prediction."""
    from crawler_spark.operators.textstats import leaf_features

    d = _read(spark, sf_dir, "documents")
    out = leaf_features(d, "text", "doc_id")
    return out.withColumnRenamed("id", "doc_id")


def q_nb_leaf_classifier(spark, sf_dir):
    """C8/C9 trained leaf classifier: counts-based Naive Bayes fit by
    groupBy over a deterministically-labelled slice (doc_id < 200, the
    graft's stand-in for the reference's hand-labelled corpora,
    leaf_pages.clj:14-137), predicted for every document via broadcast
    join. Integer-exact end to end (see operators/classifier.py)."""
    from crawler_spark.operators.classifier import nb_leaf_classifier

    d = _read(spark, sf_dir, "documents")
    out = nb_leaf_classifier(d, "text", "doc_id", train_max_id=200)
    return out.withColumnRenamed("id", "doc_id")


def q_plan_ordering(spark, sf_dir):
    """W4 plan ordering: xpath action steps sorted by (depth asc, yield
    desc) — the execute-model planner's greedy order (execute.clj:10-17,
    main.clj:208-215)."""
    l = _links_df(spark, sf_dir).filter(~F.col("is_js"))
    per_page = l.groupBy("xpath", "doc_id").agg(F.count("*").alias("n"))
    agg = per_page.groupBy("xpath").agg(F.max("n").alias("max_yield"))
    agg = agg.withColumn("depth", F.length("xpath"))
    w = Window.orderBy(F.asc("depth"), F.desc("max_yield"), F.asc("xpath"))
    return agg.withColumn("plan_rank", F.row_number().over(w)).select(
        "xpath", "depth", "max_yield", "plan_rank"
    )


def q_seeded_sample(spark, sf_dir):
    """W6 deterministic 'random' take-3 per host, seeded by an md5-based
    hash so both engines draw the same sample (utils.clj:279-298 made
    reproducible per SURVEY.md §7)."""
    from crawler_spark.operators.dedup import md5_hash61

    d = _read(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % N_HOSTS).alias("host"),
        md5_hash61(F.col("doc_id").cast("string")).alias("h"),
    )
    w = Window.partitionBy("host").orderBy("h", "doc_id")
    return (
        d.withColumn("samp_rank", F.row_number().over(w))
        .filter(F.col("samp_rank") <= 3)
        .select("host", "doc_id", "samp_rank")
    )


def q_weighted_pick(spark, sf_dir):
    """W5 proportional-to-weight pick per host (utils.clj:86-104
    sample-proportionally, made deterministic per SURVEY.md §7):
    u = seeded-hash uniform in [0, group total); the winner is the
    first row in hash order whose running weight exceeds u. Seeded by
    the md5-based 61-bit hash so the DuckDB twin draws the exact same
    winner (xxhash64 has no DuckDB analog); weights doc_id % 7 are
    integer-valued doubles, so every cumulative sum is IEEE-exact and
    the crossing-point comparison is engine-independent."""
    from crawler_spark.operators.dedup import md5_hash61
    from crawler_spark.operators.windows import weighted_pick_per_group

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % N_HOSTS).alias("host"),
        (F.col("doc_id") % 7).cast("double").alias("wgt"),
        md5_hash61(F.col("doc_id").cast("string")).alias("h"),
    )
    out = weighted_pick_per_group(d, ["host"], "wgt", ["doc_id"], hash_col="h")
    return out.select("host", "doc_id", "wgt")


def q_training_data_pipeline(spark, sf_dir):
    """Flagship training-data pipeline: language filter → quality gate →
    exact-dup drop → near-dup drop (keep smallest id of each jaccard
    cluster edge) → kept document ids. The composite a 100 TB corpus
    pipeline actually runs, end-to-end in one declarative plan."""
    from crawler_spark.operators.dedup import (
        exact_dedup,
        md5_hash61,
        ngram_jaccard_pairs,
        normalize_text,
    )
    from crawler_spark.operators.textstats import quality_score

    d = _read(spark, sf_dir, "documents")
    en = d.filter(F.col("lang") == "en")
    q = quality_score(en, "text", "doc_id").filter(F.col("quality") >= 0.3).select(
        F.col("id").alias("doc_id")
    )
    kept = en.join(q, "doc_id", "left_semi")
    exact = exact_dedup(kept, "text", "doc_id").filter(F.col("id") == F.col("dup_of")).select(
        F.col("id").alias("doc_id")
    )
    kept = kept.join(exact, "doc_id", "left_semi")
    near = ngram_jaccard_pairs(kept, "text", "doc_id", threshold=0.8).select(
        F.col("id_b").alias("doc_id")
    ).distinct()
    survivors = kept.join(near, "doc_id", "left_anti")
    return survivors.select("doc_id", "source")


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering: connected components over the n-gram Jaccard
    pair graph (threshold 0.6); every document labeled with its cluster's
    canonical (minimum) doc_id — the final 'keep one per cluster' step of
    a corpus dedup pass (C6 single-linkage at corpus scale)."""
    from crawler_spark.operators.clustering import cluster_pages_by_similarity
    from crawler_spark.operators.dedup import ngram_jaccard_pairs

    d = _read(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", threshold=0.6).select("id_a", "id_b")
    ids = d.select(F.col("doc_id").alias("id"))
    out = cluster_pages_by_similarity(pairs, ids)
    return out.select(F.col("id").alias("doc_id"), F.col("cluster_id").alias("canonical_id"))


def q_pagination_detect(spark, sf_dir):
    """Full pagination detection: digit-anchor pick + structural
    similarity of source and target page signatures (J6)."""
    from crawler_spark.operators.xpath_model import detect_pagination

    l = (
        _links_df(spark, sf_dir)
        .filter(~F.col("is_js") & (F.col("doc_id") < 300))
        .select(
            F.col("doc_id").cast("string").alias("page_url"),
            "xpath",
            F.col("tgt").cast("string").alias("href"),
            "text",
            F.col("j").alias("pos"),
        )
    )
    out = detect_pagination(l, min_cosine=0.5)
    return out.select(
        F.col("page_url").cast("long").alias("doc_id"),
        "xpath",
        F.col("next_href").cast("long").alias("next_doc"),
        "page_no",
        "cosine",
    )


# fix-model sequence shadowing (remove-pagination-from-actions,
# corpus.clj:409-438, the INTENDED every?-semantics — the reference's
# some/every? inversion is documented at strip_pagination_shadowed):
# a plan is stripped when its chronological prefix equals a learned
# per-source paging entry's (source-seq + paging-action) AND the plan's
# final-action refinement equals the entry's {:only :avoid}. Entries
# chosen so every clause bites on the realized 2-hop plan set:
# ((), xpnav) strips (xpnav, *) EXCEPT final xp1 (refinement mismatch);
# (('xp2',), xpnav) strips the mixed plan (xp2, xpnav); (('xp1',),
# xpnav, avoid '9') matches (xp1, xpnav)'s shape but not its (empty)
# refinement — never strips.
FIXSEQ_PAGING = (
    ((), "xpnav", (), ()),
    (("xp2",), "xpnav", (), ()),
    (("xp1",), "xpnav", (), ("9",)),
)
FIXSEQ_REFS = (("xp1", (), ("9",)),)


def q_fix_model_seqs(spark, sf_dir):
    """fix-model SEQUENCE shadowing (corpus.clj:409-438 as intended),
    stated relationally: realized 2-hop action plans (the
    action_seq_yields chain set) × the per-source paging entries —
    stripped iff prefix-match AND final-action refinement equality.
    The generic array statement (slice == key+[pxp], array-equality on
    the refinement) runs Spark-side; the DuckDB twin unrolls the tiny
    literal entry set. CLI rule itself: cli.cmd_fix_model._shadowed,
    e2e-gated in tests/test_cli.py."""
    l = _links_df(spark, sf_dir).filter(
        ~F.col("is_js") & ~F.col("nofollow")
        & (F.col("tgt_host") == F.col("src_host"))
    )
    hop1 = l.filter(F.col("doc_id") < 40).select(
        F.col("xpath").alias("xp1"), F.col("tgt").alias("mid")
    )
    hop2 = l.select(F.col("doc_id").alias("mid"), F.col("xpath").alias("xp2"))
    plans = (
        hop1.join(hop2, "mid")
        .select(F.array("xp1", "xp2").alias("actions"))
        .distinct()
    )
    pg = spark.createDataFrame(
        [(list(k), xp, list(on), list(av)) for k, xp, on, av in FIXSEQ_PAGING],
        "key array<string>, pxp string, ponly array<string>, "
        "pavoid array<string>",
    )
    refs = spark.createDataFrame(
        [(x, list(on), list(av)) for x, on, av in FIXSEQ_REFS],
        "fxp string, ronly array<string>, ravoid array<string>",
    )
    empty = F.array().cast("array<string>")
    p = plans.join(
        F.broadcast(refs),
        F.element_at("actions", -1) == F.col("fxp"),
        "left",
    ).select(
        "actions",
        F.coalesce("ronly", empty).alias("ronly"),
        F.coalesce("ravoid", empty).alias("ravoid"),
    )
    # prefix-match as an EQUI-join: each plan explodes to its
    # chronological prefixes, each paging entry computes its danger
    # sequence (key + [paging action]) — the join key is the array
    # itself. No nested loop anywhere (at real model sizes both sides
    # are tiny, but the rule's relational shape shouldn't depend on it).
    pref = p.select(
        "actions", "ronly", "ravoid",
        F.explode(F.sequence(F.lit(1), F.size("actions"))).alias("n"),
    ).select(
        "actions", "ronly", "ravoid",
        F.slice("actions", F.lit(1), F.col("n")).alias("prefix"),
    )
    danger = pg.select(
        F.concat("key", F.array(F.col("pxp"))).alias("prefix"),
        "ponly", "pavoid",
    )
    shadowed = (
        pref.join(F.broadcast(danger), "prefix")
        .filter(
            (F.col("ronly") == F.col("ponly"))
            & (F.col("ravoid") == F.col("pavoid"))
        )
        .select("actions")
        .distinct()
        .withColumn("stripped", F.lit(True))
    )
    out = plans.join(F.broadcast(shadowed), "actions", "left").select(
        F.element_at("actions", 1).alias("xp1"),
        F.element_at("actions", 2).alias("xp2"),
        F.coalesce("stripped", F.lit(False)).alias("stripped"),
    )
    return out


def q_paging_model_learn(spark, sf_dir):
    """Per-source pagination model LEARNING (detect-pagination
    :paging-actions + :refine, corpus.clj:123-217; refine-action
    corpus.clj:92-120) over the static link graph: digit-anchored links
    into fetched targets, page-signature cosine similarity (threshold
    0.8 splits same-parity page profiles [muscle] from cross-parity
    [fat] non-vacuously), argmax-by-cosine paging xpath per source
    action-seq, and the modal per-source {:only :avoid} token
    refinement. Arrays flattened to strings for the hash compare.
    Execution-side gates: crawl_paging_refined (chained CTE) +
    tests/test_paging_model.py (exact parity)."""
    from crawler_spark.operators.xpath_model import learn_paging_model

    l = _links_df(spark, sf_dir).filter(
        ~F.col("is_js") & (F.col("doc_id") < 300)
    )
    links = l.select(
        _url_expr(F.col("doc_id"), F.col("doc_id") % N_HOSTS).alias("page_url"),
        "xpath", "href", "text",
    )
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    fetched = docs.select(
        _url_expr(F.col("doc_id"), F.col("doc_id") % N_HOSTS).alias("page_url")
    )
    paths = docs.select(
        _url_expr(F.col("doc_id"), F.col("doc_id") % N_HOSTS).alias("page_url"),
        F.when(F.col("doc_id") % 5 == 0, F.array().cast("array<string>"))
        .otherwise(
            F.array(F.concat(F.lit("s"), (F.col("doc_id") % 3).cast("string")))
        )
        .alias("action_seq"),
    )
    out = learn_paging_model(links, paths, min_cosine=0.8, fetched=fetched)
    return out.select(
        F.concat_ws("/", "action_seq").alias("action_seq"),
        "paging_xpath",
        "cosine",
        F.concat_ws(",", "only").alias("only"),
        F.concat_ws(",", "avoid").alias("avoid"),
    )


# ---- engine-loop / multimodal queries ----
# (every one of these has a hash oracle too — the engine crawls are
# gated by chained multi-epoch CTE restatements below, the multimodal
# pair by deterministic-decoder twins; "rows-only" is history)


N_CRAWL_DOCS = 240  # corpus bound shared by the crawl-chain queries + SQL
N_CRAWL_EPOCHS = 3
CRAWL_EPOCH_MS = 8000
# harvest model: keeps the j0/j2 same-host chains (xpath xp0/xp2) and
# drops the j1 chains (xp1) — a real divergence from the plain crawl.
# Paging: the digit-text override below lands on xpath xp0 links.
HARVEST_MODEL_XP = ("xp0", "xp2")
HARVEST_PAGING_XP = ("xp0", "xpnav")
# seed docs chosen so the same-host link graph actually GROWS across
# epochs (tgt ≡ src (mod 20) requires doc ≡ 19 (20) for j0, ≡ 6 (10)
# for j1, ≡ 15 (20) for j2): 6→26→86→266, 15→75→315 (paging chain),
# 19→39→[79 is javascript], 36→116 (116 robots-disallowed on host 16)
CRAWL_SEED_DOCS = (6, 15, 19, 36)
# depth-indexed plan for the documents graph: depth 0 follows xp2
# (keeps 19→39, drops the xp1 links the flat model would keep), depth 1
# follows xp1; the digit-override paging chain (xpath xp0) rides the
# paging queue at its parent's depth
DEPTH_ACTION_SEQ = ("xp2", "xp1")
# :avoid refinement for the refined-harvest twin: xpath xp2 links whose
# href path contains token '39' are outside the refined plan — kills the
# 19→39 content hop while the paging chain survives
REFINE_AVOID = (("xp2", ("39",)),)
# :only refinement for the only-restricted harvest twin (dom.clj:603-615):
# xpath xp0 keeps ONLY hrefs whose path carries token '75' — the 15→75
# paging hop survives, the 75→315 hop is restricted away, xp2 content
# links pass through untouched (a restriction, not a blanket drop)
REFINE_ONLY_Q = (("xp0", ("75",)),)
# digit-anchor override: links (doc ≡ 15 mod 60, j=2) get digit text so
# the paging queue is non-vacuous on same-host links (the base text
# rule (doc+j)%6==0 never coincides with the same-host residues)
_DIGIT_OVERRIDE = "(l.doc_id % 60 = 15 AND l.j = 2)"


def _doc_corpus(spark, sf_dir):
    """CrawlEngine corpus derived from the documents table by the SAME
    integer arithmetic as _links_df/_LINKS_CTE, so a DuckDB oracle can
    restate the whole multi-epoch crawl. javascript links keep their
    is_js identity as literal 'javascript:void(0)' hrefs (the engine's
    canonicalizer drops them; the SQL filters NOT is_js)."""
    links = _links_df(spark, sf_dir).filter(F.col("doc_id") < N_CRAWL_DOCS)
    # digit-anchor override (see _DIGIT_OVERRIDE): same value formula as
    # the base digit rule so the text is plain digits either way
    text = F.when(
        (F.col("doc_id") % 60 == 15) & (F.col("j") == 2),
        ((F.col("doc_id") * 5 + F.col("j")) % 20 + 1).cast("string"),
    ).otherwise(F.col("text"))
    link_struct = F.struct(
        F.when(F.col("is_js"), F.lit("javascript:void(0)"))
        .otherwise(F.col("href"))
        .alias("href"),
        text.alias("text"),
        F.col("xpath").alias("xpath"),
        F.col("nofollow").alias("nofollow"),
    )
    agg = links.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("j"), link_struct.alias("l")))),
            lambda s: s["l"],
        ).alias("out_links")
    )
    return agg.select(
        _url_expr(F.col("doc_id"), F.col("doc_id") % N_HOSTS).alias("url"),
        F.concat(
            F.lit("host"), (F.col("doc_id") % N_HOSTS).cast("string"), F.lit(".test")
        ).alias("host"),
        "out_links",
        F.lit(False).alias("is_leaf"),
    )


def _doc_robots(spark):
    """Per-host politeness for the documents-derived web: hosts h%4==0
    disallow the '/p/1' path prefix; crawl delay 1000·(1+h%3) ms — the
    same rule the chained SQL oracle states inline."""
    return spark.createDataFrame(
        [
            (
                f"host{h}.test",
                ["/p/1"] if h % 4 == 0 else [],
                1000 * (1 + h % 3),
            )
            for h in range(N_HOSTS)
        ],
        "host string, disallow_prefixes array<string>, crawl_delay_ms long",
    )


def _crawl_seeds():
    return [f"http://host{d % N_HOSTS}.test/p/{d}" for d in CRAWL_SEED_DOCS]


def q_crawl_epoch(spark, sf_dir):
    """THREE full engine epochs, DRIVER-ORACLED: the REAL CrawlEngine
    (politeness dequeue → fetch join → extract → first-wins → seen
    anti-join → sequence assignment → frontier merge-back, per epoch) on
    the documents-derived link graph, hash-checked against a chained
    3-epoch DuckDB CTE restatement of the sequential oracle semantics
    (crawler_spark/oracle.py; reference crawl.clj:46-198). The synth-web
    multi-epoch gate stays in tests/test_engine_parity.py."""
    import os
    import tempfile

    from crawler_spark.engine import CrawlEngine, EngineConfig

    corpus = _doc_corpus(spark, sf_dir)
    robots = _doc_robots(spark)
    # contract-run economics: tmpfs checkpoint (the sandbox NVMe fsyncs
    # at ~1.3 ms), single exit commit, no extra metrics scan — none of
    # these change crawl_order (parity tests run the detailed path)
    scratch = tempfile.mkdtemp(
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(
            max_epochs=N_CRAWL_EPOCHS, epoch_ms=CRAWL_EPOCH_MS,
            checkpoint_dir=scratch, commit_every=4, detailed_metrics=False,
        ),
    )
    eng.run(_crawl_seeds())
    return eng.crawl_order.select(
        F.col("seq").cast("long").alias("seq"),
        "url",
        F.col("epoch").cast("long").alias("epoch"),
    )


def q_crawl_image_harvest(spark, sf_dir):
    """The capstone composite of the graft's two axes: a REAL 3-epoch
    engine crawl over a corpus whose every page carries a binary image
    payload, followed by decode-profiling of EXACTLY the crawled pages
    — the north rule's production shape (frontier loop over image+
    caption rows → harvest → per-row image processing) as one hash-
    gated query. The 100 TB discipline is in the order of operations:
    the frontier loop never reads bytes (FETCH_COLS column pruning,
    test_plans::test_fetch_join_prunes_image_payload), and the decode
    pass runs on the crawl_order join — pages the crawl selected —
    never the 240-doc corpus. Images are the `_IMG_PX_CTE` generative
    formula keyed by the SAME doc arithmetic as the link graph
    (base=doc_id, no near-dup shift), so the DuckDB twin chains the
    full multi-epoch crawl restatement (`_crawl_chain_sql("plain")` as
    a derived table) against the analytic decode stats — a wrong crawl
    order, a wrong politeness window, OR a corrupted byte path each
    break the same hash."""
    import os
    import tempfile

    from crawler_spark.engine import CrawlEngine, EngineConfig
    from crawler_spark.multimodal import encode_pixels, image_profile

    d = _read(spark, sf_dir, "documents").filter(
        F.col("doc_id") < N_CRAWL_DOCS
    )
    imgs = (
        d.select(
            "doc_id",
            F.when(F.col("doc_id") % 2 == 1, F.lit("jpeg"))
            .otherwise(F.lit("png"))
            .alias("fmt"),
        )
        .withColumn("w", (8 * (1 + F.col("doc_id") % 3)).cast("int"))
        .withColumn("h", (8 * (1 + F.col("doc_id") % 4)).cast("int"))
        .withColumn(
            "image_id",
            _url_expr(F.col("doc_id"), F.col("doc_id") % N_HOSTS),
        )
        .withColumn(
            "pixels",
            F.expr(
                "transform(sequence(0, w*h - 1), k ->"
                " ( ((k div w) * 8 div h) * (37 + (doc_id*23) % 201)"
                " + (((k % w) * 8 div w)) * (59 + (doc_id*41) % 149)"
                " + (k*7) % 11 ) % 256)"
            ),
        )
    )
    payload = encode_pixels(imgs).withColumnRenamed("image_id", "url")
    corpus = _doc_corpus(spark, sf_dir).join(payload, "url")
    scratch = tempfile.mkdtemp(
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    eng = CrawlEngine(
        spark, corpus, _doc_robots(spark),
        EngineConfig(
            max_epochs=N_CRAWL_EPOCHS, epoch_ms=CRAWL_EPOCH_MS,
            checkpoint_dir=scratch, commit_every=4, detailed_metrics=False,
        ),
    )
    eng.run(_crawl_seeds())
    crawled = eng.crawl_order.select(
        F.col("seq").cast("long").alias("seq"),
        "url",
        F.col("epoch").cast("long").alias("epoch"),
    )
    # decode ONLY what the crawl fetched: harvested rows join back to
    # their payload, one mapInPandas profile pass over that slim set
    prof = image_profile(
        corpus.select(F.col("url").alias("image_id"), "bytes").join(
            crawled.select(F.col("url").alias("image_id")), "image_id"
        )
    )
    # LEFT join: a crawled page outside the payload corpus (e.g. the
    # epoch-2 discovery of doc 315 >= N_CRAWL_DOCS — scheduled, fetch
    # miss) stays in the output with NULL stats; silently dropping a
    # crawled row would misreport the crawl
    return crawled.join(
        prof.withColumnRenamed("image_id", "url"), "url", "left"
    ).select(
        "seq", "url", "epoch",
        "dec_fmt", "dec_w", "dec_h", "mean_px", "std_px",
    )


TTL_CRAWL_EPOCHS = 4  # one epoch past expiry so a re-crawl can land
TTL_EPOCHS = 2


def q_crawl_ttl(spark, sf_dir):
    """FOUR engine epochs with recrawl-TTL expiry
    (EngineConfig.recrawl_ttl_epochs=2), DRIVER-ORACLED: urls last
    scheduled exactly 2 epochs ago leave URL-seen at epoch start; the
    documents graph's nav links (j=3 → doc_id % 20, same-host) then
    re-discover expired seeds, so the final crawl order legitimately
    contains re-crawled urls at two seqs (e.g. seed 6 expires at epoch 2
    and is re-enqueued by doc 86's nav link). The DuckDB twin chains the
    expiry into the CTE restatement. Exact multi-config TTL gates stay
    in tests/test_recrawl_ttl.py."""
    import os
    import tempfile

    from crawler_spark.engine import CrawlEngine, EngineConfig

    scratch = tempfile.mkdtemp(
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    eng = CrawlEngine(
        spark, _doc_corpus(spark, sf_dir), _doc_robots(spark),
        EngineConfig(
            max_epochs=TTL_CRAWL_EPOCHS, epoch_ms=CRAWL_EPOCH_MS,
            recrawl_ttl_epochs=TTL_EPOCHS, seen_filter="cuckoo",
            checkpoint_dir=scratch, commit_every=8, detailed_metrics=False,
        ),
    )
    eng.run(_crawl_seeds())
    return eng.crawl_order.select(
        F.col("seq").cast("long").alias("seq"),
        "url",
        F.col("epoch").cast("long").alias("epoch"),
    )


def q_crawl_harvest(spark, sf_dir):
    """E3 model-driven harvest (reference execute-model automaton,
    crawl.clj:246-530, execute.clj:10-58), DRIVER-ORACLED over three
    epochs: the engine runs with learned model xpaths + pagination
    xpaths on the documents-derived graph; the DuckDB twin chains the
    same epochs with the harvest link classification (digit-anchor on a
    paging xpath → paging queue, model-covered xpath → content,
    everything else dropped) plus the dual-queue deepest-paging-first
    dequeue. Exact multi-epoch engine gate vs the sequential oracle:
    tests/test_cli.py::test_execute_model_parity."""
    import os
    import tempfile

    from crawler_spark.engine import CrawlEngine, EngineConfig

    corpus = _doc_corpus(spark, sf_dir)
    robots = _doc_robots(spark)
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(
            max_epochs=N_CRAWL_EPOCHS, epoch_ms=CRAWL_EPOCH_MS,
            checkpoint_dir=tempfile.mkdtemp(
                dir="/dev/shm" if os.path.isdir("/dev/shm") else None
            ),
            model_xpaths=HARVEST_MODEL_XP, paging_xpaths=HARVEST_PAGING_XP,
            commit_every=4, detailed_metrics=False,
        ),
    )
    eng.run(_crawl_seeds())
    return eng.crawl_order.select(
        F.col("seq").cast("long").alias("seq"),
        "url",
        F.col("epoch").cast("long").alias("epoch"),
    )


def _harvest_engine(spark, sf_dir, **extra):
    import os
    import tempfile

    from crawler_spark.engine import CrawlEngine, EngineConfig

    eng = CrawlEngine(
        spark, _doc_corpus(spark, sf_dir), _doc_robots(spark),
        EngineConfig(
            max_epochs=N_CRAWL_EPOCHS, epoch_ms=CRAWL_EPOCH_MS,
            checkpoint_dir=tempfile.mkdtemp(
                dir="/dev/shm" if os.path.isdir("/dev/shm") else None
            ),
            commit_every=4, detailed_metrics=False, **extra,
        ),
    )
    eng.run(_crawl_seeds())
    return eng.crawl_order.select(
        F.col("seq").cast("long").alias("seq"),
        "url",
        F.col("epoch").cast("long").alias("epoch"),
    )


def q_crawl_harvest_refined(spark, sf_dir):
    """E3 harvest + learned :avoid refinement (dom.clj:942-1061 applied
    in the loop, crawl.clj:458-530), DRIVER-ORACLED: same 3-epoch chain
    as crawl_harvest, but candidates whose href path contains an avoided
    token for their xpath are dropped before the seen check — the SQL
    twin restates the token rule inline. The avoid set kills the 19→39
    content hop (non-vacuous vs crawl_harvest). Exact parity gate:
    tests/test_cli.py::test_execute_model_refinement_parity."""
    return _harvest_engine(
        spark, sf_dir,
        model_xpaths=HARVEST_MODEL_XP, paging_xpaths=HARVEST_PAGING_XP,
        refine_avoid=REFINE_AVOID,
    )


# per-source pagination chain (detect-pagination :refine applied at
# execution, crawl.clj:358-390): seeds are NON-ROOT docs (host-root doc
# = host id is the xpnav digit target on this graph, d % 20), so paging
# hops land on FRESH urls. The model: seed-level pages (path []) chase
# xpnav digits with avoid-token '13' (kills 33/93 → 13 while 21→1,
# 27→7, 45→5, 75→15 survive); depth-1 pages (path [xp2], i.e. 79→159)
# chase xpnav unrefined (159→19 — a paging hop the seed-level entry's
# key would never grant... and doc 75's xp0 digit-override link (→315)
# matches NO entry and falls through to the content check (xp0 ∉ plan)
# — the fall-through drop, exercised non-vacuously.
PGM_SEED_DOCS = (21, 27, 33, 45, 75, 79, 93)
PGM_DEPTH_SEQ = ("xp2",)
PGM_MODEL = (
    ((), "xpnav", (), ("13",)),
    (("xp2",), "xpnav", (), ()),
)


def q_crawl_paging_refined(spark, sf_dir):
    """E3 harvest with the PER-SOURCE pagination model (reference
    detect-pagination :paging-actions + :refine, corpus.clj:123-217,
    applied at crawl.clj:358-390), DRIVER-ORACLED: the engine keys the
    paging action AND its {:only :avoid} refinement by the parent's
    action path; the DuckDB twin restates the path lookup as a CASE on
    plan depth (exact under a depth-indexed plan — path ≡ plan prefix).
    The avoid token non-vacuously kills the 33/93→13 hops; the depth-1
    entry non-vacuously grants 159→19. Exact synth-web parity gate:
    tests/test_paging_model.py."""
    import os
    import tempfile

    from crawler_spark.engine import CrawlEngine, EngineConfig

    eng = CrawlEngine(
        spark, _doc_corpus(spark, sf_dir), _doc_robots(spark),
        EngineConfig(
            max_epochs=N_CRAWL_EPOCHS, epoch_ms=CRAWL_EPOCH_MS,
            checkpoint_dir=tempfile.mkdtemp(
                dir="/dev/shm" if os.path.isdir("/dev/shm") else None
            ),
            model_action_seq=PGM_DEPTH_SEQ, paging_model=PGM_MODEL,
            commit_every=4, detailed_metrics=False,
        ),
    )
    eng.run([f"http://host{d % N_HOSTS}.test/p/{d}" for d in PGM_SEED_DOCS])
    return eng.crawl_order.select(
        F.col("seq").cast("long").alias("seq"),
        "url",
        F.col("epoch").cast("long").alias("epoch"),
    )


def q_action_seq_yields(spark, sf_dir):
    """Action-sequence yield map over the static link graph — the
    relational statement of what learn-model's model JSON `action_seqs`
    encodes (reference :actions, `(frequencies leaf-paths)` over
    src-path, crawl.clj:108,200-202; plan_model ranks by these yields,
    execute.clj:10-17). From seed docs (doc_id < 40), every 2-hop chain
    of followable same-host links; per (first xpath, second xpath)
    action pair: chain count and distinct-leaf yield (leaf rule:
    tgt % 3 = 0). Two broadcastable equi-joins + one agg — the exact
    learn-time shape, no engine loop. Multi-epoch BFS-semantics gates
    live in tests/test_action_paths.py."""
    l = _links_df(spark, sf_dir).filter(
        ~F.col("is_js") & ~F.col("nofollow")
        & (F.col("tgt_host") == F.col("src_host"))
    )
    hop1 = l.filter(F.col("doc_id") < 40).select(
        F.col("xpath").alias("xp1"), F.col("tgt").alias("mid")
    )
    hop2 = l.select(
        F.col("doc_id").alias("mid"), F.col("xpath").alias("xp2"),
        F.col("tgt").alias("tgt2"),
    )
    return (
        hop1.join(hop2, "mid")
        .groupBy("xp1", "xp2")
        .agg(
            F.count(F.lit(1)).alias("n_chains"),
            F.count_distinct(
                F.when(F.col("tgt2") % 3 == 0, F.col("tgt2"))
            ).alias("leaf_yield"),
        )
    )


# chain threshold chosen against the measured within-group cosine
# distribution of the dedicated graph (0.84-0.97): at 0.90 some sibling
# pairs merge and some split, so the recursive single-linkage closure is
# exercised non-vacuously inside the chained hash gate
EX_CHAIN_THRESH = 0.90


def _exemplar_links_df(spark, sf_dir):
    """Dedicated link graph for the exemplar-crawl chain: 6 same-host
    links per page sharing only TWO xpaths, so each (page, xpath) group
    holds ~3 siblings and the exemplar clustering genuinely prunes (the
    standard crawl-chain graph has 4 links across 4 distinct xpaths —
    every group is a singleton and sampling would be vacuous).
    tgt = (d + 20·k) % 2n preserves host (20 | 2n at every sf); about
    half the targets land ≥ the corpus bound and exercise the
    failed-download path (cluster −1, never exemplar). Restated 1:1 by
    _EX_LINKS_CTE. The (d%60=15, j=2) digit override is baked into the
    text so the shared chain's is_digit stays truthful."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    j = F.explode(F.array(*[F.lit(x) for x in range(6)])).alias("j")
    d = docs.select("doc_id", j)
    kk = (F.floor(F.col("doc_id") / 20) + 3 * F.col("j") + 1) % 23 + 1
    out = d.select(
        "doc_id",
        (F.col("doc_id") % N_HOSTS).alias("src_host"),
        "j",
        ((F.col("doc_id") + 20 * kk) % (2 * n)).cast("long").alias("tgt"),
    )
    out = out.withColumn("tgt_host", F.col("tgt") % N_HOSTS)
    out = out.withColumn(
        "is_js", (F.col("doc_id") * 5 + F.col("j")) % 17 == 0
    ).withColumn("nofollow", (F.col("doc_id") * 3 + F.col("j")) % 11 == 0)
    out = out.withColumn(
        "text",
        F.when(
            ((F.col("doc_id") + F.col("j")) % 6 == 0)
            | ((F.col("doc_id") % 60 == 15) & (F.col("j") == 2)),
            ((F.col("doc_id") * 5 + F.col("j")) % 20 + 1).cast("string"),
        ).otherwise(
            F.concat(F.lit("w"), ((F.col("doc_id") + F.col("j")) % 50).cast("string"))
        ),
    ).withColumn(
        "xpath",
        F.concat(F.lit("xp"), ((F.col("doc_id") + F.col("j")) % 2).cast("string")),
    )
    return out.withColumn("href", _url_expr(F.col("tgt"), F.col("tgt_host")))


_EX_LINKS_CTE = f"""
links AS (
  SELECT d.doc_id,
         d.doc_id % {N_HOSTS} AS src_host,
         j.j,
         CAST((d.doc_id + 20 * ((d.doc_id // 20 + 3 * j.j + 1) % 23 + 1))
              % (2 * (SELECT count(*) FROM documents)) AS BIGINT) AS tgt,
         CAST((d.doc_id + 20 * ((d.doc_id // 20 + 3 * j.j + 1) % 23 + 1))
              % (2 * (SELECT count(*) FROM documents)) AS BIGINT)
           % {N_HOSTS} AS tgt_host,
         ((d.doc_id * 5 + j.j) % 17 = 0) AS is_js,
         ((d.doc_id * 3 + j.j) % 11 = 0) AS nofollow,
         CASE WHEN (d.doc_id + j.j) % 6 = 0
                   OR (d.doc_id % 60 = 15 AND j.j = 2)
              THEN CAST((d.doc_id * 5 + j.j) % 20 + 1 AS VARCHAR)
              ELSE 'w' || CAST((d.doc_id + j.j) % 50 AS VARCHAR) END AS text,
         'xp' || CAST((d.doc_id + j.j) % 2 AS VARCHAR) AS xpath
  FROM documents d, (VALUES (0), (1), (2), (3), (4), (5)) j(j)
),
links2 AS (
  SELECT *, 'http://host' || CAST(tgt_host AS VARCHAR) || '.test/p/' || CAST(tgt AS VARCHAR) AS href
  FROM links
)
"""


def _exemplar_corpus(spark, sf_dir):
    """CrawlEngine corpus for the exemplar chain: pages < N_CRAWL_DOCS
    of the _exemplar_links_df graph, with the documents text as the
    caption column the exemplar clustering consumes."""
    links = _exemplar_links_df(spark, sf_dir).filter(
        F.col("doc_id") < N_CRAWL_DOCS
    )
    link_struct = F.struct(
        F.when(F.col("is_js"), F.lit("javascript:void(0)"))
        .otherwise(F.col("href"))
        .alias("href"),
        F.col("text").alias("text"),
        F.col("xpath").alias("xpath"),
        F.col("nofollow").alias("nofollow"),
    )
    agg = links.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("j"), link_struct.alias("l")))),
            lambda s: s["l"],
        ).alias("out_links")
    )
    cap = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return agg.join(cap, "doc_id").select(
        _url_expr(F.col("doc_id"), F.col("doc_id") % N_HOSTS).alias("url"),
        F.concat(
            F.lit("host"), (F.col("doc_id") % N_HOSTS).cast("string"), F.lit(".test")
        ).alias("host"),
        "out_links",
        F.col("text").alias("caption"),
        F.lit(False).alias("is_leaf"),
    )


def q_crawl_exemplar(spark, sf_dir):
    """THREE engine epochs in E2 exemplar-sampling mode, DRIVER-ORACLED:
    the REAL CrawlEngine with EngineConfig.exemplar_sampling — per
    (page, xpath) group of seen-surviving candidates, seeded md5-order
    sample of max(10, n//4), caption char-freq-cosine single-linkage
    clustering of the sampled downloads, ONE exemplar per cluster enters
    the frontier while every survivor enters URL-seen (prepare-example,
    crawl.clj:532-629). The DuckDB twin chains the sampling window, the
    26-letter cosine, and a per-epoch recursive-CTE single-linkage
    closure through the full 3-epoch loop — the sampling/clustering
    stage is hash-gated INSIDE the crawl, not just as a single step
    (exemplar_step). Runs on a dedicated 6-link/2-xpath graph where
    groups hold ~3 siblings (the standard chain graph would make every
    group a singleton). Exact synth-web parity: tests/test_exemplar.py."""
    import os
    import tempfile

    from crawler_spark.engine import CrawlEngine, EngineConfig

    corpus = _exemplar_corpus(spark, sf_dir)
    robots = _doc_robots(spark)
    scratch = tempfile.mkdtemp(
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(
            max_epochs=N_CRAWL_EPOCHS, epoch_ms=CRAWL_EPOCH_MS,
            checkpoint_dir=scratch, commit_every=4, detailed_metrics=False,
            exemplar_sampling=True,
            exemplar_cosine_threshold=EX_CHAIN_THRESH,
        ),
    )
    eng.run(_crawl_seeds())
    return eng.crawl_order.select(
        F.col("seq").cast("long").alias("seq"),
        "url",
        F.col("epoch").cast("long").alias("epoch"),
    )


EXEMPLAR_STEP_THRESH = 0.965


def q_exemplar_step(spark, sf_dir):
    """E2 exemplar-cluster sampling, ONE step DRIVER-ORACLED (reference
    prepare-example, crawl.clj:532-629; engine mode
    EngineConfig.exemplar_sampling): per target-host group of distinct
    same-host link targets — seeded md5-order sample of max(10, n//4),
    "download" (join to documents.text), single-linkage clusters over
    char-freq cosine ≥ 0.965, cluster ids numbered by smallest url,
    exemplar = each cluster's smallest url. The DuckDB twin restates the
    sampling window, the 26-letter cosine, and the single-linkage
    closure as a recursive CTE — gating the applyInPandas clustering
    stage itself. Multi-epoch engine gate: tests/test_exemplar.py."""
    from crawler_spark.exemplar import assign_exemplars
    from crawler_spark.operators.dedup import md5_hash61

    links = _links_df(spark, sf_dir).filter(
        ~F.col("is_js") & ~F.col("nofollow")
        & (F.col("tgt_host") == F.col("src_host")) & (F.col("doc_id") < 240)
    )
    tgts = links.select(
        F.col("tgt_host").cast("string").alias("grp"),
        F.col("href").alias("url"),
        "tgt",
    ).distinct()
    w_g = Window.partitionBy("grp")
    ranked = (
        tgts.withColumn("__h", md5_hash61(F.col("url")))
        .withColumn("__rn", F.row_number().over(w_g.orderBy("__h", "url")))
        .withColumn("__n", F.count(F.lit(1)).over(w_g))
    )
    samp = ranked.filter(
        F.col("__rn") <= F.greatest(F.lit(10), F.floor(F.col("__n") / 4))
    )
    d = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("tgt"), F.col("text").alias("caption")
    )
    dl = samp.join(d, "tgt").select(
        F.col("grp").alias("src_url"),
        F.lit("g").alias("src_xpath"),
        "url",
        "caption",
        F.lit(None).cast("boolean").alias("is_leaf"),
    )
    out = assign_exemplars(dl, EXEMPLAR_STEP_THRESH)
    return out.select(
        F.col("src_url").cast("long").alias("host"),
        "url",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "exemplar",
    )


# fix-model literals: a "learned" model to clean against the documents
# graph. Actions xp0/xpnav are pagination-shadowed (they are paging
# xpaths) → stripped. Refinement claims exercise every re-probe outcome
# at sf0.01: evidence holds (xp1 only '196', avoid '36'; xp2 avoid
# '39'), evidence flipped (xp1 only '26' is now bad-only; xp2 avoid
# '119' is now good-only), evidence both-sided ('p' is in every href),
# evidence vanished ('999' never observed).
FIX_MODEL_ACTIONS = (("xp0", 30), ("xp1", 20), ("xp2", 10), ("xpnav", 5))
FIX_MODEL_CLAIMS = (
    ("xp1", ("196", "26"), ("36", "p", "999")),
    ("xp2", (), ("39", "119")),
)


def q_fix_model(spark, sf_dir):
    """fix-model (reference main.clj:232-246; corpus.clj:409-438
    remove-pagination-from-actions + model.clj:30-175 restriction
    re-probe), DRIVER-ORACLED as a pure relational statement: content
    actions that are also pagination actions leave the plan (broadcast
    anti-join), and the model's claimed :only/:avoid tokens are
    re-probed against the graph's muscle/fat evidence (good = target
    doc_id % 7 == 0) — kept only if still one-sided. Flat output rows
    (xpath, kind, tok): kind='action' for surviving plan steps,
    'only'/'avoid' for surviving tokens. E2E CLI flow incl. a tampered
    model whose fixing changes the executed plan:
    tests/test_cli.py::test_cli_fix_model."""
    from crawler_spark.operators.xpath_model import (
        reprobe_refinements,
        strip_pagination_shadowed,
    )

    links = _links_df(spark, sf_dir).filter(
        ~F.col("is_js") & ~F.col("nofollow")
        & (F.col("tgt_host") == F.col("src_host"))
    )
    labeled = links.select(
        "xpath", "href", (F.col("tgt") % 7 == 0).alias("good")
    )
    actions = spark.createDataFrame(
        list(FIX_MODEL_ACTIONS), "xpath string, freq long"
    )
    paging = spark.createDataFrame(
        [(x,) for x in HARVEST_PAGING_XP], "src_xpath string"
    )
    kept = strip_pagination_shadowed(actions, paging).select(
        "xpath", F.lit("action").alias("kind"),
        F.lit(None).cast("string").alias("tok"),
    )
    refs = spark.createDataFrame(
        [(xp, list(on), list(av)) for xp, on, av in FIX_MODEL_CLAIMS],
        "xpath string, only array<string>, avoid array<string>",
    )
    probed = reprobe_refinements(refs, labeled)
    toks = probed.select(
        "xpath", F.lit("only").alias("kind"), F.explode("only").alias("tok")
    ).unionByName(
        probed.select(
            "xpath", F.lit("avoid").alias("kind"),
            F.explode("avoid").alias("tok"),
        )
    )
    return kept.unionByName(toks)


# multi-action-sequence budgeted execution (main.clj:264-287): three
# depth-indexed plans ranked by plan_model (length asc, yield desc —
# yields chosen so the ranking is the tuple order below), one shared
# budget of 12 pages. At sf0.01 plan 0 visits 7, plan 1 starts from the
# depleted remainder (12−7=5) and is stopped mid-plan by it (5 of its
# unbudgeted 6), plan 2 is skipped outright — all three regimes (run to
# completion / budget-stopped / skipped) in one gated query.
MULTISEQ_PLANS = (("xp2", "xp1"), ("xp0", "xp2"), ("xp1", "xp0"))
MULTISEQ_YIELDS = (30, 20, 10)
MULTISEQ_BUDGET = 12


def q_crawl_multiseq(spark, sf_dir):
    """E3 multi-action-sequence budgeted execution (the reference's
    execute-model-budget-crawler fold, main.clj:247-305 +
    execute.clj:50-86), DRIVER-ORACLED: plan_model ranks the three
    action sequences, execute_model_budget chains them through
    successive depth-indexed engine runs under ONE shared page budget —
    each sequence's max_pages is what the previous sequences left, and
    a sequence reached after exhaustion never launches. The DuckDB twin
    states every chain's budget as a scalar over the previous chains'
    scheduled counts inside one statement. Exact parity gate (incl. the
    mid-plan stop and the skip): tests/test_multiseq.py."""
    import os
    import tempfile

    from crawler_spark.multiseq import execute_model_budget, plan_model

    planned = plan_model(zip(MULTISEQ_PLANS, MULTISEQ_YIELDS))
    assert planned == list(MULTISEQ_PLANS)  # yields encode the rank
    res = execute_model_budget(
        spark, _doc_corpus(spark, sf_dir), _doc_robots(spark),
        _crawl_seeds(), planned, HARVEST_PAGING_XP,
        budget=MULTISEQ_BUDGET,
        checkpoint_root=tempfile.mkdtemp(
            dir="/dev/shm" if os.path.isdir("/dev/shm") else None
        ),
        max_epochs=N_CRAWL_EPOCHS, epoch_ms=CRAWL_EPOCH_MS,
        commit_every=4, detailed_metrics=False,
    )
    return res.crawl_order().select(
        "plan_idx",
        F.col("seq").cast("long").alias("seq"),
        "url",
        F.col("epoch").cast("long").alias("epoch"),
    )


def q_crawl_harvest_only(spark, sf_dir):
    """E3 harvest + learned :only refinement (dom.clj:603-615
    restricted-to-only, applied before :avoid in the refined
    evaluation), DRIVER-ORACLED: same 3-epoch chain as crawl_harvest,
    but xpath xp0 candidates KEEP only hrefs whose path carries token
    '75' — the crawl loses the 75→315 paging hop while the 15→75 hop
    and all xp2 content links survive (non-vacuous vs crawl_harvest,
    and a genuine restriction rather than an avoid-style drop). Exact
    parity gate: tests/test_cli.py::test_refine_only_parity."""
    return _harvest_engine(
        spark, sf_dir,
        model_xpaths=HARVEST_MODEL_XP, paging_xpaths=HARVEST_PAGING_XP,
        refine_only=REFINE_ONLY_Q,
    )


def q_crawl_depth_indexed(spark, sf_dir):
    """Depth-indexed action sequences (reference xpath-to-pick,
    crawl.clj:200-202), DRIVER-ORACLED: a page at plan depth d follows
    ONLY model_action_seq[d]; paging hops keep the parent depth; pages
    past the last step expand nothing. The SQL twin carries depth on the
    chained frontier and picks the action by CASE depth. Exact parity
    gate: tests/test_cli.py::test_depth_indexed_action_sequence_parity."""
    return _harvest_engine(
        spark, sf_dir,
        model_action_seq=DEPTH_ACTION_SEQ, paging_xpaths=HARVEST_PAGING_XP,
    )


def q_rtdm_consec(spark, sf_dir):
    """C3 RTDM structural similarity of consecutive pages, ORACLED: each
    doc renders to html>body>[div>a]×n with n = 2 + doc_id % 4, so the
    restricted top-down distance between docs i and i+1 is exactly
    2·|n_i − n_{i+1}| (delete/insert the surplus div subtrees, size 2
    each) over descendant total 4 + 2n_i + 2n_{i+1} — a closed form
    DuckDB states directly; the tree DP must reproduce it."""
    from crawler_spark.operators.treedist import rtdm_consec_pairs

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    n = F.lit(2) + F.col("doc_id") % 4
    html = F.concat(
        F.lit("<html><body>"),
        F.repeat(F.lit("<div><a>x</a></div>"), n.cast("int")),
        F.lit("</body></html>"),
    )
    pages = d.select("doc_id", html.alias("html"))
    out = rtdm_consec_pairs(pages, "html", "doc_id")
    return out.select("id", F.round("rtdm", 4).alias("rtdm"))


def q_crawl_epoch_oracle(spark, sf_dir):
    """One scheduling epoch, DRIVER-ORACLED (VERDICT r1 item 9): robots
    filter → the REAL politeness.dequeue (two-phase salted quota window)
    → link extraction → within-batch first-wins → URL-seen anti-join →
    sequence assignment, over the documents-derived link graph, restated
    exactly in SQL. The multi-epoch engine keeps its exact-parity gate in
    tests/test_engine_parity.py; this makes one epoch's full operator
    chain hash-checkable by the driver too."""
    from crawler_spark import politeness

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)
    frontier = d.select(
        F.col("doc_id"),
        (F.col("doc_id") % N_HOSTS).alias("host"),
        _url_expr(F.col("doc_id"), F.col("doc_id") % N_HOSTS).alias("url"),
        F.col("doc_id").alias("insertion_seq"),
        F.lit("content").alias("queue"),
        F.lit(None).cast("string").alias("src_xpath"),
    )
    robots = spark.createDataFrame(
        [
            (h, ["/p/1"] if h % 4 == 0 else [], 1000 * (1 + h % 3))
            for h in range(N_HOSTS)
        ],
        "host long, disallow_prefixes array<string>, crawl_delay_ms long",
    )
    allowed, _dis = politeness.robots_filter(frontier, robots)
    selected, _rest = politeness.dequeue(allowed, robots, epoch_ms=20000)

    links = _links_df(spark, sf_dir).filter(
        ~F.col("is_js") & ~F.col("nofollow") & (F.col("tgt_host") == F.col("src_host"))
    )
    cand = links.join(
        selected.select(F.col("doc_id"), F.col("insertion_seq").alias("src_seq")),
        "doc_id",
    )
    w_first = Window.partitionBy("href").orderBy("src_seq", "j")
    first = (
        cand.withColumn("__rn", F.row_number().over(w_first))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    seen = frontier.select("url")
    new = first.join(seen, first.href == seen.url, "left_anti")
    w_seq = Window.orderBy("src_seq", "j")
    return new.select(
        F.col("href").alias("url"),
        F.col("doc_id").alias("src_doc"),
        (F.row_number().over(w_seq) - 1).cast("long").alias("new_seq"),
    )


def q_harvest_step_oracle(spark, sf_dir):
    """One model-driven harvest scheduling step (E3, reference
    execute-model: crawl.clj:246-530, execute.clj:10-58), DRIVER-ORACLED:
    the same epoch chain as `crawl_epoch_oracle` plus the harvest
    automaton's link classification — a link survives only if the
    learned model covers its xpath (content action) or it is a
    digit-anchor on a pagination xpath (paging queue, chased before
    content); everything else is dropped as outside the plan. Predicate
    identical to engine.run_epoch's harvest branch (engine.py:449-461);
    the multi-epoch automaton keeps its exact-parity gate in
    tests/test_cli.py::test_execute_model_parity."""
    from crawler_spark import politeness

    model_xp, paging_xp = ["xp0", "xp2"], ["xpnav", "xp3"]
    # frontier bound 120, with pages 1 and 7 withheld: every nav-anchor
    # (xpnav) pagination link targets page doc_id % 20, so with a full
    # 0..119 frontier the anti-join would drop them all — withholding
    # two pages makes the paging queue non-vacuous (targets p/1, p/7)
    d = _read(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 120) & ~F.col("doc_id").isin(1, 7)
    )
    frontier = d.select(
        F.col("doc_id"),
        (F.col("doc_id") % N_HOSTS).alias("host"),
        _url_expr(F.col("doc_id"), F.col("doc_id") % N_HOSTS).alias("url"),
        F.col("doc_id").alias("insertion_seq"),
        F.lit("content").alias("queue"),
        F.lit(None).cast("string").alias("src_xpath"),
    )
    robots = spark.createDataFrame(
        [
            (h, ["/p/1"] if h % 4 == 0 else [], 1000 * (1 + h % 3))
            for h in range(N_HOSTS)
        ],
        "host long, disallow_prefixes array<string>, crawl_delay_ms long",
    )
    allowed, _dis = politeness.robots_filter(frontier, robots)
    selected, _rest = politeness.dequeue(allowed, robots, epoch_ms=20000)

    links = _links_df(spark, sf_dir).filter(
        ~F.col("is_js") & ~F.col("nofollow") & (F.col("tgt_host") == F.col("src_host"))
    )
    cand = links.join(
        selected.select(F.col("doc_id"), F.col("insertion_seq").alias("src_seq")),
        "doc_id",
    )
    is_digit = F.coalesce(F.col("text"), F.lit("")).rlike("^[0-9]+$")
    keep_paging = is_digit & F.col("xpath").isin(paging_xp)
    keep_content = ~keep_paging & F.col("xpath").isin(model_xp)
    cand = cand.filter(keep_paging | keep_content).withColumn(
        "queue", F.when(keep_paging, F.lit("paging")).otherwise(F.lit("content"))
    )
    w_first = Window.partitionBy("href").orderBy("src_seq", "j")
    first = (
        cand.withColumn("__rn", F.row_number().over(w_first))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    new = first.join(frontier.select("url"), first.href == F.col("url"), "left_anti")
    w_seq = Window.orderBy("src_seq", "j")
    return new.select(
        F.col("href").alias("url"),
        F.col("doc_id").alias("src_doc"),
        F.col("queue"),
        (F.row_number().over(w_seq) - 1).cast("long").alias("new_seq"),
    )


def q_ttl_expiry_oracle(spark, sf_dir):
    """TTL recrawl expiry selection (engine.expired_urls, the operator
    behind EngineConfig.recrawl_ttl_epochs): given a scheduling history,
    return urls whose LATEST scheduling was exactly the expiry epoch —
    an epoch-pruned anti-join, never a full-history groupBy-max. History
    here: every doc scheduled at epoch doc_id % 5; docs with
    doc_id % 7 == 0 rescheduled later at epoch doc_id % 5 + 2. The
    multi-epoch expiry semantics (seen removal, cuckoo fingerprint
    delete, refetch) keep their exact-parity gate in
    tests/test_recrawl_ttl.py."""
    from crawler_spark.engine import expired_urls

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    url = _url_expr(F.col("doc_id"), F.col("doc_id") % N_HOSTS).alias("url")
    base = d.select(url, (F.col("doc_id") % 5).cast("int").alias("epoch"))
    resched = d.filter(F.col("doc_id") % 7 == 0).select(
        url, (F.col("doc_id") % 5 + 2).cast("int").alias("epoch")
    )
    return expired_urls(base.unionByName(resched), 3)


def _oracle_image_frame(spark, sf_dir, n_imgs=100):
    """Deterministic image corpus whose pixels come from a SQL-expressible
    integer formula over ``documents.doc_id`` — so DuckDB can restate the
    expected DECODED output without ever seeing the bytes, while the
    Spark side round-trips genuine encode → binary column → Arrow →
    decode. doc_id % 10 == 9 reuses the previous doc's pixel field
    (planted near-dup; fmt still differs png↔jpeg, so the pair survives
    lossy quantization but is not byte-identical). Pixel field has 8×8
    block structure (weights vary per image) so perceptual hashes are
    well-separated across images and ~equal within a planted pair."""
    from crawler_spark.multimodal import encode_pixels

    return encode_pixels(_image_formula_frame(spark, sf_dir, n_imgs))


def _image_formula_frame(spark, sf_dir, n_imgs=100):
    """The pre-encode side of `_oracle_image_frame`: (image_id, fmt, w,
    h, pixels) with the SQL-expressible generative pixel formula still
    visible as an array column — so a query can join encoded bytes back
    to their source pixels for per-row fidelity checks (image_psnr)."""
    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < n_imgs)
    df = d.select(
        F.col("doc_id"),
        (F.col("doc_id") - F.when(F.col("doc_id") % 10 == 9, 1).otherwise(0)).alias("base"),
        F.when(F.col("doc_id") % 2 == 1, F.lit("jpeg")).otherwise(F.lit("png")).alias("fmt"),
    )
    df = (
        df.withColumn("w", (F.lit(8) * (1 + F.col("base") % 3)).cast("int"))
        .withColumn("h", (F.lit(8) * (1 + F.col("base") % 4)).cast("int"))
        .withColumn("image_id", F.concat(F.lit("img-"), F.col("doc_id")))
        .withColumn(
            "pixels",
            F.expr(
                "transform(sequence(0, w*h - 1), k ->"
                " ( ((k div w) * 8 div h) * (37 + (base*23) % 201)"
                " + (((k % w) * 8 div w)) * (59 + (base*41) % 149)"
                " + (k*7) % 11 ) % 256)"
            ),
        )
    )
    return df


def q_image_psnr(spark, sf_dir):
    """The north-rule per-row invariant (input_hint: decoded-pixel
    PSNR ≥ 40 dB for lossy + lossless exactness) as a driver-gated
    query, not only a pytest: formula pixels → REAL encode → binary
    column → Arrow → decode, then per-image exact integer squared error
    vs the pre-encode pixels joined back on image_id. DuckDB restates
    the codec's lossy rule analytically — quantize-to-even means the
    per-pixel squared error is `p % 2`, so err_sq = Σ(p%2) over jpeg
    pixels and 0 for png — and the same mse / 10·log10(255²·n/err)
    arithmetic. A hash match certifies the decode side reproduces the
    source to the claimed fidelity per ROW, end to end through the
    binary path (cf. reference fetch fidelity: page bytes stored
    verbatim, crawler stores what it fetched — here the graft's image
    twin of that contract)."""
    from crawler_spark.multimodal import psnr_frame

    src = _image_formula_frame(spark, sf_dir)
    from crawler_spark.multimodal import encode_pixels

    enc = encode_pixels(src)
    joined = enc.join(src.select("image_id", "pixels"), "image_id")
    return psnr_frame(joined)


def q_image_neardup(spark, sf_dir):
    """Image near-dup END-TO-END on real binary columns, ORACLED: encode
    formula-pixels → decode bytes → recompute the 64-bit perceptual hash
    from pixels (mapInPandas, 8×8 block means > image mean) → banded
    Hamming pair join. DuckDB restates pixel formula → block/total sums →
    the same 64 threshold bits → signed-int64 packing → all-pairs
    Hamming ≤ 8, so the driver hash-checks the whole binary path; any
    corruption in encode/decode/Arrow batching breaks the match.
    tests/test_multimodal.py additionally proves the recomputed phash
    equals the corpus-side phash column bit-for-bit."""
    from crawler_spark.multimodal.images import phash_udf_frame
    from crawler_spark.operators.dedup import phash_neardup_pairs

    hashed = phash_udf_frame(_oracle_image_frame(spark, sf_dir))
    return phash_neardup_pairs(hashed, "phash2", "image_id", max_hamming=8)


def q_image_decode_stats(spark, sf_dir):
    """Multimodal decode over a REAL binary image column, ORACLED: the
    mean/std come from exact integer pixel sums (see decode_stats), and
    DuckDB recomputes them from the generative pixel formula — the bytes
    themselves never reach the oracle, so a hash match certifies the
    encode → binary → decode round-trip."""
    from crawler_spark.multimodal import decode_stats

    return decode_stats(_oracle_image_frame(spark, sf_dir))


def _pipeline_image_frame(spark, sf_dir, n_imgs=120):
    """Image corpus for the composite training pipeline — the
    `_oracle_image_frame` generative formula plus the defect classes a
    real pipeline must handle: doc_id%10==7 is a FLAT image (constant
    pixels — zero information, the quality gate's prey), doc_id%10==5
    is a byte-EXACT copy of doc_id-1 (same base, same png format →
    identical encode output), doc_id%10==9 stays the lossy NEAR-dup of
    doc_id-1 (same pixels pre-quantization, png↔jpeg). All three rules
    are SQL-expressible so DuckDB can restate every stage without the
    bytes."""
    from crawler_spark.multimodal import encode_pixels

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < n_imgs)
    df = d.select(
        "doc_id",
        (
            F.col("doc_id")
            - F.when((F.col("doc_id") % 10).isin(5, 9), 1).otherwise(0)
        ).alias("base"),
        F.when(F.col("doc_id") % 10 == 5, F.lit("png"))
        .when(F.col("doc_id") % 2 == 1, F.lit("jpeg"))
        .otherwise(F.lit("png"))
        .alias("fmt"),
        (F.col("doc_id") % 10 == 7).alias("flat"),
    )
    df = (
        df.withColumn("w", (F.lit(8) * (1 + F.col("base") % 3)).cast("int"))
        .withColumn("h", (F.lit(8) * (1 + F.col("base") % 4)).cast("int"))
        .withColumn("image_id", F.concat(F.lit("img-"), F.col("doc_id")))
        .withColumn(
            "pixels",
            F.when(
                F.col("flat"),
                F.expr(
                    "transform(sequence(0, w*h - 1),"
                    " k -> (37 + (base*23) % 201) % 256)"
                ),
            ).otherwise(
                F.expr(
                    "transform(sequence(0, w*h - 1), k ->"
                    " ( ((k div w) * 8 div h) * (37 + (base*23) % 201)"
                    " + (((k % w) * 8 div w)) * (59 + (base*41) % 149)"
                    " + (k*7) % 11 ) % 256)"
                )
            ),
        )
    )
    return encode_pixels(df)


def q_image_training_pipeline(spark, sf_dir):
    """Composite IMAGE training-data pipeline, ORACLED end to end — the
    multimodal twin of `training_data_pipeline`: quality gate (min
    resolution + min pixel std) → byte-exact dedup (md5 group, min-id
    winner) → perceptual near-dup (banded phash Hamming ≤ 8 →
    connected components) → one canonical exemplar per cluster. Every
    per-image signal comes from ONE `image_profile` decode pass (at
    100 TB the decode dominates — stats, phash, and the exact-dup key
    must share the scan); every later stage is slim-row DataFrame
    algebra. DuckDB restates the pixel formula → stats → the (base,
    fmt) byte-identity → phash bits → all-pairs Hamming → a recursive
    min-reachable closure, so the hash gate covers the binary
    round-trip AND the stage composition. Output: one disposition row
    per input image (stage ∈ low_quality | exact_dup | near_dup | kept)
    with the canonical image it maps to."""
    from crawler_spark.multimodal import image_profile
    from crawler_spark.operators.clustering import connected_components
    from crawler_spark.operators.dedup import phash_neardup_pairs

    prof = (
        image_profile(_pipeline_image_frame(spark, sf_dir))
        .withColumn(
            "doc_n", F.regexp_extract("image_id", "([0-9]+)$", 1).cast("bigint")
        )
        .persist()  # one decode pass feeds 3 stages + the output join
    )
    passed = prof.filter(
        (F.col("dec_w") * F.col("dec_h") >= 128) & (F.col("std_px") >= 30.0)
    )
    exact = passed.withColumn(
        "exact_rep_n", F.min("doc_n").over(Window.partitionBy("byte_key"))
    ).select("doc_n", "exact_rep_n", "phash2")
    reps = exact.filter(F.col("doc_n") == F.col("exact_rep_n")).select(
        "doc_n", "phash2"
    )
    pairs = phash_neardup_pairs(reps, "phash2", "doc_n", max_hamming=8)
    cc = connected_components(pairs)
    rep_comp = reps.join(
        cc.withColumnRenamed("id", "doc_n"), "doc_n", "left"
    ).select(
        "doc_n", F.coalesce("component", F.col("doc_n")).alias("comp")
    )
    # component ids are doc_ns of cluster-min reps — resolve each back
    # to its image_id rather than re-deriving the string
    canon = prof.select(
        F.col("doc_n").alias("comp"), F.col("image_id").alias("canonical")
    )
    out = (
        prof.select("image_id", "doc_n")
        .join(exact.select("doc_n", "exact_rep_n"), "doc_n", "left")
        .join(
            rep_comp.select(
                F.col("doc_n").alias("exact_rep_n"), "comp"
            ),
            "exact_rep_n",
            "left",
        )
        .join(canon, "comp", "left")
    )
    return out.select(
        "image_id",
        F.when(F.col("exact_rep_n").isNull(), F.lit("low_quality"))
        .when(F.col("doc_n") != F.col("exact_rep_n"), F.lit("exact_dup"))
        .when(F.col("doc_n") != F.col("comp"), F.lit("near_dup"))
        .otherwise(F.lit("kept"))
        .alias("stage"),
        "canonical",
    )


def q_image_resize_stats(spark, sf_dir):
    """Resize plumbing certified end to end: decode → nearest-neighbor
    sample to 8×8 → lossless re-encode → second decode → exact-sum
    stats. DuckDB restates the SAMPLED pixel directly (source index
    k = (ry*h//8)*w + rx*w//8 into the generative formula, quantized by
    the SOURCE format since resize reads the stored lossy payload), so
    a hash match proves both codec trips and the sampling grid."""
    from crawler_spark.multimodal import decode_stats, resize_images

    rs = resize_images(_oracle_image_frame(spark, sf_dir), 8, 8)
    return decode_stats(rs.select("image_id", "bytes"))


def q_video_frame_sample(spark, sf_dir):
    """Video-style frame sampling over binary clips: every-2nd-frame
    indices against a per-clip frame count, frame bytes riding along
    (no video codec in this sandbox — index-0 bytes stand in for a
    decoder seek; the fan-out, batch shape, and byte plumbing are the
    deliverable). Oracled: DuckDB restates the index arithmetic and the
    byte LENGTH (9-byte header + w*h payload), so the hash gate
    catches a dropped/duplicated frame row or truncated bytes."""
    from crawler_spark.multimodal import frame_sample

    clips = _oracle_image_frame(spark, sf_dir).withColumn(
        "n_frames",
        (
            F.lit(1)
            + F.regexp_extract("image_id", "([0-9]+)$", 1).cast("int") % 7
        ).cast("int"),
    )
    out = frame_sample(clips, every_n=2, n_frames_col="n_frames")
    return out.select(
        "image_id", "frame_idx", F.length("bytes").alias("frame_bytes")
    )


def _mm_frame(spark, sf_dir):
    """(captions, images) for the joint-modality near-dup: doc_id%10==9
    copies BOTH the previous doc's pixel field (png↔jpeg lossy twin)
    AND its caption text → a true multimodal duplicate; doc_id%10==3
    copies only the PIXELS (caption stays its own) → an image-only
    near-dup the joint join must reject. Captions come from
    documents.text via the cap_base self-join; pixels from the
    `_oracle_image_frame` generative formula over img_base — all
    SQL-expressible for the DuckDB twin."""
    from crawler_spark.multimodal import encode_pixels

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    meta = d.select(
        "doc_id",
        (
            F.col("doc_id")
            - F.when((F.col("doc_id") % 10).isin(9, 3), 1).otherwise(0)
        ).alias("img_base"),
        (
            F.col("doc_id")
            - F.when(F.col("doc_id") % 10 == 9, 1).otherwise(0)
        ).alias("cap_base"),
        F.when(F.col("doc_id") % 2 == 1, F.lit("jpeg"))
        .otherwise(F.lit("png"))
        .alias("fmt"),
    )
    caps = meta.join(
        d.select(
            F.col("doc_id").alias("cap_base"), F.col("text").alias("caption")
        ),
        "cap_base",
    ).select("doc_id", "caption")
    imgs = encode_pixels(
        meta.withColumnRenamed("img_base", "base")
        .withColumn("w", (F.lit(8) * (1 + F.col("base") % 3)).cast("int"))
        .withColumn("h", (F.lit(8) * (1 + F.col("base") % 4)).cast("int"))
        .withColumn("image_id", F.concat(F.lit("img-"), F.col("doc_id")))
        .withColumn(
            "pixels",
            F.expr(
                "transform(sequence(0, w*h - 1), k ->"
                " ( ((k div w) * 8 div h) * (37 + (base*23) % 201)"
                " + (((k % w) * 8 div w)) * (59 + (base*41) % 149)"
                " + (k*7) % 11 ) % 256)"
            ),
        )
    )
    return caps, imgs


def q_multimodal_neardup(spark, sf_dir):
    """Joint-modality near-dup over (image, caption) rows — an
    image+caption pair is a duplicate only when BOTH modalities agree:
    caption 4-gram Jaccard ≥ 0.2 (df-capped shingle join) AND decoded
    image phash Hamming ≤ 8 (banded pair join), intersected on the
    pair key. This is the dedup rule a captioned-image training
    pipeline actually wants: same picture + rewritten caption, or same
    boilerplate caption + different picture, are NOT duplicates. Both
    sides stay banded/blocked (never all-pairs); the intersection is
    an equi-join on (id_a, id_b). Planted structure: %10==9 duplicates
    both modalities (kept), %10==3 duplicates pixels only (dropped) —
    the DuckDB twin restates captions, shingles, pixel formula, phash
    bits, and both thresholds."""
    from crawler_spark.multimodal import phash_udf_frame
    from crawler_spark.operators.dedup import (
        ngram_jaccard_pairs, phash_neardup_pairs,
    )

    caps, imgs = _mm_frame(spark, sf_dir)
    txt = ngram_jaccard_pairs(
        caps, "caption", "doc_id", threshold=0.2, df_cap=3
    ).select("id_a", "id_b", "jaccard")
    ph = phash_udf_frame(imgs).withColumn(
        "doc_n", F.regexp_extract("image_id", "([0-9]+)$", 1).cast("bigint")
    )
    img = phash_neardup_pairs(ph, "phash2", "doc_n", max_hamming=8).select(
        "id_a", "id_b", "hamming"
    )
    return txt.join(img, ["id_a", "id_b"]).select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard"), "hamming"
    )


def q_image_shard_pack(spark, sf_dir):
    """Training-export shard planning (webdataset-style): pack the image
    corpus into 16-row shards under the doc_id total order and emit the
    per-shard manifest (row count, payload bytes, id range) — the last
    mile of the pipeline, planned over SLIM metadata rows (id + encoded
    byte size from the codec arithmetic: 9-byte header + w·h payload)
    so the binary payload is shuffled once by the writer, never by the
    planning. The operator's 100 TB shape (pack_shards): range
    repartition → per-partition local ranks → bounded #partitions-row
    offset collect → broadcast join — NO single-partition global
    window. DuckDB restates the global row_number and the same shard
    arithmetic."""
    from crawler_spark.operators.sharding import pack_shards

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    meta = d.select(
        "doc_id",
        (
            F.lit(9)
            + (8 * (1 + F.col("doc_id") % 3)) * (8 * (1 + F.col("doc_id") % 4))
        )
        .cast("long")
        .alias("n_bytes"),
    )
    packed = pack_shards(meta, ["doc_id"], 16)
    return packed.groupBy("shard_id").agg(
        F.count("*").alias("n_rows"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def q_train_val_split(spark, sf_dir):
    """Deterministic train/val holdout over the corpus: a row is 'val'
    iff its md5-based 61-bit key hash lands in the first 10 of 100
    buckets — content-seeded, so the same row keeps its split across
    re-runs, cluster sizes, and the DuckDB twin (the W6 sampler's hash
    idiom). Pure per-row column math, no shuffle, no rand()."""
    from crawler_spark.operators.sharding import hash_split

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return hash_split(d.select("doc_id"), ["doc_id"], 10).select(
        "doc_id", "split"
    )


def q_caption_image_align(spark, sf_dir):
    """Cross-modal alignment gate — the CLIP-score filter a captioned-
    image training pipeline runs before anything else (keep a pair only
    when the caption actually describes the picture; reference analog:
    the crawler trusts anchor-text ↔ target-page agreement the same
    way). Both modalities are embedded into the SAME 64-dim space:
    the image side from DECODED bytes (block_embedding — exact int64
    8×8 block sums, one mapInPandas pass), the caption side parsed out
    of genuine caption TEXT (split → slice → cast, all JVM) whose
    tokens quantize the scene's block-gradient. cosine = dot /
    sqrt(na·nb) where dot/na/nb are exact integer sums — the one sqrt
    and one divide are single correctly-rounded IEEE ops, so the DuckDB
    twin (which restates the pixel formula, the caption formula, and
    the same arithmetic) hash-matches bit-for-bit. Planted noise:
    doc_id%7==3 carries the caption of doc_id-2 (wrong alt-text, the
    web's favorite defect) — measured cosine ≤ 0.818 vs ≥ 0.934 for
    true pairs, so the 0.875 gate splits them with margin both sides
    (pinned in tests/test_multimodal.py). 100 TB shape: bytes never
    leave the decode scan; the join carries (image_id, 64×int64) only;
    misaligned pairs drop before any expensive downstream stage."""
    from crawler_spark.multimodal import block_embedding

    iv = block_embedding(_oracle_image_frame(spark, sf_dir))
    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    caps = (
        d.select(
            "doc_id",
            (
                F.col("doc_id")
                - F.when(
                    (F.col("doc_id") % 7 == 3) & (F.col("doc_id") >= 2), 2
                ).otherwise(0)
            ).alias("cap_src"),
        )
        .withColumn(
            "cap_base",
            F.col("cap_src")
            - F.when(F.col("cap_src") % 10 == 9, 1).otherwise(0),
        )
        .withColumn(
            "caption",
            F.expr(
                "concat('alt photo ', cast(cap_src as string), ' ',"
                " concat_ws(' ', transform(sequence(0, 63), i -> cast("
                " ((i div 8) * (37 + (cap_base*23) % 201)"
                " + (i % 8) * (59 + (cap_base*41) % 149) + 5) % 256"
                " as string))))"
            ),
        )
    )
    # the caption VECTOR comes back out of the text, not the formula —
    # a broken tokenizer breaks the hash
    parsed = caps.select(
        F.concat(F.lit("img-"), F.col("doc_id")).alias("image_id"),
        "cap_src",
        F.expr(
            "transform(slice(split(caption, ' '), 4, 64),"
            " t -> cast(t as bigint))"
        ).alias("cap_vec"),
    )
    scored = iv.join(parsed, "image_id").select(
        "image_id",
        F.col("cap_src").cast("int").alias("cap_src"),
        F.expr(
            "aggregate(zip_with(img_vec, cap_vec, (x, y) -> x*y),"
            " 0L, (a, x) -> a + x)"
        ).alias("dot"),
        F.expr("aggregate(img_vec, 0L, (a, x) -> a + x*x)").alias("na"),
        F.expr("aggregate(cap_vec, 0L, (a, x) -> a + x*x)").alias("nb"),
    )
    cos = F.col("dot") / F.sqrt((F.col("na") * F.col("nb")).cast("double"))
    return scored.select(
        "image_id",
        "cap_src",
        cos.alias("cosine"),
        (cos >= 0.875).alias("aligned"),
    )


def q_image_profile_corrupt(spark, sf_dir):
    """Corrupt-blob quarantine — the 100 TB posture for binary scans:
    some fraction of fetched image payloads IS garbage (truncated
    transfers, non-image bytes behind an image URL), and one such row
    must become a classified quarantine row, never a dead executor
    task. Planted defects over the oracle image corpus: doc_id%13==11
    swaps the bytes for non-image text (err='bad_magic'), doc_id%13==7
    truncates the real blob to 12 bytes — a VALID header whose payload
    is missing (err='truncated', the nastier case: naive header sniffing
    passes it). `image_profile(on_error="quarantine")` classifies both
    in the same single decode pass that profiles the healthy rows;
    healthy rows keep their exact-integer stats. DuckDB restates the
    defect rules and the formula stats; both planted classes are
    non-vacuous (7 truncated + 7 bad-magic of 100) and pinned in
    tests/test_multimodal.py along with raise-mode still raising."""
    from crawler_spark.multimodal import image_profile

    enc = _oracle_image_frame(spark, sf_dir).withColumn(
        "doc_n", F.regexp_extract("image_id", "([0-9]+)$", 1).cast("bigint")
    )
    damaged = enc.select(
        "image_id",
        F.when(
            F.col("doc_n") % 13 == 11,
            F.encode(F.concat(F.lit("GARBAGE-"), F.col("doc_n")), "utf-8"),
        )
        .when(F.col("doc_n") % 13 == 7, F.expr("substring(bytes, 1, 12)"))
        .otherwise(F.col("bytes"))
        .alias("bytes"),
    )
    prof = image_profile(damaged, on_error="quarantine")
    return prof.select(
        "image_id",
        F.when(F.col("err").isNull(), F.lit("ok"))
        .otherwise(F.lit("quarantined"))
        .alias("status"),
        "err",
        "dec_w",
        "dec_h",
        "dec_fmt",
        "mean_px",
        "std_px",
    )


def q_image_ann_topk(spark, sf_dir):
    """Image-to-image retrieval over the content embedding: decode →
    `block_embedding` (64 exact-int block sums) → the SAME hyperplane-
    LSH ANN operator the text embeddings use (`lsh_ann_topk`: bucket
    equi-join, no cross product, corpus bucketed once and reused across
    query batches) → exact cosine re-rank. Every image whose id ends
    in 0 queries the full 100-image corpus for its 3 nearest neighbors.
    Because the embedding components are integers, dot and norms are
    EXACT in doubles regardless of summation order — the cross-engine
    ranking cannot flip on float noise (stronger than the text-embedding
    twin, which leans on round-4). DuckDB restates pixel formula →
    block sums → the deterministic integer hyperplanes → buckets →
    cosine → rank."""
    from crawler_spark.multimodal import block_embedding
    from crawler_spark.operators.similarity import lsh_ann_topk

    iv = block_embedding(_oracle_image_frame(spark, sf_dir)).select(
        F.regexp_extract("image_id", "([0-9]+)$", 1)
        .cast("bigint")
        .alias("vec_id"),
        F.col("img_vec").cast("array<double>").alias("embedding"),
    )
    q = iv.filter(F.col("vec_id") % 10 == 0)
    return lsh_ann_topk(iv, q, k=3, n_planes=6, n_tables=2).select(
        "q_id", "n_id", F.round("cosine", 4).alias("cosine"), "rank"
    )


def _ingest_image_frame(spark, sf_dir):
    """Image corpus for the incremental-ingest dedup: docs 0..59 are the
    EXISTING reference corpus (base=doc, fmt by doc%2); docs 60..119 are
    the INCOMING batch with planted cross-boundary relationships —
    d%10==3 is a byte-EXACT copy of existing doc d-61 (same base, same
    fmt), d%10==7 is a lossy NEAR-dup of existing doc d-61 (same base,
    flipped png↔jpeg), d%10==9 stays the near-dup of INCOMING doc d-1
    (the negative control: a within-batch dup must NOT match the
    reference corpus). All rules are doc_id arithmetic, so DuckDB
    restates every stage."""
    from crawler_spark.multimodal import encode_pixels

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    incoming = F.col("doc_id") >= 60
    base = (
        F.when(incoming & (F.col("doc_id") % 10).isin(3, 7), F.col("doc_id") - 61)
        .when(F.col("doc_id") % 10 == 9, F.col("doc_id") - 1)
        .otherwise(F.col("doc_id"))
    )
    df = d.select("doc_id", base.alias("base"))
    fmt = (
        F.when(
            incoming & (F.col("doc_id") % 10 == 3),
            F.when(F.col("base") % 2 == 1, F.lit("jpeg")).otherwise(F.lit("png")),
        )
        .when(
            incoming & (F.col("doc_id") % 10 == 7),
            F.when(F.col("base") % 2 == 1, F.lit("png")).otherwise(F.lit("jpeg")),
        )
        .otherwise(
            F.when(F.col("doc_id") % 2 == 1, F.lit("jpeg")).otherwise(F.lit("png"))
        )
    )
    df = (
        df.withColumn("fmt", fmt)
        .withColumn("w", (F.lit(8) * (1 + F.col("base") % 3)).cast("int"))
        .withColumn("h", (F.lit(8) * (1 + F.col("base") % 4)).cast("int"))
        .withColumn("image_id", F.concat(F.lit("img-"), F.col("doc_id")))
        .withColumn(
            "pixels",
            F.expr(
                "transform(sequence(0, w*h - 1), k ->"
                " ( ((k div w) * 8 div h) * (37 + (base*23) % 201)"
                " + (((k % w) * 8 div w)) * (59 + (base*41) % 149)"
                " + (k*7) % 11 ) % 256)"
            ),
        )
    )
    return encode_pixels(df)


def q_image_incremental_dedup(spark, sf_dir):
    """Incremental-ingest dedup — the production cadence at 100 TB is
    never 'dedup the corpus', it is 'dedup TODAY'S batch against the
    reference corpus': one `image_profile` decode pass over both sides,
    then (a) byte-exact matches by md5 byte_key equi-join against the
    existing side, (b) perceptual near-dups via the cross-FRAME banded
    phash join (`phash_neardup_join` — pigeonhole-complete candidates,
    existing side banded once and reusable across increments), with
    exact taking precedence and ties resolved to the smallest existing
    doc. Within-batch near-dups (the %10==9 plants) deliberately do NOT
    match — they are the in-batch pipeline's job, not the ingest
    join's. DuckDB restates byte identity as (base, fmt) equality and
    the near rule as all-pairs formula-phash Hamming ≤ 8 (sound against
    the banding because max_hamming+1 bands make candidates complete)."""
    from crawler_spark.multimodal import image_profile
    from crawler_spark.operators.dedup import phash_neardup_join

    prof = image_profile(_ingest_image_frame(spark, sf_dir)).withColumn(
        "doc_n", F.regexp_extract("image_id", "([0-9]+)$", 1).cast("bigint")
    )
    existing = prof.filter(F.col("doc_n") < 60)
    incoming = prof.filter(F.col("doc_n") >= 60)
    exact = (
        incoming.select("doc_n", "byte_key")
        .join(
            existing.select(
                F.col("byte_key"), F.col("doc_n").alias("m")
            ),
            "byte_key",
        )
        .groupBy("doc_n")
        .agg(F.min("m").alias("exact_match"))
    )
    near = (
        phash_neardup_join(
            incoming.select(F.col("doc_n").alias("id"), "phash2"),
            existing.select(F.col("doc_n").alias("id"), "phash2"),
            "phash2",
            "id",
            max_hamming=8,
        )
        .groupBy(F.col("id_l").alias("doc_n"))
        .agg(F.min("id_r").alias("near_match"))
    )
    return (
        incoming.select("image_id", "doc_n")
        .join(exact, "doc_n", "left")
        .join(near, "doc_n", "left")
        .select(
            "image_id",
            F.when(F.col("exact_match").isNotNull(), F.lit("exact"))
            .when(F.col("near_match").isNotNull(), F.lit("near"))
            .otherwise(F.lit("fresh"))
            .alias("disposition"),
            F.coalesce("exact_match", "near_match").alias("match_doc"),
        )
    )


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash-LSH banded candidate pairs + signature-agreement verify."""
    from crawler_spark.operators.dedup import minhash_lsh_pairs

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    out = minhash_lsh_pairs(d, "text", "doc_id", num_hashes=8, bands=4, threshold=0.3)
    return out.select("id_a", "id_b", F.round("est_jaccard", 4).alias("est_jaccard"))


def q_lsh_ann_topk(spark, sf_dir):
    """LSH-bucketed approximate nearest neighbors (hash-oracled: the
    DuckDB twin restates the same hyperplane buckets; recall vs brute
    force additionally asserted in tests/test_similarity.py)."""
    from crawler_spark.operators.similarity import lsh_ann_topk

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 10)
    return lsh_ann_topk(emb, q, k=3, n_planes=6, n_tables=2).select(
        "q_id", "n_id", F.round("cosine", 4).alias("cosine"), "rank"
    )


def q_ivf_topk(spark, sf_dir):
    """IVF partition-pruned ANN, ORACLED: corpus-seeded centroids (the
    8 smallest vec_ids — a deterministic k-means init, no Lloyd rounds)
    → argmin-L2 cell assignment → 2-cell probe per query → exact cosine
    re-rank. DuckDB restates fit+assign+probe+re-rank via list_distance
    / list_cosine_similarity. The Lloyd-converged variant (ivf_topk,
    pyspark.ml KMeans) has a recall-vs-brute pytest gate instead."""
    from crawler_spark.operators.similarity import ivf_seeded_topk

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 5)
    return ivf_seeded_topk(emb, q, k=5, n_cells=8, n_probe=2).select(
        "q_id", "n_id", F.round("cosine", 4).alias("cosine"), "rank"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational core (SURVEY §2.3-2.7)
        "pricing_summary": q_pricing_summary,
        "join_agg": q_join_agg,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "top_order_per_customer": q_top_order_per_customer,
        "topk_lineitems": q_topk_lineitems,
        "running_sum": q_running_sum,
        "mean_variance": q_mean_variance,
        "above_mean": q_above_mean,
        "count_ranked": q_count_ranked,
        "first_event_per_user": q_first_event_per_user,
        "tumbling_hourly": q_tumbling_hourly,
        "stream_tumbling_hourly": q_stream_tumbling_hourly,
        "stream_politeness_throttle": q_stream_politeness_throttle,
        "stream_seen_dedup": q_stream_seen_dedup,
        "sessionize": q_sessionize,
        "json_props": q_json_props,
        # text analysis
        "token_counts": q_token_counts,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "token_overlap_consec": q_token_overlap_consec,
        # dedup family
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "multimodal_neardup": q_multimodal_neardup,
        "caption_image_align": q_caption_image_align,
        "image_profile_corrupt": q_image_profile_corrupt,
        "image_shard_pack": q_image_shard_pack,
        "train_val_split": q_train_val_split,
        "image_ann_topk": q_image_ann_topk,
        "image_incremental_dedup": q_image_incremental_dedup,
        "simhash": q_simhash,
        "phash_neardup": q_phash_neardup,
        # similarity search
        "embed_topk": q_embed_topk,
        "embed_lsh_bucket": q_embed_lsh_bucket,
        "embed_cosine_neardup": q_embed_cosine_neardup,
        "lsh_ann_topk": q_lsh_ann_topk,
        "ivf_topk": q_ivf_topk,
        # crawl graph (SURVEY §2.2, §2.12)
        "link_extract": q_link_extract,
        "html_extract": q_html_extract,
        "html_extract_positioned": q_html_extract_positioned,
        "date_indexed_detect": q_date_indexed_detect,
        "fixture_anchor_stats": q_fixture_anchor_stats,
        "diverse_records_detect": q_diverse_records_detect,
        "crawl_epoch_oracle": q_crawl_epoch_oracle,
        "harvest_step_oracle": q_harvest_step_oracle,
        "ttl_expiry_oracle": q_ttl_expiry_oracle,
        "rtdm_consec": q_rtdm_consec,
        "url_seen_antijoin": q_url_seen_antijoin,
        "politeness_quota": q_politeness_quota,
        "host_page_counts": q_host_page_counts,
        "pagination_pick": q_pagination_pick,
        "xpath_char_score": q_xpath_char_score,
        "template_incidence": q_template_incidence,
        "dominated_prune": q_dominated_prune,
        "enum_scores": q_enum_scores,
        "yield_estimate": q_yield_estimate,
        "signature_cosine_consec": q_signature_cosine_consec,
        "connected_components": q_connected_components,
        "char_freq_cosine": q_char_freq_cosine,
        "leaf_features": q_leaf_features,
        "nb_leaf_classifier": q_nb_leaf_classifier,
        "plan_ordering": q_plan_ordering,
        "seeded_sample": q_seeded_sample,
        "weighted_pick": q_weighted_pick,
        "training_data_pipeline": q_training_data_pipeline,
        "pagination_detect": q_pagination_detect,
        "dedup_clusters": q_dedup_clusters,
        # engine / multimodal (all hash-oracled via chained CTEs /
        # deterministic-decoder twins since rounds 3-4)
        "crawl_epoch": q_crawl_epoch,
        "crawl_image_harvest": q_crawl_image_harvest,
        "crawl_harvest": q_crawl_harvest,
        "crawl_harvest_refined": q_crawl_harvest_refined,
        "crawl_paging_refined": q_crawl_paging_refined,
        "paging_model_learn": q_paging_model_learn,
        "fix_model_seqs": q_fix_model_seqs,
        "crawl_ttl": q_crawl_ttl,
        "crawl_depth_indexed": q_crawl_depth_indexed,
        "crawl_multiseq": q_crawl_multiseq,
        "crawl_harvest_only": q_crawl_harvest_only,
        "fix_model": q_fix_model,
        "signature_sims": q_signature_sims,
        "exemplar_step": q_exemplar_step,
        "crawl_exemplar": q_crawl_exemplar,
        "action_seq_yields": q_action_seq_yields,
        "image_decode_stats": q_image_decode_stats,
        "image_psnr": q_image_psnr,
        "image_neardup": q_image_neardup,
        "image_training_pipeline": q_image_training_pipeline,
        "image_resize_stats": q_image_resize_stats,
        "video_frame_sample": q_video_frame_sample,
    }


def _ttl_cte(k: int, ttl: int | None, p: str = "", mat: str = "") -> str:
    """Per-epoch effective-seen CTE: identity without TTL; with TTL the
    engine's expiry (urls last scheduled exactly k-ttl epochs ago leave
    URL-seen at epoch-k start, before the anti-join) is restated from
    the ord{{j}} scheduling history. ``p`` prefixes every chain-local
    CTE name so several chains can share one statement (multiseq)."""
    if ttl is None or k - ttl < 0:
        return f"{p}seeneff{k} AS {mat}(SELECT url FROM {p}seen{k}),"
    later = " UNION ALL ".join(
        f"SELECT url FROM {p}ord{j}" for j in range(k - ttl + 1, k)
    )
    not_later = f" WHERE url NOT IN ({later})" if later else ""
    return f"""{p}expired{k} AS (
  SELECT url FROM {p}ord{k - ttl}{not_later}),
{p}seeneff{k} AS (
  SELECT url FROM {p}seen{k}
  WHERE url NOT IN (SELECT url FROM {p}expired{k})),"""


def _crawl_chain_sql(mode: str, epochs: int | None = None,
                     ttl: int | None = None, seed_docs: tuple | None = None,
                     action_seq: tuple | None = None,
                     pgm: tuple | None = None) -> str:
    """Chained multi-epoch DuckDB restatement of the engine crawl loop
    (sequential-oracle semantics, crawler_spark/oracle.py; reference
    crawl.clj:46-198): per epoch — robots drop, dual-queue per-host
    quota window (content FIFO; paging deepest-src_xpath-first, only on
    hosts with no pending content), link extraction from the fetched
    pages, within-epoch first-wins, seen anti-join, insertion-sequence
    continuation, frontier merge-back. Epochs unroll as CTE blocks.

    Modes: 'plain' (digit→paging, everything else content), 'harvest'
    (execute-model flat classification), 'harvest_refined' (harvest +
    the :avoid refinement over href path tokens, dom.clj:942-1061), and
    'depth' (xpath-to-pick, crawl.clj:200-202 — the frontier carries
    plan depth; a page follows only action_seq[depth]; paging hops keep
    the parent depth).

    ``ttl=T`` adds the engine's recrawl-TTL expiry to every epoch k >= T
    (EngineConfig.recrawl_ttl_epochs; oracle.py:123-132): at epoch
    start, urls whose LATEST scheduling epoch equals k-T leave URL-seen,
    so later re-discovery enqueues and recrawls them — the final order
    then legitimately contains the same url at two seqs."""
    epochs = N_CRAWL_EPOCHS if epochs is None else epochs
    parts = [
        _chain_header(seed_docs=seed_docs),
        _chain_epoch_blocks(mode, epochs, ttl=ttl, action_seq=action_seq,
                            pgm=pgm),
    ]
    union = " UNION ALL ".join(f"SELECT * FROM ord{i}" for i in range(epochs))
    parts.append(f"""
all_ord AS ({union})
SELECT CAST(seq AS BIGINT) AS seq, url, CAST(epoch AS BIGINT) AS epoch
FROM all_ord""")
    return "\n".join(parts)


def _chain_header(materialize: bool = False, links_cte: str | None = None,
                  recursive: bool = False,
                  seed_docs: tuple | None = None) -> str:
    """Shared WITH header for every crawl-chain restatement: the link
    arithmetic + the seed frontier rows. ``materialize`` marks the
    shared CTEs MATERIALIZED — required by the multi-chain multiseq
    statement, where inlined re-expansion would re-open the documents
    parquet once per reference and exhaust the fd limit. ``links_cte``
    swaps in a different link graph (the exemplar chain's 6-link/
    2-xpath variant); ``recursive`` emits WITH RECURSIVE (needed when
    the chain embeds the single-linkage reach CTEs)."""
    links = (links_cte or _LINKS_CTE).strip().lstrip("WITH").strip()
    if materialize:
        links = links.replace("links AS (", "links AS MATERIALIZED (", 1).replace(
            "links2 AS (", "links2 AS MATERIALIZED (", 1
        )
    mat = "MATERIALIZED " if materialize else ""
    return (
        f"WITH {'RECURSIVE ' if recursive else ''}{links},"
        + f"""
seeds AS {mat}(
  SELECT d.doc_id, d.doc_id % {N_HOSTS} AS host,
         'http://host' || CAST(d.doc_id % {N_HOSTS} AS VARCHAR)
           || '.test/p/' || CAST(d.doc_id AS VARCHAR) AS url,
         row_number() OVER (ORDER BY d.doc_id) - 1 AS insertion_seq,
         'content' AS queue, CAST(NULL AS VARCHAR) AS src_xpath,
         0 AS depth
  FROM documents d
  WHERE d.doc_id IN ({", ".join(str(x) for x in (seed_docs or CRAWL_SEED_DOCS))})),"""
    )


_EXL = "abcdefghijklmnopqrstuvwxyz"


def _ex_vec_sql(txt: str) -> str:
    """26 letter-count columns (c_a..c_z) of *txt* — the char-frequency
    vector of crawler_spark/exemplar.py char_vec, integer-exact."""
    return ", ".join(
        f"CAST(length(lower({txt})) - length(replace(lower({txt}), '{ch}', ''))"
        f" AS DOUBLE) AS c_{ch}"
        for ch in _EXL
    )


def _ex_cos_sql(a: str, b: str) -> str:
    """cosine({a}, {b}) over the c_a..c_z columns — same expression
    shape as exemplar.cosine (dot / (sqrt·sqrt), IEEE-deterministic)."""
    dot = " + ".join(f"{a}.c_{ch} * {b}.c_{ch}" for ch in _EXL)
    na = " + ".join(f"{a}.c_{ch} * {a}.c_{ch}" for ch in _EXL)
    nb = " + ".join(f"{b}.c_{ch} * {b}.c_{ch}" for ch in _EXL)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def _chain_epoch_blocks(
    mode: str,
    epochs: int,
    ttl: int | None = None,
    action_seq: tuple | None = None,
    p: str = "",
    budget: str | None = None,
    materialize: bool = False,
    exemplar: float | None = None,
    pgm: tuple | None = None,
) -> str:
    """The per-epoch CTE blocks of ONE crawl chain (no WITH header, no
    final select). Every chain-local CTE name carries prefix ``p`` so
    several chains can share one statement (the multiseq twin).

    ``action_seq`` overrides DEPTH_ACTION_SEQ for mode='depth'.
    ``budget`` is a SQL scalar expression for this chain's max_pages:
    epoch k dequeues only while (pages this chain already scheduled) <
    budget — the engine's epoch-granular max_pages stop
    (engine.py run(): dequeue_seq >= max_pages breaks BEFORE the epoch;
    oracle.py:117 applies the identical rule)."""
    K, ems = N_CRAWL_DOCS, CRAWL_EPOCH_MS
    is_digit = (
        "(regexp_full_match(coalesce(l.text, ''), '[0-9]+') "
        f"OR {_DIGIT_OVERRIDE})"
    )
    depth_mode = mode == "depth"
    cand_filter = ""
    if mode in ("harvest", "harvest_refined", "harvest_only"):
        pg = ", ".join(f"'{x}'" for x in HARVEST_PAGING_XP)
        md = ", ".join(f"'{x}'" for x in HARVEST_MODEL_XP)
        keep_paging = f"({is_digit} AND l.xpath IN ({pg}))"
        cand_filter = (
            f"AND ({keep_paging} OR (NOT {keep_paging} AND l.xpath IN ({md})))"
        )
        queue_case = (
            f"CASE WHEN {keep_paging} THEN 'paging' ELSE 'content' END"
        )
    elif depth_mode:
        seq_xp = DEPTH_ACTION_SEQ if action_seq is None else action_seq
        if pgm is not None:
            # per-source pagination (EngineConfig.paging_model, reference
            # crawl.clj:358-390): under a depth-indexed plan the parent's
            # action path IS the plan prefix of length depth (content
            # hops follow exactly action_seq[depth]; paging hops keep the
            # parent's path), so the engine's path-array keyed lookup
            # restates EXACTLY as a CASE on s.depth. Each entry's
            # refinement gates the hop on the target's url path tokens
            # (['p', tgt] on this graph); a failed link falls through to
            # the content check, as in the engine.
            arms = []
            for key, xp, only, avoid in pgm:
                assert tuple(key) == tuple(seq_xp[: len(key)]), (
                    "pgm keys must be plan prefixes for the depth "
                    "restatement to hold"
                )
                cond = f"(s.depth = {len(key)} AND l.xpath = '{xp}'"
                toks = "['p', CAST(l.tgt AS VARCHAR)]"
                for t in avoid:
                    cond += f" AND NOT list_contains({toks}, '{t}')"
                if only:
                    anyof = ", ".join(f"'{t}'" for t in only)
                    cond += f" AND list_has_any({toks}, [{anyof}])"
                arms.append(cond + ")")
            keep_paging = f"({is_digit} AND ({' OR '.join(arms)}))"
        else:
            pg = ", ".join(f"'{x}'" for x in HARVEST_PAGING_XP)
            keep_paging = f"({is_digit} AND l.xpath IN ({pg}))"
        action = "CASE s.depth " + " ".join(
            f"WHEN {d} THEN '{xp}'" for d, xp in enumerate(seq_xp)
        ) + " END"
        cand_filter = (
            f"AND ({keep_paging} OR (NOT {keep_paging} AND l.xpath = {action}))"
        )
        queue_case = (
            f"CASE WHEN {keep_paging} THEN 'paging' ELSE 'content' END"
        )
    else:
        queue_case = f"CASE WHEN {is_digit} THEN 'paging' ELSE 'content' END"
    if mode == "harvest_refined":
        # engine apply_refinement mirror: href path tokens after
        # scheme://host/ are ['p', tgt]; a hit for the link's xpath
        # drops it before the seen check
        hits = " OR ".join(
            f"(l.xpath = '{xp}' AND list_contains(['p', "
            f"CAST(l.tgt AS VARCHAR)], '{tok}'))"
            for xp, toks in REFINE_AVOID
            for tok in toks
        )
        cand_filter += f" AND NOT ({hits})"
    if mode == "harvest_only":
        # engine apply_refinement :only mirror (dom.clj:603-615): an
        # xpath with a non-empty only-set KEEPS only hrefs whose path
        # tokens (['p', tgt]) carry one of its tokens; other xpaths
        # pass through
        conds = " AND ".join(
            f"(l.xpath != '{xp}' OR list_has_any(['p', "
            f"CAST(l.tgt AS VARCHAR)], [{', '.join(chr(39) + t + chr(39) for t in toks)}]))"
            for xp, toks in REFINE_ONLY_Q
        )
        cand_filter += f" AND ({conds})"

    # MATERIALIZED (multiseq only): each chain CTE is referenced many
    # times (seq bases, later chains' budget guards, the final union);
    # inlined re-expansion is exponential in epochs and re-opens the
    # documents parquet per reference
    mat = "MATERIALIZED " if materialize else ""
    parts = [f"""
{p}frontier0 AS {mat}(SELECT * FROM seeds),
{p}seen0 AS {mat}(SELECT url FROM seeds),"""]
    for k in range(epochs):
        seq_base = " + ".join(
            [f"(SELECT COUNT(*) FROM {p}ord{i})" for i in range(k)]
        ) or "0"
        next_base = " + ".join(
            ["4"] + [f"(SELECT COUNT(*) FROM {p}new{i})" for i in range(k)]
        )
        budget_guard = ""
        if budget is not None:
            budget_guard = f"\n    AND ({seq_base}) < ({budget})"
        parts.append(f"""
{p}allowed{k} AS {mat}(
  SELECT * FROM {p}frontier{k}
  WHERE NOT (host % 4 = 0
             AND starts_with('/p/' || CAST(doc_id AS VARCHAR), '/p/1'))),
{p}pool{k} AS {mat}(
  SELECT a.* FROM {p}allowed{k} a
  WHERE NOT (a.queue = 'paging' AND a.host IN
             (SELECT host FROM {p}allowed{k} WHERE queue = 'content'))),
{p}sel{k} AS {mat}(
  SELECT * FROM (
    SELECT p.*, row_number() OVER (
        PARTITION BY host
        ORDER BY CASE WHEN queue = 'paging'
                      THEN -length(coalesce(src_xpath, '')) ELSE 0 END,
                 insertion_seq) AS rn
    FROM {p}pool{k} p)
  WHERE rn <= GREATEST(1, {ems} // (1000 * (1 + host % 3))){budget_guard}),
{p}ord{k} AS {mat}(
  SELECT url,
         {seq_base} + row_number() OVER (ORDER BY insertion_seq) - 1 AS seq,
         {k} AS epoch
  FROM {p}sel{k}),
{p}cand{k} AS {mat}(
  SELECT l.tgt AS doc_id, l.tgt_host AS host, l.j,
         s.insertion_seq AS src_seq, l.xpath AS src_xpath, l.href AS url,
         {queue_case} AS queue,
         CASE WHEN {queue_case} = 'paging' THEN s.depth
              ELSE s.depth + 1 END AS depth
  FROM links2 l JOIN {p}sel{k} s ON s.doc_id = l.doc_id
  WHERE l.doc_id < {K} AND NOT l.is_js AND NOT l.nofollow
    AND l.tgt_host = l.src_host {cand_filter}),
{p}firstw{k} AS {mat}(
  SELECT * FROM (
    SELECT c.*, row_number() OVER (PARTITION BY url
                                   ORDER BY src_seq, j) AS rn
    FROM {p}cand{k} c)
  WHERE rn = 1),
{_ttl_cte(k, ttl, p, mat)}
{p}new{k} AS {mat}(
  SELECT doc_id, host, url, queue, src_xpath, depth, src_seq,
         {next_base} + row_number() OVER (ORDER BY src_seq, j) - 1
           AS insertion_seq
  FROM {p}firstw{k} f
  WHERE NOT EXISTS (SELECT 1 FROM {p}seeneff{k} sn WHERE sn.url = f.url)),
{_exemplar_ctes(k, exemplar, p, mat)}
{p}frontier{k + 1} AS {mat}(
  SELECT doc_id, host, url, insertion_seq, queue, src_xpath, depth
  FROM {p}allowed{k}
  WHERE insertion_seq NOT IN (SELECT insertion_seq FROM {p}sel{k})
  UNION ALL
  SELECT doc_id, host, url, insertion_seq, queue, src_xpath, depth
  FROM {p}{"newf" if exemplar is not None else "new"}{k}),
{p}seen{k + 1} AS {mat}(SELECT url FROM {p}seeneff{k}
                   UNION ALL SELECT url FROM {p}new{k}),""")
    return "\n".join(parts)


def _exemplar_ctes(k: int, thresh: float | None, p: str, mat: str) -> str:
    """Per-epoch E2 sampling + single-linkage clustering CTEs (engine
    run_epoch exemplar block / oracle.py exemplar branch): per
    (source row, xpath) group of the epoch's seen-surviving candidates,
    md5-order sample of max(10, n//4); sampled urls that ARE corpus
    pages get the documents text as caption; components of the
    cosine ≥ threshold graph cluster single-linkage; the exemplar is
    each component's smallest url (url = MIN(reach) ⟺ exemplar);
    newf{k} = the frontier-entering subset. Sampled misses (target
    outside the corpus) and unsampled survivors never expand — but ALL
    survivors stay in URL-seen (seen{k+1} reads new{k}, not newf{k})."""
    if thresh is None:
        return ""
    h61 = _H61.format(x="s.url")
    return f"""
{p}exrank{k} AS {mat}(
  SELECT s.*, row_number() OVER (PARTITION BY src_seq, src_xpath
                                 ORDER BY {h61}, s.url) AS srn,
         COUNT(*) OVER (PARTITION BY src_seq, src_xpath) AS gn
  FROM {p}new{k} s),
{p}exsamp{k} AS {mat}(
  SELECT * FROM {p}exrank{k} WHERE srn <= GREATEST(10, gn // 4)),
{p}exvec{k} AS {mat}(
  SELECT s.src_seq, s.src_xpath, s.url, {_ex_vec_sql("d.text")}
  FROM {p}exsamp{k} s JOIN documents d ON d.doc_id = s.doc_id
  WHERE s.doc_id < {N_CRAWL_DOCS}),
{p}exprs{k} AS {mat}(
  SELECT a.src_seq, a.src_xpath, a.url AS ua, b.url AS ub
  FROM {p}exvec{k} a JOIN {p}exvec{k} b
    ON a.src_seq = b.src_seq AND a.src_xpath = b.src_xpath
   AND a.url < b.url
  WHERE {_ex_cos_sql("a", "b")} >= {thresh}),
{p}exedg{k} AS {mat}(
  SELECT src_seq, src_xpath, ua, ub FROM {p}exprs{k}
  UNION ALL SELECT src_seq, src_xpath, ub AS ua, ua AS ub FROM {p}exprs{k}),
{p}exreach{k} AS (
  SELECT src_seq, src_xpath, url, url AS r FROM {p}exvec{k}
  UNION
  SELECT e.src_seq, e.src_xpath, e.ua AS url, r.r
  FROM {p}exedg{k} e JOIN {p}exreach{k} r
    ON r.src_seq = e.src_seq AND r.src_xpath = e.src_xpath
   AND r.url = e.ub),
{p}exm{k} AS {mat}(
  SELECT src_seq, src_xpath, url
  FROM (SELECT src_seq, src_xpath, url, MIN(r) AS rep
        FROM {p}exreach{k} GROUP BY 1, 2, 3)
  WHERE url = rep),
{p}newf{k} AS {mat}(
  SELECT n.* FROM {p}new{k} n
  WHERE EXISTS (SELECT 1 FROM {p}exm{k} e WHERE e.url = n.url)),"""


def _exemplar_chain_sql() -> str:
    """Chained DuckDB restatement of the E2 exemplar-sampling crawl
    (q_crawl_exemplar): the plain-mode crawl chain over the dedicated
    6-link/2-xpath graph, with the per-epoch sampling + recursive-CTE
    single-linkage + exemplar-pick blocks between survivor computation
    and frontier merge-back."""
    parts = [
        _chain_header(links_cte=_EX_LINKS_CTE, recursive=True),
        _chain_epoch_blocks("plain", N_CRAWL_EPOCHS, exemplar=EX_CHAIN_THRESH),
    ]
    union = " UNION ALL ".join(
        f"SELECT * FROM ord{i}" for i in range(N_CRAWL_EPOCHS)
    )
    parts.append(f"""
all_ord AS ({union})
SELECT CAST(seq AS BIGINT) AS seq, url, CAST(epoch AS BIGINT) AS epoch
FROM all_ord""")
    return "\n".join(parts)


def _multiseq_sql(plans: tuple, budget: int, epochs: int) -> str:
    """Chained DuckDB restatement of the multi-action-sequence budgeted
    executor (crawler_spark/multiseq.py; reference main.clj:264-287 +
    execute.clj:50-86): one depth-mode crawl chain per planned sequence,
    each chain's max_pages = budget − Σ(pages scheduled by the previous
    chains) — a scalar the later chain's epoch guards reference
    directly, so sequence i+1 demonstrably starts from sequence i's
    depleted budget inside ONE statement. A chain whose remaining
    budget is ≤ 0 schedules nothing (the epoch-0 guard fails), exactly
    the driver's skip."""
    parts = [_chain_header(materialize=True)]
    spent_terms: list = []
    for i, plan in enumerate(plans):
        remaining = str(budget)
        if spent_terms:
            remaining = f"{budget} - ({' + '.join(spent_terms)})"
        parts.append(
            _chain_epoch_blocks(
                "depth", epochs, action_seq=plan, p=f"m{i}_",
                budget=remaining, materialize=True,
            )
        )
        spent_terms.extend(
            f"(SELECT COUNT(*) FROM m{i}_ord{k})" for k in range(epochs)
        )
    union = " UNION ALL ".join(
        f"SELECT {i} AS plan_idx, seq, url, epoch FROM m{i}_ord{k}"
        for i in range(len(plans))
        for k in range(epochs)
    )
    parts.append(f"""
all_ord AS ({union})
SELECT CAST(plan_idx AS BIGINT) AS plan_idx, CAST(seq AS BIGINT) AS seq,
       url, CAST(epoch AS BIGINT) AS epoch
FROM all_ord""")
    return "\n".join(parts)


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}

    sqls["pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
               CAST(round(AVG(l_discount) * 10000) AS BIGINT) AS avg_disc_fp,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY 1, 2
    """
    sqls["join_agg"] = """
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    """
    sqls["anti_join"] = """
        SELECT c_custkey FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """
    sqls["semi_join"] = """
        SELECT p_partkey, p_brand FROM part p
        WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """
    sqls["top_order_per_customer"] = """
        SELECT o_custkey, o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS top_price_cents
        FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) WHERE rn = 1
    """
    sqls["topk_lineitems"] = """
        SELECT l_orderkey, l_linenumber, rnk FROM (
            SELECT l_orderkey, l_linenumber,
                   row_number() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_extendedprice DESC, l_linenumber) AS rnk
            FROM lineitem WHERE l_orderkey < 500)
        WHERE rnk <= 3
    """
    sqls["running_sum"] = """
        SELECT user_id, event_id,
               round(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
        FROM events WHERE user_id < 50
    """
    sqls["mean_variance"] = """
        SELECT l_returnflag,
               round(AVG(l_quantity), 4) AS mean_qty,
               round(var_pop(l_quantity), 4) AS var_qty,
               round(AVG(l_quantity) * var_pop(l_quantity), 2) AS score
        FROM lineitem GROUP BY 1
    """
    sqls["above_mean"] = """
        SELECT o_orderkey FROM (
            SELECT o_orderkey, o_totalprice,
                   AVG(o_totalprice) OVER (PARTITION BY o_custkey) AS m
            FROM orders)
        WHERE o_totalprice >= m
    """
    sqls["count_ranked"] = """
        SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY 1
    """
    sqls["first_event_per_user"] = """
        SELECT user_id, event_id FROM (
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events) WHERE rn = 1
    """
    sqls["tumbling_hourly"] = """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_fp
        FROM events GROUP BY 1, 2
    """
    sqls["stream_tumbling_hourly"] = """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_fp
        FROM events GROUP BY 1, 2
    """
    # stream_politeness_throttle: one AvailableNow drain of the per-host
    # token bucket = the first quota urls per host in event_id order,
    # with released_in_batch = how many the host released in that batch
    sqls["stream_politeness_throttle"] = f"""
        WITH u AS (
            SELECT 'host' || CAST(user_id % {N_HOSTS} AS VARCHAR) AS host,
                   'http://host' || CAST(user_id % {N_HOSTS} AS VARCHAR)
                     || '.test/e/' || CAST(event_id AS VARCHAR) AS url,
                   event_id
            FROM events),
        ranked AS (
            SELECT host, url,
                   row_number() OVER (PARTITION BY host ORDER BY event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY host) AS n
            FROM u)
        SELECT host, url, CAST(LEAST(5, n) AS INTEGER) AS released_in_batch
        FROM ranked WHERE rn <= 5
    """
    # streaming URL-seen with watermark TTL: restate the committed-
    # watermark sequence (max input t through batch b, minus delay —
    # dropped duplicates still advance it) and the unrolled microbatch
    # recurrence pinned by experiment:
    #   late(b):  t + 60 <= wm(b-1)   (operator watermark during b)
    #   live(b):  some prior EMITTED (url, t0) with t0 + 60 > wm(b-2)
    #             (eviction runs at batch END, one batch behind the
    #              late-filter watermark)
    sqls["stream_seen_dedup"] = """
        WITH us AS (SELECT unnest(range(0, 10)) AS u),
        ev AS (
          SELECT 0 AS b, 'u' || u AS url, 100 + u AS t FROM us
          UNION ALL
          SELECT 1, 'u' || u,
                 CASE WHEN u < 5 THEN 200 + u
                      WHEN u = 9 THEN 500 ELSE 210 + u END FROM us
          UNION ALL
          SELECT 2, 'u' || u, 600 + u FROM us
          UNION ALL
          SELECT 3, 'u' || u, 700 + u FROM us
          UNION ALL
          SELECT 3, 'u' || u, 300 + u FROM us
        ),
        wm AS (
          SELECT b, MAX(MAX(t)) OVER (ORDER BY b) - 60 AS w
          FROM ev GROUP BY b
        ),
        e0 AS (SELECT url, t FROM ev WHERE b = 0),
        e1 AS (
          SELECT ev.url, ev.t FROM ev
          WHERE ev.b = 1
            AND NOT (ev.t + 60 <= (SELECT w FROM wm WHERE b = 0))
            AND NOT EXISTS (SELECT 1 FROM e0 p WHERE p.url = ev.url)
        ),
        e2 AS (
          SELECT ev.url, ev.t FROM ev
          WHERE ev.b = 2
            AND NOT (ev.t + 60 <= (SELECT w FROM wm WHERE b = 1))
            AND NOT EXISTS (
              SELECT 1 FROM (SELECT * FROM e0 UNION ALL SELECT * FROM e1) p
              WHERE p.url = ev.url
                AND p.t + 60 > (SELECT w FROM wm WHERE b = 0))
        ),
        e3 AS (
          SELECT ev.url, ev.t FROM ev
          WHERE ev.b = 3
            AND NOT (ev.t + 60 <= (SELECT w FROM wm WHERE b = 2))
            AND NOT EXISTS (
              SELECT 1 FROM (SELECT * FROM e0 UNION ALL SELECT * FROM e1
                             UNION ALL SELECT * FROM e2) p
              WHERE p.url = ev.url
                AND p.t + 60 > (SELECT w FROM wm WHERE b = 1))
        )
        SELECT url, CAST(t AS BIGINT) AS t
        FROM (SELECT * FROM e0 UNION ALL SELECT * FROM e1
              UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3)
    """
    sqls["json_props"] = """
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_fp
        FROM events GROUP BY 1
    """
    sqls["sessionize"] = """
        WITH lagged AS (
            SELECT user_id, event_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events),
        flags AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN prev_ts IS NULL
                             OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_sess
            FROM lagged),
        sess AS (
            SELECT user_id,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM flags)
        SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        FROM sess GROUP BY 1
    """
    sqls["token_counts"] = f"""
        WITH norm AS (SELECT doc_id, text, {_NORM} AS t FROM documents),
        toks AS (SELECT doc_id, text, string_split(t, ' ') AS ts FROM norm),
        exploded AS (SELECT doc_id, unnest(ts) AS tok FROM toks)
        SELECT t.doc_id,
               CAST(len(t.ts) AS INTEGER) AS n_tokens,
               (SELECT CAST(SUM(CAST(ceil(length(e.tok) / 4.0) AS BIGINT)) AS BIGINT)
                FROM exploded e WHERE e.doc_id = t.doc_id) AS n_subwords,
               CAST(length(t.text) AS INTEGER) AS n_chars_raw
        FROM toks t
    """
    stop_en = "('the','and','of','to','in','is','that','with')"
    sqls["text_quality"] = f"""
        WITH norm AS (SELECT doc_id, text, {_NORM} AS t FROM documents),
        toks AS (SELECT doc_id, text, string_split(t, ' ') AS ts FROM norm),
        stats AS (
            SELECT doc_id,
                   CAST(len(ts) AS INTEGER) AS n_tokens,
                   length(text) AS n_chars,
                   length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
                   len(list_filter(ts, x -> x IN {stop_en})) AS n_stop
            FROM toks)
        SELECT doc_id, n_tokens,
               round(CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0 END, 4) AS punct_ratio,
               round(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0 END, 4) AS stop_ratio,
               round(
                 least(n_tokens / 100.0, 1.0) * 0.4
                 + least((CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0 END) * 4.0, 1.0) * 0.4
                 + (1.0 - least((CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0 END) * 10.0, 1.0)) * 0.2
               , 4) AS quality
        FROM stats
    """
    lang_lists = {
        "de": "('der','die','und','das','ist','nicht','ein','mit')",
        "en": "('the','and','of','to','in','is','that','with')",
        "es": "('el','la','los','que','es','una','con','por')",
        "fr": "('le','la','et','les','des','est','une','dans')",
    }
    hits = ", ".join(
        f"len(list_filter(ts, x -> x IN {words})) AS hits_{lang}"
        for lang, words in lang_lists.items()
    )
    # argmax with (hits desc, lang asc) tie-break mirrors the Spark
    # rank = hits*1000 - index encoding
    sqls["lang_id"] = f"""
        WITH norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
        toks AS (SELECT doc_id, string_split(t, ' ') AS ts FROM norm),
        h AS (SELECT doc_id, {hits} FROM toks),
        ranked AS (
            SELECT doc_id, greatest(hits_de*1000 - 0, hits_en*1000 - 1,
                                    hits_es*1000 - 2, hits_fr*1000 - 3) AS best,
                   hits_de, hits_en, hits_es, hits_fr
            FROM h)
        SELECT doc_id,
               CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr) = 0 THEN 'und'
                    WHEN best = hits_de*1000 - 0 THEN 'de'
                    WHEN best = hits_en*1000 - 1 THEN 'en'
                    WHEN best = hits_es*1000 - 2 THEN 'es'
                    ELSE 'fr' END AS pred_lang
        FROM ranked
    """
    sqls["doc_fingerprint"] = f"""
        WITH {_SHINGLES_CTE.strip().lstrip()},
        hashed AS (SELECT DISTINCT doc_id, {_H61.format(x='s')} AS h FROM sh),
        ranked AS (SELECT doc_id, h,
                          row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn
                   FROM hashed)
        SELECT doc_id, string_agg(CAST(h AS VARCHAR), '-' ORDER BY h) AS fingerprint
        FROM ranked WHERE rn <= 8 GROUP BY doc_id
    """
    sqls["dedup_exact"] = f"""
        WITH norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
        hashed AS (SELECT doc_id, {_H61.format(x='t')} AS th FROM norm)
        SELECT doc_id, MIN(doc_id) OVER (PARTITION BY th) AS dup_of FROM hashed
    """
    sqls["ngram_jaccard"] = f"""
        WITH {_SHINGLES_CTE.strip().lstrip()},
        hashed0 AS (SELECT DISTINCT doc_id, {_H61.format(x='s')} AS h FROM sh),
        keepable AS (SELECT h FROM hashed0 GROUP BY h HAVING COUNT(*) <= 3),
        hashed AS (SELECT hashed0.* FROM hashed0 JOIN keepable USING (h)),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM hashed GROUP BY 1),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS m
                  FROM hashed a JOIN hashed b ON a.h = b.h AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(m / CAST(sa.sz + sb.sz - m AS DOUBLE), 4) AS jaccard
        FROM inter JOIN sizes sa ON sa.doc_id = id_a
                   JOIN sizes sb ON sb.doc_id = id_b
        WHERE m / CAST(sa.sz + sb.sz - m AS DOUBLE) >= 0.2
    """
    sqls["minhash_signatures"] = f"""
        WITH docs AS (SELECT * FROM documents WHERE doc_id < 200),
        norm AS (SELECT doc_id, {_NORM} AS t FROM docs),
        toks AS (SELECT doc_id, string_split(t, ' ') AS ts FROM norm),
        sh AS (SELECT DISTINCT doc_id, ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS s
               FROM toks JOIN generate_series(0, 2000) g(i) ON i <= len(ts) - 4),
        hashed AS (SELECT DISTINCT doc_id, ({_H61.format(x='s')}) % 2147483647 AS x FROM sh),
        expanded AS (SELECT doc_id, x, CAST(g.i AS INTEGER) AS hash_idx
                     FROM hashed JOIN generate_series(0, 7) g(i) ON true)
        SELECT doc_id, hash_idx,
               MIN(((hash_idx * 2 + 1) * x + hash_idx * 7919 + 1) % 2147483647) AS minhash
        FROM expanded GROUP BY 1, 2
    """
    sqls["minhash_lsh_pairs"] = f"""
        WITH docs AS (SELECT * FROM documents WHERE doc_id < 200),
        norm AS (SELECT doc_id, {_NORM} AS t FROM docs),
        toks AS (SELECT doc_id, string_split(t, ' ') AS ts FROM norm),
        sh AS (SELECT DISTINCT doc_id, ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS s
               FROM toks JOIN generate_series(0, 2000) g(i) ON i <= len(ts) - 4),
        hashed AS (SELECT DISTINCT doc_id, ({_H61.format(x='s')}) % 2147483647 AS x FROM sh),
        expanded AS (SELECT doc_id, x, CAST(g.i AS INTEGER) AS hash_idx
                     FROM hashed JOIN generate_series(0, 7) g(i) ON true),
        sig AS (SELECT doc_id, hash_idx,
                       MIN(((hash_idx * 2 + 1) * x + hash_idx * 7919 + 1) % 2147483647) AS minhash
                FROM expanded GROUP BY 1, 2),
        banded AS (SELECT doc_id, hash_idx // 2 AS band,
                          list(minhash ORDER BY hash_idx) AS band_sig
                   FROM sig GROUP BY 1, 2),
        cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                 FROM banded x JOIN banded y
                   ON x.band = y.band AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id),
        agree AS (SELECT c.id_a, c.id_b,
                         SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) / 8.0 AS est
                  FROM cand c
                  JOIN sig sa ON sa.doc_id = c.id_a
                  JOIN sig sb ON sb.doc_id = c.id_b AND sb.hash_idx = sa.hash_idx
                  GROUP BY 1, 2)
        SELECT id_a, id_b, round(est, 4) AS est_jaccard FROM agree WHERE est >= 0.3
    """
    sqls["simhash"] = f"""
        WITH docs AS (SELECT * FROM documents WHERE doc_id < 200),
        norm AS (SELECT doc_id, {_NORM} AS t FROM docs),
        toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm),
        nonempty AS (SELECT doc_id, tok, {_H61.format(x='tok')} AS x
                     FROM toks WHERE tok <> ''),
        contrib AS (SELECT doc_id, CAST(g.i AS INTEGER) AS bit,
                           CASE WHEN (x >> g.i) & 1 = 1 THEN 1 ELSE -1 END AS v
                    FROM nonempty JOIN generate_series(0, 15) g(i) ON true),
        sums AS (SELECT doc_id, bit, SUM(v) AS s FROM contrib GROUP BY 1, 2)
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
        FROM sums GROUP BY 1
    """
    # image queries: restate the generative pixel formula (never the
    # bytes) — px = ((br)*(37+(base*23)%201) + (bc)*(59+(base*41)%149)
    # + (k*7)%11) % 256, jpeg quantizes to even; stats/phash recomputed
    # from exact integer sums, so a hash match certifies the Spark-side
    # encode → binary column → Arrow → decode round-trip end to end.
    _IMG_PX_CTE = """
        WITH imgs AS (
          SELECT doc_id,
                 doc_id - CASE WHEN doc_id % 10 = 9 THEN 1 ELSE 0 END AS base,
                 CASE WHEN doc_id % 2 = 1 THEN 'jpeg' ELSE 'png' END AS fmt
          FROM documents WHERE doc_id < 100
        ),
        dims AS (
          SELECT doc_id, base, fmt,
                 8*(1 + base % 3) AS w, 8*(1 + base % 4) AS h
          FROM imgs
        ),
        praw AS (
          SELECT d.doc_id, d.w, d.h, d.fmt,
                 (t.k // d.w) * 8 // d.h AS br,
                 (t.k % d.w) * 8 // d.w AS bc,
                 ( ((t.k // d.w) * 8 // d.h) * (37 + (d.base*23) % 201)
                 + ((t.k % d.w) * 8 // d.w) * (59 + (d.base*41) % 149)
                 + (t.k*7) % 11 ) % 256 AS p
          FROM dims d, LATERAL (SELECT unnest(range(0, d.w*d.h)) AS k) t
        ),
        px AS (
          SELECT doc_id, w, h, fmt, br, bc,
                 CASE WHEN fmt = 'jpeg' THEN p - (p % 2) ELSE p END AS q
          FROM praw
        )
    """
    sqls["image_decode_stats"] = _IMG_PX_CTE + """
        , agg AS (
          SELECT doc_id, w, h, fmt, COUNT(*) AS n,
                 CAST(SUM(q) AS BIGINT) AS s, CAST(SUM(q*q) AS BIGINT) AS sq
          FROM px GROUP BY 1, 2, 3, 4
        )
        SELECT 'img-' || doc_id AS image_id,
               CAST(w AS INTEGER) AS dec_w, CAST(h AS INTEGER) AS dec_h,
               fmt AS dec_fmt,
               s / n AS mean_px,
               sqrt((n*sq - s*s) / (n*n)) AS std_px
        FROM agg
    """
    # per-row codec fidelity: quantize-to-even ⇒ squared error per pixel
    # is p % 2 (jpeg) / 0 (png); PSNR from the same exact-integer sums
    # and the identical double-precision formula the Spark side uses.
    sqls["image_psnr"] = _IMG_PX_CTE + """
        , agg AS (
          SELECT doc_id, fmt, COUNT(*) AS n,
                 CAST(SUM(CASE WHEN fmt = 'jpeg' THEN p % 2 ELSE 0 END)
                      AS BIGINT) AS err
          FROM praw GROUP BY 1, 2
        )
        SELECT 'img-' || doc_id AS image_id,
               fmt,
               CAST(n AS INTEGER) AS n_px,
               err AS err_sq,
               CAST(err AS DOUBLE) / n AS mse,
               CASE WHEN err = 0 THEN NULL
                    ELSE 10.0 * log10(65025.0 * n / err) END AS psnr_db,
               (err = 0 OR 10.0 * log10(65025.0 * n / err) >= 40.0) AS psnr_ok
        FROM agg
    """
    sqls["image_neardup"] = _IMG_PX_CTE + """
        , tot AS (
          SELECT doc_id, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS s
          FROM px GROUP BY 1
        ),
        blk AS (
          SELECT doc_id, br, bc, COUNT(*) AS bn, CAST(SUM(q) AS BIGINT) AS bs
          FROM px GROUP BY 1, 2, 3
        ),
        bits AS (
          SELECT b.doc_id, b.br*8 + b.bc AS idx,
                 CASE WHEN (CAST(b.bs AS DOUBLE) / b.bn)
                         > (CAST(t.s AS DOUBLE) / t.n)
                      THEN 1 ELSE 0 END AS bit
          FROM blk b JOIN tot t USING (doc_id)
        ),
        ph AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN bit = 1 THEN (1::HUGEINT << idx)
                               ELSE 0::HUGEINT END)
                      - CASE WHEN MAX(CASE WHEN idx = 63 AND bit = 1
                                          THEN 1 ELSE 0 END) = 1
                             THEN 18446744073709551616::HUGEINT
                             ELSE 0::HUGEINT END AS BIGINT) AS ph
          FROM bits GROUP BY 1
        )
        SELECT 'img-' || a.doc_id AS id_a, 'img-' || b.doc_id AS id_b,
               CAST(bit_count(xor(a.ph, b.ph)) AS INTEGER) AS hamming
        FROM ph a JOIN ph b ON 'img-' || a.doc_id < 'img-' || b.doc_id
        WHERE bit_count(xor(a.ph, b.ph)) <= 8
    """
    # composite image pipeline: restates the _pipeline_image_frame rules
    # (flat %10==7, byte-exact copy %10==5, lossy near-dup %10==9) →
    # stats → quality gate → byte-identity groups ((base, fmt) ⟺ equal
    # bytes, since pixels and dims derive from base and the encoder is
    # deterministic) → phash bits → all-pairs Hamming ≤ 8 among the
    # exact reps → recursive min-reachable closure → per-image stage +
    # canonical. Covers every Spark stage including the single-decode
    # image_profile pass.
    sqls["image_training_pipeline"] = """
        WITH RECURSIVE imgs AS (
          SELECT doc_id,
                 doc_id - CASE WHEN doc_id % 10 IN (5, 9) THEN 1 ELSE 0 END AS base,
                 CASE WHEN doc_id % 10 = 5 THEN 'png'
                      WHEN doc_id % 2 = 1 THEN 'jpeg' ELSE 'png' END AS fmt,
                 (doc_id % 10 = 7) AS flat
          FROM documents WHERE doc_id < 120
        ),
        dims AS (
          SELECT doc_id, base, fmt, flat,
                 8*(1 + base % 3) AS w, 8*(1 + base % 4) AS h
          FROM imgs
        ),
        praw AS (
          SELECT d.doc_id, d.w, d.h, d.fmt, d.base,
                 (t.k // d.w) * 8 // d.h AS br,
                 (t.k % d.w) * 8 // d.w AS bc,
                 CASE WHEN d.flat THEN (37 + (d.base*23) % 201) % 256
                      ELSE ( ((t.k // d.w) * 8 // d.h) * (37 + (d.base*23) % 201)
                           + ((t.k % d.w) * 8 // d.w) * (59 + (d.base*41) % 149)
                           + (t.k*7) % 11 ) % 256 END AS p
          FROM dims d, LATERAL (SELECT unnest(range(0, d.w*d.h)) AS k) t
        ),
        px AS (
          SELECT doc_id, w, h, base, fmt, br, bc,
                 CASE WHEN fmt = 'jpeg' THEN p - (p % 2) ELSE p END AS q
          FROM praw
        ),
        stats AS (
          SELECT doc_id, w, h, base, fmt, COUNT(*) AS n,
                 CAST(SUM(q) AS BIGINT) AS s, CAST(SUM(q*q) AS BIGINT) AS sq
          FROM px GROUP BY 1, 2, 3, 4, 5
        ),
        qual AS (
          SELECT doc_id, base, fmt FROM stats
          WHERE w*h >= 128 AND sqrt((n*sq - s*s) / (n*n)) >= 30.0
        ),
        exact AS (
          SELECT doc_id,
                 MIN(doc_id) OVER (PARTITION BY base, fmt) AS exact_rep
          FROM qual
        ),
        reps AS (SELECT doc_id FROM exact WHERE doc_id = exact_rep),
        tot AS (
          SELECT doc_id, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS s
          FROM px WHERE doc_id IN (SELECT doc_id FROM reps) GROUP BY 1
        ),
        blk AS (
          SELECT doc_id, br, bc, COUNT(*) AS bn, CAST(SUM(q) AS BIGINT) AS bs
          FROM px WHERE doc_id IN (SELECT doc_id FROM reps) GROUP BY 1, 2, 3
        ),
        bits AS (
          SELECT b.doc_id, b.br*8 + b.bc AS idx,
                 CASE WHEN (CAST(b.bs AS DOUBLE) / b.bn)
                         > (CAST(t.s AS DOUBLE) / t.n)
                      THEN 1 ELSE 0 END AS bit
          FROM blk b JOIN tot t USING (doc_id)
        ),
        ph AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN bit = 1 THEN (1::HUGEINT << idx)
                               ELSE 0::HUGEINT END)
                      - CASE WHEN MAX(CASE WHEN idx = 63 AND bit = 1
                                          THEN 1 ELSE 0 END) = 1
                             THEN 18446744073709551616::HUGEINT
                             ELSE 0::HUGEINT END AS BIGINT) AS ph
          FROM bits GROUP BY 1
        ),
        edges AS (
          SELECT a.doc_id AS ea, b.doc_id AS eb
          FROM ph a JOIN ph b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.ph, b.ph)) <= 8
        ),
        sym AS (SELECT ea AS a, eb AS b FROM edges
                UNION SELECT eb, ea FROM edges),
        reach(id, comp) AS (
            SELECT a, a FROM sym UNION SELECT a, b FROM sym
            UNION SELECT s.a, r.comp FROM sym s JOIN reach r ON r.id = s.b
        ),
        compo AS (SELECT id, MIN(comp) AS component FROM reach GROUP BY id),
        repc AS (
          SELECT r.doc_id, COALESCE(c.component, r.doc_id) AS comp
          FROM reps r LEFT JOIN compo c ON c.id = r.doc_id
        )
        SELECT 'img-' || i.doc_id AS image_id,
               CASE WHEN e.doc_id IS NULL THEN 'low_quality'
                    WHEN i.doc_id <> e.exact_rep THEN 'exact_dup'
                    WHEN i.doc_id <> rc.comp THEN 'near_dup'
                    ELSE 'kept' END AS stage,
               CASE WHEN e.doc_id IS NULL THEN NULL
                    ELSE 'img-' || rc2.comp END AS canonical
        FROM imgs i
        LEFT JOIN exact e ON e.doc_id = i.doc_id
        LEFT JOIN repc rc ON rc.doc_id = i.doc_id
        LEFT JOIN repc rc2 ON rc2.doc_id = e.exact_rep
    """
    # resize: sampled source index k = (ry*h//8)*w + rx*w//8 into the
    # generative formula, quantized by the SOURCE fmt (resize reads the
    # stored lossy payload, re-encodes lossless)
    sqls["image_resize_stats"] = """
        WITH imgs AS (
          SELECT doc_id,
                 doc_id - CASE WHEN doc_id % 10 = 9 THEN 1 ELSE 0 END AS base,
                 CASE WHEN doc_id % 2 = 1 THEN 'jpeg' ELSE 'png' END AS fmt
          FROM documents WHERE doc_id < 100
        ),
        dims AS (
          SELECT doc_id, base, fmt,
                 8*(1 + base % 3) AS w, 8*(1 + base % 4) AS h
          FROM imgs
        ),
        rp AS (
          SELECT d.doc_id, d.w, d.h, d.fmt, d.base,
                 ((t.r // 8) * d.h // 8) * d.w + ((t.r % 8) * d.w // 8) AS k
          FROM dims d, LATERAL (SELECT unnest(range(0, 64)) AS r) t
        ),
        rq AS (
          SELECT doc_id,
                 CASE WHEN fmt = 'jpeg' THEN p - (p % 2) ELSE p END AS q
          FROM (
            SELECT doc_id, fmt,
                   ( ((k // w) * 8 // h) * (37 + (base*23) % 201)
                   + ((k % w) * 8 // w) * (59 + (base*41) % 149)
                   + (k*7) % 11 ) % 256 AS p
            FROM rp)
        ),
        agg AS (
          SELECT doc_id, COUNT(*) AS n,
                 CAST(SUM(q) AS BIGINT) AS s, CAST(SUM(q*q) AS BIGINT) AS sq
          FROM rq GROUP BY 1
        )
        SELECT 'img-' || doc_id AS image_id,
               CAST(8 AS INTEGER) AS dec_w, CAST(8 AS INTEGER) AS dec_h,
               'png' AS dec_fmt,
               s / n AS mean_px,
               sqrt((n*sq - s*s) / (n*n)) AS std_px
        FROM agg
    """
    # joint-modality near-dup: captions (cap_base self-join) through the
    # shingle/jaccard chain AND pixels (img_base generative formula)
    # through the phash chain, intersected on the pair key — the %10==3
    # image-only twins must appear in pairs_i but not the output
    sqls["multimodal_neardup"] = f"""
        WITH mm AS (
          SELECT doc_id,
                 doc_id - CASE WHEN doc_id % 10 IN (9, 3) THEN 1 ELSE 0 END AS base,
                 doc_id - CASE WHEN doc_id % 10 = 9 THEN 1 ELSE 0 END AS cap_base,
                 CASE WHEN doc_id % 2 = 1 THEN 'jpeg' ELSE 'png' END AS fmt
          FROM documents WHERE doc_id < 100
        ),
        caps AS (
          SELECT mm.doc_id, t.text AS text
          FROM mm JOIN documents t ON t.doc_id = mm.cap_base
        ),
        norm AS (SELECT doc_id, {_NORM} AS t FROM caps),
        toks AS (SELECT doc_id, string_split(t, ' ') AS ts FROM norm),
        sh AS (SELECT DISTINCT doc_id,
                      ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS s
               FROM toks JOIN generate_series(0, 2000) g(i) ON i <= len(ts) - 4),
        hashed0 AS (SELECT DISTINCT doc_id, {_H61.format(x='s')} AS h FROM sh),
        keepable AS (SELECT h FROM hashed0 GROUP BY h HAVING COUNT(*) <= 3),
        hashed AS (SELECT hashed0.* FROM hashed0 JOIN keepable USING (h)),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM hashed GROUP BY 1),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS m
                  FROM hashed a JOIN hashed b ON a.h = b.h AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        pairs_t AS (
          SELECT id_a, id_b,
                 round(m / CAST(sa.sz + sb.sz - m AS DOUBLE), 4) AS jaccard
          FROM inter JOIN sizes sa ON sa.doc_id = id_a
                     JOIN sizes sb ON sb.doc_id = id_b
          WHERE m / CAST(sa.sz + sb.sz - m AS DOUBLE) >= 0.2
        ),
        dims AS (
          SELECT doc_id, base, fmt,
                 8*(1 + base % 3) AS w, 8*(1 + base % 4) AS h
          FROM mm
        ),
        praw AS (
          SELECT d.doc_id, d.w, d.fmt,
                 (t.k // d.w) * 8 // d.h AS br,
                 (t.k % d.w) * 8 // d.w AS bc,
                 ( ((t.k // d.w) * 8 // d.h) * (37 + (d.base*23) % 201)
                 + ((t.k % d.w) * 8 // d.w) * (59 + (d.base*41) % 149)
                 + (t.k*7) % 11 ) % 256 AS p
          FROM dims d, LATERAL (SELECT unnest(range(0, d.w*d.h)) AS k) t
        ),
        px AS (
          SELECT doc_id, br, bc,
                 CASE WHEN fmt = 'jpeg' THEN p - (p % 2) ELSE p END AS q
          FROM praw
        ),
        tot AS (SELECT doc_id, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS s
                FROM px GROUP BY 1),
        blk AS (SELECT doc_id, br, bc, COUNT(*) AS bn, CAST(SUM(q) AS BIGINT) AS bs
                FROM px GROUP BY 1, 2, 3),
        bits AS (
          SELECT b.doc_id, b.br*8 + b.bc AS idx,
                 CASE WHEN (CAST(b.bs AS DOUBLE) / b.bn)
                         > (CAST(t.s AS DOUBLE) / t.n)
                      THEN 1 ELSE 0 END AS bit
          FROM blk b JOIN tot t USING (doc_id)
        ),
        ph AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN bit = 1 THEN (1::HUGEINT << idx)
                               ELSE 0::HUGEINT END)
                      - CASE WHEN MAX(CASE WHEN idx = 63 AND bit = 1
                                          THEN 1 ELSE 0 END) = 1
                             THEN 18446744073709551616::HUGEINT
                             ELSE 0::HUGEINT END AS BIGINT) AS ph
          FROM bits GROUP BY 1
        ),
        pairs_i AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.ph, b.ph)) AS INTEGER) AS hamming
          FROM ph a JOIN ph b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.ph, b.ph)) <= 8
        )
        SELECT id_a, id_b, jaccard, hamming
        FROM pairs_t JOIN pairs_i USING (id_a, id_b)
    """
    # cross-modal alignment: image side = exact int64 block sums of the
    # DECODED (quantized) pixels, caption side = the caption formula's
    # quantized block-gradient; dot/na/nb exact integers, cosine =
    # dot / sqrt(CAST(na*nb AS DOUBLE)) — the identical single-sqrt
    # single-divide the Spark side computes, so doubles match bitwise
    sqls["caption_image_align"] = _IMG_PX_CTE + """
        , blk AS (
          SELECT doc_id, br*8 + bc AS idx, CAST(SUM(q) AS BIGINT) AS bs
          FROM px GROUP BY 1, 2
        ),
        iv AS (
          SELECT doc_id, CAST(SUM(bs*bs) AS BIGINT) AS na
          FROM blk GROUP BY 1
        ),
        capb AS (
          SELECT doc_id, cap_src,
                 cap_src - CASE WHEN cap_src % 10 = 9 THEN 1 ELSE 0 END
                   AS cap_base
          FROM (
            SELECT doc_id,
                   doc_id - CASE WHEN doc_id % 7 = 3 AND doc_id >= 2
                                 THEN 2 ELSE 0 END AS cap_src
            FROM documents WHERE doc_id < 100
          )
        ),
        cv AS (
          SELECT c.doc_id, c.cap_src, t.idx,
                 ( (t.idx // 8) * (37 + (c.cap_base*23) % 201)
                 + (t.idx % 8) * (59 + (c.cap_base*41) % 149) + 5 ) % 256
                   AS v
          FROM capb c, LATERAL (SELECT unnest(range(0, 64)) AS idx) t
        ),
        dots AS (
          SELECT c.doc_id, c.cap_src,
                 CAST(SUM(b.bs * c.v) AS BIGINT) AS dot,
                 CAST(SUM(c.v * c.v) AS BIGINT) AS nb
          FROM cv c JOIN blk b ON b.doc_id = c.doc_id AND b.idx = c.idx
          GROUP BY 1, 2
        )
        SELECT 'img-' || d.doc_id AS image_id,
               CAST(d.cap_src AS INTEGER) AS cap_src,
               d.dot / sqrt(CAST(i.na * d.nb AS DOUBLE)) AS cosine,
               d.dot / sqrt(CAST(i.na * d.nb AS DOUBLE)) >= 0.875 AS aligned
        FROM dots d JOIN iv i USING (doc_id)
    """
    # shard packing: global row_number under the doc_id total order,
    # then fixed-size shard arithmetic + per-shard manifest aggregate
    sqls["image_shard_pack"] = """
        WITH m AS (
          SELECT doc_id,
                 9 + (8*(1 + doc_id % 3)) * (8*(1 + doc_id % 4)) AS n_bytes,
                 row_number() OVER (ORDER BY doc_id) - 1 AS g
          FROM documents WHERE doc_id < 100
        )
        SELECT CAST(g // 16 AS BIGINT) AS shard_id,
               COUNT(*) AS n_rows,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM m GROUP BY 1
    """
    # content-seeded holdout: same first-15-hex-of-md5 hash as the W6
    # sampler, bucket < 10 of 100 -> 'val'
    sqls["train_val_split"] = f"""
        SELECT doc_id,
               CASE WHEN {_H61.format(x="CAST(doc_id AS VARCHAR)")} % 100 < 10
                    THEN 'val' ELSE 'train' END AS split
        FROM documents WHERE doc_id < 200
    """
    # image ANN: block sums → the SAME deterministic integer hyperplanes
    # as lsh_ann_topk → bucket candidates → exact cosine re-rank
    sqls["image_ann_topk"] = _IMG_PX_CTE + """
        , blk AS (
          SELECT doc_id, br*8 + bc AS idx, CAST(SUM(q) AS BIGINT) AS bs
          FROM px GROUP BY 1, 2
        ),
        e AS (
          SELECT doc_id AS vec_id,
                 list(CAST(bs AS DOUBLE) ORDER BY idx) AS v
          FROM blk GROUP BY 1
        ),
        idims AS (SELECT CAST(g.i AS INTEGER) AS d
                  FROM generate_series(0, 63) g(i)),
        tp AS (SELECT CAST(t.i AS INTEGER) AS t, CAST(p.i AS INTEGER) AS p
               FROM generate_series(0, 1) t(i), generate_series(0, 5) p(i)),
        proj AS (
            SELECT e.vec_id, tp.t, tp.p,
                   SUM(e.v[idims.d + 1]
                       * ((((tp.t * 97 + tp.p) * 131 + idims.d * 137) % 997)
                          - 498)) AS pr
            FROM e, idims, tp GROUP BY 1, 2, 3),
        buckets AS (
            SELECT vec_id, t,
                   CAST(SUM(CASE WHEN pr > 0 THEN 1 << p ELSE 0 END)
                        AS INTEGER) AS bucket
            FROM proj GROUP BY 1, 2),
        qq AS (SELECT * FROM buckets WHERE vec_id % 10 = 0),
        cand AS (
            SELECT DISTINCT qq.vec_id AS q_id, c.vec_id AS n_id
            FROM qq JOIN buckets c
              ON c.t = qq.t AND c.bucket = qq.bucket
             AND c.vec_id <> qq.vec_id),
        scored AS (
            SELECT cand.q_id, cand.n_id,
                   list_cosine_similarity(eq.v, en.v) AS cos
            FROM cand JOIN e eq ON eq.vec_id = cand.q_id
                      JOIN e en ON en.vec_id = cand.n_id),
        ranked AS (
            SELECT q_id, n_id, cos,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, n_id) AS rank
            FROM scored)
        SELECT q_id, n_id, round(cos, 4) AS cosine, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 3
    """
    # incremental-ingest dedup: byte identity = (base, fmt) equality
    # (pixels/dims derive from base, encoder deterministic); near =
    # all-pairs formula-phash Hamming <= 8 incoming x existing (sound vs
    # the banded join: max_hamming+1 bands make candidates complete)
    sqls["image_incremental_dedup"] = """
        WITH imgs AS (
          SELECT doc_id,
                 CASE WHEN doc_id >= 60 AND doc_id % 10 IN (3, 7)
                        THEN doc_id - 61
                      WHEN doc_id % 10 = 9 THEN doc_id - 1
                      ELSE doc_id END AS base
          FROM documents WHERE doc_id < 120
        ),
        wf AS (
          SELECT doc_id, base,
                 CASE WHEN doc_id >= 60 AND doc_id % 10 = 3
                        THEN CASE WHEN base % 2 = 1 THEN 'jpeg' ELSE 'png' END
                      WHEN doc_id >= 60 AND doc_id % 10 = 7
                        THEN CASE WHEN base % 2 = 1 THEN 'png' ELSE 'jpeg' END
                      ELSE CASE WHEN doc_id % 2 = 1 THEN 'jpeg' ELSE 'png' END
                 END AS fmt
          FROM imgs
        ),
        dims AS (
          SELECT doc_id, base, fmt,
                 8*(1 + base % 3) AS w, 8*(1 + base % 4) AS h
          FROM wf
        ),
        praw AS (
          SELECT d.doc_id, d.fmt,
                 (t.k // d.w) * 8 // d.h AS br,
                 (t.k % d.w) * 8 // d.w AS bc,
                 ( ((t.k // d.w) * 8 // d.h) * (37 + (d.base*23) % 201)
                 + ((t.k % d.w) * 8 // d.w) * (59 + (d.base*41) % 149)
                 + (t.k*7) % 11 ) % 256 AS p
          FROM dims d, LATERAL (SELECT unnest(range(0, d.w*d.h)) AS k) t
        ),
        px AS (
          SELECT doc_id, br, bc,
                 CASE WHEN fmt = 'jpeg' THEN p - (p % 2) ELSE p END AS q
          FROM praw
        ),
        tot AS (
          SELECT doc_id, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS s
          FROM px GROUP BY 1
        ),
        blk AS (
          SELECT doc_id, br, bc, COUNT(*) AS bn, CAST(SUM(q) AS BIGINT) AS bs
          FROM px GROUP BY 1, 2, 3
        ),
        bits AS (
          SELECT b.doc_id, b.br*8 + b.bc AS idx,
                 CASE WHEN (CAST(b.bs AS DOUBLE) / b.bn)
                         > (CAST(t.s AS DOUBLE) / t.n)
                      THEN 1 ELSE 0 END AS bit
          FROM blk b JOIN tot t USING (doc_id)
        ),
        ph AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN bit = 1 THEN (1::HUGEINT << idx)
                               ELSE 0::HUGEINT END)
                      - CASE WHEN MAX(CASE WHEN idx = 63 AND bit = 1
                                          THEN 1 ELSE 0 END) = 1
                             THEN 18446744073709551616::HUGEINT
                             ELSE 0::HUGEINT END AS BIGINT) AS ph
          FROM bits GROUP BY 1
        ),
        nearm AS (
          SELECT i.doc_id AS inc, MIN(e.doc_id) AS near_match
          FROM ph i JOIN ph e
            ON i.doc_id >= 60 AND e.doc_id < 60
           AND bit_count(xor(i.ph, e.ph)) <= 8
          GROUP BY 1
        ),
        exactm AS (
          SELECT i.doc_id AS inc, MIN(e.doc_id) AS exact_match
          FROM wf i JOIN wf e
            ON i.doc_id >= 60 AND e.doc_id < 60
           AND e.base = i.base AND e.fmt = i.fmt
          GROUP BY 1
        )
        SELECT 'img-' || d.doc_id AS image_id,
               CASE WHEN x.exact_match IS NOT NULL THEN 'exact'
                    WHEN n.near_match IS NOT NULL THEN 'near'
                    ELSE 'fresh' END AS disposition,
               COALESCE(x.exact_match, n.near_match) AS match_doc
        FROM wf d
        LEFT JOIN exactm x ON x.inc = d.doc_id
        LEFT JOIN nearm n ON n.inc = d.doc_id
        WHERE d.doc_id >= 60
    """
    # corrupt-blob quarantine: defect classes are pure doc_id rules —
    # %13==11 bytes are non-image text (bad_magic), %13==7 keeps a valid
    # 9-byte header but only 3 payload bytes (truncated; every image has
    # w*h >= 64 > 3) — everything else profiles via the formula stats
    sqls["image_profile_corrupt"] = _IMG_PX_CTE + """
        , agg AS (
          SELECT doc_id, w, h, fmt, COUNT(*) AS n,
                 CAST(SUM(q) AS BIGINT) AS s, CAST(SUM(q*q) AS BIGINT) AS sq
          FROM px GROUP BY 1, 2, 3, 4
        )
        SELECT 'img-' || doc_id AS image_id,
               CASE WHEN doc_id % 13 IN (11, 7) THEN 'quarantined'
                    ELSE 'ok' END AS status,
               CASE WHEN doc_id % 13 = 11 THEN 'bad_magic'
                    WHEN doc_id % 13 = 7 THEN 'truncated'
                    ELSE NULL END AS err,
               CASE WHEN doc_id % 13 IN (11, 7) THEN NULL
                    ELSE CAST(w AS INTEGER) END AS dec_w,
               CASE WHEN doc_id % 13 IN (11, 7) THEN NULL
                    ELSE CAST(h AS INTEGER) END AS dec_h,
               CASE WHEN doc_id % 13 IN (11, 7) THEN NULL
                    ELSE fmt END AS dec_fmt,
               CASE WHEN doc_id % 13 IN (11, 7) THEN NULL
                    ELSE s / n END AS mean_px,
               CASE WHEN doc_id % 13 IN (11, 7) THEN NULL
                    ELSE sqrt((n*sq - s*s) / (n*n)) END AS std_px
        FROM agg
    """
    # frame sampling: indices 0,2,... below the per-clip count; byte
    # length = 9-byte header + w*h grayscale payload
    sqls["video_frame_sample"] = """
        WITH imgs AS (
          SELECT doc_id,
                 doc_id - CASE WHEN doc_id % 10 = 9 THEN 1 ELSE 0 END AS base
          FROM documents WHERE doc_id < 100
        ),
        dims AS (
          SELECT doc_id, 8*(1 + base % 3) AS w, 8*(1 + base % 4) AS h
          FROM imgs
        )
        SELECT 'img-' || doc_id AS image_id,
               CAST(t.f AS INTEGER) AS frame_idx,
               CAST(9 + w*h AS INTEGER) AS frame_bytes
        FROM dims d,
             LATERAL (SELECT unnest(range(0, 1 + d.doc_id % 7, 2)) AS f) t
    """
    sqls["phash_neardup"] = """
        WITH ph AS (SELECT doc_id,
                           CAST((doc_id % 40) * 1048576 + (doc_id % 40) * (doc_id % 40) AS BIGINT) AS ph
                    FROM documents WHERE doc_id < 400)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.ph, b.ph)) AS INTEGER) AS hamming
        FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.ph, b.ph)) <= 8
    """
    # IVF seeded search: fit (seeded centroids) + assign (argmin L2,
    # tie → lower cell) + probe (2 nearest cells) + exact cosine re-rank,
    # all restated. list_distance is monotone with the Spark side's
    # squared-L2, so every ordering decision agrees.
    sqls["ivf_topk"] = """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        cen AS (SELECT vec_id AS cell, v AS c FROM e ORDER BY vec_id LIMIT 8),
        assign AS (
            SELECT vec_id, cell FROM (
                SELECT e.vec_id, cen.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY list_distance(e.v, cen.c), cen.cell) AS rn
                FROM e, cen) WHERE rn = 1),
        q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 5),
        probed AS (
            SELECT q_id, cell FROM (
                SELECT q.q_id, cen.cell,
                       row_number() OVER (PARTITION BY q.q_id
                                          ORDER BY list_distance(q.q_vec, cen.c), cen.cell) AS pr
                FROM q, cen) WHERE pr <= 2),
        scored AS (
            SELECT p.q_id, a.vec_id AS n_id,
                   list_cosine_similarity(q.q_vec, e.v) AS cos
            FROM probed p
            JOIN assign a ON a.cell = p.cell
            JOIN q ON q.q_id = p.q_id
            JOIN e ON e.vec_id = a.vec_id
            WHERE a.vec_id <> p.q_id),
        ranked AS (
            SELECT q_id, n_id, cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
            FROM scored)
        SELECT q_id, n_id, round(cos, 4) AS cosine, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5
    """
    sqls["embed_topk"] = """
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
        scored AS (
            SELECT q.q_id, e.vec_id AS n_id,
                   list_cosine_similarity(q.q_vec, e.embedding) AS cos
            FROM embeddings e, q WHERE e.vec_id <> q.q_id),
        ranked AS (
            SELECT q_id, n_id, cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
            FROM scored)
        SELECT q_id, n_id, round(cos, 4) AS cosine, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5
    """
    # LSH-blocked near-dup: restates the Spark side's deterministic
    # hyperplane blocking (weight(t,p,d) = (((t*97+p)*131 + d*137) % 997)
    # - 498, bucket = packed sign bits over 4 planes, 4 tables), then the
    # exact cosine verify — same candidate set, same pairs.
    sqls["embed_cosine_neardup"] = """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE vec_id < 400),
        dims AS (SELECT CAST(g.i AS INTEGER) AS d FROM generate_series(0, 63) g(i)),
        tp AS (SELECT CAST(t.i AS INTEGER) AS t, CAST(p.i AS INTEGER) AS p
               FROM generate_series(0, 3) t(i), generate_series(0, 3) p(i)),
        proj AS (
            SELECT e.vec_id, tp.t, tp.p,
                   SUM(e.v[dims.d + 1]
                       * ((((tp.t * 97 + tp.p) * 131 + dims.d * 137) % 997) - 498)) AS pr
            FROM e, dims, tp
            WHERE dims.d < len(e.v)
            GROUP BY 1, 2, 3),
        buckets AS (
            SELECT vec_id, t,
                   CAST(SUM(CASE WHEN pr > 0 THEN 1 << p ELSE 0 END) AS INTEGER) AS bucket
            FROM proj GROUP BY 1, 2),
        cand AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM buckets a JOIN buckets b
              ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
        SELECT c.id_a, c.id_b,
               round(list_cosine_similarity(ea.v, eb.v), 4) AS cosine
        FROM cand c JOIN e ea ON ea.vec_id = c.id_a
                    JOIN e eb ON eb.vec_id = c.id_b
        WHERE list_cosine_similarity(ea.v, eb.v) >= 0.35
    """
    sqls["embed_lsh_bucket"] = """
        WITH dims AS (SELECT CAST(g.i AS INTEGER) AS d FROM generate_series(0, 63) g(i)),
        planes AS (SELECT CAST(g.i AS INTEGER) AS p FROM generate_series(0, 5) g(i)),
        proj AS (
            SELECT e.vec_id, planes.p,
                   SUM(CAST(e.embedding[dims.d + 1] AS DOUBLE)
                       * (((planes.p * 131 + dims.d * 137) % 997) - 498)) AS pr
            FROM embeddings e, dims, planes
            WHERE dims.d < len(e.embedding)
            GROUP BY 1, 2)
        SELECT vec_id,
               CAST(SUM(CASE WHEN pr > 0 THEN 1 << p ELSE 0 END) AS INTEGER) AS bucket
        FROM proj GROUP BY 1
    """
    sqls["token_overlap_consec"] = f"""
        WITH norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
        toks AS (SELECT DISTINCT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm),
        ne AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ne GROUP BY 1),
        inter AS (SELECT a.doc_id, COUNT(*) AS n_common
                  FROM ne a JOIN ne b ON b.doc_id = a.doc_id + 1 AND b.tok = a.tok
                  GROUP BY 1)
        SELECT s.doc_id,
               COALESCE(i.n_common, 0) AS n_common,
               s.sz + sn.sz - COALESCE(i.n_common, 0) AS n_union
        FROM sizes s
        JOIN sizes sn ON sn.doc_id = s.doc_id + 1
        LEFT JOIN inter i ON i.doc_id = s.doc_id
    """
    sqls["training_data_pipeline"] = f"""
        WITH en AS (SELECT * FROM documents WHERE lang = 'en'),
        norm AS (SELECT doc_id, text, source, {_NORM} AS t FROM en),
        toks AS (SELECT doc_id, text, source,
                        list_filter(string_split(t, ' '), x -> x <> '') AS ts
                 FROM norm),
        stats AS (
            SELECT doc_id, text, source,
                   CAST(len(ts) AS INTEGER) AS n_tokens,
                   length(text) AS n_chars,
                   length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
                   len(list_filter(ts, x -> x IN ('the','and','of','to','in','is','that','with'))) AS n_stop
            FROM toks),
        qual AS (
            SELECT doc_id, text, source FROM stats
            WHERE least(n_tokens / 100.0, 1.0) * 0.4
                  + least((CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0 END) * 4.0, 1.0) * 0.4
                  + (1.0 - least((CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0 END) * 10.0, 1.0)) * 0.2
                  >= 0.3),
        hashed AS (SELECT doc_id, text, source,
                          {_H61.format(x=_NORM)} AS th
                   FROM qual),
        exact_keep AS (
            SELECT doc_id, text, source FROM (
                SELECT doc_id, text, source,
                       MIN(doc_id) OVER (PARTITION BY th) AS keeper
                FROM hashed)
            WHERE doc_id = keeper),
        norm2 AS (SELECT doc_id, {_NORM} AS t FROM exact_keep),
        toks2 AS (SELECT doc_id, string_split(t, ' ') AS ts FROM norm2),
        sh AS (SELECT DISTINCT doc_id,
                      ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS s
               FROM toks2 JOIN generate_series(0, 2000) g(i) ON i <= len(ts) - 4),
        hs AS (SELECT DISTINCT doc_id, {_H61.format(x='s')} AS h FROM sh),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM hs GROUP BY 1),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS m
                  FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        near_b AS (
            SELECT DISTINCT id_b AS doc_id
            FROM inter JOIN sizes sa ON sa.doc_id = id_a
                       JOIN sizes sb ON sb.doc_id = id_b
            WHERE m / CAST(sa.sz + sb.sz - m AS DOUBLE) >= 0.8)
        SELECT e.doc_id, e.source FROM exact_keep e
        WHERE NOT EXISTS (SELECT 1 FROM near_b n WHERE n.doc_id = e.doc_id)
    """
    sqls["dedup_clusters"] = f"""
        WITH RECURSIVE {_SHINGLES_CTE.strip().lstrip()},
        hashed AS (SELECT DISTINCT doc_id, {_H61.format(x='s')} AS h FROM sh),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM hashed GROUP BY 1),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS m
                  FROM hashed a JOIN hashed b ON a.h = b.h AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        pairs AS (
            SELECT id_a, id_b FROM inter
            JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
            WHERE m / CAST(sa.sz + sb.sz - m AS DOUBLE) >= 0.6),
        sym AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
        nodes AS (SELECT DISTINCT a AS id FROM sym),
        reach(id, comp) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT s.a, r.comp FROM sym s JOIN reach r ON r.id = s.b),
        comp AS (SELECT id, MIN(comp) AS component FROM reach GROUP BY id)
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS canonical_id
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    """
    sqls["pagination_detect"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()},
        l AS (SELECT doc_id, xpath, tgt, text, j FROM links
              WHERE NOT is_js AND doc_id < 300),
        digits AS (SELECT * FROM l WHERE regexp_matches(text, '^[0-9]+$')),
        cand AS (SELECT doc_id, xpath, tgt AS next_doc, CAST(text AS BIGINT) AS page_no
                 FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, xpath
                                ORDER BY CAST(text AS BIGINT), j) AS rn
                       FROM digits)
                 WHERE rn = 1),
        sig AS (SELECT doc_id, xpath, COUNT(*) AS n FROM l GROUP BY 1, 2),
        dots AS (SELECT a.doc_id AS pa, b.doc_id AS pb, SUM(a.n * b.n) AS dot
                 FROM sig a JOIN sig b ON a.xpath = b.xpath
                 GROUP BY 1, 2),
        norms AS (SELECT doc_id, sqrt(SUM(n * n)) AS nrm FROM sig GROUP BY 1),
        sim AS (SELECT d.pa, d.pb, d.dot / (na.nrm * nb.nrm) AS cosine
                FROM dots d JOIN norms na ON na.doc_id = d.pa
                            JOIN norms nb ON nb.doc_id = d.pb)
        SELECT c.doc_id, c.xpath, c.next_doc, c.page_no, round(s.cosine, 4) AS cosine
        FROM cand c JOIN sim s ON s.pa = c.doc_id AND s.pb = c.next_doc
        WHERE s.cosine >= 0.5
    """
    # ---- crawl graph ----
    sqls["link_extract"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()}
        SELECT doc_id, href, xpath FROM links2
        WHERE NOT is_js AND NOT nofollow AND tgt_host = src_host
    """
    # html_extract: the HTML is a closed-form function of doc_id, so the
    # expected parse (href, text, generalized xpath per the reference's
    # tag/id/class rules) is stated directly — the parser must invert the
    # construction exactly, script block and nofollow anchor included.
    div_xp = (
        "//html/body/div[contains(@id,'nav') and contains(@class,'menu-bar')"
        " or contains(@class,'lnk')]"
    ).replace("'", "''")  # SQL string-literal escaping
    sqls["html_extract"] = f"""
        WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 300),
        items AS (
            SELECT d.doc_id, CAST(g.i AS INTEGER) AS pos,
                   '/p/' || CAST(d.doc_id * 3 + g.i AS VARCHAR) AS href,
                   't' || CAST(g.i AS VARCHAR) || ' ' || CAST(d.doc_id + g.i AS VARCHAR) AS text,
                   '{div_xp}/a[contains(@class,''item'')]' AS xpath,
                   false AS nofollow
            FROM d JOIN generate_series(0, 2) g(i) ON true),
        skips AS (
            SELECT doc_id, CAST(3 AS INTEGER) AS pos,
                   '/skip/' || CAST(doc_id AS VARCHAR) AS href,
                   'x' AS text,
                   '{div_xp}/a' AS xpath,
                   true AS nofollow
            FROM d)
        SELECT * FROM items UNION ALL SELECT * FROM skips
    """
    # html_extract_positioned: the sibling-position xpath form — first
    # class only, 0-based same-tag-same-raw-class sibling index appended;
    # class-less anchors (skip, /x/) index against each other (0, 1).
    pos_div = "//html[0]/body[0]/div[contains(@class,''menu-bar'')][0]"
    sqls["html_extract_positioned"] = f"""
        WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 300),
        items AS (
            SELECT d.doc_id, CAST(g.i AS INTEGER) AS pos,
                   '/p/' || CAST(d.doc_id * 3 + g.i AS VARCHAR) AS href,
                   't' || CAST(g.i AS VARCHAR) AS text,
                   '{pos_div}/a[contains(@class,''item'')][0]' AS xpath,
                   false AS nofollow
            FROM d JOIN generate_series(0, 1) g(i) ON true),
        skips AS (
            SELECT doc_id, CAST(2 AS INTEGER) AS pos,
                   '/skip/' || CAST(doc_id AS VARCHAR) AS href, 'x' AS text,
                   '{pos_div}/a[0]' AS xpath, true AS nofollow
            FROM d),
        bares AS (
            SELECT doc_id, CAST(3 AS INTEGER) AS pos,
                   '/x/' || CAST(doc_id AS VARCHAR) AS href, 'p' AS text,
                   '{pos_div}/a[1]' AS xpath, false AS nofollow
            FROM d)
        SELECT * FROM items UNION ALL SELECT * FROM skips
        UNION ALL SELECT * FROM bares
    """
    # date_indexed_detect: the detector is a pure function of the 26
    # fixture pages' bytes, so the oracle pins the exact verdicts —
    # measured once, locked forever (a parser or date-pattern regression
    # flips the hash). 19/20 positives (published reference rate: 17/20)
    # + the one urbandictionary negative FP.
    _DET_ROWS = [
        # (label, page, kind, tag, n_records, n_dated, ratio_fp, det)
        ("positive", "4chan_vg", "P", "div", 191, 177, 9267, True),
        ("positive", "apple_imovie_subforum", "P", "tr", 25, 25, 10000, True),
        ("positive", "ars_technica", "P", "tr", 41, 40, 9756, True),
        ("positive", "davita_activity", "P", "li", 31, 30, 9677, True),
        ("positive", "davita_dialysis_subforum", "P", "li", 20, 20, 10000, True),
        ("positive", "davita_index", "P", "li", 12, 12, 10000, True),
        ("positive", "fmylife_index", "P", "div", 17, 14, 8235, True),
        ("positive", "gaia_index", "P", "tr", 40, 40, 10000, True),
        ("positive", "gaia_mini_shops_index", "P", "tr", 40, 40, 10000, True),
        ("positive", "gist_discover", "P", "div", 11, 10, 9091, True),
        ("positive", "hn_front", "N", "td", 30, 30, 10000, True),
        ("positive", "invisionpower_subforum", "P", "tr", 31, 30, 9677, True),
        ("positive", "kineyspace_index", "P", "tr", 22, 20, 9091, True),
        ("positive", "phpbb_general", "P", "li", 25, 25, 10000, True),
        ("positive", "phpbb_support_index", "P", "li", 50, 50, 10000, True),
        ("positive", "questions", "P", "div", 15, 15, 10000, True),
        ("positive", "reddit_index", "P", "div", 25, 25, 10000, True),
        ("positive", "stackoverflow_landing", "P", "div", 89, 89, 10000, True),
        ("positive", "topix_carrizo_springs_tx_index", "P", "tr", 102, 81, 7941, True),
        ("positive", "topix_west_helena_ar", None, None, 0, 0, 0, False),
        ("negative", "4chan", None, None, 0, 0, 0, False),
        ("negative", "amazon_affiliates", None, None, 0, 0, 0, False),
        ("negative", "amazon_home", None, None, 0, 0, 0, False),
        ("negative", "kindle_amazon", None, None, 0, 0, 0, False),
        ("negative", "urbandictionary_4chan", "N", "td", 7, 7, 10000, True),
        ("negative", "vbulletin_home", None, None, 0, 0, 0, False),
    ]
    sqls["date_indexed_detect"] = "SELECT * FROM (VALUES " + ", ".join(
        "({})".format(", ".join([
            f"'{lbl}'", f"'{pg}'",
            "CAST(NULL AS VARCHAR)" if k is None else f"'{k}'",
            "CAST(NULL AS VARCHAR)" if t is None else f"'{t}'",
            f"CAST({n} AS INTEGER)", f"CAST({nd} AS INTEGER)",
            f"CAST({fp} AS BIGINT)", str(det).lower(),
        ]))
        for lbl, pg, k, t, n, nd, fp, det in _DET_ROWS
    ) + (") AS v(label, page, group_kind, record_tag, n_records, "
         "n_dated, ratio_fp, detected)")
    _DIV_ROWS = [
        # (label, page, kind, tag, n_records, cv_permille, mass, det)
        ("positive", "4chan_vg", "P", "div", 31, 305, 39700, True),
        ("positive", "apple_imovie_subforum", "P", "tr", 25, 133, 7268, True),
        ("positive", "ars_technica", "P", "tr", 41, 144, 8741, True),
        ("positive", "davita_activity", "P", "li", 31, 237, 9185, True),
        ("positive", "davita_dialysis_subforum", "P", "li", 20, 83, 10609, True),
        ("positive", "davita_index", "P", "li", 12, 66, 6434, True),
        ("positive", "fmylife_index", "P", "div", 17, 379, 5543, True),
        ("positive", "gaia_index", "P", "tr", 40, 132, 13357, True),
        ("positive", "gaia_mini_shops_index", "P", "tr", 40, 119, 15171, True),
        ("positive", "gist_discover", "P", "div", 11, 335, 8769, True),
        ("positive", "hn_front", "P", "tr", 62, 341, 3237, True),
        ("positive", "invisionpower_subforum", "P", "tr", 31, 168, 7009, True),
        ("positive", "kineyspace_index", "P", "tr", 22, 238, 4284, True),
        ("positive", "phpbb_general", "P", "li", 25, 79, 4492, True),
        ("positive", "phpbb_support_index", "P", "li", 50, 92, 8974, True),
        ("positive", "questions", "P", "div", 15, 54, 10473, True),
        ("positive", "reddit_index", "P", "div", 25, 364, 4909, True),
        ("positive", "stackoverflow_landing", "P", "div", 89, 79, 29747, True),
        ("positive", "topix_carrizo_springs_tx_index", "P", "tr", 102, 369, 4860, True),
        ("positive", "topix_west_helena_ar", "P", "tr", 102, 307, 5732, True),
        ("negative", "4chan", None, None, 0, 0, 0, False),
        ("negative", "amazon_affiliates", None, None, 0, 0, 0, False),
        ("negative", "amazon_home", "P", "td", 30, 232, 1124, True),
        ("negative", "kindle_amazon", None, None, 0, 0, 0, False),
        ("negative", "urbandictionary_4chan", None, None, 0, 0, 0, False),
        ("negative", "vbulletin_home", None, None, 0, 0, 0, False),
    ]
    sqls["diverse_records_detect"] = "SELECT * FROM (VALUES " + ", ".join(
        "({})".format(", ".join([
            f"'{lbl}'", f"'{pg}'",
            "CAST(NULL AS VARCHAR)" if k is None else f"'{k}'",
            "CAST(NULL AS VARCHAR)" if tg is None else f"'{tg}'",
            f"CAST({n} AS INTEGER)", f"CAST({cvp} AS INTEGER)",
            f"CAST({mass} AS INTEGER)", str(det).lower(),
        ]))
        for lbl, pg, k, tg, n, cvp, mass, det in _DIV_ROWS
    ) + (") AS v(label, page, group_kind, record_tag, n_records, "
         "cv_permille, mass, detected)")
    # fixture_anchor_stats: anchor extraction + both xpath forms over
    # the same 26 real pages — pure function of the fixture bytes,
    # verdicts pinned (parser or generalizer regressions flip the hash)
    _ANCHOR_ROWS = [
        # (label, page, n_anchors, n_nofollow, n_xpaths, n_xpaths_positioned)
        ("positive", "4chan_vg", 937, 1, 52, 804),
        ("positive", "apple_imovie_subforum", 163, 2, 54, 162),
        ("positive", "ars_technica", 332, 40, 23, 328),
        ("positive", "davita_activity", 241, 3, 56, 223),
        ("positive", "davita_dialysis_subforum", 410, 32, 98, 394),
        ("positive", "davita_index", 331, 24, 88, 322),
        ("positive", "fmylife_index", 237, 0, 43, 232),
        ("positive", "gaia_index", 491, 0, 118, 446),
        ("positive", "gaia_mini_shops_index", 655, 0, 129, 607),
        ("positive", "gist_discover", 84, 0, 14, 83),
        ("positive", "hn_front", 138, 2, 7, 138),
        ("positive", "invisionpower_subforum", 154, 11, 50, 147),
        ("positive", "kineyspace_index", 131, 0, 20, 131),
        ("positive", "phpbb_general", 255, 0, 78, 213),
        ("positive", "phpbb_support_index", 367, 0, 86, 269),
        ("positive", "questions", 194, 0, 40, 192),
        ("positive", "reddit_index", 391, 17, 282, 141),
        ("positive", "stackoverflow_landing", 619, 0, 115, 618),
        ("positive", "topix_carrizo_springs_tx_index", 388, 6, 265, 388),
        ("positive", "topix_west_helena_ar", 400, 7, 275, 399),
        ("negative", "4chan", 99, 0, 9, 96),
        ("negative", "amazon_affiliates", 30, 0, 14, 30),
        ("negative", "amazon_home", 339, 2, 78, 268),
        ("negative", "kindle_amazon", 40, 0, 19, 40),
        ("negative", "urbandictionary_4chan", 251, 0, 32, 249),
        ("negative", "vbulletin_home", 40, 0, 13, 40),
    ]
    sqls["fixture_anchor_stats"] = "SELECT * FROM (VALUES " + ", ".join(
        f"('{lbl}', '{pg}', CAST({n} AS BIGINT), CAST({nf} AS BIGINT), "
        f"CAST({ux} AS BIGINT), CAST({up} AS BIGINT))"
        for lbl, pg, n, nf, ux, up in _ANCHOR_ROWS
    ) + (") AS v(label, page, n_anchors, n_nofollow, n_xpaths, "
         "n_xpaths_positioned)")
    # lsh_ann_topk: full SQL restatement of the multi-table hyperplane
    # blocking (2 tables × 6 planes, weight(t,p,d) = (((t*97+p)*131 +
    # d*137) % 997) - 498) + exact cosine re-rank — upgraded from
    # rows-only in round 1.
    sqls["lsh_ann_topk"] = """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        dims AS (SELECT CAST(g.i AS INTEGER) AS d FROM generate_series(0, 63) g(i)),
        tp AS (SELECT CAST(t.i AS INTEGER) AS t, CAST(p.i AS INTEGER) AS p
               FROM generate_series(0, 1) t(i), generate_series(0, 5) p(i)),
        proj AS (
            SELECT e.vec_id, tp.t, tp.p,
                   SUM(e.v[dims.d + 1]
                       * ((((tp.t * 97 + tp.p) * 131 + dims.d * 137) % 997) - 498)) AS pr
            FROM e, dims, tp
            WHERE dims.d < len(e.v)
            GROUP BY 1, 2, 3),
        buckets AS (
            SELECT vec_id, t,
                   CAST(SUM(CASE WHEN pr > 0 THEN 1 << p ELSE 0 END) AS INTEGER) AS bucket
            FROM proj GROUP BY 1, 2),
        q AS (SELECT * FROM buckets WHERE vec_id < 10),
        cand AS (
            SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
            FROM q JOIN buckets c
              ON c.t = q.t AND c.bucket = q.bucket AND c.vec_id <> q.vec_id),
        scored AS (
            SELECT cand.q_id, cand.n_id, list_cosine_similarity(eq.v, en.v) AS cos
            FROM cand JOIN e eq ON eq.vec_id = cand.q_id
                      JOIN e en ON en.vec_id = cand.n_id),
        ranked AS (
            SELECT q_id, n_id, cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
            FROM scored)
        SELECT q_id, n_id, round(cos, 4) AS cosine, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 3
    """
    # rtdm_consec: the tree DP's result on the closed-form page family,
    # stated directly (see q_rtdm_consec docstring for the derivation)
    sqls["rtdm_consec"] = """
        WITH d AS (SELECT doc_id, 2 + doc_id % 4 AS n FROM documents
                   WHERE doc_id < 300)
        SELECT a.doc_id AS id,
               round(1.0 - 2.0 * abs(a.n - b.n)
                     / (4.0 + 2.0 * a.n + 2.0 * b.n), 4) AS rtdm
        FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
    """
    # crawl_epoch / crawl_harvest: the REAL engine's 3-epoch crawl order
    # vs the chained CTE restatement (was rows-only through round 2)
    sqls["crawl_epoch"] = _crawl_chain_sql("plain")
    # capstone composite: the full plain-crawl chain (as a derived
    # table) joined to the analytic decode stats of the SAME generative
    # image formula keyed by doc_id — crawl order AND byte path under
    # one hash
    sqls["crawl_image_harvest"] = f"""
        SELECT co.seq, co.url, co.epoch,
               st.dec_fmt, st.dec_w, st.dec_h, st.mean_px, st.std_px
        FROM ({_crawl_chain_sql("plain")}) co
        LEFT JOIN (
          WITH idims AS (
            SELECT doc_id, 8*(1 + doc_id % 3) AS w, 8*(1 + doc_id % 4) AS h,
                   CASE WHEN doc_id % 2 = 1 THEN 'jpeg' ELSE 'png' END AS fmt
            FROM documents WHERE doc_id < {N_CRAWL_DOCS}
          ),
          ipraw AS (
            SELECT m.doc_id, m.w, m.h, m.fmt,
                   CASE WHEN m.fmt = 'jpeg' THEN p0 - (p0 % 2) ELSE p0 END AS q
            FROM (
              SELECT m.doc_id, m.w, m.h, m.fmt,
                     ( ((t.k // m.w) * 8 // m.h) * (37 + (m.doc_id*23) % 201)
                     + ((t.k % m.w) * 8 // m.w) * (59 + (m.doc_id*41) % 149)
                     + (t.k*7) % 11 ) % 256 AS p0
              FROM idims m, LATERAL (SELECT unnest(range(0, m.w*m.h)) AS k) t
            ) m
          ),
          iagg AS (
            SELECT doc_id, w, h, fmt, COUNT(*) AS n,
                   CAST(SUM(q) AS BIGINT) AS s,
                   CAST(SUM(q*q) AS BIGINT) AS sq
            FROM ipraw GROUP BY 1, 2, 3, 4
          )
          SELECT 'http://host' || CAST(doc_id % {N_HOSTS} AS VARCHAR)
                   || '.test/p/' || CAST(doc_id AS VARCHAR) AS url,
                 fmt AS dec_fmt,
                 CAST(w AS INTEGER) AS dec_w, CAST(h AS INTEGER) AS dec_h,
                 s / n AS mean_px, sqrt((n*sq - s*s) / (n*n)) AS std_px
          FROM iagg
        ) st ON st.url = co.url
    """
    sqls["crawl_harvest"] = _crawl_chain_sql("harvest")
    sqls["crawl_harvest_refined"] = _crawl_chain_sql("harvest_refined")
    sqls["crawl_paging_refined"] = _crawl_chain_sql(
        "depth", seed_docs=PGM_SEED_DOCS, action_seq=PGM_DEPTH_SEQ,
        pgm=PGM_MODEL,
    )
    # 1:1 restatement of operators.xpath_model.learn_paging_model over
    # the same bounded link graph: signatures → pair cosines (missing
    # dot/norm rows coalesce to 0 — zero-overlap targets are fat, not
    # absent) → argmax winner per seq → per-source token incidence →
    # modal refinement (ties: count desc, only asc, avoid asc)
    sqls["paging_model_learn"] = f"""
        WITH {_LINKS_CTE.strip().lstrip("WITH").strip()},
        pages AS (
          SELECT doc_id, 'http://host' || CAST(doc_id % {N_HOSTS} AS VARCHAR)
                 || '.test/p/' || CAST(doc_id AS VARCHAR) AS page_url
          FROM documents WHERE doc_id < 300),
        l AS (
          SELECT 'http://host' || CAST(src_host AS VARCHAR) || '.test/p/'
                 || CAST(doc_id AS VARCHAR) AS page_url,
                 xpath, href, text, tgt
          FROM links2 WHERE NOT is_js AND doc_id < 300),
        -- seq carried as its '/'-joined STRING form throughout: DuckDB
        -- mis-partitions empty-list keys (observed: two rn=1 rows in one
        -- [] partition) and array_to_string([]) is NULL, so the scalar
        -- key is both correct and what the final column needs anyway
        paths AS (
          SELECT page_url,
                 CASE WHEN doc_id % 5 = 0 THEN ''
                      ELSE 's' || CAST(doc_id % 3 AS VARCHAR) END AS seq
          FROM pages),
        digits AS (
          SELECT page_url, xpath, href FROM l
          WHERE regexp_full_match(coalesce(text, ''), '[0-9]+')
            AND tgt < 300),
        sigent AS (
          SELECT page_url, xpath AS k, CAST(COUNT(*) AS DOUBLE) AS v
          FROM l GROUP BY 1, 2),
        norms AS (
          SELECT page_url, sqrt(SUM(v * v)) AS nrm FROM sigent GROUP BY 1),
        pairs AS (SELECT DISTINCT page_url AS pa, href AS pb FROM digits),
        dots AS (
          SELECT p.pa, p.pb, SUM(ea.v * eb.v) AS dot
          FROM pairs p
          JOIN sigent ea ON ea.page_url = p.pa
          JOIN sigent eb ON eb.page_url = p.pb AND eb.k = ea.k
          GROUP BY 1, 2),
        sims AS (
          SELECT p.pa, p.pb,
                 CASE WHEN coalesce(na.nrm, 0) > 0 AND coalesce(nb.nrm, 0) > 0
                      THEN coalesce(d.dot, 0) / (na.nrm * nb.nrm)
                      ELSE 0 END AS cosine
          FROM pairs p
          LEFT JOIN dots d ON d.pa = p.pa AND d.pb = p.pb
          LEFT JOIN norms na ON na.page_url = p.pa
          LEFT JOIN norms nb ON nb.page_url = p.pb),
        labeled AS (
          SELECT g.page_url, g.xpath, g.href, s.cosine, pt.seq,
                 s.cosine >= 0.8 AS sim
          FROM digits g
          JOIN sims s ON s.pa = g.page_url AND s.pb = g.href
          JOIN paths pt ON pt.page_url = g.page_url),
        per_pair AS (
          SELECT seq, xpath, MAX(cosine) AS cosine
          FROM labeled WHERE sim GROUP BY 1, 2),
        winners AS (
          SELECT seq, xpath, cosine FROM (
            SELECT *, row_number() OVER (
                PARTITION BY seq ORDER BY cosine DESC, xpath ASC) AS rn
            FROM per_pair) WHERE rn = 1),
        at_w AS (
          SELECT lb.* FROM labeled lb
          JOIN winners w ON w.seq = lb.seq AND w.xpath = lb.xpath),
        toks AS (
          SELECT seq, xpath, page_url, sim, t.tok
          FROM at_w, unnest(string_split(
              regexp_replace(href, '^[a-zA-Z]+://[^/]*/', ''), '/')) AS t(tok)
          WHERE t.tok <> ''),
        inc AS (
          SELECT seq, xpath, page_url, tok,
                 MAX(CASE WHEN sim THEN 1 ELSE 0 END) AS im,
                 MAX(CASE WHEN sim THEN 0 ELSE 1 END) AS ifat
          FROM toks GROUP BY 1, 2, 3, 4),
        -- refinements also carried as ','-joined strings: equality and
        -- lexicographic order match Spark's array semantics because ','
        -- sorts below the token alphabet (digits + 'p')
        per_src AS (
          SELECT seq, xpath, page_url,
                 coalesce(array_to_string(list_sort(list(DISTINCT tok)
                     FILTER (WHERE im = 1 AND ifat = 0)), ','), '') AS only_s,
                 coalesce(array_to_string(list_sort(list(DISTINCT tok)
                     FILTER (WHERE ifat = 1 AND im = 0)), ','), '') AS avoid_s
          FROM inc GROUP BY 1, 2, 3),
        modal AS (
          SELECT seq, xpath, only_s, avoid_s, COUNT(*) AS n
          FROM per_src GROUP BY 1, 2, 3, 4),
        chosen AS (
          SELECT seq, xpath, only_s, avoid_s FROM (
            SELECT *, row_number() OVER (
                PARTITION BY seq, xpath
                ORDER BY n DESC, only_s ASC, avoid_s ASC) AS rn
            FROM modal) WHERE rn = 1)
        SELECT w.seq AS action_seq,
               w.xpath AS paging_xpath,
               ROUND(w.cosine, 4) AS cosine,
               c.only_s AS "only",
               c.avoid_s AS "avoid"
        FROM winners w
        JOIN chosen c ON c.seq = w.seq AND c.xpath = w.xpath
    """
    sqls["crawl_ttl"] = _crawl_chain_sql(
        "plain", epochs=TTL_CRAWL_EPOCHS, ttl=TTL_EPOCHS
    )
    sqls["crawl_depth_indexed"] = _crawl_chain_sql("depth")
    sqls["crawl_multiseq"] = _multiseq_sql(
        MULTISEQ_PLANS, MULTISEQ_BUDGET, N_CRAWL_EPOCHS
    )
    sqls["crawl_harvest_only"] = _crawl_chain_sql("harvest_only")
    sqls["crawl_exemplar"] = _exemplar_chain_sql()
    sqls["action_seq_yields"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()},
        l AS (SELECT * FROM links2
              WHERE NOT is_js AND NOT nofollow AND tgt_host = src_host),
        hop1 AS (SELECT xpath AS xp1, tgt AS mid FROM l WHERE doc_id < 40),
        hop2 AS (SELECT doc_id AS mid, xpath AS xp2, tgt AS tgt2 FROM l)
        SELECT h1.xp1, h2.xp2,
               COUNT(*) AS n_chains,
               COUNT(DISTINCT CASE WHEN h2.tgt2 % 3 = 0 THEN h2.tgt2 END)
                 AS leaf_yield
        FROM hop1 h1 JOIN hop2 h2 ON h1.mid = h2.mid
        GROUP BY h1.xp1, h2.xp2
    """
    # fix_model_seqs twin: the Spark side states the rule generically
    # (array slice == key+[pxp], refinement array equality); here the
    # three literal entries unroll to string predicates on (xp1, xp2).
    # Plan refinement = final action's entry in FIXSEQ_REFS (only xp1
    # carries one, avoid ['9']): entry 1 (key (), ref empty) strips
    # plans starting xpnav UNLESS the final action is xp1; entry 2 strips
    # exactly (xp2, xpnav); entry 3 requires ref ((), ('9')) on a final
    # xpnav — ref('xpnav') is empty, so it never strips (stated for the
    # auditor, folded out of the predicate).
    sqls["fix_model_seqs"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()},
        l AS (SELECT * FROM links2
              WHERE NOT is_js AND NOT nofollow AND tgt_host = src_host),
        hop1 AS (SELECT xpath AS xp1, tgt AS mid FROM l WHERE doc_id < 40),
        hop2 AS (SELECT doc_id AS mid, xpath AS xp2 FROM l),
        plans AS (SELECT DISTINCT h1.xp1, h2.xp2
                  FROM hop1 h1 JOIN hop2 h2 ON h1.mid = h2.mid)
        SELECT xp1, xp2,
               ((xp1 = 'xpnav' AND xp2 <> 'xp1')
                OR (xp1 = 'xp2' AND xp2 = 'xpnav')) AS stripped
        FROM plans
    """
    _ex_letters = "abcdefghijklmnopqrstuvwxyz"
    _ex_counts = ", ".join(
        f"CAST(length(lower(text)) - length(replace(lower(text), '{ch}', ''))"
        f" AS DOUBLE) AS c_{ch}"
        for ch in _ex_letters
    )
    _ex_dot = " + ".join(f"a.c_{ch} * b.c_{ch}" for ch in _ex_letters)
    _ex_na = " + ".join(f"a.c_{ch} * a.c_{ch}" for ch in _ex_letters)
    _ex_nb = " + ".join(f"b.c_{ch} * b.c_{ch}" for ch in _ex_letters)
    sqls["exemplar_step"] = f"""
        WITH RECURSIVE {_LINKS_CTE.strip().lstrip('WITH').strip()},
        tgts AS (
          SELECT DISTINCT tgt_host AS grp, href AS url, tgt FROM links2
          WHERE NOT is_js AND NOT nofollow AND tgt_host = src_host
            AND doc_id < {N_CRAWL_DOCS}),
        ranked AS (
          SELECT grp, url, tgt,
                 row_number() OVER (
                   PARTITION BY grp
                   ORDER BY {_H61.format(x='url')}, url) AS rn,
                 COUNT(*) OVER (PARTITION BY grp) AS n
          FROM tgts),
        samp AS (SELECT grp, url, tgt FROM ranked
                 WHERE rn <= GREATEST(10, n // 4)),
        vec AS (
          SELECT s.grp, s.url, {_ex_counts}
          FROM samp s JOIN documents d ON d.doc_id = s.tgt),
        pairs AS (
          SELECT a.grp, a.url AS ua, b.url AS ub
          FROM vec a JOIN vec b ON a.grp = b.grp AND a.url < b.url
          WHERE ({_ex_dot}) / (sqrt({_ex_na}) * sqrt({_ex_nb}))
                >= {EXEMPLAR_STEP_THRESH}),
        edges AS (SELECT grp, ua, ub FROM pairs
                  UNION ALL SELECT grp, ub AS ua, ua AS ub FROM pairs),
        reach AS (
          SELECT grp, url, url AS r FROM vec
          UNION
          SELECT e.grp, e.ua AS url, r.r
          FROM edges e JOIN reach r ON r.grp = e.grp AND r.url = e.ub),
        comp AS (SELECT grp, url, MIN(r) AS rep FROM reach GROUP BY 1, 2),
        cid AS (
          SELECT grp, rep,
                 dense_rank() OVER (PARTITION BY grp ORDER BY rep) - 1
                   AS cluster_id
          FROM (SELECT DISTINCT grp, rep FROM comp))
        SELECT CAST(c.grp AS BIGINT) AS host, c.url,
               CAST(i.cluster_id AS BIGINT) AS cluster_id,
               (c.url = c.rep) AS exemplar
        FROM comp c JOIN cid i ON i.grp = c.grp AND i.rep = c.rep
    """
    claims_vals = ", ".join(
        f"('{xp}', '{kind}', '{tok}')"
        for xp, on, av in FIX_MODEL_CLAIMS
        for kind, toks in (("only", on), ("avoid", av))
        for tok in toks
    )
    actions_vals = ", ".join(f"('{xp}')" for xp, _f in FIX_MODEL_ACTIONS)
    paging_vals = ", ".join(f"('{xp}')" for xp in HARVEST_PAGING_XP)
    sqls["fix_model"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()},
        labeled AS (
          SELECT xpath, tgt, (tgt % 7 = 0) AS good FROM links2
          WHERE NOT is_js AND NOT nofollow AND tgt_host = src_host),
        inc AS (
          SELECT xpath, tok,
                 MAX(CASE WHEN good THEN 1 ELSE 0 END) AS in_good,
                 MAX(CASE WHEN good THEN 0 ELSE 1 END) AS in_bad
          FROM (SELECT xpath, good,
                       unnest(['p', CAST(tgt AS VARCHAR)]) AS tok
                FROM labeled)
          GROUP BY 1, 2),
        claims(xpath, kind, tok) AS (VALUES {claims_vals}),
        actions(xpath) AS (VALUES {actions_vals}),
        paging(xpath) AS (VALUES {paging_vals})
        SELECT xpath, 'action' AS kind, CAST(NULL AS VARCHAR) AS tok
        FROM actions WHERE xpath NOT IN (SELECT xpath FROM paging)
        UNION ALL
        SELECT c.xpath, c.kind, c.tok
        FROM claims c JOIN inc i ON c.xpath = i.xpath AND c.tok = i.tok
        WHERE (c.kind = 'only' AND i.in_good = 1 AND i.in_bad = 0)
           OR (c.kind = 'avoid' AND i.in_bad = 1 AND i.in_good = 0)
    """
    # crawl_epoch_oracle: one epoch of the engine's operator chain —
    # robots disallow, per-host quota = 20000 // (1000·(1+h%3)) FIFO
    # window, same-host link extract, first-wins dedup, seen anti-join,
    # global sequence by (parent seq, link position).
    sqls["crawl_epoch_oracle"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()},
        frontier AS (
            SELECT doc_id, doc_id % {N_HOSTS} AS host,
                   'http://host' || CAST(doc_id % {N_HOSTS} AS VARCHAR)
                     || '.test/p/' || CAST(doc_id AS VARCHAR) AS url
            FROM documents WHERE doc_id < 240),
        allowed AS (
            SELECT * FROM frontier
            WHERE NOT (host % 4 = 0
                       AND starts_with('/p/' || CAST(doc_id AS VARCHAR), '/p/1'))),
        sel AS (
            SELECT doc_id FROM (
                SELECT doc_id, host,
                       row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rn
                FROM allowed)
            WHERE rn <= 20000 // (1000 * (1 + host % 3))),
        cand AS (
            SELECT l.doc_id, l.j, l.doc_id AS src_seq,
                   'http://host' || CAST(l.tgt_host AS VARCHAR)
                     || '.test/p/' || CAST(l.tgt AS VARCHAR) AS href
            FROM links l JOIN sel s ON s.doc_id = l.doc_id
            WHERE NOT l.is_js AND NOT l.nofollow AND l.tgt_host = l.src_host),
        first_w AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY href
                                             ORDER BY src_seq, j) AS rn
                FROM cand)
            WHERE rn = 1),
        new AS (
            SELECT f.* FROM first_w f
            WHERE NOT EXISTS (SELECT 1 FROM frontier fr WHERE fr.url = f.href))
        SELECT href AS url, doc_id AS src_doc,
               CAST(row_number() OVER (ORDER BY src_seq, j) - 1 AS BIGINT) AS new_seq
        FROM new
    """
    # ttl_expiry_oracle: urls last scheduled exactly at the expiry epoch
    # (scheduled there, never rescheduled after) — engine.expired_urls.
    sqls["ttl_expiry_oracle"] = f"""
        WITH co AS (
            SELECT 'http://host' || CAST(doc_id % {N_HOSTS} AS VARCHAR)
                     || '.test/p/' || CAST(doc_id AS VARCHAR) AS url,
                   doc_id % 5 AS epoch
            FROM documents WHERE doc_id < 400
            UNION ALL
            SELECT 'http://host' || CAST(doc_id % {N_HOSTS} AS VARCHAR)
                     || '.test/p/' || CAST(doc_id AS VARCHAR) AS url,
                   doc_id % 5 + 2 AS epoch
            FROM documents WHERE doc_id < 400 AND doc_id % 7 = 0),
        at_x AS (SELECT DISTINCT url FROM co WHERE epoch = 3)
        SELECT a.url FROM at_x a
        WHERE NOT EXISTS (SELECT 1 FROM co WHERE co.url = a.url AND co.epoch > 3)
    """
    # harvest_step_oracle: the same epoch chain + the execute-model
    # automaton's link classification (engine.py:449-461) — digit-anchor
    # on a pagination xpath → paging queue; model-covered xpath →
    # content; everything else dropped as outside the learned plan.
    sqls["harvest_step_oracle"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()},
        frontier AS (
            SELECT doc_id, doc_id % {N_HOSTS} AS host,
                   'http://host' || CAST(doc_id % {N_HOSTS} AS VARCHAR)
                     || '.test/p/' || CAST(doc_id AS VARCHAR) AS url
            FROM documents WHERE doc_id < 120 AND doc_id NOT IN (1, 7)),
        allowed AS (
            SELECT * FROM frontier
            WHERE NOT (host % 4 = 0
                       AND starts_with('/p/' || CAST(doc_id AS VARCHAR), '/p/1'))),
        sel AS (
            SELECT doc_id FROM (
                SELECT doc_id, host,
                       row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rn
                FROM allowed)
            WHERE rn <= 20000 // (1000 * (1 + host % 3))),
        cand AS (
            SELECT l.doc_id, l.j, l.doc_id AS src_seq, l.text, l.xpath,
                   'http://host' || CAST(l.tgt_host AS VARCHAR)
                     || '.test/p/' || CAST(l.tgt AS VARCHAR) AS href,
                   regexp_full_match(coalesce(l.text, ''), '[0-9]+')
                     AND l.xpath IN ('xpnav', 'xp3') AS keep_paging,
                   NOT (regexp_full_match(coalesce(l.text, ''), '[0-9]+')
                        AND l.xpath IN ('xpnav', 'xp3'))
                     AND l.xpath IN ('xp0', 'xp2') AS keep_content
            FROM links l JOIN sel s ON s.doc_id = l.doc_id
            WHERE NOT l.is_js AND NOT l.nofollow AND l.tgt_host = l.src_host),
        klass AS (
            SELECT doc_id, j, src_seq, href,
                   CASE WHEN keep_paging THEN 'paging' ELSE 'content' END AS queue
            FROM cand WHERE keep_paging OR keep_content),
        first_w AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY href
                                             ORDER BY src_seq, j) AS rn
                FROM klass)
            WHERE rn = 1),
        new AS (
            SELECT f.* FROM first_w f
            WHERE NOT EXISTS (SELECT 1 FROM frontier fr WHERE fr.url = f.href))
        SELECT href AS url, doc_id AS src_doc, queue,
               CAST(row_number() OVER (ORDER BY src_seq, j) - 1 AS BIGINT) AS new_seq
        FROM new
    """
    sqls["url_seen_antijoin"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()},
        cand AS (SELECT DISTINCT href FROM links2
                 WHERE NOT is_js AND NOT nofollow AND tgt_host = src_host),
        seen AS (SELECT 'http://host' || CAST(doc_id % {N_HOSTS} AS VARCHAR)
                        || '.test/p/' || CAST(doc_id AS VARCHAR) AS href
                 FROM documents WHERE doc_id % 3 = 0)
        SELECT href FROM cand WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.href = cand.href)
    """
    sqls["politeness_quota"] = f"""
        SELECT doc_id, host, rn FROM (
            SELECT doc_id, doc_id % {N_HOSTS} AS host,
                   row_number() OVER (PARTITION BY doc_id % {N_HOSTS} ORDER BY doc_id) AS rn
            FROM documents)
        WHERE rn <= 5
    """
    sqls["host_page_counts"] = f"""
        SELECT doc_id % {N_HOSTS} AS host, COUNT(*) AS n_pages
        FROM documents GROUP BY 1
    """
    sqls["pagination_pick"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()},
        digits AS (SELECT * FROM links2
                   WHERE NOT is_js AND regexp_matches(text, '^[0-9]+$')),
        ranked AS (SELECT src_host, xpath, CAST(text AS BIGINT) AS page_no, href,
                          row_number() OVER (PARTITION BY src_host, xpath
                                             ORDER BY CAST(text AS BIGINT), doc_id, j) AS rn
                   FROM digits)
        SELECT src_host, xpath, page_no, href FROM ranked WHERE rn = 1
    """
    sqls["xpath_char_score"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()}
        SELECT xpath, CAST(SUM(length(text)) AS BIGINT) AS char_score, COUNT(*) AS href_count
        FROM links2 WHERE NOT is_js GROUP BY 1
    """
    sqls["template_incidence"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()}
        SELECT xpath, href, COUNT(DISTINCT doc_id) AS incidence
        FROM links2 WHERE NOT is_js GROUP BY 1, 2
        HAVING COUNT(DISTINCT doc_id) >= 5
    """
    sqls["dominated_prune"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()},
        la AS (SELECT DISTINCT doc_id, xpath, href FROM links2 WHERE NOT is_js),
        sizes AS (SELECT doc_id, xpath, COUNT(*) AS sz FROM la GROUP BY 1, 2),
        pairmatch AS (
            SELECT a.doc_id, a.xpath AS xa, b.xpath AS xb, COUNT(*) AS m
            FROM la a JOIN la b ON a.doc_id = b.doc_id AND a.href = b.href AND a.xpath <> b.xpath
            GROUP BY 1, 2, 3),
        dom AS (
            SELECT DISTINCT p.doc_id, p.xa AS xpath
            FROM pairmatch p
            JOIN sizes sa ON sa.doc_id = p.doc_id AND sa.xpath = p.xa
            JOIN sizes sb ON sb.doc_id = p.doc_id AND sb.xpath = p.xb
            WHERE p.m = sa.sz AND (sa.sz < sb.sz OR (sa.sz = sb.sz AND p.xa > p.xb)))
        SELECT s.doc_id, s.xpath, s.sz AS n_hrefs
        FROM sizes s
        WHERE NOT EXISTS (SELECT 1 FROM dom d WHERE d.doc_id = s.doc_id AND d.xpath = s.xpath)
    """
    sqls["enum_scores"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()},
        per_page AS (SELECT xpath, doc_id, COUNT(*) AS n_hrefs
                     FROM links2 WHERE NOT is_js GROUP BY 1, 2)
        SELECT xpath, CAST(SUM(n_hrefs) AS BIGINT) AS total_hrefs,
               COUNT(DISTINCT doc_id) AS df,
               CAST(round(ln(SUM(n_hrefs) + 10) / COUNT(DISTINCT doc_id) * 10000) AS BIGINT) AS score_fp
        FROM per_page GROUP BY 1
    """
    sqls["yield_estimate"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()},
        per_page AS (SELECT xpath, doc_id, COUNT(*) AS n FROM links2
                     WHERE NOT is_js GROUP BY 1, 2)
        SELECT xpath, MAX(n) AS max_yield FROM per_page GROUP BY 1
    """
    sqls["signature_cosine_consec"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()},
        sig AS (SELECT doc_id, xpath, COUNT(*) AS n FROM links2
                WHERE NOT is_js AND doc_id < 300 GROUP BY 1, 2),
        dots AS (SELECT a.doc_id, SUM(a.n * b.n) AS dot
                 FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1 AND b.xpath = a.xpath
                 GROUP BY 1),
        norms AS (SELECT doc_id, sqrt(SUM(n * n)) AS nrm FROM sig GROUP BY 1)
        SELECT d.doc_id, round(d.dot / (na.nrm * nb.nrm), 4) AS cosine
        FROM dots d
        JOIN norms na ON na.doc_id = d.doc_id
        JOIN norms nb ON nb.doc_id = d.doc_id + 1
    """
    sqls["signature_sims"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()},
        sig AS (SELECT doc_id, xpath, COUNT(*) AS n FROM links2
                WHERE NOT is_js AND doc_id < 300 GROUP BY 1, 2),
        w AS (SELECT xpath, ln(COUNT(*)) / COUNT(DISTINCT doc_id) AS w
              FROM links2 WHERE NOT is_js AND doc_id < 300 GROUP BY 1),
        ids AS (SELECT DISTINCT doc_id FROM sig),
        pairs AS (SELECT a.doc_id AS pa, b.doc_id AS pb
                  FROM ids a JOIN ids b ON b.doc_id = a.doc_id + 1),
        sa AS (SELECT p.pa, p.pb, s.xpath AS k, s.n AS va
               FROM pairs p JOIN sig s ON s.doc_id = p.pa),
        sb AS (SELECT p.pa, p.pb, s.xpath AS k, s.n AS vb
               FROM pairs p JOIN sig s ON s.doc_id = p.pb),
        fullj AS (
          SELECT coalesce(sa.pa, sb.pa) AS pa, coalesce(sa.pb, sb.pb) AS pb,
                 coalesce(sa.k, sb.k) AS k, sa.va, sb.vb
          FROM sa FULL OUTER JOIN sb
            ON sa.pa = sb.pa AND sa.pb = sb.pb AND sa.k = sb.k),
        fw AS (SELECT f.*, w.w FROM fullj f LEFT JOIN w ON w.xpath = f.k),
        agg AS (
          SELECT pa, pb,
                 SUM(coalesce(va, 0) * coalesce(vb, 0)) AS dot,
                 SUM(coalesce(va, 0) * coalesce(va, 0)) AS na2,
                 SUM(coalesce(vb, 0) * coalesce(vb, 0)) AS nb2,
                 SUM(coalesce(va, 0)) AS l1a,
                 SUM(coalesce(vb, 0)) AS l1b,
                 COUNT(va) AS ka, COUNT(vb) AS kb,
                 COUNT(CASE WHEN va IS NOT NULL AND vb IS NOT NULL
                            THEN 1 END) AS inter,
                 SUM(coalesce(va, 0) * coalesce(vb, 0) * w * w) AS dotw,
                 SUM(coalesce(va, 0) * coalesce(va, 0) * w * w) AS naw2,
                 SUM(coalesce(vb, 0) * coalesce(vb, 0) * w * w) AS nbw2,
                 SUM(GREATEST(coalesce(va, 0) - coalesce(vb, 0), 0)) AS del_,
                 SUM(GREATEST(coalesce(vb, 0) - coalesce(va, 0), 0)) AS ins_
          FROM fw GROUP BY 1, 2)
        SELECT pa AS doc_id,
               round(dot / (sqrt(na2) * sqrt(nb2)), 4) AS cosine,
               round(inter / (sqrt(ka) * sqrt(kb)), 4) AS cardinality,
               round((dot / (sqrt(na2) * sqrt(nb2)))
                     * (inter / (sqrt(ka) * sqrt(kb))), 4) AS combined,
               round(dot / (CAST(l1a AS DOUBLE) * l1b), 4) AS manhattan,
               round(dotw / (sqrt(naw2) * sqrt(nbw2)), 4) AS weighted_cosine,
               round(1.0 - (del_ + ins_) / (CAST(l1a AS DOUBLE) + l1b), 4)
                 AS edit_sim
        FROM agg
    """
    letters = "abcdefghijklmnopqrstuvwxyz"
    cf = ", ".join(
        f"CAST(length(lower(text)) - length(replace(lower(text), '{ch}', '')) AS DOUBLE) AS c_{ch}"
        for ch in letters
    )
    dot = " + ".join(f"a.c_{ch} * b.c_{ch}" for ch in letters)
    na = " + ".join(f"a.c_{ch} * a.c_{ch}" for ch in letters)
    nb = " + ".join(f"b.c_{ch} * b.c_{ch}" for ch in letters)
    sqls["char_freq_cosine"] = f"""
        WITH vec AS (SELECT doc_id, {cf} FROM documents)
        SELECT a.doc_id,
               round(CASE WHEN sqrt({na}) > 0 AND sqrt({nb}) > 0
                          THEN ({dot}) / (sqrt({na}) * sqrt({nb}))
                          ELSE 0 END, 4) AS cosine
        FROM vec a JOIN vec b ON b.doc_id = a.doc_id + 1
    """
    sqls["leaf_features"] = f"""
        WITH norm AS (SELECT doc_id, text, {_NORM} AS t FROM documents),
        toks AS (SELECT doc_id, text, list_filter(string_split(t, ' '), x -> x <> '') AS ts
                 FROM norm),
        feats AS (
            SELECT doc_id,
                   CAST(len(ts) AS INTEGER) AS n_tokens,
                   CAST(length(text) AS INTEGER) AS n_chars,
                   CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
                   CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INTEGER) AS n_digits,
                   CAST(len(list_filter(string_split_regex(text, '[.!?]'), s -> trim(s) <> '')) AS INTEGER) AS n_sentences,
                   round(CASE WHEN len(ts) > 0
                              THEN list_sum(list_transform(ts, x -> length(x))) / CAST(len(ts) AS DOUBLE)
                              ELSE 0 END, 4) AS mean_tok_len,
                   COALESCE(list_max(list_transform(ts, x -> CAST(length(x) AS INTEGER))), 0) AS max_tok_len,
                   round(CASE WHEN len(ts) > 0
                              THEN len(list_filter(ts, x -> x IN ('the','and','of','to','in','is','that','with'))) / CAST(len(ts) AS DOUBLE)
                              ELSE 0 END, 4) AS stop_ratio
            FROM toks)
        SELECT *,
               (n_tokens >= 30 AND
                (CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0 END) < 0.1)
               AS is_leaf_pred
        FROM feats
    """
    # C8/C9 Naive Bayes: integer-only throughout (integral division for
    # bins, cross-multiplied smoothed posteriors) so DuckDB reproduces
    # the Spark fit + predict bit-for-bit. Mirrors operators/classifier.py.
    sqls["nb_leaf_classifier"] = f"""
        WITH norm AS (SELECT doc_id, text, {_NORM} AS t FROM documents),
        toks AS (SELECT doc_id, text, list_filter(string_split(t, ' '), x -> x <> '') AS ts
                 FROM norm),
        stats AS (
            SELECT doc_id,
                   CAST(len(ts) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS BIGINT) AS n_punct,
                   CAST(len(list_filter(ts, x -> x IN ('the','and','of','to','in','is','that','with'))) AS BIGINT) AS n_stop
            FROM toks),
        feats AS (
            SELECT doc_id, n_tokens, n_chars, n_punct,
                   least(n_tokens // 16, 7) AS b_tok,
                   least((n_punct * 100) // greatest(n_chars, 1) // 2, 7) AS b_punct,
                   least((n_stop * 100) // greatest(n_tokens, 1) // 4, 7) AS b_stop
            FROM stats),
        train AS (
            SELECT *, CASE WHEN n_tokens >= 30
                            AND (n_punct * 100) // greatest(n_chars, 1) < 10
                           THEN 1 ELSE 0 END AS y
            FROM feats WHERE doc_id < 200),
        priors AS (SELECT CAST(SUM(y) AS BIGINT) AS n1,
                          CAST(COUNT(*) - SUM(y) AS BIGINT) AS n0 FROM train),
        melt_train AS (
            SELECT 'tok' AS f, b_tok AS bin, y FROM train
            UNION ALL SELECT 'punct', b_punct, y FROM train
            UNION ALL SELECT 'stop', b_stop, y FROM train),
        model AS (SELECT f, bin, CAST(SUM(y) AS BIGINT) AS c1,
                         CAST(COUNT(*) - SUM(y) AS BIGINT) AS c0
                  FROM melt_train GROUP BY 1, 2),
        melt_all AS (
            SELECT doc_id, 'tok' AS f, b_tok AS bin FROM feats
            UNION ALL SELECT doc_id, 'punct', b_punct FROM feats
            UNION ALL SELECT doc_id, 'stop', b_stop FROM feats),
        joined AS (
            SELECT m.doc_id, COALESCE(model.c1, 0) + 1 AS l1,
                   COALESCE(model.c0, 0) + 1 AS l0
            FROM melt_all m LEFT JOIN model ON m.f = model.f AND m.bin = model.bin),
        prods AS (SELECT doc_id, CAST(product(l1) AS BIGINT) AS p1,
                         CAST(product(l0) AS BIGINT) AS p0
                  FROM joined GROUP BY 1)
        SELECT f.doc_id,
               CAST(b_tok AS BIGINT) AS b_tok,
               CAST(b_punct AS BIGINT) AS b_punct,
               CAST(b_stop AS BIGINT) AS b_stop,
               CAST(n1 * p1 * (n0 + 8) * (n0 + 8) * (n0 + 8) AS BIGINT) AS score_leaf,
               CAST(n0 * p0 * (n1 + 8) * (n1 + 8) * (n1 + 8) AS BIGINT) AS score_non,
               (n1 * p1 * (n0 + 8) * (n0 + 8) * (n0 + 8)
                > n0 * p0 * (n1 + 8) * (n1 + 8) * (n1 + 8)) AS pred_leaf
        FROM feats f JOIN prods USING (doc_id) CROSS JOIN priors
    """
    sqls["plan_ordering"] = f"""
        WITH {_LINKS_CTE.strip().lstrip('WITH').strip()},
        per_page AS (SELECT xpath, doc_id, COUNT(*) AS n FROM links2
                     WHERE NOT is_js GROUP BY 1, 2),
        agg AS (SELECT xpath, MAX(n) AS max_yield, CAST(length(xpath) AS INTEGER) AS depth
                FROM per_page GROUP BY xpath)
        SELECT xpath, depth, max_yield,
               CAST(row_number() OVER (ORDER BY depth ASC, max_yield DESC, xpath ASC) AS INTEGER)
                 AS plan_rank
        FROM agg
    """
    sqls["seeded_sample"] = f"""
        WITH hashed AS (
            SELECT doc_id, doc_id % {N_HOSTS} AS host,
                   {_H61.format(x='CAST(doc_id AS VARCHAR)')} AS h
            FROM documents)
        SELECT host, doc_id, samp_rank FROM (
            SELECT host, doc_id,
                   row_number() OVER (PARTITION BY host ORDER BY h, doc_id) AS samp_rank
            FROM hashed)
        WHERE samp_rank <= 3
    """
    # weighted_pick mirrors windows.weighted_pick_per_group exactly:
    # cumulative/total sums are integer-valued doubles (IEEE-exact), the
    # uniform draw is pmod(min-hash, 10^9)/10^9 · total (hash ≥ 0 so
    # pmod == %), and ties break by (running, hash, doc_id)
    sqls["weighted_pick"] = f"""
        WITH d AS (
            SELECT doc_id, doc_id % {N_HOSTS} AS host,
                   CAST(doc_id % 7 AS DOUBLE) AS wgt,
                   {_H61.format(x='CAST(doc_id AS VARCHAR)')} AS h
            FROM documents),
        r AS (
            SELECT *,
                   SUM(wgt) OVER (PARTITION BY host ORDER BY h, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS run,
                   SUM(wgt) OVER (PARTITION BY host) AS tot,
                   MIN(h) OVER (PARTITION BY host) AS mh,
                   row_number() OVER (PARTITION BY host
                                      ORDER BY h, doc_id) AS rk
            FROM d),
        u AS (
            SELECT *, (CAST(mh % 1000000000 AS DOUBLE) / 1000000000) * tot
                      AS uu
            FROM r),
        w AS (
            SELECT *, row_number() OVER (PARTITION BY host
                                         ORDER BY run, h, doc_id) AS rn
            FROM u WHERE run > uu OR (tot = 0 AND rk = 1))
        SELECT host, doc_id, wgt FROM w WHERE rn = 1
    """
    sqls["connected_components"] = """
        WITH RECURSIVE edges AS (
            SELECT doc_id - 1 AS a, doc_id AS b FROM documents
            WHERE doc_id % 37 = 0 AND doc_id > 0
            UNION ALL
            SELECT doc_id AS a, (doc_id * 2 + 1) % 500 AS b FROM documents
            WHERE doc_id % 53 = 0),
        sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
        nodes AS (SELECT DISTINCT a AS id FROM sym),
        reach(id, comp) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT s.a, r.comp FROM sym s JOIN reach r ON r.id = s.b)
        SELECT id, MIN(comp) AS component FROM reach GROUP BY id
    """
    return sqls


# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship smoke: the crawl pipeline composite on sf0.001 — politeness
    window → link extraction with filters → URL-seen anti-join → per-host
    scheduling summary."""
    sf = "/root/testdata/sf0.001"
    scheduled = q_politeness_quota(spark, sf).groupBy("host").agg(
        F.count("*").alias("scheduled")
    )
    cands = q_link_extract(spark, sf).groupBy(
        (F.col("doc_id") % N_HOSTS).alias("host")
    ).agg(F.count("*").alias("candidates"))
    fresh = (
        q_url_seen_antijoin(spark, sf)
        .select(
            F.regexp_extract("href", r"http://host(\d+)\.test", 1).cast("long").alias("host")
        )
        .groupBy("host")
        .agg(F.count("*").alias("new_urls"))
    )
    return (
        scheduled.join(cands, "host", "left")
        .join(fresh, "host", "left")
        .select(
            "host",
            "scheduled",
            F.coalesce("candidates", F.lit(0)).alias("candidates"),
            F.coalesce("new_urls", F.lit(0)).alias("new_urls"),
        )
        .orderBy("host")
    )
