"""Engine table schemas (SURVEY.md §1.1 table, FIXTURES.md §1-§5).

The reference is schemaless (Clojure maps, ``crawl.clj:29-34``); here every
state structure is a typed table so it can live in Iceberg and shuffle
efficiently. ``corpus`` follows BASELINE.json ``input_hint`` exactly:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)`` plus the link-graph columns layered on top.
"""

from __future__ import annotations

from pyspark.sql import types as T

# One out-link as extracted from a page (reference: href/text pairs gathered
# per XPath group, dom.clj:436-442; rich_char_extractor.clj:113-124).
LINK_TYPE = T.StructType(
    [
        T.StructField("href", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("xpath", T.StringType(), True),
        T.StructField("nofollow", T.BooleanType(), False),
    ]
)

# The synthetic web / fetched-page store. Fetch = lookup join on url
# (reference: live HTTP GET + document cache, utils.clj:210-227).
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("out_links", T.ArrayType(LINK_TYPE), False),
        T.StructField("is_leaf", T.BooleanType(), False),
        # redirect aliases (S3): alternate URLs that 301 to this page —
        # fetching an alias returns this row, and redirect closure
        # inserts the canonical url into url_seen (crawl.clj:1054-1060,
        # utils.clj:210-227)
        T.StructField("aliases", T.ArrayType(T.StringType()), True),
    ]
)

# Frontier entry == reference url-ds map {:url :path :src-url :src-text}
# (crawl.clj:29-34) + the scheduling columns batching requires.
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("src_url", T.StringType(), True),
        T.StructField("src_text", T.StringType(), True),
        T.StructField("src_xpath", T.StringType(), True),
        T.StructField("epoch_added", T.IntegerType(), False),
        T.StructField("insertion_seq", T.LongType(), False),
        T.StructField("queue", T.StringType(), False),  # "content" | "paging"
        # plan depth = number of content hops from the seed (reference
        # src-path length, crawl.clj:200-202 xpath-to-pick indexes the
        # action sequence BY this). Paging hops do not advance depth
        # (crawl.clj:525-528 keeps the parent's src-xpath on paging rows).
        T.StructField("depth", T.IntegerType(), False),
        # action path: the ordered xpath sequence that reached this row
        # (reference src-path, crawl.clj:200-202 — the model's :actions
        # key is the frequency map of these). Content hops append their
        # src_xpath; paging hops keep the parent's path, so
        # len(path) == depth always. Seeds start at []. Scale note:
        # bounded by depth (a handful of entries) and drawn from the
        # tiny generalized-xpath vocabulary, so parquet dictionary
        # encoding stores it as ints — same per-row cost the reference
        # pays to keep src-path.
        T.StructField("path", T.ArrayType(T.StringType(), False), False),
    ]
)

# URL-seen membership table (reference: one in-heap set, crawl.clj:125-129).
# partition_id = pmod(url_hash, n_buckets) keys both the storage bucketing
# and the bloom segment that prefilters the exact anti-join.
URL_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
    ]
)

BLOOM_SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("bits", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
    ]
)

# Politeness rules. The reference declares clj-robots but never uses it
# (project.clj:10); fixed sleeps are its only politeness (crawl.clj:83).
ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay_ms", T.IntegerType(), False),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("urls_scheduled", T.LongType(), False),
        T.StructField("pages_fetched", T.LongType(), False),
        T.StructField("links_extracted", T.LongType(), False),
        T.StructField("links_enqueued", T.LongType(), False),
        T.StructField("dups_dropped", T.LongType(), False),
        T.StructField("disallowed_dropped", T.LongType(), False),
        T.StructField("leaves_fetched", T.LongType(), False),
        T.StructField("neardup_fetched", T.LongType(), False),
    ]
)

# Content near-dup state (reference `seen?` shingle check on harvested
# bodies, crawl.clj:237-244, 341-349): normalized-caption hashes of every
# page fetched so far.
CONTENT_SEEN_SCHEMA = T.StructType(
    [T.StructField("caption_hash", T.LongType(), False)]
)

# Canonical page urls whose content has been extracted — the redirect
# cache (S3): a later fetch that resolves to an already-extracted page is
# a cache hit (fetch counted, no re-extraction).
EXTRACTED_SCHEMA = T.StructType([T.StructField("url", T.StringType(), False)])

# Per-partition lineage: which seen-bucket each epoch touched and how much
# (north_rule: "per-partition lineage + metrics").
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_added", T.LongType(), False),
    ]
)

# E2 exemplar-sampling evidence (reference prepare-example downloads,
# crawl.clj:567-629): one row per sampled ("downloaded") link — its
# structural cluster within the (source page, xpath) group, whether it
# was the cluster's exemplar (and thus entered the frontier), and the
# leaf label the model learner consumes (:leaf-paths / :corpus).
SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("src_url", T.StringType(), True),
        T.StructField("src_xpath", T.StringType(), True),
        T.StructField("url", T.StringType(), False),
        T.StructField("cluster_id", T.IntegerType(), False),
        T.StructField("exemplar", T.BooleanType(), False),
        T.StructField("is_leaf", T.BooleanType(), True),
    ]
)

CRAWL_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
        # the frontier row's action path at dequeue time (see
        # FRONTIER_SCHEMA.path) — learn-model's :actions evidence: the
        # per-leaf frequency map over these IS the reference model's
        # action-sequence set (crawl.clj:108)
        T.StructField("path", T.ArrayType(T.StringType(), False), False),
    ]
)
