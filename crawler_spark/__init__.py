"""crawler_spark — a PySpark-native web-frontier analytics engine.

A ground-up re-implementation of the *capabilities* of shriphani/crawler
(reference at /root/reference, Clojure): URL-frontier scheduling, URL-seen
dedup, politeness, link extraction, near-duplicate detection, pagination,
resumable models — re-expressed as declarative DataFrame plans so Catalyst /
Tungsten / AQE pick the physical strategy, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) such an engine needs at 100 TB.

Design points (see SURVEY.md for the full blueprint):

* One reference crawl-loop iteration class == one DataFrame *epoch batch*
  (the reference pops one URL per iteration, ``crawl.clj:90-91``; we schedule
  thousands per epoch under per-host politeness quotas).
* URL-seen is a partitioned bloom prefilter + exact ``left_anti`` join
  (reference: a single in-heap Clojure set, ``crawl.clj:125-129``).
* All per-row work is JVM built-ins or Arrow-vectorized pandas UDFs — no
  row-at-a-time Python anywhere on the hot path.
* State is carried across epochs in snapshot-committed tables (Iceberg on a
  real cluster; local parquet snapshot dirs in this sandbox) so every epoch
  is a resumable checkpoint (reference analog: pprinted ``.state`` EDN files,
  ``main.clj:40-60``).
"""

__version__ = "0.1.0"
