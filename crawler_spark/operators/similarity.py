"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the correctness baseline; the scale path is
random-hyperplane LSH bucketing (probe only same-bucket candidates) and
an IVF-style coarse quantizer (probe nearest centroid partitions).
Dot products use ``F.zip_with`` + ``F.aggregate`` — JVM higher-order
functions, no Python. The reference's cosine machinery
(``page.clj:24-59``, char-frequency cosine C4) is the ancestor; here it
runs over dense vectors at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row.

    queries is small (broadcast); the corpus side streams — one pass,
    no corpus shuffle; ranking is a per-query window (parallel across
    queries). Excludes self-matches."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = df.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cosine", cosine_expr(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )


def hyperplane_bucket_expr(vec_col, n_planes: int = 8, table: int = 0):
    """Random-hyperplane LSH bucket id: sign bits of <v, h_p> packed to an
    int. Hyperplane weights are a deterministic integer function of
    (table, plane, dim): w = (((t*97 + p)*131 + d*137) % 997) - 498 —
    reproducible in plain SQL, no RNG state."""
    def weight_fn(pp):
        # two-arg lambda for zip_with; pp captured by closure (a default
        # arg would change the lambda's arity as seen by Spark)
        return lambda v, d: v * (((F.lit(pp * 131) + d * 137) % 997) - 498)

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.size(vec_col) - 1),
                weight_fn(table * 97 + p),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out


def lsh_ann_topk(
    df: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 3,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's hyperplane
    bucket in any of n_tables independent tables (equi-join on
    (table, bucket) → hash join, no cross product; multiple tables is the
    standard recall lever). At 16 planes / 65k buckets per table this is
    the 1000-executor-friendly shape: the corpus is bucketed once and
    reused across query batches."""

    def with_buckets(d, idc, vecc, id_out, vec_out):
        # one projection pass computes every table's bucket, then a
        # single posexplode fans out (table, bucket) rows — the corpus is
        # scanned once, not once per table
        bucketed = d.select(
            F.col(idc).alias(id_out),
            F.col(vecc).alias(vec_out),
            F.posexplode(
                F.array(
                    *[hyperplane_bucket_expr(F.col(vecc), n_planes, t) for t in range(n_tables)]
                )
            ).alias("table", "bucket"),
        )
        return bucketed

    c = with_buckets(df, id_col, vec_col, "n_id", "n_vec")
    q = with_buckets(queries, id_col, vec_col, "q_id", "q_vec")
    scored = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", "q_vec", "n_vec")
        .distinct()  # same pair may collide in several tables
        .withColumn("cosine", cosine_expr(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.35,
    n_planes: int = 4,
    n_tables: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH blocking: candidate
    pairs come ONLY from rows sharing a hyperplane bucket in at least one
    of ``n_tables`` tables (equi-join on (table, bucket) — a hash join,
    never an all-pairs nested loop), then an exact cosine verify applies
    ``threshold``. This is the 100 TB shape of the dedup family's dense
    member: the all-pairs O(n²) variant dies at 10⁹ vectors, the bucketed
    one shuffles each vector n_tables times and joins within buckets.

    Approximate by construction (a true pair that never collides in any
    table is missed); recall is tuned with (n_planes, n_tables) and the
    blocking is deterministic, so an oracle can restate it exactly.
    Returns (id_a, id_b, cosine) with id_a < id_b, distinct pairs."""
    vd = F.col(vec_col).cast("array<double>")  # double before bucket math:
    # sign(proj) must agree bit-for-bit with a double-precision oracle
    bucketed = df.select(
        F.col(id_col).alias("id"),
        vd.alias("v"),
        F.posexplode(
            F.array(*[hyperplane_bucket_expr(vd, n_planes, t) for t in range(n_tables)])
        ).alias("table", "bucket"),
    )
    a = bucketed.select("table", "bucket", F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = bucketed.select("table", "bucket", F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .distinct()  # a pair may collide in several tables
        .withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def char_freq_cosine_consec(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """C4 structural similarity: cosine over letter-frequency vectors of
    row i vs row i+1 (the external structural-similarity dep's
    char-frequency representation, SURVEY.md §2.9 C4 — observable at
    corpus.clj:23, crawl.clj:587-589). 26 counting expressions, one
    self-join on id+1; everything stays in codegen."""
    letters = "abcdefghijklmnopqrstuvwxyz"
    t = F.lower(F.col(text_col))
    counts = [
        (F.length(t) - F.length(F.replace(t, F.lit(ch), F.lit("")))).cast("double").alias(f"c_{ch}")
        for ch in letters
    ]
    vec = df.select(F.col(id_col).alias("id"), *counts)
    a = vec.alias("a")
    b = vec.select(
        (F.col("id") - 1).alias("id"), *[F.col(f"c_{ch}").alias(f"d_{ch}") for ch in letters]
    ).alias("b")
    joined = a.join(b, "id")
    dot = sum(F.col(f"c_{ch}") * F.col(f"d_{ch}") for ch in letters)
    na = F.sqrt(sum(F.col(f"c_{ch}") * F.col(f"c_{ch}") for ch in letters))
    nb = F.sqrt(sum(F.col(f"d_{ch}") * F.col(f"d_{ch}") for ch in letters))
    return joined.select(
        "id",
        F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0)).alias("cosine"),
    )


def ivf_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    seed: int = 42,
):
    """IVF coarse quantizer with REAL learned centroids:
    ``pyspark.ml.clustering.KMeans`` (fixed seed → deterministic given
    the same input). Returns (centroids, assignments) where centroids is
    a plain list of n_cells vectors (the tiny model artifact that gets
    broadcast for probing) and assignments is (id, cell).

    Scale shape: k-means over a sampled fraction is standard at 10⁹+
    vectors (fit cost is per-iteration linear scans); the assignment is
    one map-side pass, and search then prunes to n_probe cells — the
    partition-pruned ANN the deterministic ``ivf_assign`` stub stood in
    for in round 1."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    va = df.select(
        F.col(id_col).alias("id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_cells, seed=seed).fit(va)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    assign = model.transform(va).select("id", F.col("prediction").alias("cell"))
    return centroids, assign


def _sq_dist_to(vec, centroid: list):
    cen = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, cen, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: corpus partitioned by learned centroid cell; each query
    probes only its n_probe nearest cells, then exact cosine ranks the
    candidates. The query→cells fan-out is pure column math over the
    broadcast centroid list (no model object on the executors); the
    candidate join is an equi-join on cell."""
    centroids, assign = ivf_fit(df, vec_col, id_col, n_cells, seed)
    return ivf_search(df, queries, centroids, assign, vec_col, id_col, k, n_probe)


def ivf_search(
    df: DataFrame,
    queries: DataFrame,
    centroids: list,
    assign: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Partition-pruned ANN search against a given centroid list +
    cell assignment (the IVF probe stage, independent of how the
    quantizer was fit)."""
    corpus = df.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).cast("array<double>").alias("n_vec")
    ).join(assign.withColumnRenamed("id", "n_id"), "n_id")

    qv = F.col(vec_col).cast("array<double>")
    dists = F.array(
        *[
            F.struct(
                _sq_dist_to(qv, c).alias("d"), F.lit(i).alias("cell")
            )
            for i, c in enumerate(centroids)
        ]
    )
    probed = queries.select(
        F.col(id_col).alias("q_id"),
        qv.alias("q_vec"),
        F.explode(F.slice(F.array_sort(dists), 1, n_probe)).alias("pc"),
    ).select("q_id", "q_vec", F.col("pc.cell").alias("cell"))
    scored = (
        corpus.join(F.broadcast(probed), "cell")
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cosine", cosine_expr(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )


def ivf_seeded_topk(
    df: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF ANN with CORPUS-SEEDED centroids (the vectors with the
    n_cells smallest ids — i.e. a deterministic k-means|| init step
    without the Lloyd iterations): assignment = argmin squared-L2 to a
    centroid (ties → lower cell), probe = the n_probe nearest cells per
    query, exact cosine re-rank inside probed cells. Deterministic end
    to end, so the WHOLE search — fit, assign, probe, re-rank — is
    restatable in DuckDB (list_distance / list_cosine_similarity);
    `ivf_topk` is the production variant with Lloyd-converged centroids
    (pytest recall gate). Scale shape identical: centroids are a
    driver-side model artifact re-broadcast as column literals; the
    corpus never shuffles except the one equi-join on cell."""
    cen_rows = (
        df.orderBy(id_col)
        .limit(n_cells)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    centroids = [list(map(float, r[0])) for r in cen_rows]
    dists = F.array(
        *[
            F.struct(
                _sq_dist_to(F.col(vec_col).cast("array<double>"), c).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    assign = df.select(
        F.col(id_col).alias("id"),
        F.array_sort(dists)[0]["cell"].alias("cell"),
    )
    return ivf_search(df, queries, centroids, assign, vec_col, id_col, k, n_probe)


def ivf_assign(df: DataFrame, vec_col: str, id_col: str, n_cells: int = 16) -> DataFrame:
    """IVF coarse assignment with deterministic pseudo-centroids (same
    integer hyperplane trick, one 'centroid' per cell = unit direction):
    cell = argmax_c <v, dir_c>. Returns (id, cell). Real IVF would learn
    centroids with k-means (`pyspark.ml.clustering.KMeans`) — the
    partition-pruned search shape is identical."""
    best = None
    for cell in range(n_cells):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
                lambda v, d: v * (((F.lit(cell * 251) + d * 241) % 499) - 249),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        s = F.struct(proj.alias("proj"), F.lit(cell).alias("cell"))
        best = s if best is None else F.when(s["proj"] > best["proj"], s).otherwise(best)
    return df.select(F.col(id_col).alias("id"), best["cell"].alias("cell"))
