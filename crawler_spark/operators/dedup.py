"""Deduplication operators — exact, n-gram Jaccard, MinHash-LSH, SimHash,
phash-Hamming (SURVEY.md §2.9; reference near-dup: word 4-gram Jaccard
≥ 0.9, ``shingles.clj:5-43``; RTDM tree-edit similarity ``similarity.clj``
is replaced by the phash analog per the graft cell).

Everything here is built-in ``pyspark.sql.functions`` — no Python UDFs —
so every stage stays inside whole-stage codegen, and every hash used is
restateable in ANSI SQL for the DuckDB oracle (md5-hex arithmetic, not
engine-private hash functions).

Scale shapes:
* exact dedup: one hash-shuffle groupBy — the canonical map-side-partial
  aggregate, linear at any scale;
* n-gram Jaccard: explode shingles → sampled-sketch self-join on shingle
  → per-pair intersection counts. The sample (keep a deterministic 1/k of
  shingles by hash) bounds the join fan-out the way MinHash bounds
  signature size; pairs sharing zero sampled shingles never materialize.
* MinHash-LSH: signatures via groupBy-min over universal-hash families
  (pure column math), banded into buckets; candidate pairs only within
  equal (band, band_hash) buckets — the classic sub-quadratic path;
* SimHash / phash: fixed-width bit signatures compared by
  ``bit_count(xor)`` — a broadcastable band-bucket join for scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Deterministic 61-bit string hash both Spark and DuckDB can compute:
# first 15 hex chars of md5 → int. (conv() in Spark, parse in DuckDB.)
MD5_PREFIX_LEN = 15


def md5_hash61(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, MD5_PREFIX_LEN), 16, 10).cast("long")


def normalize_text(col) -> F.Column:
    """lowercase, strip punctuation, collapse whitespace
    (shingles.clj:12-16)."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\w\s]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def shingles_col(col, n: int = 4) -> F.Column:
    """Word n-gram shingle strings from raw text (shingles.clj:5-26).

    Built as arrays_zip of n shifted slices + a per-element concat: the
    transform lambda touches only its own zipped element, so the token
    array (and the normalize regexes feeding it) is evaluated a constant
    number of times per row — the index-based slice(toks, i+1, n) form
    re-evaluated the outer array expression per shingle inside the
    interpreted HOF (measured 2.4x slower). Short rows degrade
    identically: zip pads missing tails with NULL and concat_ws skips
    them, matching the old greatest(k-1, 0) clamp."""
    toks = F.split(normalize_text(col), " ")
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, k) for i in range(n)])
    return F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )


_SHUFFLE_NODES = ("Join", "Aggregate", "Window", "Repartition", "Deduplicate", "Sort")


def widen_narrow_input(df: DataFrame) -> DataFrame:
    """Heavy per-row stages must not inherit a narrow scan: one parquet
    file at small SF reads as a single partition and serializes all the
    regex/hash work onto one core (measured 10x on the shingle explode).
    At cluster scale inputs carry thousands of partitions and this is a
    no-op; the round-robin repartition only fires when the scan is
    narrower than the session's parallelism.

    Only shuffle-free plans (scan + project/filter) are probed: a plan
    with an upstream Join/Aggregate/Window already runs at
    shuffle-partition width, and probing it via .rdd would finalize the
    adaptive plan — executing every upstream query stage eagerly and
    then again at the real action (measured: 6.7 s probe on a 3M-row
    join that the action re-ran)."""
    plan = df._jdf.queryExecution().analyzed().toString()
    if any(k in plan for k in _SHUFFLE_NODES):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicates by normalized-text hash; keeps the smallest id per
    group (deterministic winner). Returns (id, dup_of, text_hash)."""
    df = widen_narrow_input(df)
    h = df.select(F.col(id_col).alias("id"), md5_hash61(normalize_text(F.col(text_col))).alias("text_hash"))
    w = Window.partitionBy("text_hash").orderBy("id")
    return (
        h.withColumn("keeper", F.min("id").over(Window.partitionBy("text_hash")))
        .select("id", F.col("keeper").alias("dup_of"), "text_hash")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 4,
    threshold: float = 0.9,
    sample_mod: int = 1,
    df_cap: int | None = 10_000,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with sketch Jaccard ≥ threshold over
    word n-gram shingles (shingles.clj:28-43 semantics, distributed).

    sample_mod > 1 keeps only shingles with hash % sample_mod == 0
    (deterministic bottom-sketch) — the scale knob that bounds the
    explode-join at 100 TB; sample_mod=1 is the exact reference semantics.

    df_cap drops shingles shared by more than df_cap documents BEFORE the
    self-join (standard hot-shingle guard): one boilerplate shingle on
    10⁶ docs would otherwise contribute 10¹² join rows — quadratic in the
    hottest key, unbounded by sample_mod. Such shingles are navigation
    chrome, not content evidence; Jaccard is then over the capped shingle
    universe (sizes computed after the cap, so the metric stays a true
    Jaccard of the surviving sets). None = exact reference semantics.
    """
    # hash BEFORE the distinct: the dedup shuffle then carries 16-byte
    # (id, hash) rows instead of raw shingle strings — the oracle's
    # hashed0 CTE distincts on the hash the same way
    sh = (
        widen_narrow_input(df)
        .select(F.col(id_col).alias("id"), F.explode(shingles_col(F.col(text_col), n)).alias("sh"))
        .filter(F.col("sh") != "")
        .select("id", md5_hash61(F.col("sh")).alias("sh_hash"))
        .distinct()
    )
    if sample_mod > 1:
        sh = sh.filter(F.pmod(F.col("sh_hash"), F.lit(sample_mod)) == 0)
    if df_cap is not None:
        # document-frequency cap as a WINDOW over sh_hash: the count
        # rides the same hash(sh_hash) exchange the self-join below
        # needs, so the cap costs a sort, not an extra aggregation pass
        # over every shingle (a separate groupBy+anti-join doubled the
        # operator's wall time when no shingle was actually hot)
        w_df = Window.partitionBy("sh_hash")
        sh = sh.withColumn("__df", F.count("*").over(w_df)).filter(
            F.col("__df") <= df_cap
        ).drop("__df")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "sh_hash")
    b = sh.select(F.col("id").alias("id_b"), "sh_hash")
    inter = (
        a.join(b, "sh_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "jaccard")


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 32, n: int = 4
) -> DataFrame:
    """(id, hash_idx, minhash): min over a universal-hash family
    h_i(x) = (a_i*x + b_i) mod p applied to shingle hashes — expressed as
    groupBy-min (map-side partial agg; one shuffle keyed on id)."""
    # p = 2^31-1 keeps a*x' + b < 2^63 (ANSI mode raises on long overflow)
    p = 2147483647
    # hash+mod BEFORE the distinct (slim shuffle; identical MIN result —
    # and the oracle's hashed CTE distincts on x the same way)
    sh = (
        widen_narrow_input(df)
        .select(F.col(id_col).alias("id"), F.explode(shingles_col(F.col(text_col), n)).alias("sh"))
        .filter(F.col("sh") != "")
        .select("id", F.pmod(md5_hash61(F.col("sh")), F.lit(p)).alias("x"))
        .distinct()
    )
    idx = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("hash_idx")
    expanded = sh.select("id", "x", idx)
    a = F.col("hash_idx") * 2 + 1  # odd multipliers
    b = F.col("hash_idx") * 7919 + 1
    hv = F.pmod(a * F.col("x") + b, F.lit(p))
    return (
        expanded.withColumn("hv", hv)
        .groupBy("id", "hash_idx")
        .agg(F.min("hv").alias("minhash"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH, verified by
    signature agreement ≥ threshold. Sub-quadratic: pairs only form
    inside equal (band, band_signature) buckets."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, n)
    # band signature: minhashes sorted by hash_idx (deterministic order)
    banded = (
        sig.withColumn("band", (F.col("hash_idx") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(F.sort_array(F.collect_list(F.struct("hash_idx", "minhash"))).alias("s"))
        # join key: '-'-joined minhashes in hash_idx order — unambiguous
        # for ints and cheaper than serializing the struct array to JSON
        .withColumn(
            "band_sig",
            F.concat_ws(
                "-", F.transform(F.col("s"), lambda s: s["minhash"].cast("string"))
            ),
        )
        .select("id", "band", "band_sig")
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "band_sig"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    # verify: fraction of agreeing minhashes estimates Jaccard
    sa = sig.select(F.col("id").alias("id_a"), "hash_idx", F.col("minhash").alias("mh_a"))
    sb = sig.select(F.col("id").alias("id_b"), "hash_idx", F.col("minhash").alias("mh_b"))
    agree = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "hash_idx"])
        .groupBy("id_a", "id_b")
        .agg((F.sum((F.col("mh_a") == F.col("mh_b")).cast("int")) / num_hashes).alias("est_jaccard"))
    )
    return agree.filter(F.col("est_jaccard") >= threshold)


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """(id, simhash): sign-aggregated token-hash bits — groupBy-sum over
    (id, bit) then bit-pack, all column math."""
    toks = (
        widen_narrow_input(df)
        .select(F.col(id_col).alias("id"), F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .withColumn("x", md5_hash61(F.col("tok")))
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    # F.shiftright/shiftleft take a literal int; column shift amounts need
    # the SQL form
    contrib = toks.select("id", "x", bit).withColumn(
        "v", F.when(F.expr("(x >> bit) & 1") == 1, 1).otherwise(-1)
    )
    return (
        contrib.groupBy("id", "bit")
        .agg(F.sum("v").alias("s"))
        .withColumn("bitval", F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)")).otherwise(F.lit(0)))
        .groupBy("id")
        .agg(F.sum("bitval").alias("simhash"))
    )


def simhash_neardup_pairs(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming, blocked
    by bit-bands (pigeonhole: d differences across d+1 bands leave at
    least one band difference-free)."""
    sig = simhash(df, text_col, id_col, bits)
    n_bands = max_hamming + 1
    band_bits = max(1, bits // n_bands)
    bands = sig.select(
        "id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"(simhash >> (band * {band_bits})) & {(1 << band_bits) - 1}"),
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "band_val"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.simhash").alias("sh_a"),
            F.col("y.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


def phash_neardup_join(
    left: DataFrame, right: DataFrame, phash_col: str, id_col: str,
    max_hamming: int = 8,
) -> DataFrame:
    """Cross-FRAME image near-dup: every (left, right) pair within
    Hamming ≤ max_hamming — the incremental-ingest shape (today's batch
    vs the reference corpus), where the self-join variant above would
    wrongly also pair rows within each side. Same pigeonhole banding
    (max_hamming+1 bands → candidate set provably complete), same
    equi-join-only plan: at the 100 TB design point the corpus side is
    banded once and reused across daily increments. Returns
    (id_l, id_r, hamming)."""
    n_bands = max_hamming + 1
    band_bits = max(1, 64 // n_bands)

    def banded(d, id_out, ph_out):
        return d.select(
            F.col(id_col).alias(id_out), F.col(phash_col).alias(ph_out),
            F.explode(
                F.sequence(F.lit(0), F.lit(n_bands - 1))
            ).alias("band"),
        ).withColumn(
            "band_val",
            F.expr(
                f"({ph_out} >> (band * {band_bits})) & {(1 << band_bits) - 1}"
            ),
        )

    cand = (
        banded(left, "id_l", "ph_l")
        .join(banded(right, "id_r", "ph_r"), ["band", "band_val"])
        .select("id_l", "id_r", "ph_l", "ph_r")
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("ph_l").bitwiseXOR(F.col("ph_r")))
    ).filter(F.col("hamming") <= max_hamming).select("id_l", "id_r", "hamming")


def phash_neardup_pairs(df: DataFrame, phash_col: str, id_col: str, max_hamming: int = 8) -> DataFrame:
    """Image near-dup by perceptual-hash Hamming distance (the graft's
    vectorized analog of RTDM tree-edit similarity, similarity.clj:7-125),
    banded like simhash for sub-quadratic candidate generation.

    Pigeonhole guarantee needs n_bands = max_hamming + 1: with d
    differences and d+1 bands, at least one band is difference-free even
    if every difference lands in a distinct band (tail bits not covered
    by a band only reduce the number of dirty bands)."""
    n_bands = max_hamming + 1
    band_bits = max(1, 64 // n_bands)
    sig = df.select(F.col(id_col).alias("id"), F.col(phash_col).alias("ph"))
    bands = sig.select(
        "id", "ph", F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band")
    ).withColumn(
        "band_val",
        F.expr(f"(ph >> (band * {band_bits})) & {(1 << band_bits) - 1}"),
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "band_val"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"),
                F.col("x.ph").alias("ph_a"), F.col("y.ph").alias("ph_b"))
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    ).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")
