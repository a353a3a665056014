"""Trained leaf-page classifier (C8/C9): counts-based Naive Bayes.

The reference classifies leaf pages with an offline-trained SVM
(`discussion_forum.clj:10-14, 73-84`, libsvm model file) and a WEKA
J48 over 10 numeric page features (`leaf_pages.clj:230-340`, trained on
hand-labelled URL corpora at `leaf_pages.clj:14-137`). The graft replaces
the offline binary-model dependency with a classifier whose TRAINING is
itself a relational job: a Bernoulli/categorical Naive Bayes fit by pure
``groupBy().count()`` over discretized page features, predicted by a
broadcast join — both stages are DataFrame-native, deterministic, and
restatable in ANSI SQL for the DuckDB oracle.

Exactness design (the driver hash-compares against DuckDB):
- every feature is an INTEGER bin computed with integral division
  (`DIV` in Spark, ``//`` in DuckDB) — no float rounding can flip a bin;
- the argmax is decided by a cross-multiplied integer comparison of the
  two Laplace-smoothed posteriors, so no log/exp floats exist anywhere:
  predict leaf  iff  n1·Π(c1+1)·(n0+B)³  >  n0·Π(c0+1)·(n1+B)³ .
  The training slice is capped at 500 rows (guarded), which keeps the
  full cross-multiplied score under 2^63 — exact in ANSI int64 — and
  the 3-factor product under 2^53, exact in the double returned by the
  ``product`` aggregate both engines use.

Scale shape (100 TB): the model is 3 features × 8 bins × 2 classes = at
most 48 rows + a 1-row prior — a broadcast. Training is one map-side
combinable groupBy over the (bounded) labelled slice; prediction is a
broadcast join + column math per document. No shuffle of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import text_counts

N_BINS = 8  # per-feature bins; Laplace denominator uses this


def page_feature_bins(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Integer-binned page features (the A12 feature family, discretized):
    token-count bin, punctuation-density bin, stopword-ratio bin.
    All integral arithmetic — bit-identical across engines. Counts come
    from the one shared textstats.text_counts definition."""
    c = text_counts(text_col)
    stats = df.select(
        F.col(id_col).alias("id"),
        c["n_tokens"].cast("long").alias("n_tokens"),
        c["n_chars"].cast("long").alias("n_chars"),
        c["n_punct"].cast("long").alias("n_punct"),
        c["n_stop"].cast("long").alias("n_stop"),
    )
    return stats.select(
        "id", "n_tokens", "n_chars", "n_punct",
        F.least(F.expr("n_tokens DIV 16"), F.lit(7)).cast("long").alias("b_tok"),
        F.least(F.expr("(n_punct * 100) DIV greatest(n_chars, 1) DIV 2"), F.lit(7))
        .cast("long").alias("b_punct"),
        F.least(F.expr("(n_stop * 100) DIV greatest(n_tokens, 1) DIV 4"), F.lit(7))
        .cast("long").alias("b_stop"),
    )


def teacher_label() -> F.Column:
    """Deterministic labelling rule standing in for the reference's
    hand-labelled training corpora (`leaf_pages.clj:14-137`): leaf = long
    text with low punctuation density. Integer-only so both engines agree."""
    return (
        (F.col("n_tokens") >= 30)
        & (F.expr("(n_punct * 100) DIV greatest(n_chars, 1)") < 10)
    ).cast("int")


def _melt(feats: DataFrame, cols) -> DataFrame:
    """(id, feature-name, bin) long form for the 3 binned features."""
    arr = F.array(*[
        F.struct(F.lit(name).alias("f"), F.col(col).alias("bin"))
        for name, col in cols
    ])
    return feats.select("id", F.explode(arr).alias("fb")).select(
        "id", F.col("fb.f").alias("f"), F.col("fb.bin").alias("bin")
    )


def nb_leaf_classifier(
    df: DataFrame, text_col: str, id_col: str, train_max_id: int = 200
) -> DataFrame:
    """Fit NB on the labelled slice (id < train_max_id), predict for every
    document. Returns (id, b_tok, b_punct, b_stop, score_leaf, score_non,
    pred_leaf) — scores are the exact cross-multiplied integer posteriors."""
    if train_max_id > 500:
        # the cross-multiplied integer posterior is exact only while
        # n·(n+1)³·(n+8)³ < 2^63, which holds through n=500 (8.2e18) and
        # overflows ANSI-mode int64 by n=520. Larger corpora: train on a
        # capped deterministic sample, the model saturates long before.
        raise ValueError("train_max_id > 500 overflows the integer posterior")
    fcols = [("tok", "b_tok"), ("punct", "b_punct"), ("stop", "b_stop")]
    feats = page_feature_bins(df, text_col, id_col)

    train = feats.filter(F.col("id") < train_max_id).withColumn("y", teacher_label())
    priors = train.agg(
        F.sum("y").cast("long").alias("n1"),
        (F.count("*") - F.sum("y")).cast("long").alias("n0"),
    )
    model = (
        _melt(train.select("id", "b_tok", "b_punct", "b_stop"), fcols)
        .join(train.select("id", "y"), "id")
        .groupBy("f", "bin")
        .agg(
            F.sum("y").cast("long").alias("c1"),
            (F.count("*") - F.sum("y")).cast("long").alias("c0"),
        )
    )

    melted = _melt(feats, fcols)
    joined = melted.join(F.broadcast(model), ["f", "bin"], "left").select(
        "id",
        (F.coalesce(F.col("c1"), F.lit(0)) + 1).alias("l1"),
        (F.coalesce(F.col("c0"), F.lit(0)) + 1).alias("l0"),
    )
    # product of 3 ints ≤ (train_max_id+1)^3 — exact in the double the
    # product aggregate returns; cast back to long loss-free
    prods = joined.groupBy("id").agg(
        F.product("l1").cast("long").alias("p1"),
        F.product("l0").cast("long").alias("p0"),
    )

    b = F.lit(N_BINS).cast("long")
    d0 = F.col("n0") + b
    d1 = F.col("n1") + b
    s1 = F.col("n1") * F.col("p1") * d0 * d0 * d0
    s0 = F.col("n0") * F.col("p0") * d1 * d1 * d1
    # 1-row prior attaches via a BROADCAST HASH join: a crossJoin (or a
    # literal join key, which Catalyst constant-folds away) plans as
    # BroadcastNestedLoopJoin, which the plan audit bans outright — so
    # both keys are attribute-derived zeros the optimizer can't fold
    return (
        feats.join(prods, "id")
        .withColumn("__k", F.pmod(F.col("id"), F.lit(1)))
        .join(
            F.broadcast(priors.withColumn("__k", F.pmod(F.col("n1"), F.lit(1)))),
            "__k",
        )
        .select(
            "id", "b_tok", "b_punct", "b_stop",
            s1.alias("score_leaf"),
            s0.alias("score_non"),
            (s1 > s0).alias("pred_leaf"),
        )
    )
