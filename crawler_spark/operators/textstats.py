"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

Reference analogs: tokenizers ``utils.clj:179-195``, punct-density +
formatting features ``leaf_pages.clj:141-228`` (the 10-feature page
classifier), text normalization ``shingles.clj:12-16``. All pure column
expressions (whole-stage codegen; no UDFs), and every formula is
restateable in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash61, normalize_text

# Tiny per-language stopword anchors for the n-gram/stopword heuristic.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
    "es": ["el", "la", "los", "que", "es", "una", "con", "por"],
}


def text_counts(text_col) -> dict:
    """Shared integer text counts (tokens / chars / punct / en-stopword
    hits) — ONE definition for quality_score, leaf_features and the NB
    classifier bins (operators/classifier.py), so a tokenization change
    can't silently diverge the three operators and their DuckDB oracles."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.filter(F.split(normalize_text(text), " "), lambda t: t != "")
    stop_arr = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    return {
        "toks": toks,
        "n_tokens": F.size(toks),
        "n_chars": F.length(text),
        "n_punct": F.length(text) - F.length(F.regexp_replace(text, r"[.!?,;:]", "")),
        "n_stop": F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))),
    }


def token_count(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (word-piece count
    approximated as ceil(chars/4) per token, the common ~4-chars-per-token
    heuristic) — both as columns."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    toks = F.filter(toks, lambda t: t != "")
    subword = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.ceil(F.length(t) / 4).cast("long")
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        subword.alias("n_subwords"),
        F.length(F.col(text_col)).alias("n_chars_raw"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a
    composite score (leaf_pages.clj:141-228 analog, columnized)."""
    c = text_counts(text_col)
    toks, n_tokens, n_chars = c["toks"], c["n_tokens"], c["n_chars"]
    n_punct, n_stop = c["n_punct"], c["n_stop"]
    mean_tok_len = F.when(n_tokens > 0, (
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)) / n_tokens
    )).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * 0.2
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        mean_tok_len.alias("mean_tok_len"),
        score.alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-vote language ID: per language, count token hits against
    its anchor list; argmax wins, ties broken alphabetically, zero hits →
    'und'. Declarative: the scores are plain aggregates."""
    toks = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda t: t != "")
    scores = []
    for lang, words in sorted(LANG_STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # max_by (hits desc, lang asc): negate lang ordering via array_max on
    # struct(hits, negated-rank) — instead pick via sort: greatest struct
    best = F.array_max(
        F.array(*[F.struct((s["hits"] * 1000 - i).alias("rank"), s["lang"].alias("lang"))
                  for i, s in enumerate(scores)])
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.when(F.floor((best["rank"] + len(scores) - 1) / 1000) > 0, best["lang"])
        .otherwise(F.lit("und"))
        .alias("pred_lang"),
    )


def leaf_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """A12 classifier features (leaf_pages.clj:141-228, columnized):
    per-document numeric aggregates + the rule-based leaf prediction
    standing in for the SVM/WEKA classifiers (C8/C9; the graft replaces
    trained models with a deterministic rule per SURVEY.md §2.9)."""
    text = F.col(text_col)
    c = text_counts(text_col)
    toks, n_tokens, n_chars = c["toks"], c["n_tokens"], c["n_chars"]
    n_punct = c["n_punct"]
    n_digits = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    n_sentences = F.size(F.filter(F.split(text, r"[.!?]"), lambda s: F.trim(s) != ""))
    sum_tok_len = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    mean_tok_len = F.when(n_tokens > 0, sum_tok_len / n_tokens).otherwise(F.lit(0.0))
    max_tok_len = F.array_max(F.transform(toks, lambda t: F.length(t)))
    stop_ratio = F.when(
        n_tokens > 0, c["n_stop"] / n_tokens
    ).otherwise(F.lit(0.0))
    is_leaf_pred = (n_tokens >= 30) & (
        F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)) < 0.1
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        n_punct.alias("n_punct"),
        n_digits.alias("n_digits"),
        n_sentences.alias("n_sentences"),
        F.round(mean_tok_len, 4).alias("mean_tok_len"),
        F.coalesce(max_tok_len, F.lit(0)).alias("max_tok_len"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        is_leaf_pred.alias("is_leaf_pred"),
    )


def doc_fingerprint(df: DataFrame, text_col: str, id_col: str, k: int = 8) -> DataFrame:
    """Bottom-k sketch fingerprint: the k smallest 4-gram shingle hashes,
    packed to a string (winnowing-style document fingerprint; same
    identity ⇒ same fingerprint, robust to small edits)."""
    from .dedup import shingles_col, widen_narrow_input

    sh = (
        widen_narrow_input(df)
        .select(F.col(id_col).alias("id"), F.explode(shingles_col(F.col(text_col))).alias("sh"))
        .filter(F.col("sh") != "")
        .withColumn("h", md5_hash61(F.col("sh")))
        .distinct()
    )
    return (
        sh.groupBy("id")
        .agg(F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("mins"))
        .select("id", F.concat_ws("-", F.col("mins")).alias("fingerprint"))
    )
