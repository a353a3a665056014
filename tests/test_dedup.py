"""Dedup operator suite vs tiny hand-checkable corpora + the synthetic
web's planted near-dups (reference threshold: Jaccard ≥ 0.9 on word
4-grams, shingles.clj:31-36)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 1
        (3, "The quick brown fox jumps over the lazy dog, today!"),  # normalized dup of 1
        (4, "the quick brown fox jumps over the lazy dog tonight"),  # near dup (1 token)
        (5, "completely different words about database engines and storage"),
        (6, "another unrelated caption mentioning mountains and rivers and lakes"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["id", "t"]).select(
        dedup.shingles_col(F.col("t")).alias("sh")
    )
    assert df.collect()[0].sh == ["a b c d", "b c d e"]


def test_exact_dedup(docs):
    out = {r.id: r.dup_of for r in dedup.exact_dedup(docs, "text", "doc_id").collect()}
    assert out[1] == 1 and out[2] == 1 and out[3] == 1  # normalization folds 3 into 1
    assert out[4] == 4 and out[5] == 5


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0
    assert (1, 4) in pairs and 0.5 <= pairs[(1, 4)] < 1.0
    assert (1, 5) not in pairs


def test_minhash_lsh_finds_planted_dups(docs):
    got = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=32, bands=16, threshold=0.5
        ).collect()
    }
    assert (1, 2) in got and (1, 3) in got
    assert (5, 6) not in got


def test_simhash_neardup(docs):
    sigs = {r.id: r.simhash for r in dedup.simhash(docs, "text", "doc_id").collect()}
    assert sigs[1] == sigs[2] == sigs[3]
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_neardup_pairs(docs, "text", "doc_id", max_hamming=6).collect()
    }
    assert (1, 2) in pairs
    assert (5, 6) not in pairs


def test_phash_neardup(spark):
    rows = [(1, 0x0F0F), (2, 0x0F0F), (3, 0x0F0E), (4, -1)]
    df = spark.createDataFrame(rows, ["img", "ph"])
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.phash_neardup_pairs(df, "ph", "img", max_hamming=2).collect()
    }
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 1 and pairs[(2, 3)] == 1
    assert not any(4 in p for p in pairs)


def test_synthetic_web_planted_neardups(spark):
    """The synthetic corpus plants caption near-dups at i%37==0 — the
    jaccard pair finder must recover consecutive-id pairs."""
    from crawler_spark.synth import SynthConfig, corpus_df

    cfg = SynthConfig(n_pages=300, with_images=False)
    corpus = corpus_df(spark, cfg).select(
        F.regexp_extract("image_id", r"(\d+)$", 1).cast("long").alias("doc_id"),
        F.col("caption"),
    )
    pairs = dedup.ngram_jaccard_pairs(corpus, "caption", "doc_id", threshold=0.8).collect()
    consec = [(r.id_a, r.id_b) for r in pairs if r.id_b == r.id_a + 1]
    assert len(consec) >= 3


def test_phash_neardup_join_matches_brute(spark):
    """Cross-frame banded join = brute-force cross Hamming (pigeonhole
    completeness), and it must NOT pair rows within one side."""
    from crawler_spark.operators.dedup import phash_neardup_join

    import random

    rng = random.Random(5)
    left_rows = [(i, rng.getrandbits(63)) for i in range(40)]
    # plant rights: 0..9 near left 0..9 (flip 3 bits), rest random
    right_rows = []
    for i in range(10):
        ph = left_rows[i][1] ^ (1 << (i % 60)) ^ (1 << 62) ^ (1 << (i + 1))
        right_rows.append((100 + i, ph))
    right_rows += [(200 + i, rng.getrandbits(63)) for i in range(30)]
    left = spark.createDataFrame(left_rows, "id long, ph long")
    right = spark.createDataFrame(right_rows, "id long, ph long")
    got = {
        (r.id_l, r.id_r, r.hamming)
        for r in phash_neardup_join(left, right, "ph", "id", max_hamming=8).collect()
    }
    brute = set()
    for il, pl in left_rows:
        for ir, pr in right_rows:
            h = bin(pl ^ pr).count("1")
            if h <= 8:
                brute.add((il, ir, h))
    assert got == brute
    assert all(r[0] < 100 <= r[1] for r in got)  # strictly cross-frame
