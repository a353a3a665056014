"""Text-analysis operators over hand-checkable rows + driver documents."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators import textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat and the dog sat in the garden with the bird"),
        (2, "der hund und die katze ist nicht in das haus mit"),
        (3, "zzz qqq xxx"),
        (4, "Hello, world! This is: a test... with punctuation; lots of it!?"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_count(docs):
    out = {r.id: (r.n_tokens, r.n_subwords) for r in textstats.token_count(docs, "text", "doc_id").collect()}
    assert out[1][0] == 12
    assert out[3][0] == 3
    assert out[1][1] >= out[1][0]  # subwords ≥ tokens


def test_quality_score(docs):
    out = {r.id: r for r in textstats.quality_score(docs, "text", "doc_id").collect()}
    assert out[1].stop_ratio > 0.3
    assert out[3].stop_ratio == 0.0
    assert out[4].punct_ratio > 0.1
    assert out[1].quality > out[3].quality


def test_lang_id(docs):
    out = {r.id: r.pred_lang for r in textstats.lang_id(docs, "text", "doc_id").collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "und"


def test_doc_fingerprint_stability(spark):
    rows = [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "totally different text here now ok")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.id: r.fingerprint for r in textstats.doc_fingerprint(df, "text", "doc_id").collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_nb_leaf_classifier(spark):
    """NB fit on the teacher-labelled slice should (a) be deterministic,
    (b) recover the teacher rule well on separable synthetic docs, and
    (c) emit integer-exact scores (no floats anywhere)."""
    from crawler_spark.operators.classifier import nb_leaf_classifier

    # separable corpus: leafy docs = long low-punct prose; non-leaf =
    # short punct-heavy nav strings. ids interleave classes.
    rows = []
    for i in range(120):
        if i % 2 == 0:
            text = " ".join(["the quick brown word of prose is that with number"] * 5)
        else:
            text = "home | login ;;; !!! nav: " + "x, " * (i % 4 + 1)
        rows.append((i, text))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    out1 = nb_leaf_classifier(df, "text", "doc_id", train_max_id=80)
    got1 = {r.id: r for r in out1.collect()}
    got2 = {r.id: r for r in nb_leaf_classifier(df, "text", "doc_id", train_max_id=80).collect()}
    assert {k: (v.pred_leaf, v.score_leaf, v.score_non) for k, v in got1.items()} == {
        k: (v.pred_leaf, v.score_leaf, v.score_non) for k, v in got2.items()
    }
    # scores are integral longs
    schema = dict((f.name, f.dataType.simpleString()) for f in out1.schema.fields)
    assert schema["score_leaf"] == "bigint" and schema["score_non"] == "bigint"
    # held-out half (ids >= 80, never in training) still classified by class
    heldout_leaf = [got1[i].pred_leaf for i in range(80, 120, 2)]
    heldout_non = [got1[i].pred_leaf for i in range(81, 120, 2)]
    assert sum(heldout_leaf) >= len(heldout_leaf) * 0.9
    assert sum(heldout_non) <= len(heldout_non) * 0.1
