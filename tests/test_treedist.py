"""C3 RTDM tree-edit distance (restricted top-down mapping) — pure-DP
invariants + the Spark consecutive-pair operator."""

import pytest

from crawler_spark.operators import treedist


def sim(a, b):
    return treedist.rtdm_similarity_html(a, b)


def test_identical_pages():
    h = "<html><body><div><a href='x'>A</a><p>t</p></div></body></html>"
    assert sim(h, h) == pytest.approx(1.0)


def test_disjoint_structures():
    a = "<html><body><table><tr><td>x</td></tr></table></body></html>"
    b = "<article><section><h1>y</h1></section></article>"
    assert sim(a, b) == pytest.approx(0.0)  # roots differ → full replace


def test_small_known_distance():
    # t1: html>body>(div, p)   t2: html>body>(div)
    # top-down alignment deletes the <p> subtree (size 1):
    # dist = 1; sizes 4 + 3 → sim = 1 - 1/7
    a = "<html><body><div></div><p></p></body></html>"
    b = "<html><body><div></div></body></html>"
    assert sim(a, b) == pytest.approx(1 - 1 / 7)


def test_subtree_replacement_cost():
    # same skeleton, one leaf's tag differs: dist = 1 (del span) + 1
    # (ins em) = 2; sizes 4 + 4
    a = "<html><body><div><span></span></div></body></html>"
    b = "<html><body><div><em></em></div></body></html>"
    assert sim(a, b) == pytest.approx(1 - 2 / 8)


def test_similarity_monotone_in_shared_structure():
    base = "<html><body>" + "<div><a href='x'>t</a></div>" * 5 + "</body></html>"
    near = "<html><body>" + "<div><a href='x'>t</a></div>" * 4 + "<p></p></body></html>"
    far = "<html><body><ul>" + "<li></li>" * 10 + "</ul></body></html>"
    assert sim(base, near) > sim(base, far)


def test_nil_safety():
    assert sim(None, "<html></html>") == 0.0


def test_rtdm_consec_pairs_spark(spark):
    rows = [
        (i,
         "<html><body>"
         + ("<div><a>x</a></div>" * 3 if i % 2 == 0 else "<table><tr><td>y</td></tr></table>")
         + "</body></html>")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "html"])
    out = treedist.rtdm_consec_pairs(df, "html", "doc_id")
    got = {r.id: r.rtdm for r in out.collect()}
    assert len(got) == 19
    # consecutive pages alternate structure → low sim; same-parity pages
    # are identical (checked via a shifted frame)
    assert all(v < 0.5 for v in got.values())
    df2 = spark.createDataFrame([(0, rows[0][1]), (1, rows[2][1])], ["doc_id", "html"])
    out2 = treedist.rtdm_consec_pairs(df2, "html", "doc_id").collect()
    assert out2[0].rtdm == pytest.approx(1.0)
