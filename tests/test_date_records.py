"""Golden-fixture eval: the reference's 26 REAL saved forum/board pages
(resources/date-indexed-data/{positive,negative}, replicated under
tests/fixtures/date-indexed) through the date-indexed record detector
(reference results.html: date-detection success threshold 0.7,
published success rate 17/20 on the positives).

These are the first tests of the stdlib-parser DOM pipeline on markup
nobody synthesized — 2.5 MB of genuinely messy HTML (4chan, reddit,
stack overflow, phpBB, vBulletin, gaia, topix...).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "date-indexed")


def _pages(label):
    out = []
    for f in sorted(glob.glob(os.path.join(FIXDIR, label, "*.html"))):
        out.append(
            (os.path.basename(f)[:-5],
             open(f, encoding="utf-8", errors="replace").read())
        )
    return out


def test_fixture_inventory():
    # the reference set: 20 positive, 6 negative
    assert len(_pages("positive")) == 20
    assert len(_pages("negative")) == 6


def test_detector_beats_published_rate_on_positives(spark):
    """results.html publishes 17/20; this detector reaches 19/20 on the
    identical pages (pinned exactly so a parser/pattern regression is
    loud). The one miss is pinned too."""
    from crawler_spark.operators.date_records import detect_date_indexed

    df = spark.createDataFrame(_pages("positive"), "page string, html string")
    got = {
        r.page: r for r in detect_date_indexed(df, "html", ("page",)).collect()
    }
    assert len(got) == 20
    detected = {p for p, r in got.items() if r.detected}
    assert len(detected) >= 17, f"below published rate: {sorted(detected)}"
    assert detected == {p for p, _ in _pages("positive")} - {
        "topix_west_helena_ar"
    }
    # sanity on the verdicts: real record counts, ratios >= threshold
    for p in detected:
        assert got[p].n_records >= 4
        assert got[p].date_ratio >= 0.7
        assert got[p].best_group.startswith(("N:", "P:"))


def test_detector_rejects_negatives(spark):
    """At most one false positive on the 6 negative pages (pinned: the
    urbandictionary '4chan' entry page IS date-stamped per definition
    entry, so the detector finds a genuine dated record list there)."""
    from crawler_spark.operators.date_records import detect_date_indexed

    df = spark.createDataFrame(_pages("negative"), "page string, html string")
    got = detect_date_indexed(df, "html", ("page",)).collect()
    fps = sorted(r.page for r in got if r.detected)
    assert fps == ["urbandictionary_4chan"], fps


def test_record_grouping_finds_published_shapes():
    """Spot-check against results.html's winning xpaths: hn_front's
    records are table rows; 4chan_vg's are divs under the board div —
    the detector's best group must agree on the record tag."""
    from crawler_spark.operators.date_records import page_date_records

    hn = dict(_pages("positive"))["hn_front"]
    key, n, nd, r, ok = page_date_records(hn)
    assert ok and key.endswith("/tr") or "/tr" in key, key

    chan = dict(_pages("positive"))["4chan_vg"]
    key, n, nd, r, ok = page_date_records(chan)
    assert ok
    assert "board" in key, key


def test_leaf_features_on_real_markup(spark):
    """leaf_features (A12) over the text of all 26 real pages: every
    numeric feature lands in a sane range and the pipeline is
    crash-free on genuinely messy input."""
    from crawler_spark.dom import parse_html
    from crawler_spark.operators.textstats import leaf_features

    rows = [
        (p, parse_html(h).text())
        for p, h in _pages("positive") + _pages("negative")
    ]
    df = spark.createDataFrame(rows, "page string, text string")
    feats = leaf_features(df, "text", "page").collect()
    assert len(feats) == 26
    for r in feats:
        assert r.n_tokens > 50, r.page  # real pages are text-bearing
        assert 0.0 <= r.stop_ratio <= 1.0
        assert r.mean_tok_len > 0


@pytest.mark.parametrize("page", ["4chan_vg", "stackoverflow_landing"])
def test_parser_survives_largest_pages(page):
    """The two largest fixtures (219 KB / 193 KB) parse into a
    substantial DOM — no silent truncation by the lenient closer."""
    from crawler_spark.dom import parse_html

    html = dict(_pages("positive"))[page]

    def count(n):
        return 1 + sum(count(c) for c in n.children)

    assert count(parse_html(html)) > 500


def test_diversity_detector_beats_published_rate(spark):
    """The second published eval (output_diversity_and_outlier.html,
    17-18/20): the date-free diversity+outlier detector reaches 20/20 on
    the identical positive pages — pinned exactly."""
    from crawler_spark.operators.date_records import detect_diverse_records

    df = spark.createDataFrame(_pages("positive"), "page string, html string")
    got = {
        r.page: r
        for r in detect_diverse_records(df, "html", ("page",)).collect()
    }
    assert {p for p, r in got.items() if r.detected} == {
        p for p, _ in _pages("positive")
    }
    for r in got.values():
        assert r.n_records >= 6
        assert r.cv_permille <= 400  # the uniformity bound, scaled


def test_diversity_detector_rejects_negatives(spark):
    """One pinned FP (amazon_home's nav grid IS a uniform diverse list);
    the other five negatives stay rejected."""
    from crawler_spark.operators.date_records import detect_diverse_records

    df = spark.createDataFrame(_pages("negative"), "page string, html string")
    got = detect_diverse_records(df, "html", ("page",)).collect()
    assert sorted(r.page for r in got if r.detected) == ["amazon_home"]


def test_detector_union_covers_all_positives():
    """Date detector ∪ diversity detector = 20/20 positives: diversity
    recovers topix_west_helena_ar (undated records), dates anchor the
    rest — the complementarity the reference's two evals imply."""
    from crawler_spark.operators.date_records import (
        page_date_records, page_diverse_records,
    )

    for page, html in _pages("positive"):
        dated = page_date_records(html)[4]
        diverse = page_diverse_records(html)[4]
        assert dated or diverse, page
