"""P1/P2/P9 HTML parsing + xpath generalization, validated against the
reference's own unit expectations (``test/crawler/dom_test.clj:10-50``
over ``resources/anchor-tags-test.html`` / ``tag-id-class-test.html``,
replicated under tests/fixtures) plus the Spark mapInPandas stage and
the HTML-round-trip into the engine's out_links shape."""

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark import dom

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _read(name):
    with open(os.path.join(FIX, name)) as f:
        return f.read()


# ---- dom_test.clj parity -------------------------------------------------


def test_anchor_tags_count():
    # dom_test.clj:11-14 anchor-tag-test
    assert len(dom.anchor_tags(dom.parse_html(_read("anchor-tags-test.html")))) == 4


def test_path_root_seq():
    # dom_test.clj:16-23 path-root-seq-test
    a = dom.anchor_tags(dom.parse_html(_read("anchor-tags-test.html")))[0]
    assert [n.tag for n in dom.path_root_seq(a)] == ["html", "body", "a"]


def test_tag_id_class():
    # dom_test.clj:25-32 tag-id-class-test
    a = dom.anchor_tags(dom.parse_html(_read("tag-id-class-test.html")))[0]
    assert dom.tag_id_class(a) == ("a", "hello", ["hello", "class-tag"])


def test_tag_id_class_to_xpath():
    # dom_test.clj:34-41 tag-id-class->xpath-test
    a = dom.anchor_tags(dom.parse_html(_read("tag-id-class-test.html")))[0]
    assert dom.tag_id_class_to_xpath(dom.tag_id_class(a)) == (
        "a[contains(@id,'hello') and contains(@class,'hello')"
        " or contains(@class,'class-tag')]"
    )


def test_tags_to_xpath():
    # dom_test.clj:43-52 tags->xpath-test
    a = dom.anchor_tags(dom.parse_html(_read("tag-id-class-test.html")))[0]
    assert dom.node_to_xpath(a) == (
        "//html/body/a[contains(@id,'hello')"
        " and contains(@class,'hello') or contains(@class,'class-tag')]"
    )


def test_positioned_xpath_distinguishes_classless_siblings():
    """Sibling-position variant (dom.clj:134-199 child-position +
    tag-id-class-node): identical class-less siblings that the
    tag/id/class form collapses get distinct position predicates."""
    html = (
        "<html><body>"
        "<div><a href='/a'>x</a><a href='/b'>y</a></div>"
        "<div class='nav box'><a href='/c'>z</a></div>"
        "</body></html>"
    )
    anchors = dom.anchor_tags(dom.parse_html(html))
    flat = [dom.node_to_xpath(a) for a in anchors]
    assert flat[0] == flat[1], "flat form collapses the twins"
    pos = [dom.node_to_xpath_positioned(a) for a in anchors]
    # reference form: first class only, 0-based sibling index appended
    assert pos[0] == "//html[0]/body[0]/div[0]/a[0]"
    assert pos[1] == "//html[0]/body[0]/div[0]/a[1]"
    assert pos[2] == "//html[0]/body[0]/div[contains(@class,'nav')][0]/a[0]"
    assert pos[0] != pos[1]


def test_positioned_xpath_on_reference_fixture():
    # the dom_test.clj fixture through the positioned form: first class
    # only (no id slot, dom.clj:152-179), trailing digits stripped
    a = dom.anchor_tags(dom.parse_html(_read("tag-id-class-test.html")))[0]
    got = dom.node_to_xpath_positioned(a)
    assert got.endswith("/a[contains(@class,'hello')][0]"), got


def test_positioned_sibling_counts_same_class_only():
    """child-position counts only siblings with the SAME tag and SAME
    raw class value (dom.clj:134-151): a differently-classed twin does
    not advance the index."""
    html = (
        "<html><body><div>"
        "<a class='odd' href='/1'>1</a>"
        "<a class='even' href='/2'>2</a>"
        "<a class='odd' href='/3'>3</a>"
        "</div></body></html>"
    )
    anchors = dom.anchor_tags(dom.parse_html(html))
    assert [dom.sibling_position(a) for a in anchors] == [0, 0, 1]


# ---- parser robustness ---------------------------------------------------


def test_script_pruned_comments_dropped_voids_closed():
    html = (
        "<html><body><script>var s = \"<a href='x'>fake</a>\";</script>"
        "<!-- <a href='y'>comment</a> -->"
        "<div class='nav3 main'><br><img src='z.png'>"
        "<a href='/p/1' rel='nofollow external'>One</a>"
        "<a href='/p/2'><span class='t9'>Two</span> more</a></div></body></html>"
    )
    anchors = dom.page_anchors(html)
    assert [a[1] for a in anchors] == ["/p/1", "/p/2"]
    assert anchors[0][4] is True and anchors[1][4] is False  # nofollow
    assert anchors[1][2] == "Two more"  # document-order text
    assert anchors[0][3] == (
        "//html/body/div[contains(@class,'nav') or contains(@class,'main')]/a"
    )


def test_unclosed_tags_lenient():
    html = "<html><body><p>one<p>two<a href='u'>U</a></body></html>"
    anchors = dom.page_anchors(html)
    assert len(anchors) == 1 and anchors[0][1] == "u"


def test_format_attr():
    # dom.clj:101-110 format-attr (trailing-digit strip per dom_test)
    assert dom.format_attr("hello1") == "hello"
    assert dom.format_attr("class-tag2") == "class-tag"
    assert dom.format_attr("123") is None
    assert dom.format_attr(None) is None


# ---- Spark stage ---------------------------------------------------------


def test_anchors_from_html_spark(spark):
    rows = [
        (f"http://h.test/p/{i}",
         f"<html><body><div id='nav{i}' class='menu-bar{i} lnk'>"
         + "".join(f"<a href='/p/{i*3+j}' class='item{j}'>t{j}</a>" for j in range(3))
         + "</div></body></html>")
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["url", "html"])
    out = dom.anchors_from_html(df, "html", ("url",))
    got = out.collect()
    assert len(got) == 150
    r0 = sorted(got, key=lambda r: (r.url, r.pos))[0]
    assert r0.xpath == (
        "//html/body/div[contains(@id,'nav') and contains(@class,'menu-bar')"
        " or contains(@class,'lnk')]/a[contains(@class,'item')]"
    )
    # the stage is a pure map: no shuffle exchange in the plan
    from crawler_spark.plans import explain_str

    assert "Exchange" not in explain_str(out)


def test_with_out_links_round_trip(spark):
    """Render the synthetic web's out_links to real HTML, drop the
    pre-parsed arrays, re-derive them with the parser, and the engine's
    extraction inputs (href/text/nofollow sequences) must round-trip."""
    from crawler_spark.synth import SynthConfig, corpus_df

    cfg = SynthConfig(n_pages=120, with_images=False)
    corpus = corpus_df(spark, cfg)
    rendered = corpus.withColumn(
        "html",
        F.concat(
            F.lit("<html><body><ul class=\"links\">"),
            F.concat_ws(
                "",
                # hrefs/text must be HTML-escaped when rendered (the synth
                # web plants literal '&amp;' in hrefs; the parser
                # unescapes, so an unescaped render would not round-trip)
                F.expr(
                    "transform(out_links, l -> concat('<li><a href=\"',"
                    " replace(replace(l.href, '&', '&amp;'), '\"', '&quot;'), '\"',"
                    " if(l.nofollow, ' rel=\"nofollow\"', ''), '>',"
                    " replace(replace(l.text, '&', '&amp;'), '<', '&lt;'),"
                    " '</a></li>'))"
                ),
            ),
            F.lit("</ul></body></html>"),
        ),
    )
    reparsed = dom.with_out_links(rendered, "html", "url")
    slim = (
        "transform(out_links, l -> struct(l.href as href, l.text as text,"
        " l.nofollow as nofollow))"
    )
    orig = corpus.select("url", F.expr(slim).alias("ol_orig"))
    back = reparsed.select("url", F.expr(slim).alias("ol_back"))
    diff = orig.join(back, "url").filter(F.col("ol_orig") != F.col("ol_back"))
    assert diff.count() == 0, diff.show(5, False)


def test_engine_runs_on_html_corpus(spark, tmp_path):
    """The engine's front door accepts raw-markup corpora: same synthetic
    web rendered to an html column (out_links dropped), parsed back by
    the dom stage inside CrawlEngine — crawl order must equal the
    sequential oracle's, exactly as with the pre-parsed corpus."""
    from crawler_spark.engine import CrawlEngine, EngineConfig
    from crawler_spark.oracle import crawl_oracle
    from crawler_spark.schema import ROBOTS_SCHEMA
    from crawler_spark.synth import SynthConfig, corpus_df, robots_rows, seed_urls

    cfg = SynthConfig(n_pages=120, n_hosts=6, with_images=False)
    corpus = corpus_df(spark, cfg)
    rendered = corpus.withColumn(
        "html",
        F.concat(
            F.lit('<html><body><ul class="links">'),
            F.concat_ws(
                "",
                F.expr(
                    "transform(out_links, l -> concat('<li><a href=\"',"
                    " replace(replace(l.href, '&', '&amp;'), '\"', '&quot;'), '\"',"
                    " if(l.nofollow, ' rel=\"nofollow\"', ''), '>',"
                    " replace(replace(l.text, '&', '&amp;'), '<', '&lt;'),"
                    " '</a></li>'))"
                ),
            ),
            F.lit("</ul></body></html>"),
        ),
    ).drop("out_links").persist()
    rendered.count()
    robots = spark.createDataFrame(robots_rows(cfg), ROBOTS_SCHEMA)
    seeds = seed_urls(cfg, 3)
    eng = CrawlEngine(
        spark,
        rendered,
        robots,
        EngineConfig(max_epochs=3, epoch_ms=10_000, checkpoint_dir=str(tmp_path)),
    )
    eng.run(seeds)
    oracle = crawl_oracle(cfg, seeds, robots_rows(cfg), max_epochs=3, epoch_ms=10_000)
    got = [(r.seq, r.url) for r in eng.crawl_order.collect()]
    assert got == [(s, u) for (s, u, _, _) in oracle.crawl_order]
    rendered.unpersist()
