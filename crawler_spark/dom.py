"""Real HTML parsing + XPath generalization (SURVEY.md §2 P1/P2/P9).

The reference's front door is HtmlCleaner → DOM → per-anchor root path →
generalized xpath (``/root/reference/src/crawler/dom.clj:19-31`` clean,
``53-61`` path-root-seq, ``101-122`` format-attr / tag-id-class,
``152-199`` tag-id-class->xpath / tags->xpath, ``289-300`` html->xml).
Its unit tests (``test/crawler/dom_test.clj:10-50`` over
``resources/anchor-tags-test.html`` / ``tag-id-class-test.html``) pin the
exact expected xpath strings — those fixtures are replicated under
``tests/fixtures`` and this module is validated against them.

No HTML parser library ships in this sandbox (no selectolax / lxml /
bs4), so the tree builder is the stdlib ``html.parser`` tokenizer plus a
~60-line element-stack DOM — pure Python, which is fine because HTML
parsing is inherently per-document string work: the reference runs
HtmlCleaner per page too. On Spark it runs as an Arrow-batched
``mapInPandas`` stage (the sanctioned slow-path shape for logic the
built-in operators can't express): one Python process per partition
parses its whole batch, so at 1000 executors the stage is embarrassingly
parallel with zero shuffle, and everything downstream of it (xpath
aggregates, link filters) stays JVM-side.

Generalization rules (pinned by dom_test.clj):

- ``format_attr``: strip a trailing digit run (``hello1`` → ``hello``,
  ``class-tag2`` → ``class-tag``).
- component: ``tag[contains(@id,'i') and contains(@class,'c1') or
  contains(@class,'c2') ...]`` — id and first class joined with ``and``,
  remaining classes appended with ``or``; bare ``tag`` if neither.
- full xpath: ``//`` + ``/``-joined components root→anchor
  (``//html/body/a[...]``).
"""

from __future__ import annotations

from html.parser import HTMLParser

# ---------------------------------------------------------------------------
# tiny DOM
# ---------------------------------------------------------------------------

# elements that never take a closing tag (HTML5 void elements) — without
# this a <br> would swallow the rest of the page into its subtree
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

# reference prunes these subtrees entirely (dom.clj:23 setPruneTags)
_PRUNE = {"script", "style"}


class Node:
    __slots__ = ("tag", "attrs", "parent", "content")

    def __init__(self, tag, attrs, parent):
        self.tag = tag
        self.attrs = dict(attrs)
        self.parent = parent
        # document-order mix of str (text runs) and Node (children)
        self.content = []

    @property
    def children(self):
        return [c for c in self.content if isinstance(c, Node)]

    def text(self) -> str:
        """Concatenated descendant text in document order (HtmlCleaner
        .getText analog)."""
        return "".join(
            c if isinstance(c, str) else c.text() for c in self.content
        )


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document", {}, None)
        self.cur = self.root
        self.prune_depth = 0

    def handle_starttag(self, tag, attrs):
        if self.prune_depth:
            if tag in _PRUNE:
                self.prune_depth += 1
            return
        if tag in _PRUNE:
            self.prune_depth = 1
            return
        node = Node(tag, attrs, self.cur)
        self.cur.content.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        if self.prune_depth:
            return
        if tag in _PRUNE:
            return
        self.cur.content.append(Node(tag, attrs, self.cur))

    def handle_endtag(self, tag):
        if self.prune_depth:
            if tag in _PRUNE:
                self.prune_depth -= 1
            return
        # close the nearest open ancestor with this tag (lenient, like
        # HtmlCleaner's error-tolerant close)
        n = self.cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self.cur = n.parent

    def handle_data(self, data):
        if not self.prune_depth and data:
            self.cur.content.append(data)


def parse_html(src: str) -> Node:
    """HTML source → document root node (script/style pruned, comments
    dropped — handle_comment is simply not defined)."""
    b = _TreeBuilder()
    b.feed(src or "")
    return b.root


def _walk(node):
    for c in node.children:
        yield c
        yield from _walk(c)


def anchor_tags(root: Node) -> list:
    """Document-order <a> elements (dom.clj:27-31 anchor-tags)."""
    return [n for n in _walk(root) if n.tag == "a"]


def path_root_seq(node: Node) -> list:
    """Nodes root→node, excluding #document (dom.clj:53-61)."""
    path = []
    n = node
    while n is not None and n.tag != "#document":
        path.append(n)
        n = n.parent
    return list(reversed(path))


# ---------------------------------------------------------------------------
# xpath generalization
# ---------------------------------------------------------------------------


def format_attr(attr: str):
    """Strip a trailing digit run: 'hello1' → 'hello', 'class-tag2' →
    'class-tag' (dom.clj:102-110 / the dom_test.clj:24-32 expectation)."""
    if attr is None:
        return None
    import re

    out = re.sub(r"\d+$", "", attr)
    # a quote inside an id/class value would render a syntactically
    # invalid XPath predicate (contains(@class,'john's')) — strip it;
    # the generalized path is a grouping key AND must stay evaluable
    out = out.replace("'", "")
    return out or None


def tag_id_class(node: Node) -> tuple:
    """(tag, formatted id, [formatted classes]) — dom_test.clj:24-32."""
    nid = format_attr(node.attrs.get("id"))
    classes = [
        c
        for c in (format_attr(x) for x in (node.attrs.get("class") or "").split())
        if c
    ]
    return (node.tag, nid, classes)


def tag_id_class_to_xpath(tic: tuple) -> str:
    """One path component — dom_test.clj:34-42 pins the exact shape:
    a[contains(@id,'hello') and contains(@class,'hello') or
    contains(@class,'class-tag')]."""
    tag, nid, classes = tic
    cls = [f"contains(@class,'{c}')" for c in classes]
    if nid and cls:
        # id AND first class, OR the remaining classes — the exact
        # clause structure dom_test.clj:34-42 pins
        pred = " or ".join([f"contains(@id,'{nid}') and " + cls[0]] + cls[1:])
    elif nid:
        pred = f"contains(@id,'{nid}')"
    elif cls:
        pred = " or ".join(cls)
    else:
        return tag
    return f"{tag}[{pred}]"


def node_to_xpath(node: Node) -> str:
    """Generalized xpath root→node: '//' + '/'-joined components
    (dom_test.clj:44-52 expects //html/body/a[...])."""
    return "/" + "/".join(
        [""] + [tag_id_class_to_xpath(tag_id_class(n)) for n in path_root_seq(node)]
    )


def sibling_position(node: Node) -> int:
    """0-based index of *node* among its parent's children that share
    the same tag AND the same raw class attribute value — the
    reference's child-position (dom.clj:134-151). The root (no parent)
    is child 0 of the document."""
    parent = node.parent
    if parent is None:
        return 0
    cls = node.attrs.get("class")
    same = [
        c
        for c in parent.children
        if c.tag == node.tag and c.attrs.get("class") == cls
    ]
    return same.index(node)


def tag_class_pos_to_xpath(tag: str, first_class, pos) -> str:
    """Position-qualified component (dom.clj:152-199 tag-id-class-node →
    tag-id-class->xpath): only the FIRST formatted class is used (no id
    slot in this form), and the sibling position is appended as a
    predicate — tag[contains(@class,'c')][2] / tag[2]. The reference
    renders the 0-based index verbatim (XPath itself is 1-based; these
    strings are grouping keys first), mirrored here."""
    base = f"{tag}[contains(@class,'{first_class}')]" if first_class else tag
    return base if pos is None else f"{base}[{pos}]"


def node_to_xpath_positioned(node: Node) -> str:
    """Position-qualified generalized xpath (the w3c-node->xpath form,
    dom.clj:206-210): distinguishes identical class-less siblings that
    the tag/id/class form of node_to_xpath collapses."""
    comps = []
    for n in path_root_seq(node):
        classes = [
            c
            for c in (
                format_attr(x) for x in (n.attrs.get("class") or "").split()
            )
            if c
        ]
        comps.append(
            tag_class_pos_to_xpath(
                n.tag, classes[0] if classes else None, sibling_position(n)
            )
        )
    return "/" + "/".join([""] + comps)


def page_anchors(html: str, positioned: bool = False) -> list:
    """One page → [(pos, href, text, xpath, nofollow)] in document order.
    The P1-P3 pipeline front door: parse, walk anchors, generalize each
    anchor's root path. Anchors without href are skipped (the reference's
    decision space is href-bearing anchors, dom.clj:311-369).
    ``positioned=True`` emits the sibling-position-qualified xpath form
    (w3c-node->xpath) instead of the tag/id/class form."""
    to_xpath = node_to_xpath_positioned if positioned else node_to_xpath
    out = []
    for pos, a in enumerate(anchor_tags(parse_html(html))):
        href = a.attrs.get("href")
        if href is None:
            continue
        # Entity convention: HTMLParser has already decoded the attribute
        # value, and the downstream canonicalizer unescapes once more —
        # i.e. a double-encoded href (&amp;amp;) decodes twice. This is
        # deliberately REFERENCE-FAITHFUL: HtmlCleaner also returns
        # decoded attributes and dom.clj:362 html-unescapes them again.
        # It also makes parse(render(corpus)) == corpus for corpora whose
        # raw hrefs may themselves contain entity text (the round-trip
        # test pins this).
        rel = (a.attrs.get("rel") or "").lower()
        out.append(
            (
                pos,
                href,
                a.text().strip(),
                to_xpath(a),
                "nofollow" in rel,
            )
        )
    return out


# ---------------------------------------------------------------------------
# Spark stage
# ---------------------------------------------------------------------------

ANCHOR_FIELDS = "pos int, href string, text string, xpath string, nofollow boolean"


def anchors_from_html(
    df,
    html_col: str = "html",
    key_cols: tuple = ("url",),
    positioned: bool = False,
):
    """(key_cols..., html) → one row per anchor: (key_cols..., pos, href,
    text, xpath, nofollow). Arrow-batched mapInPandas; no shuffle — each
    input partition parses independently, so this scales with executors
    like any map stage. Projection first so only the html column and keys
    cross into Python. ``positioned=True`` emits the sibling-position-
    qualified xpath variant (dom.clj:152-199)."""
    import pandas as pd

    keys = list(key_cols)
    proj = df.select(*keys, html_col)
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in proj.schema.fields[:-1]
    )
    out_schema = schema + ", " + ANCHOR_FIELDS

    def gen(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                key_vals = tuple(rec[: len(keys)])
                for pos, href, text, xpath, nofollow in page_anchors(
                    rec[-1], positioned=positioned
                ):
                    rows.append(key_vals + (pos, href, text, xpath, nofollow))
            yield pd.DataFrame(
                rows, columns=keys + ["pos", "href", "text", "xpath", "nofollow"]
            )

    return proj.mapInPandas(gen, out_schema)


def with_out_links(df, html_col: str = "html", url_col: str = "url"):
    """HTML-bodied corpus → corpus with the engine's ``out_links``
    array<struct<href,text,xpath,nofollow>> column derived by the real
    parser (replacing the synthetic web's pre-parsed stand-in). One
    mapInPandas pass builds the arrays; an equi-join on url attaches them
    (the join is url↔url — co-partitionable / bucket-able at scale)."""
    import pandas as pd

    proj = df.select(url_col, html_col)

    def gen(batches):
        for pdf in batches:
            urls, links = [], []
            for rec in pdf.itertuples(index=False):
                urls.append(rec[0])
                links.append(
                    [
                        {"href": h, "text": t, "xpath": x, "nofollow": nf}
                        for _, h, t, x, nf in page_anchors(rec[1])
                    ]
                )
            yield pd.DataFrame({url_col: urls, "out_links": links})

    out_schema = (
        f"`{url_col}` string, out_links "
        "array<struct<href:string,text:string,xpath:string,nofollow:boolean>>"
    )
    parsed = proj.mapInPandas(gen, out_schema)
    return df.drop("out_links").join(parsed, url_col)
