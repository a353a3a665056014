"""XPath-model operators — the reference's crawl-learning analytics
re-expressed as DataFrame aggregates over the exploded link table
``(page_url, xpath, href, text)`` (SURVEY.md §2.4, §2.9).

The reference computes every one of these by folding Clojure seqs on one
heap; each becomes one groupBy/window, so partial aggregation and AQE
come free and nothing holds a page list in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def explode_links(corpus: DataFrame) -> DataFrame:
    """corpus → one row per (page, link): the 'state-action space' table
    (rich_char_extractor.clj:113-124)."""
    return corpus.select(
        F.col("url").alias("page_url"),
        F.col("host"),
        F.posexplode("out_links").alias("pos", "link"),
    ).select(
        "page_url",
        "host",
        "pos",
        F.col("link.href").alias("href"),
        F.col("link.text").alias("text"),
        F.col("link.xpath").alias("xpath"),
        F.col("link.nofollow").alias("nofollow"),
    )


def xpath_char_score(links: DataFrame) -> DataFrame:
    """A3: per (page, xpath): Σ anchor-text length + href count — the
    char-score that drives extraction choice (rich_char_extractor.clj:
    61-124; :score there is the href count, the char sum feeds the model
    variant at lines 283-302; we emit both)."""
    return links.groupBy("page_url", "xpath").agg(
        F.sum(F.length("text")).alias("char_score"),
        F.count("*").alias("href_count"),
    )


def page_nav_chars(links: DataFrame) -> DataFrame:
    """A4: page-wide Σ of anchor text length (rich_char_extractor.clj:74-85)."""
    return links.groupBy("page_url").agg(F.sum(F.length("text")).alias("nav_chars"))


def mean_variance_score(links: DataFrame) -> DataFrame:
    """A5: per xpath, mean(token-count) · var_pop(token-count) over its
    anchor texts (rank.clj:132-170 score-xpaths-1)."""
    n_tok = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    return (
        links.withColumn("n_tok", n_tok)
        .groupBy("xpath")
        .agg(
            F.avg("n_tok").alias("mean_tok"),
            F.var_pop("n_tok").alias("var_tok"),
            F.count("*").alias("n_links"),
        )
        .withColumn("score", F.col("mean_tok") * F.col("var_tok"))
    )


def enum_candidate_score(links: DataFrame) -> DataFrame:
    """A6: log(|hrefs|+10) / df per xpath (rank.clj:8-22; novelty/update
    factors default to 1 outside the incremental loop). df = number of
    distinct pages the xpath appears on."""
    per_page = links.groupBy("xpath", "page_url").agg(F.count("*").alias("n_hrefs"))
    agg = per_page.groupBy("xpath").agg(
        F.sum("n_hrefs").alias("total_hrefs"),
        F.countDistinct("page_url").alias("df"),
    )
    return agg.withColumn("score", F.log(F.col("total_hrefs") + 10) / F.col("df"))


def dominated_xpath_prune(links: DataFrame) -> DataFrame:
    """J4: drop any (page, xpath) whose href set is a subset of another
    xpath's href set on the same page (rich_char_extractor.clj:9-27).
    Self-join per page on small per-page cardinality → broadcast-friendly;
    subset test = size(array_except(a,b)) == 0."""
    sets = links.groupBy("page_url", "xpath").agg(
        F.collect_set("href").alias("hrefs"), F.count("*").alias("n")
    )
    a, b = sets.alias("a"), sets.alias("b")
    dominated = (
        a.join(b, "page_url")
        .filter(
            (F.col("a.xpath") != F.col("b.xpath"))
            & (F.size(F.array_except(F.col("a.hrefs"), F.col("b.hrefs"))) == 0)
            & (
                (F.size(F.col("a.hrefs")) < F.size(F.col("b.hrefs")))
                | (
                    (F.size(F.col("a.hrefs")) == F.size(F.col("b.hrefs")))
                    & (F.col("a.xpath") > F.col("b.xpath"))  # tie-break: keep lexic. first
                )
            )
        )
        .select("page_url", F.col("a.xpath").alias("xpath"))
        .distinct()
    )
    return sets.join(dominated, ["page_url", "xpath"], "left_anti").select(
        "page_url", "xpath", "hrefs", "n"
    )


def template_links(links: DataFrame, min_incidence: int = 5) -> DataFrame:
    """P10/A8 learn step: (xpath, href) pairs appearing on ≥ min_incidence
    distinct pages are template/boilerplate (template_removal.clj:49-93)."""
    return (
        links.groupBy("xpath", "href")
        .agg(F.countDistinct("page_url").alias("incidence"))
        .filter(F.col("incidence") >= min_incidence)
    )


def remove_template_links(links: DataFrame, min_incidence: int = 5) -> DataFrame:
    """P10 apply step: anti-join the learned template table (broadcast —
    boilerplate tables are small relative to the link table)."""
    t = template_links(links, min_incidence).select("xpath", "href")
    return links.join(F.broadcast(t), ["xpath", "href"], "left_anti")


def pagination_candidates(links: DataFrame) -> DataFrame:
    """Pagination detection core (corpus.clj:123-217 digit-anchor rule +
    W2 smallest-numeric pick): per (page, xpath), the digit-anchored link
    with the smallest numeric text is the next-page candidate."""
    digits = links.filter(F.col("text").rlike("^[0-9]+$"))
    w = Window.partitionBy("page_url", "xpath").orderBy(
        # try_cast: >19-digit anchor text would overflow ANSI cast
        F.col("text").try_cast("long").asc_nulls_last(), F.col("pos").asc()
    )
    return (
        digits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("page_url", "xpath", F.col("href").alias("next_href"),
                F.col("text").try_cast("long").alias("page_no"))
    )


def updated_count(links_a: DataFrame, links_b: DataFrame) -> DataFrame:
    """A10: per xpath, |hrefs(A) \\ hrefs(B)| between two page versions
    (rich_extractor.clj:217-226)."""
    sa = links_a.groupBy("xpath").agg(F.collect_set("href").alias("ha"))
    sb = links_b.groupBy("xpath").agg(F.collect_set("href").alias("hb"))
    return (
        sa.join(sb, "xpath", "left")
        .withColumn(
            "novel", F.size(F.array_except("ha", F.coalesce("hb", F.array())))
        )
        .select("xpath", "novel")
    )


def page_signature(links: DataFrame) -> DataFrame:
    """C5 input: page signature = map xpath → href count (page.clj:79-84)."""
    return (
        links.groupBy("page_url", "xpath")
        .agg(F.count("*").alias("n"))
        .groupBy("page_url")
        .agg(F.map_from_entries(F.sort_array(F.collect_list(F.struct("xpath", "n")))).alias("signature"))
    )


def signature_cosine(sig_a: DataFrame, sig_b: DataFrame) -> DataFrame:
    """C5: cosine over sparse xpath→count signatures of page pairs
    (page.clj:24-59), via explode + join on xpath — no dense vectors."""
    ea = sig_a.select(F.col("page_url").alias("pa"), F.explode("signature").alias("k", "va"))
    eb = sig_b.select(F.col("page_url").alias("pb"), F.explode("signature").alias("k", "vb"))
    dots = (
        ea.join(eb, "k")
        .groupBy("pa", "pb")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    na = ea.groupBy("pa").agg(F.sqrt(F.sum(F.col("va") * F.col("va"))).alias("na"))
    nb = eb.groupBy("pb").agg(F.sqrt(F.sum(F.col("vb") * F.col("vb"))).alias("nb"))
    return (
        dots.join(na, "pa").join(nb, "pb")
        .withColumn("cosine", F.col("dot") / (F.col("na") * F.col("nb")))
        .select("pa", "pb", "cosine")
    )


def signature_sims(
    links: DataFrame,
    pairs: DataFrame,
    ins_cost: float = 1.0,
    del_cost: float = 1.0,
) -> DataFrame:
    """C5 complete: ALL five signature similarities of the reference
    (page.clj:15-154) per requested page pair, plus the combined score.

    signature = sparse map xpath → href count (page-signature,
    page.clj:79-84). Per pair (pa, pb):

    * cosine       — Σ va·vb / (‖va‖₂·‖vb‖₂) (page.clj:24-42)
    * cardinality  — |keys∩| / (√|keys a|·√|keys b|) (page.clj:15-22)
    * combined     — cosine × cardinality (signature-similarity,
      page.clj:99-104)
    * manhattan    — Σ va·vb / (‖va‖₁·‖vb‖₁). The reference's own
      function (page.clj:44-58) is broken: its norm terms thread the
      `second` FUNCTION into Math/pow (`#(-> second (Math/pow 2))`)
      instead of applying it, so it can never have produced the L1
      normalization its name promises. This implements the evident
      intent (cosine numerator over L1 norms); the latent bug is
      documented here for parity auditing.
    * weighted_cosine — cosine of w-scaled counts with the reference's
      global weights table w(xpath) = ln(#hrefs(xpath)) / df(xpath)
      (weights-table page.clj:86-97, applied page.clj:60-75)
    * edit_sim     — 1 − edit/worst with edit = Σ del·max(0, va−vb) +
      Σ ins·max(0, vb−va) over the key union and worst = del·Σva +
      ins·Σvb (page.clj:106-154)

    ``pairs`` (pa, pb) bounds the pair set up front — the same
    candidates-first discipline as detect_pagination: an unbounded
    self-join on xpath keys is O(P²) on templated sites. One exploded
    full-outer alignment per pair, one aggregation — no dense vectors,
    no per-row Python."""
    sig = links.groupBy(F.col("page_url").alias("pid"), "xpath").agg(
        F.count("*").alias("n")
    )
    # reference weights-table: ln(global href count) / global page df
    w = links.groupBy("xpath").agg(
        (F.log(F.count("*")) / F.countDistinct("page_url")).alias("w")
    )
    a = (
        pairs.join(sig, pairs["pa"] == sig["pid"])
        .select("pa", "pb", F.col("xpath").alias("k"), F.col("n").alias("va"))
    )
    b = (
        pairs.join(sig, pairs["pb"] == sig["pid"])
        .select("pa", "pb", F.col("xpath").alias("k"), F.col("n").alias("vb"))
    )
    full = a.join(b, ["pa", "pb", "k"], "full_outer").join(
        F.broadcast(w.withColumnRenamed("xpath", "k")), "k", "left"
    )
    va = F.coalesce(F.col("va"), F.lit(0)).cast("double")
    vb = F.coalesce(F.col("vb"), F.lit(0)).cast("double")
    agg = full.groupBy("pa", "pb").agg(
        F.sum(va * vb).alias("dot"),
        F.sum(va * va).alias("na2"),
        F.sum(vb * vb).alias("nb2"),
        F.sum(va).alias("l1a"),
        F.sum(vb).alias("l1b"),
        F.count(F.col("va")).alias("ka"),
        F.count(F.col("vb")).alias("kb"),
        F.count(F.when(F.col("va").isNotNull() & F.col("vb").isNotNull(), 1)).alias("inter"),
        F.sum(va * vb * F.col("w") * F.col("w")).alias("dotw"),
        F.sum(va * va * F.col("w") * F.col("w")).alias("naw2"),
        F.sum(vb * vb * F.col("w") * F.col("w")).alias("nbw2"),
        F.sum(F.greatest(va - vb, F.lit(0.0))).alias("del_"),
        F.sum(F.greatest(vb - va, F.lit(0.0))).alias("ins_"),
    )
    cosine = F.col("dot") / (F.sqrt("na2") * F.sqrt("nb2"))
    cardinality = F.col("inter") / (F.sqrt("ka") * F.sqrt("kb"))
    return agg.select(
        "pa",
        "pb",
        cosine.alias("cosine"),
        cardinality.alias("cardinality"),
        (cosine * cardinality).alias("combined"),
        (F.col("dot") / (F.col("l1a") * F.col("l1b"))).alias("manhattan"),
        (F.col("dotw") / (F.sqrt("naw2") * F.sqrt("nbw2"))).alias("weighted_cosine"),
        (
            F.lit(1.0)
            - (F.lit(del_cost) * F.col("del_") + F.lit(ins_cost) * F.col("ins_"))
            / (F.lit(del_cost) * F.col("l1a") + F.lit(ins_cost) * F.col("l1b"))
        ).alias("edit_sim"),
    )


def detect_pagination(
    links: DataFrame, min_cosine: float = 0.6, canonicalize_hrefs: bool = False
) -> DataFrame:
    """Full pagination detection (corpus.clj:123-217): a (page, xpath)
    pair is a pagination control iff it has a digit-anchored candidate
    (the smallest-numeric pick) AND the link target's page signature is
    structurally similar to the source page (J6 candidate join +
    signature cosine ≥ threshold). Target pages are resolved by href
    within the same link table.

    The cosine is computed ONLY for the candidate (page, next_href)
    pairs: a full signature_cosine(sig, sig) self-join explodes O(P²)
    on templated sites where every page shares xpath keys with every
    other — candidates bound the pair set to at most one per
    (page, xpath) before any signature math happens.

    canonicalize_hrefs=True resolves each candidate href against its
    page url first — required for links from the real HTML front door,
    where hrefs are relative/fragment-bearing and would never equal a
    canonical page_url. Off by default for pre-resolved link tables."""
    cand = pagination_candidates(links)
    if canonicalize_hrefs:
        from ..canon import canonicalize_expr

        cand = cand.withColumn(
            "next_href", canonicalize_expr(F.col("next_href"), F.col("page_url"))
        )
    sig = page_signature(links)
    e = sig.select("page_url", F.explode("signature").alias("k", "v"))
    norms = e.groupBy("page_url").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    pairs = cand.select(
        F.col("page_url").alias("pa"), F.col("next_href").alias("pb")
    ).distinct()
    dots = (
        pairs.join(
            e.select(F.col("page_url").alias("pa"), "k", F.col("v").alias("va")),
            "pa",
        )
        .join(
            e.select(F.col("page_url").alias("pb"), "k", F.col("v").alias("vb")),
            ["pb", "k"],
        )
        .groupBy("pa", "pb")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    sim = (
        dots.join(norms.select(F.col("page_url").alias("pa"), F.col("nrm").alias("na")), "pa")
        .join(norms.select(F.col("page_url").alias("pb"), F.col("nrm").alias("nb")), "pb")
        .withColumn("cosine", F.col("dot") / (F.col("na") * F.col("nb")))
    )
    return (
        cand.join(
            sim,
            (cand.page_url == sim.pa) & (cand.next_href == sim.pb),
            "inner",
        )
        .filter(F.col("cosine") >= min_cosine)
        .select("page_url", "xpath", "next_href", "page_no",
                F.round("cosine", 4).alias("cosine"))
    )


def href_path_tokens(href_col: str):
    """URL path tokens of *href_col* — the refinement vocabulary shared
    by learning (token_incidence / learn_paging_model) and execution
    (apply_refinement / the engine's per-source paging filter)."""
    return F.split(
        F.regexp_replace(href_col, "^[a-zA-Z]+://[^/]*/", ""), "/"
    )


def learn_paging_model(
    links: DataFrame,
    page_paths: DataFrame,
    min_cosine: float = 0.6,
    fetched: DataFrame | None = None,
) -> DataFrame:
    """Per-source pagination model — the reference detect-pagination's
    :paging-actions AND :refine maps in one pass (corpus.clj:123-217,
    refine-action corpus.clj:92-120):

    1. candidates: digit-anchored links whose TARGET page is
       structurally similar to the source (page-signature cosine ≥
       *min_cosine* — the ``similar?`` gate);
    2. per source action-seq, the winning paging xpath is the
       argmax-by-cosine over its candidates (corpus.clj:158-186 reduce;
       distinct pairs first, max cosine per (seq, xpath), then the
       best xpath per seq — ties break cosine desc, xpath asc, where
       the reference's reduce order is accidental);
    3. per winner, the learned refinement: each SOURCE PAGE labels its
       digit targets muscle (similar) / fat (dissimilar) and derives
       {:only :avoid} over the target-URL path-token vocabulary (the
       repo's refinement alphabet — the reference discriminates on DOM
       positions, dom.clj:942-1061; same shape, documented adaptation),
       then the MODAL refinement across source pages wins
       (corpus.clj:186-217 ``frequencies`` → last of sort-by; ties
       break count desc, only asc, avoid asc — deterministic where the
       reference's hash-map order is not).

    ``links``: (page_url, xpath, href, text) — out-links of fetched
    pages whose href target was also fetched, hrefs canonical.
    ``page_paths``: (page_url, action_seq array<string>) — the action
    path each source page was reached by (crawl_order.path).

    Returns (action_seq, paging_xpath, cosine, only, avoid). Scale
    shape: the pair set is bounded by digit links into fetched targets
    (never all-pairs); signatures aggregate once from the link table;
    every later stage groups the bounded candidate set.

    ``fetched`` (page_url) restricts targets to downloaded pages —
    unfetched targets are not corpus evidence (the reference's corpus
    filter). Defaults to the pages appearing in ``links``; pass the
    real fetched set when link-less fetched pages exist (they carry an
    empty signature and count as FAT — structurally dissimilar — as
    does any zero-xpath-overlap target)."""
    if fetched is None:
        fetched = links.select("page_url").distinct()
    digits = (
        links.filter(F.coalesce(F.col("text"), F.lit("")).rlike("^[0-9]+$"))
        .select("page_url", "xpath", "href")
        .join(
            fetched.select(F.col("page_url").alias("href")), "href", "left_semi"
        )
    )
    # structural cosine for the digit (source, target) pairs only. A
    # pair sharing NO xpath key has no dot row — coalesce to 0, never
    # drop: zero-overlap targets are maximal fat evidence
    sig = page_signature(links)
    e = sig.select("page_url", F.explode("signature").alias("k", "v"))
    norms = e.groupBy("page_url").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    pairs = digits.select(
        F.col("page_url").alias("pa"), F.col("href").alias("pb")
    ).distinct()
    dots = (
        pairs.join(
            e.select(F.col("page_url").alias("pa"), "k", F.col("v").alias("va")),
            "pa",
        )
        .join(
            e.select(F.col("page_url").alias("pb"), "k", F.col("v").alias("vb")),
            ["pb", "k"],
        )
        .groupBy("pa", "pb")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    sims = (
        pairs.join(dots, ["pa", "pb"], "left")
        .join(
            norms.select(F.col("page_url").alias("pa"), F.col("nrm").alias("na")),
            "pa", "left",
        )
        .join(
            norms.select(F.col("page_url").alias("pb"), F.col("nrm").alias("nb")),
            "pb", "left",
        )
        .select(
            "pa", "pb",
            F.when(
                (F.coalesce(F.col("na"), F.lit(0.0)) > 0)
                & (F.coalesce(F.col("nb"), F.lit(0.0)) > 0),
                F.coalesce(F.col("dot"), F.lit(0.0))
                / (F.col("na") * F.col("nb")),
            ).otherwise(F.lit(0.0)).alias("cosine"),
        )
    )
    labeled = (
        digits.join(
            sims,
            (digits.page_url == sims.pa) & (digits.href == sims.pb),
        )
        .drop("pa", "pb")
        .join(page_paths.withColumnRenamed("action_seq", "__seq"), "page_url")
        .withColumn("sim", F.col("cosine") >= F.lit(min_cosine))
    )
    labeled = labeled.persist()
    # step 2: argmax-by-cosine paging xpath per source action-seq
    per_pair = (
        labeled.filter("sim")
        .groupBy("__seq", "xpath")
        .agg(F.max("cosine").alias("cosine"))
    )
    w_best = Window.partitionBy("__seq").orderBy(
        F.desc("cosine"), F.asc("xpath")
    )
    winners = (
        per_pair.withColumn("__rn", F.row_number().over(w_best))
        .filter(F.col("__rn") == 1)
        .select("__seq", F.col("xpath").alias("paging_xpath"), "cosine")
    )
    # step 3: per-source {only, avoid} at the winning xpath, then modal
    at_winner = labeled.join(
        winners.select("__seq", F.col("paging_xpath").alias("xpath")),
        ["__seq", "xpath"],
    )
    toks = at_winner.select(
        "__seq", "xpath", "page_url", "sim",
        F.explode(href_path_tokens("href")).alias("tok"),
    ).filter(F.col("tok") != "")
    inc = toks.groupBy("__seq", "xpath", "page_url", "tok").agg(
        F.max(F.col("sim").cast("int")).alias("in_muscle"),
        F.max((~F.col("sim")).cast("int")).alias("in_fat"),
    )
    per_source = inc.groupBy("__seq", "xpath", "page_url").agg(
        F.sort_array(
            F.collect_set(
                F.when((F.col("in_muscle") == 1) & (F.col("in_fat") == 0), F.col("tok"))
            )
        ).alias("only"),
        F.sort_array(
            F.collect_set(
                F.when((F.col("in_fat") == 1) & (F.col("in_muscle") == 0), F.col("tok"))
            )
        ).alias("avoid"),
    )
    modal = per_source.groupBy("__seq", "xpath", "only", "avoid").agg(
        F.count("*").alias("n_sources")
    )
    w_modal = Window.partitionBy("__seq", "xpath").orderBy(
        F.desc("n_sources"), F.asc("only"), F.asc("avoid")
    )
    chosen = (
        modal.withColumn("__rn", F.row_number().over(w_modal))
        .filter(F.col("__rn") == 1)
        .select("__seq", F.col("xpath").alias("paging_xpath"), "only", "avoid")
    )
    return winners.join(chosen, ["__seq", "paging_xpath"]).select(
        F.col("__seq").alias("action_seq"),
        "paging_xpath",
        F.round("cosine", 4).alias("cosine"),
        "only",
        "avoid",
    )


def token_incidence(labeled_links: DataFrame) -> DataFrame:
    """Per-(xpath, href-path-token) good/bad incidence over labeled
    links — the evidence table both refinement LEARNING (refine_xpaths)
    and refinement RE-PROBING (reprobe_refinements, the fix-model pass)
    aggregate from. labeled_links: (xpath, href, good boolean)."""
    toks = labeled_links.select(
        "xpath",
        "good",
        F.explode(href_path_tokens("href")).alias("tok"),
    ).filter(F.col("tok") != "")
    return toks.groupBy("xpath", "tok").agg(
        F.max(F.col("good").cast("int")).alias("in_good"),
        F.max((~F.col("good")).cast("int")).alias("in_bad"),
    )


def refine_xpaths(labeled_links: DataFrame) -> DataFrame:
    """Refinement learning (:only/:avoid, dom.clj:942-1061): given links
    labeled good (muscle — lead to leaves) vs bad (fat), per xpath find
    href path tokens that appear ONLY in good links (→ :only) or ONLY in
    bad links (→ :avoid). labeled_links: (xpath, href, good boolean).

    The reference walks DOM node-name positions; the columnar analog
    discriminates on URL path segments — same shape: a broadcastable
    per-xpath filter table applied before enqueue."""
    per = token_incidence(labeled_links)
    return per.groupBy("xpath").agg(
        F.sort_array(
            F.collect_set(F.when((F.col("in_good") == 1) & (F.col("in_bad") == 0), F.col("tok")))
        ).alias("only"),
        F.sort_array(
            F.collect_set(F.when((F.col("in_bad") == 1) & (F.col("in_good") == 0), F.col("tok")))
        ).alias("avoid"),
    )


def strip_pagination_shadowed(
    actions: DataFrame, paging: DataFrame
) -> DataFrame:
    """fix-model part 1 (reference remove-pagination-from-actions,
    corpus.clj:409-438): an action whose xpath is ALSO a pagination
    action is pagination in disguise — executing it as content would
    double-walk the paging chain — so it leaves the content plan
    (pagination refinements are trusted always, model.clj:49-50).

    ``actions``: the learned content plan (xpath, ...); ``paging``:
    pagination xpaths (src_xpath, ...). Pure relational statement:
    a broadcast anti-join on the xpath. NOTE the reference's own
    predicate uses ``some`` over paging actions where ``every?`` was
    almost certainly intended (corpus.clj:426-437) — with 2+ paging
    actions it keeps every action, because a sequence shadowed by one
    paging action is never shadowed by the others too. This implements
    the documented INTENT (strip if shadowed by ANY paging action); the
    latent reference bug is noted here for parity auditing."""
    return actions.join(
        F.broadcast(paging.select(F.col("src_xpath").alias("xpath"))),
        "xpath",
        "left_anti",
    )


def reprobe_refinements(
    model_refinements: DataFrame, labeled_links: DataFrame
) -> DataFrame:
    """fix-model part 2 (reference fix-model-restrictions-model-read,
    model.clj:30-175): re-probe a model's learned :only/:avoid tokens
    against the actually-crawled corpus and keep only tokens whose
    evidence still holds — an :avoid token must still appear ONLY in
    fat (non-leaf-leading) links of its xpath, an :only token ONLY in
    muscle links. Tokens whose evidence flipped (or vanished — the
    reference probes real pages, and a token no longer observed can't
    justify a restriction) are dropped.

    ``model_refinements``: (xpath, only array, avoid array) as learned
    (possibly stale); ``labeled_links``: (xpath, href, good) from the
    fixing crawl. Output: the same shape, cleaned. The probe is the
    same token_incidence evidence refine_xpaths learns from, joined
    against the model's claimed tokens — a pure relational statement
    (explode → join → re-aggregate)."""
    inc = token_incidence(labeled_links)
    claimed = model_refinements.select(
        "xpath",
        F.explode(
            F.concat(
                F.transform(
                    F.coalesce(F.col("only"), F.array()),
                    lambda t: F.struct(t.alias("tok"), F.lit("only").alias("kind")),
                ),
                F.transform(
                    F.coalesce(F.col("avoid"), F.array()),
                    lambda t: F.struct(t.alias("tok"), F.lit("avoid").alias("kind")),
                ),
            )
        ).alias("c"),
    ).select("xpath", F.col("c.tok").alias("tok"), F.col("c.kind").alias("kind"))
    probed = claimed.join(inc, ["xpath", "tok"], "left").filter(
        (
            (F.col("kind") == "only")
            & (F.col("in_good") == 1)
            & (F.col("in_bad") == 0)
        )
        | (
            (F.col("kind") == "avoid")
            & (F.col("in_bad") == 1)
            & (F.col("in_good") == 0)
        )
    )
    regrouped = probed.groupBy("xpath").agg(
        F.sort_array(
            F.collect_set(F.when(F.col("kind") == "only", F.col("tok")))
        ).alias("only"),
        F.sort_array(
            F.collect_set(F.when(F.col("kind") == "avoid", F.col("tok")))
        ).alias("avoid"),
    )
    # xpaths whose every token failed the probe must survive with empty
    # sets (the model still lists them; execution just won't restrict)
    return (
        model_refinements.select("xpath")
        .join(regrouped, "xpath", "left")
        .select(
            "xpath",
            F.coalesce(F.col("only"), F.array().cast("array<string>")).alias("only"),
            F.coalesce(F.col("avoid"), F.array().cast("array<string>")).alias("avoid"),
        )
    )


def apply_refinement(
    links: DataFrame,
    refinement: DataFrame,
    xpath_col: str = "xpath",
    href_col: str = "href",
) -> DataFrame:
    """Apply a learned refinement (dom.clj:599-643 eval-refined): the
    reference first RESTRICTS to :only matches when an xpath has a
    non-empty :only set (dom.clj:603-615 restricted-to-only — a link
    must carry at least one only-token), then drops :avoid hits
    (dom.clj:617-631 restrict-avoid). ``refinement`` carries an
    ``avoid`` array column and optionally an ``only`` array column;
    xpaths absent from the table pass through untouched. Column names
    are parameterized so the engine's candidate stream (src_xpath/url)
    reuses the same operator. Both filters are broadcast-join + codegen
    ``exists()`` predicates — the candidate side never shuffles."""
    has_only = "only" in refinement.columns
    cols = ["only", "avoid"] if has_only else ["avoid"]
    r = refinement.select(F.col("xpath").alias(xpath_col), *cols)
    joined = links.join(F.broadcast(r), xpath_col, "left")
    path_toks = href_path_tokens(href_col)
    keep = ~F.exists(
        F.coalesce(F.col("avoid"), F.array()),
        lambda a: F.array_contains(path_toks, a),
    )
    if has_only:
        only = F.coalesce(F.col("only"), F.array())
        keep = keep & (
            (F.size(only) == 0)
            | F.exists(only, lambda t: F.array_contains(path_toks, t))
        )
    return joined.filter(keep).drop(*cols)


def yield_estimate(links: DataFrame, leaf_paths: DataFrame) -> DataFrame:
    """A9 analog: per xpath step, max per-page link yield; the driver
    multiplies the ≤5 steps of an action sequence (corpus.clj:324-407 —
    the product over steps stays driver-side, as in the reference plan)."""
    per_page = links.groupBy("xpath", "page_url").agg(F.count("*").alias("links_on_page"))
    return per_page.groupBy("xpath").agg(F.max("links_on_page").alias("max_yield"))
