"""Positional and document-similarity retrieval over the documents table:
phrase matching and more-like-this.

The reference retrieves by unordered term recall only (posting OR-merge,
/root/reference/src/table.cpp:430-470); it stores term offsets but never
uses adjacency (the computed-but-unused ``pre_term_sign``,
segment.cpp:84-99). These operators are the Spark-native completion of
that positional machinery — both are pure column algebra with exact
DuckDB oracles.

Scale shape:

* ``phrase_match`` — the classic anchor trick turns k-way positional
  self-joins into ONE broadcast join + ONE aggregation: a token at
  position p matching phrase slot s votes for anchor p − s; an anchor
  with all k distinct slots is a phrase occurrence. Shuffle volume is
  bounded by occurrences of the phrase vocabulary (a semi-join-sized
  slice of the corpus), never the corpus itself; the aggregation key
  (query, doc, anchor) is high-cardinality and unskewed.
* ``more_like_this`` — tf-idf cosine of seed docs against the corpus.
  The seed side is capped to its ``max_query_terms`` highest-weight
  terms (Lucene MLT's guard, default 25) and broadcast, so the dot
  product is one broadcast join + one aggregation regardless of corpus
  size; hot boilerplate terms are additionally prunable with
  ``min_idf``. Ranks by the ROUNDED similarity with a doc-id tie-break
  so the ordering is reproducible bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens_view


def phrase_match(
    docs: DataFrame,
    phrases: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Exact phrase search: docs containing the phrase terms at strictly
    consecutive positions, ranked per query by occurrence count
    (ties → lowest doc id). *phrases* is [(query_id, "w1 w2 ...")].

    Returns (query_id, rank, doc_id, n_occurrences)."""
    spark = docs.sparkSession
    slot_rows = []
    for qid, p in phrases:
        terms = [t for t in p.split() if t]
        if not terms:
            continue
        slot_rows += [(int(qid), s, t, len(terms)) for s, t in enumerate(terms)]
    slots = spark.createDataFrame(
        slot_rows, "query_id long, slot int, term string, n_slots int"
    )
    toks = tokens_view(docs, id_col=id_col, text_col=text_col)
    anchored = (
        toks.join(F.broadcast(slots), "term")
        .select(
            "query_id",
            F.col(id_col),
            (F.col("pos") - F.col("slot")).alias("anchor"),
            "slot",
            "n_slots",
        )
        .filter(F.col("anchor") >= 0)
    )
    occurrences = (
        anchored.groupBy("query_id", id_col, "anchor", "n_slots")
        .agg(F.countDistinct("slot").alias("_ns"))
        .filter(F.col("_ns") == F.col("n_slots"))
        .groupBy("query_id", id_col)
        .agg(F.count("*").alias("n_occurrences"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_occurrences").desc(), F.col(id_col).asc()
    )
    return (
        occurrences.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "n_occurrences")
    )


def proximity_search(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    max_span: int | None = None,
) -> DataFrame:
    """Unordered proximity ranking: docs containing ALL of a query's
    distinct terms, ranked by the smallest token window (min-cover
    span) holding every term in ANY order — Lucene's sloppy
    PhraseQuery / INQUIRY ``#uwN`` semantics, relaxing
    :func:`phrase_match`'s strict adjacency. The reference stores term
    offsets but only ever uses them for the D8 diversity stddev
    (/root/reference/src/feature_mgr.cpp); this is the missing "terms
    NEAR each other" query those offsets exist for. *queries* is
    [(query_id, "w1 w2 ...")]; duplicate words collapse to one term.

    Returns (query_id, rank, doc_id, min_span, proximity) with
    ``proximity = round(n_terms / min_span, 6)`` (1.0 = the terms form
    one contiguous block, in any order); rank orders by (min_span asc,
    doc_id asc). Docs missing any term are excluded. ``max_span``
    (Lucene's slop bound) drops windows wider than it.

    Exactness: a minimal covering window always starts at some hit of
    some query term, so enumerating hit positions as window starts and
    taking ``span(s) = max_t min{pos_t >= s} - s + 1`` over starts
    where every term has a hit at/after ``s`` is the exact min-cover —
    the relational form of the two-pointer sweep.

    Scale shape: ONE shuffle. The corpus is reduced to query-vocabulary
    hits by a broadcast semi-join (semi-join-sized slice, like
    phrase_match); the hit self-join keys on (query, doc) — and every
    groupBy after it groups on supersets of (query, doc), so the
    join's hash partitioning satisfies them all and Catalyst plans no
    further exchange until the per-query top-k window (result-set
    sized). Fanout is hits-per-doc squared, bounded by query-term
    occurrences per doc (``max_span`` also bounds it by banding the
    range predicate), never doc length or corpus size.
    """
    if max_span is not None and max_span < 1:
        raise ValueError(f"max_span must be >= 1, got {max_span}")
    spark = docs.sparkSession
    rows = []
    for qid, q in queries:
        terms = sorted({t for t in q.split() if t})
        rows += [(int(qid), t, len(terms)) for t in terms]
    qterms = spark.createDataFrame(rows, "query_id long, term string, n_terms int")
    toks = tokens_view(docs, id_col=id_col, text_col=text_col)
    hits = toks.join(F.broadcast(qterms), "term").select(
        "query_id", F.col(id_col), "term", "pos", "n_terms"
    )
    anchors = hits.select("query_id", id_col, F.col("pos").alias("apos"))
    right = hits.select(
        "query_id", id_col, "term", F.col("pos").alias("hpos"), "n_terms"
    )
    cover = anchors.join(right, ["query_id", id_col]).filter(
        F.col("hpos") >= F.col("apos")
    )
    if max_span is not None:
        cover = cover.filter(F.col("hpos") < F.col("apos") + max_span)
    tmin = cover.groupBy("query_id", id_col, "apos", "term").agg(
        F.min("hpos").alias("_mn"), F.first("n_terms").alias("n_terms")
    )
    spans = (
        tmin.groupBy("query_id", id_col, "apos")
        .agg(
            F.count("*").alias("_nt"),
            F.max("_mn").alias("_mx"),
            F.first("n_terms").alias("n_terms"),
        )
        .filter(F.col("_nt") == F.col("n_terms"))
        .select(
            "query_id",
            id_col,
            (F.col("_mx") - F.col("apos") + 1).alias("_span"),
            "n_terms",
        )
    )
    best = spans.groupBy("query_id", id_col).agg(
        F.min("_span").alias("min_span"), F.first("n_terms").alias("n_terms")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("min_span").asc(), F.col(id_col).asc()
    )
    return (
        best.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            id_col,
            "min_span",
            F.round(F.col("n_terms") / F.col("min_span"), 6).alias("proximity"),
        )
    )


def suggest(
    docs: DataFrame,
    prefixes: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Prefix completion from the corpus term dictionary: top-k terms per
    prefix by document frequency (ties → lexicographic).  *prefixes* is
    [(prefix_id, prefix)].  Returns (prefix_id, rank, term, df).

    Scale shape: the match is a broadcast theta-join of the (tiny) prefix
    batch against the term DICTIONARY — one distinct-project of (doc,
    term) then a term-level groupBy, both orders of magnitude smaller
    than the corpus.  A production suggester would range-scan a sorted
    term dictionary; the broadcast startswith join is the declarative
    equivalent at dictionary cardinality."""
    spark = docs.sparkSession
    pf = spark.createDataFrame(
        [(int(i), p) for i, p in prefixes], "prefix_id long, prefix string"
    )
    df_tbl = (
        tokens_view(docs, id_col=id_col, text_col=text_col)
        .select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    w = Window.partitionBy("prefix_id").orderBy(F.col("df").desc(), F.col("term").asc())
    return (
        df_tbl.join(F.broadcast(pf), F.col("term").startswith(F.col("prefix")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("prefix_id", "rank", "term", "df")
    )


def ordered_window_search(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    max_gap: int | None = None,
) -> DataFrame:
    """Ordered-window retrieval (INQUERY's ``#odN`` / Lucene's
    in-order sloppy PhraseQuery): docs where the query terms appear IN
    QUERY ORDER — not necessarily adjacent — ranked by the smallest
    span of such an ordered chain; ``max_gap`` bounds each consecutive
    gap (#od1 = strict adjacency = :func:`phrase_match` semantics).
    Completes the positional family: strict adjacency (phrase_match) /
    any-order window (proximity_search) / in-order window (this).

    Exactness: with no gap bound, greedily chaining the EARLIEST
    next-term position minimizes the chain end per start (exchange
    argument), so the state collapses to one ``min`` row per (doc,
    start). With ``max_gap``, earliest-next can DEAD-END (the earliest
    t2 may sit too far from every t3 while a later t2 chains fine), so
    the state instead keeps ALL feasible positions per prefix —
    distinct (doc, start, cur) rows, still hit-bounded — and the final
    per-start minimum is taken over complete chains only. Repeated
    query words must re-occur (``go go`` needs two ``go`` s).

    Scale shape: one broadcast vocab semi-join slices the corpus to
    hits, then ``max(n_slots) - 1`` chaining steps, each an
    (query, doc)-keyed equi-join + groupBy over the hit slice — the
    first join's partitioning is reused by every later step (same key,
    like proximity_search), and chain state is one row per surviving
    (query, doc, start), monotonically shrinking. Query length bounds
    the step count (a driver-side loop over slots, NEVER over data —
    the mmr_rerank discipline).

    Returns (query_id, rank, doc_id, min_span, n_terms); rank by
    (min_span asc, doc_id asc).
    """
    if max_gap is not None and max_gap < 1:
        raise ValueError(f"max_gap must be >= 1, got {max_gap}")
    spark = docs.sparkSession
    slot_rows = []
    max_slots = 0
    for qid, q in queries:
        terms = [t for t in q.split() if t]
        if not terms:
            continue
        max_slots = max(max_slots, len(terms))
        slot_rows += [(int(qid), s, t, len(terms)) for s, t in enumerate(terms)]
    slots = spark.createDataFrame(
        slot_rows, "query_id long, slot int, term string, n_slots int"
    )
    toks = tokens_view(docs, id_col=id_col, text_col=text_col)
    # hits of ANY query slot, sliced once and materialized: every chain
    # step joins back into this (it is hit-sized, not corpus-sized)
    hits = (
        toks.join(F.broadcast(slots), "term")
        .select("query_id", F.col(id_col), "slot", "pos", "n_slots")
        .localCheckpoint()
    )
    # chain state: (query_id, doc, start, cur, n_slots) for chains that
    # matched slots [0..i]; start = the slot-0 position
    state = hits.filter(F.col("slot") == 0).select(
        "query_id",
        id_col,
        F.col("pos").alias("start"),
        F.col("pos").alias("cur"),
        "n_slots",
    )
    done = state.filter(F.col("n_slots") == 1)
    for i in range(1, max_slots):
        nxt = hits.filter(F.col("slot") == i).select(
            "query_id", id_col, F.col("pos").alias("_p")
        )
        stepped = state.filter(F.col("n_slots") > i).join(
            nxt, ["query_id", id_col]
        ).filter(F.col("_p") > F.col("cur"))
        if max_gap is None:
            state = stepped.groupBy("query_id", id_col, "start", "n_slots").agg(
                F.min("_p").alias("cur")
            )
        else:
            state = (
                stepped.filter(F.col("_p") <= F.col("cur") + max_gap)
                .select(
                    "query_id", id_col, "start", "n_slots",
                    F.col("_p").alias("cur"),
                )
                .distinct()
            )
        done = done.unionByName(state.filter(F.col("n_slots") == i + 1))
    best = done.groupBy("query_id", id_col).agg(
        F.min(F.col("cur") - F.col("start") + 1).alias("min_span"),
        F.first("n_slots").alias("n_terms"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("min_span").asc(), F.col(id_col).asc()
    )
    return (
        best.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "min_span", "n_terms")
    )


def static_index_prune(
    docs: DataFrame,
    m: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Impact-ordered static index pruning (Carmel et al., SIGIR 2001):
    keep only each term's top-``m`` postings by BM25 impact, the
    offline counterpart of the block-max WAND pruning the query path
    already does — where WAND skips low-impact postings at query time,
    static pruning never stores them, trading bounded recall loss for
    an index ~m/avg_df the size. The reference materializes FULL
    posting lists (/root/reference/src/table.cpp invert_table build);
    this is the standard lossy compaction applied on top.

    Returns the pruned postings (term, doc_id, tf, impact, rank) with
    ``impact = round(idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)), 6)``
    (Robertson/Sparck-Jones idf, ln(1+(N-df+.5)/(df+.5))) and rank
    ordering (impact desc, doc_id asc) — rank over the ROUNDED impact
    so a last-ulp float difference can't change what survives.

    Scale shape: TWO posting-mass exchanges total. The corpus
    repartitions by doc id once (raw text rows, before the explode),
    after which the tf census, the doc-length census and their join
    are all satisfied by that one partitioning (subset rule) and plan
    no exchange — and the repartition subtree is shared, so Catalyst
    reuses it (ReusedExchange) instead of scanning twice. The df
    census collapses map-side to dictionary size and is BROADCAST
    (never a sort-merge join that would drag the posting mass through
    a term exchange early); N/avgdl ride as a broadcast 1-row
    aggregate. The per-term top-m is then the ONLY term-keyed
    exchange, and Catalyst's rank-limit pushdown (WindowGroupLimit
    Partial, plan-pinned) cuts each map task to ≤ m rows per term
    BEFORE it — so the exchange carries O(m · n_terms) + partial-group
    remainders, never the full posting mass.
    """
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    imp = _impact_table(docs, id_col, text_col, k1, b)
    w = Window.partitionBy("term").orderBy(
        F.col("impact").desc(), F.col(id_col).asc()
    )
    return (
        imp.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= m)
        .select("term", id_col, "tf", "impact", "rank")
    )


def _impact_table(
    docs: DataFrame, id_col: str, text_col: str, k1: float, b: float
) -> DataFrame:
    """(term, id, tf, _dl, impact) with impact ROUNDED to 6 dp — the
    shared BM25-impact census behind static_index_prune and prf_search
    (the scale shape both docstrings describe: one doc-id repartition
    of raw text, exchange-free censuses + join off it, broadcast df
    table, broadcast 1-row N/avgdl)."""
    toks = tokens_view(
        docs.repartition(F.col(id_col)), id_col=id_col, text_col=text_col
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("_dl"))
    dfc = tf.groupBy("term").agg(F.count("*").alias("_df"))
    corpus = dl.agg(
        F.count("*").alias("_N"), F.avg("_dl").alias("_avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_N") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
    )
    impact = F.round(idf * F.col("tf") * F.lit(k1 + 1.0) / denom, 6)
    return (
        tf.join(dl, id_col)
        .join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn("impact", impact)
        .select("term", id_col, "tf", "_dl", "impact")
    )


def choose_tier_m(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    target_tier1: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Derive the champion-list depth ``m`` from a target tier-1 rate
    over a query log (VERDICT r4 ask #5): a query is tier-1 iff every
    matched term's document frequency is ≤ m, so its binding constraint
    is its MAX matched-term df — and the smallest m achieving a ≥
    ``target_tier1`` tier-1 fraction is exactly the ceil(target·n)-th
    smallest of the per-query max-df values (a quantile of the query
    log's df distribution). Guaranteed: ``tiered_topk(docs, queries,
    m=choose_tier_m(docs, queries, t))`` serves ≥ t of these queries
    from tier 1 (pinned in test_retrieval.py).

    Scale shape: one distinct-token df census (term-keyed agg), one
    broadcast join against the query-term table, a per-query max agg,
    then an exact order-statistic via sort+limit — ONE scalar reaches
    the driver regardless of corpus size; the intermediate is bounded
    by the query-log size."""
    if not 0.0 < target_tier1 <= 1.0:
        raise ValueError(f"target_tier1 must be in (0, 1], got {target_tier1}")
    if not queries:
        raise ValueError("empty query log")
    import math

    spark = docs.sparkSession
    qt = spark.createDataFrame(
        [
            (int(qid), t)
            for qid, q in queries
            for t in sorted({w for w in q.split() if w})
        ],
        "query_id long, term string",
    )
    # the SAME df definition tiered_topk's certificate uses (docs
    # containing the term, via the shared tokens view)
    dfc = (
        tokens_view(docs, id_col=id_col, text_col=text_col)
        .select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("_df"))
    )
    # localCheckpoint: the count below AND the quantile action both read
    # mx — without it the corpus-wide df census would execute twice
    # (query-log-bounded relation, cheap to materialize)
    mx = (
        qt.join(dfc, "term", "left")
        .groupBy("query_id")
        .agg(F.max(F.coalesce(F.col("_df"), F.lit(0))).alias("_maxdf"))
        .localCheckpoint()
    )
    # queries with NO terms (all-whitespace) never reach qt — they are
    # trivially tier-1; count them into the quantile's numerator
    n = len({qid for qid, _ in queries})
    n_trivial = n - mx.count()
    need = max(0, math.ceil(target_tier1 * n) - n_trivial)
    if need == 0:
        return 1
    row = mx.orderBy(F.asc("_maxdf")).limit(need).agg(F.max("_maxdf")).first()
    return max(int(row[0] or 0), 1)


def tiered_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    m: int,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Two-tier BM25 serving over the statically-pruned index
    (champion lists, Brown 1995 / tiered indexes, Manning IR §7.1.2
    / Carmel et al. 2001): tier 1 scores against
    :func:`static_index_prune`'s top-``m`` postings; a query falls
    back to the FULL postings only when pruning could have touched it.
    The certificate is per query: if every query term's document
    frequency is ≤ m, none of its lists lost a posting, so tier-1
    results are PROVABLY identical to full BM25 — those queries never
    touch the full index. Queries with at least one pruned (hot) term
    are re-scored exactly (the prune-narrows / exact-confirms contract
    of heavy_hitters/bloom_semijoin, applied to serving). Output is
    therefore ALWAYS exact full-BM25 top-k — what changes with ``m``
    is only how much work the hot-term queries cost — which is what
    lets a plain unpruned SQL oracle verify the tiered plan.

    Returns (query_id, rank, doc_id, score, tier1) where ``tier1``
    marks queries served entirely from the pruned index.

    Scale shape: the impact census is materialized once (see
    prf_search); the pruned tier is the WindowGroupLimit top-m slice;
    both scoring passes join BROADCAST query-term tables; the fallback
    pass carries only the hot-term queries' terms. At 100 TB with a
    Zipfian vocabulary, df ≤ m holds for the long tail of terms, so
    the fallback set is the head-term queries only.
    """
    if m < 1 or k < 1:
        raise ValueError(f"m and k must be >= 1, got {m}, {k}")
    spark = docs.sparkSession
    qt = spark.createDataFrame(
        [
            (int(qid), t)
            for qid, q in queries
            for t in sorted({w for w in q.split() if w})
        ],
        "query_id long, term string",
    )
    imp = _impact_table(docs, id_col, text_col, k1, b).localCheckpoint()
    dfc = imp.groupBy("term").agg(F.count("*").alias("_df"))
    # exactness certificate: max df over the query's MATCHED terms
    # (absent terms have no postings to lose)
    flags = (
        qt.join(dfc, "term", "left")
        .groupBy("query_id")
        .agg((F.max(F.coalesce(F.col("_df"), F.lit(0))) <= m).alias("tier1"))
    )
    wm = Window.partitionBy("term").orderBy(
        F.col("impact").desc(), F.col(id_col).asc()
    )
    pruned = imp.withColumn("_r", F.row_number().over(wm)).filter(F.col("_r") <= m)
    qt1 = qt.join(flags.filter("tier1"), "query_id").select("query_id", "term")
    qt2 = qt.join(flags.filter("NOT tier1"), "query_id").select("query_id", "term")
    s1 = (
        pruned.join(F.broadcast(qt1), "term")
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("impact"), 6).alias("score"))
        .withColumn("tier1", F.lit(True))
    )
    s2 = (
        imp.join(F.broadcast(qt2), "term")
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("impact"), 6).alias("score"))
        .withColumn("tier1", F.lit(False))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        s1.unionByName(s2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "score", "tier1")
    )


def prf_search(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 20,
    r: int = 5,
    e: int = 10,
    lam: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (Rocchio 1971; relevance
    models of Lavrenko & Croft 2001, the RM3 interpolation of
    Abdul-Jaleel et al. 2004): two BM25 passes where the second's query
    is expanded with terms mined from the first's top documents — the
    classic recall-widening rerank the reference's synonym expansion
    (table.cpp:376-397) approximates with a static dictionary; PRF
    derives the expansion from the corpus itself, per query.

    Recipe (every step deterministic and 6-dp-rounded so a SQL oracle
    replays it bit-for-bit):

    1. ``s1(q,d) = round(Σ_{t∈q∩d} impact(t,d), 6)`` over the shared
       BM25 impact table (`_impact_table`); keep the top-``r`` feedback
       docs per query (s1 desc, doc asc).
    2. Relevance-model term weight ``w(q,t) = round(Σ_{d∈fb(q)}
       (tf_{t,d}/dl_d) · s1(q,d), 6)`` — p(t|d) weighted by the doc's
       (rounded) first-pass score; drop the original query terms; keep
       the top-``e`` expansion terms (w desc, term asc).
    3. Second pass with term weights: originals at 1.0, expansion term
       t at ``round(lam · w(q,t)/max_w(q), 6)``;
       ``score = round(Σ impact·weight, 6)``; top-``k``
       (score desc, doc asc). Returns (query_id, rank, doc_id, score).

    Queries whose terms match nothing return no rows (there is no doc
    to feed back from). Duplicate query words collapse to one term
    (unit weight — the impact table already carries document tf).

    Scale shape: the corpus-sized work is the impact census (see
    `_impact_table`); both retrieval passes join it against BROADCAST
    query-side tables (q terms; q terms + e expansion terms), and the
    feedback mining joins it against the broadcast top-r doc slice —
    result-set-sized, so the expansion step costs Σ|fb doc vectors|,
    never a corpus pass. At 100 TB the impact table is itself the
    persisted artifact (static_index_prune's output reused across
    passes); in-process, Catalyst reuses the repartition exchange
    across the three scans.
    """
    if min(k, r, e) < 1:
        raise ValueError(f"k, r, e must all be >= 1, got {k}, {r}, {e}")
    if lam < 0:
        raise ValueError(f"lam must be >= 0, got {lam}")
    spark = docs.sparkSession
    qt = spark.createDataFrame(
        [
            (int(qid), t)
            for qid, q in queries
            for t in sorted({w for w in q.split() if w})
        ],
        "query_id long, term string",
    )
    # materialize the census ONCE: three passes read it (s1, feedback
    # mining, s2) — at 100 TB this is the persisted index artifact, and
    # inlining it would triple the build plan (the composed-query
    # discipline of simsearch.mmr_rerank's _candidates)
    imp = _impact_table(docs, id_col, text_col, k1, b).localCheckpoint()
    s1 = (
        imp.join(F.broadcast(qt), "term")
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("impact"), 6).alias("s1"))
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("s1").desc(), F.col(id_col).asc()
    )
    fb = (
        s1.withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= r)
        .select("query_id", id_col, "s1")
    )
    wts = (
        imp.join(F.broadcast(fb), id_col)
        .groupBy("query_id", "term")
        .agg(F.round(F.sum(F.col("tf") / F.col("_dl") * F.col("s1")), 6).alias("_w"))
        .join(qt, ["query_id", "term"], "left_anti")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("_w").desc(), F.col("term").asc()
    )
    exp = (
        wts.withColumn("_r", F.row_number().over(w2))
        .filter(F.col("_r") <= e)
        .select("query_id", "term", "_w")
    )
    mx = exp.groupBy("query_id").agg(F.max("_w").alias("_mx"))
    expanded = qt.select(
        "query_id", "term", F.lit(1.0).alias("weight")
    ).unionByName(
        exp.join(mx, "query_id").select(
            "query_id",
            "term",
            F.round(F.lit(float(lam)) * F.col("_w") / F.col("_mx"), 6).alias(
                "weight"
            ),
        )
    )
    s2 = (
        imp.join(F.broadcast(expanded), "term")
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(F.col("impact") * F.col("weight")), 6).alias("score"))
    )
    w3 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        s2.withColumn("rank", F.row_number().over(w3))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "score")
    )


def related_terms(
    docs: DataFrame,
    seeds: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_cooc: int = 2,
) -> DataFrame:
    """Top-k related terms per seed term by document-level PMI:
    ``pmi = ln(n_docs · c_xy / (c_x · c_y))`` over distinct-per-doc term
    occurrences.  Returns (seed, rank, term, c_xy, pmi) with pmi rounded
    to 6 dp and the rank computed OVER the rounded value + term tie-break
    (engine-reproducible order).

    Scale shape: the expansion join keys on doc_id and its output is
    bounded by the total length of the docs the SEEDS occur in (a
    semi-join slice), never all corpus pairs; ``min_cooc`` prunes the
    long tail before the PMI math."""
    n = docs.count()
    dt = (
        tokens_view(docs, id_col=id_col, text_col=text_col)
        .select(id_col, "term")
        .distinct()
    )
    c_t = dt.groupBy("term").agg(F.count("*").alias("c"))
    seed_lit = [str(s) for s in seeds]
    seed_dt = dt.filter(F.col("term").isin(seed_lit)).select(
        F.col(id_col), F.col("term").alias("seed")
    )
    cooc = (
        seed_dt.join(dt, id_col)
        .filter(F.col("term") != F.col("seed"))
        .groupBy("seed", "term")
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= min_cooc)
    )
    scored = (
        cooc.join(F.broadcast(c_t.filter(F.col("term").isin(seed_lit))
                              .select(F.col("term").alias("seed"), F.col("c").alias("c_x"))),
                  "seed")
        .join(c_t.select("term", F.col("c").alias("c_y")), "term")
        .withColumn(
            "pmi",
            F.round(
                F.log(F.lit(float(n)) * F.col("c_xy") / (F.col("c_x") * F.col("c_y"))), 6
            ),
        )
    )
    w = Window.partitionBy("seed").orderBy(
        F.col("pmi").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("seed", "rank", "term", "c_xy", "pmi")
    )


def parse_boolean_queries(
    queries: list[tuple[int, str]],
) -> tuple[list[tuple[int, str, str]], list[tuple[int, int, int]]]:
    """Parse ``+must -not should`` query strings into (query_id, term,
    role) rows plus per-query (query_id, n_must, n_should) counts; shared
    by the engine and its SQL-oracle generator so grammar can't drift."""
    rows: list[tuple[int, str, str]] = []
    musts: dict[int, int] = {}
    shoulds: dict[int, int] = {}
    for qid, q in queries:
        qid = int(qid)
        if qid in musts:
            raise ValueError(f"duplicate query_id {qid}")
        musts[qid] = 0
        shoulds[qid] = 0
        for tok in q.split():
            if tok.startswith("+") and len(tok) > 1:
                rows.append((qid, tok[1:], "must"))
                musts[qid] += 1
            elif tok.startswith("-") and len(tok) > 1:
                rows.append((qid, tok[1:], "not"))
            elif tok:
                rows.append((qid, tok, "should"))
                shoulds[qid] += 1
        if musts[qid] + shoulds[qid] == 0:
            raise ValueError(
                f"query {qid} has no positive term (pure-NOT queries are "
                f"a corpus-complement scan): {q!r}"
            )
    return rows, [(q, musts[q], shoulds[q]) for q in musts]


def boolean_search(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Boolean term retrieval — the AND/NOT surface the reference's
    OR-only recall (/root/reference/src/table.cpp:430-470) lacks.

    Query grammar (whitespace-separated): ``+term`` MUST, ``-term`` MUST
    NOT, bare ``term`` SHOULD.  A doc matches when every MUST term is
    present, no MUST-NOT term is present, and — if any SHOULD terms were
    given — at least one SHOULD term is present.  Queries with no
    positive (MUST/SHOULD) term are refused: "everything except X" is a
    corpus-complement scan, not an index lookup.  Returns (query_id,
    rank, doc_id, n_matched) ranked by distinct positive terms matched
    (desc), doc id tie-break.

    Scale shape: candidate GROUPS are formed only by positive (MUST /
    SHOULD) hits — one broadcast join against the distinct (doc, term)
    projection + one (query, doc)-keyed aggregation over the positive
    posting mass.  MUST-NOT terms are applied as a left-anti join of
    (query, doc) exclusion pairs: their cost is linear in the NOT terms'
    posting mass (unavoidable — the docs containing them must be
    enumerated) but they never create aggregation state or candidate
    groups of their own."""
    spark = docs.sparkSession
    rows, need_rows = parse_boolean_queries(queries)
    qt = spark.createDataFrame(rows, "query_id long, term string, role string")
    need = spark.createDataFrame(
        need_rows, "query_id long, n_must long, n_should long"
    )
    dt = (
        tokens_view(docs, id_col=id_col, text_col=text_col)
        .select(id_col, "term")
        .distinct()
    )
    pos = qt.filter(F.col("role") != "not")
    nots = qt.filter(F.col("role") == "not").select("query_id", "term")
    hits = (
        dt.join(F.broadcast(pos), "term")
        .groupBy("query_id", id_col)
        .agg(
            F.sum(F.when(F.col("role") == "must", 1).otherwise(0)).alias("must_hit"),
            F.sum(F.when(F.col("role") == "should", 1).otherwise(0)).alias("should_hit"),
        )
        .join(F.broadcast(need), "query_id")
        .filter(
            (F.col("must_hit") == F.col("n_must"))
            & ((F.col("n_should") == 0) | (F.col("should_hit") > 0))
        )
        .withColumn("n_matched", F.col("must_hit") + F.col("should_hit"))
    )
    excl = dt.join(F.broadcast(nots), "term").select("query_id", id_col)
    hits = hits.join(excl, ["query_id", id_col], "left_anti")
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_matched").desc(), F.col(id_col).asc()
    )
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "n_matched")
    )


def more_like_this(
    docs: DataFrame,
    seed_ids: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    max_query_terms: int = 25,
    min_idf: float = 0.0,
) -> DataFrame:
    """Top-k most similar docs per seed doc by tf-idf cosine
    (wei = tf · ln(1 + N/df)), excluding the seed itself.

    Returns (seed_id, rank, doc_id, sim) with sim rounded to 4 decimals
    (the rank is computed OVER the rounded value + doc-id tie-break, so
    it is engine-reproducible)."""
    n = docs.count()
    tf = (
        tokens_view(docs, id_col=id_col, text_col=text_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    stats = tf.groupBy("term").agg(F.count("*").alias("df"))
    wei = (
        tf.join(stats, "term")
        .withColumn("idf", F.log(F.lit(1.0) + F.lit(float(n)) / F.col("df")))
        .filter(F.col("idf") >= min_idf)
        .withColumn("wei", F.col("tf") * F.col("idf"))
        .select(id_col, "term", "wei")
    )
    # the tf-idf table feeds three consumers (norms, the seed slice, the
    # similarity join); materialize it once instead of inlining the
    # corpus-sized subtree into each — at scale this is the "build the
    # weighted index once, serve many lookups" discipline
    wei = wei.localCheckpoint()
    norms = wei.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("wei") * F.col("wei"))).alias("norm")
    )
    sw = Window.partitionBy(id_col).orderBy(F.col("wei").desc(), F.col("term").asc())
    seed = (
        wei.filter(F.col(id_col).isin([int(s) for s in seed_ids]))
        .withColumn("_r", F.row_number().over(sw))
        .filter(F.col("_r") <= max_query_terms)
        .join(norms, id_col)
        .select(
            F.col(id_col).alias("seed_id"),
            "term",
            F.col("wei").alias("swei"),
            F.col("norm").alias("snorm"),
        )
    )
    sims = (
        wei.join(F.broadcast(seed), "term")
        .filter(F.col(id_col) != F.col("seed_id"))
        .groupBy("seed_id", id_col)
        .agg(
            F.sum(F.col("wei") * F.col("swei")).alias("dot"),
            F.first("snorm").alias("snorm"),  # constant within the group
        )
        .join(norms, id_col)
        .select(
            "seed_id",
            id_col,
            F.round(F.col("dot") / (F.col("norm") * F.col("snorm")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("seed_id").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("seed_id", "rank", id_col, "sim")
    )


def spell_correct(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 1,
    k: int = 5,
) -> DataFrame:
    """Fuzzy term correction ("did you mean") from the corpus term
    dictionary: for each (query_id, typed term), the top-k dictionary
    terms within Levenshtein distance ``max_dist``, ranked by
    (distance asc, document frequency desc, term asc). Exact hits rank
    first at distance 0. Returns (query_id, rank, term, dist, df).

    The reference has no fuzzy matching at all — an unknown query term
    simply recalls nothing (src/table.cpp:430-470 merges postings of
    exact term signs only); this is the query-repair layer every real
    engine bolts on in front of that recall.

    Scale shape: like ``suggest``, the match runs against the term
    DICTIONARY (one distinct (doc, term) projection + a term-level
    groupBy — dictionary-sized, not corpus-sized) with the tiny query
    batch broadcast. The theta join carries a cheap length-band
    prefilter (|len(term) − len(q)| ≤ max_dist, a necessary condition
    for edit distance ≤ max_dist) so most dictionary rows short-circuit
    before the DP; ``F.levenshtein``'s built-in threshold form prunes
    the rest JVM-side. A production engine compiles a Levenshtein
    automaton over its FST dictionary (Lucene FuzzyQuery); at dictionary
    cardinality the broadcast banded theta join is the declarative
    equivalent, and it never touches the corpus again after the one
    dictionary build."""
    spark = docs.sparkSession
    qf = spark.createDataFrame(
        [(int(i), q) for i, q in queries], "query_id long, q string"
    )
    df_tbl = (
        tokens_view(docs, id_col=id_col, text_col=text_col)
        .select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    cand = df_tbl.join(
        F.broadcast(qf),
        (F.abs(F.length("term") - F.length("q")) <= max_dist)
        & (F.levenshtein("term", "q", max_dist) >= 0),
    ).withColumn("dist", F.levenshtein("term", "q"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("df").desc(), F.col("term").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "term", "dist", "df")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k_rrf: int = 60,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    weights: list[float] | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): fuse any
    number of per-query rankings — each (query_col, id_col, rank) — into
    one, scoring each doc Σ_i w_i / (k_rrf + rank_i) over the lists that
    ranked it. The standard hybrid-search combiner (lexical BM25 +
    embedding ANN) because it needs no score calibration across systems —
    only ranks. k_rrf=60 is the paper's constant. Returns
    (query_col, rank, id_col, rrf) with rrf rounded to 6 decimals and the
    fused rank ordered (rrf desc, id asc).

    The reference has exactly one ranking and no fusion; this is the
    glue that lets its lexical pipeline and the ANN family serve ONE
    result list.

    Scale shape: inputs are already top-k-per-query — k·n_queries rows
    each, corpus-independent — so the union + (query, doc) groupBy + one
    per-query window is as small as the query batch itself. The heavy
    lifting stays in the upstream rankings; fusion adds no corpus pass.
    Bit-stable by construction with ≤2 lists (one commutative add per
    doc); with more lists, equal-rrf ties still order deterministically
    by the id tie-break."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError("rrf_fuse: weights/rankings length mismatch")
    parts = [
        df.select(
            F.col(query_col),
            F.col(id_col),
            (
                F.lit(float(w)) / (F.lit(float(k_rrf)) + F.col("rank").cast("double"))
            ).alias("_c"),
        )
        for df, w in zip(rankings, weights)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(query_col, id_col).agg(F.round(F.sum("_c"), 6).alias("rrf"))
    w = Window.partitionBy(query_col).orderBy(F.desc("rrf"), F.asc(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_col, "rank", id_col, "rrf")
    )


def facet_counts(
    results: DataFrame,
    meta: DataFrame,
    facets: list[str],
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Faceted navigation counts over a result set: for each query and
    each facet column, how many of its result docs carry each value —
    the standard search-UI sidebar (filter by language / source / …).
    The reference returns a bare ranked list (result.h:24-38); facets
    are the canonical aggregation layered on top.

    ``results`` is a per-query ranked set (query_id, doc_id, …) — e.g.
    the output of the BM25/WAND/VSM top-k paths; ``meta`` is the corpus
    metadata table. Returns (query, facet, value, n_docs).

    Scale shape: results is top-k-per-query (k·|queries| rows — tiny
    next to a 100 TB corpus), so it is BROADCAST into the metadata scan:
    the corpus is never shuffled, facet stacking happens on the
    semi-join-sized slice, and the final groupBy keys
    (query, facet, value) are low-cardinality with map-side partial
    aggregation. NULL facet values are kept as the literal '(null)'
    bucket (a real UI shows missing metadata too).
    """
    if not facets:
        raise ValueError("facet_counts: need at least one facet column")
    r = results.select(query_col, id_col).distinct()
    joined = meta.select(id_col, *facets).join(F.broadcast(r), id_col)
    stacked = joined.select(
        query_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("facet"),
                        F.coalesce(F.col(c).cast("string"), F.lit("(null)")).alias("value"),
                    )
                    for c in facets
                ]
            )
        ).alias("fv"),
    )
    return (
        stacked.select(query_col, F.col("fv.facet").alias("facet"), F.col("fv.value").alias("value"))
        .groupBy(query_col, "facet", "value")
        .agg(F.count("*").alias("n_docs"))
    )


def collapse_results(
    results: DataFrame,
    meta: DataFrame,
    group_col: str,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "bm25",
) -> DataFrame:
    """Field collapsing (Lucene/Solr "collapse", ES field_collapse): keep
    only the best-scoring result per (query, group) — e.g. one hit per
    site/source/cluster — then re-rank the survivors to top-k. The
    standard same-site-spam guard the reference's bare ranked list lacks.

    Docs whose metadata is missing or whose group value is NULL each form
    their own singleton group (keyed by their own doc id), so they are
    never collapsed together. Returns (query, rank, group, id, score).

    Scale shape: like facet_counts, the top-k-per-query result set is
    tiny, so it BROADCASTS into the metadata scan (corpus never
    shuffled); both windows then run over result-set-sized data with
    deterministic (score desc, id asc) tie-breaks.
    """
    m = meta.select(F.col(id_col), F.col(group_col).alias("_grp"))
    joined = (
        m.join(F.broadcast(results.select(query_col, id_col, score_col)), id_col)
        .withColumn(
            "_grp",
            F.coalesce(F.col("_grp").cast("string"), F.concat(F.lit("(doc:"), id_col, F.lit(")"))),
        )
    )
    # results rows with no metadata at all: keep them, singleton-grouped
    missing = (
        results.select(query_col, id_col, score_col)
        .join(m.select(id_col), id_col, "left_anti")
        .withColumn("_grp", F.concat(F.lit("(doc:"), id_col, F.lit(")")))
    )
    joined = joined.unionByName(missing.select(*joined.columns))
    wg = Window.partitionBy(query_col, "_grp").orderBy(F.desc(score_col), F.asc(id_col))
    wq = Window.partitionBy(query_col).orderBy(F.desc(score_col), F.asc(id_col))
    return (
        joined.withColumn("_rn", F.row_number().over(wg))
        .filter(F.col("_rn") == 1)
        .withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= k)
        .select(query_col, "rank", F.col("_grp").alias("group_value"), id_col, score_col)
    )


def result_snippets(
    results: DataFrame,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    window: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Result snippets with multi-term highlighting: for each (query,
    doc) in a result set, the ``window``-token span containing the MOST
    query-term hits (ties → earliest), with every query term wrapped in
    ``**``. The search-results page surface the reference lacks (its
    highlight, query.py:824-841, marks the whole title only).

    Window selection is anchor-based: every hit position p is a
    candidate start; its score is the number of hits in [p, p+window) —
    an optimal window always exists that starts at a hit, so this is
    exact, and the self-join is bounded by hits-per-doc (query terms
    only), never doc length. Docs with zero hits emit no row (they
    shouldn't be in a term-based result set anyway).

    Returns (query, id, snippet_start, n_hits, snippet).

    Scale shape: the result set broadcasts into the docs scan
    (corpus never shuffled); tokens are exploded only for result docs;
    the anchor self-join and windows run on hit-sized data."""
    if window < 1:
        raise ValueError("result_snippets: window must be >= 1")
    spark = results.sparkSession
    qdf = spark.createDataFrame(queries, f"{query_col} long, query string")
    qterms = qdf.select(
        query_col, F.explode(F.split("query", r"\s+")).alias("term")
    ).filter(F.col("term") != "").distinct()
    qarrs = qterms.groupBy(query_col).agg(F.collect_set("term").alias("_qt"))

    r = results.select(query_col, id_col).distinct()
    rdocs = docs.select(
        id_col,
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "").alias("_toks"),
    ).join(F.broadcast(r), id_col)
    toks = rdocs.select(
        query_col, id_col, F.posexplode("_toks").alias("_pos", "_term")
    )
    hits = toks.join(
        F.broadcast(qterms),
        (toks[query_col] == qterms[query_col]) & (toks["_term"] == qterms["term"]),
    ).select(toks[query_col], id_col, "_pos")
    h1 = hits.alias("h1")
    h2 = hits.alias("h2")
    scored = (
        h1.join(
            h2,
            (F.col(f"h1.{query_col}") == F.col(f"h2.{query_col}"))
            & (F.col(f"h1.{id_col}") == F.col(f"h2.{id_col}"))
            & (F.col("h2._pos") >= F.col("h1._pos"))
            & (F.col("h2._pos") < F.col("h1._pos") + window),
        )
        .groupBy(
            F.col(f"h1.{query_col}").alias(query_col),
            F.col(f"h1.{id_col}").alias(id_col),
            F.col("h1._pos").alias("snippet_start"),
        )
        .agg(F.count("*").alias("n_hits"))
    )
    w = Window.partitionBy(query_col, id_col).orderBy(
        F.desc("n_hits"), F.asc("snippet_start")
    )
    best = scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    out = (
        best.join(rdocs, [query_col, id_col])
        .join(F.broadcast(qarrs), query_col)
        .select(
            query_col,
            id_col,
            "snippet_start",
            "n_hits",
            F.array_join(
                F.transform(
                    F.slice(F.col("_toks"), F.col("snippet_start") + 1, window),
                    lambda t: F.when(
                        F.array_contains(F.col("_qt"), t),
                        F.concat(F.lit("**"), t, F.lit("**")),
                    ).otherwise(t),
                ),
                " ",
            ).alias("snippet"),
        )
    )
    return out
