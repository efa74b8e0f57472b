"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure column algebra (whole-stage codegen) —
no Python in the hot path; each has an equivalent ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# whitespace tokenizer, SQL-expressible on both engines
WS_SPLIT = r"\s+"

# deterministic per-language marker tokens (tiny n-gram-ish heuristic; the
# `documents` test table uses en/de/fr/es/zh sources with shared vocab, so
# markers double as a worked example rather than a real lang-id model)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "y", "es", "los"],
    "zh": ["de", "shi", "le", "zai", "he"],
}

STOPWORDS_EN = ["the", "a", "of", "to", "in", "and", "is", "for"]


def tokens_view(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exploded whitespace tokens with position: (id, pos, term)."""
    arr = F.filter(F.split(F.col(text_col), WS_SPLIT), lambda x: x != "")
    return (
        df.select(id_col, F.posexplode(arr).alias("pos", "term"))
    )


def token_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword-regex count
    (word pieces = letter runs, digit runs, single punctuation)."""
    ws_arr = F.filter(F.split(F.col(text_col), WS_SPLIT), lambda x: x != "")
    return df.select(
        id_col,
        F.size(ws_arr).alias("n_ws_tokens"),
        F.size(
            F.expr(f"regexp_extract_all({text_col}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)")
        ).alias("n_bpe_tokens"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score: char length, token
    count, mean token length, punctuation ratio, stopword ratio."""
    t = F.col(text_col)
    ws_arr = F.filter(F.split(t, WS_SPLIT), lambda x: x != "")
    n_tok = F.size(ws_arr)
    n_chars = F.length(t)
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}]", ""))
    stop_lit = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.filter(ws_arr, lambda x: F.array_contains(stop_lit, F.lower(x))))
    mean_tok_len = F.when(n_tok > 0, (
        F.aggregate(ws_arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
        / n_tok
    )).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1 - punct_ratio) * 0.3
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.3
    )
    return df.select(
        id_col,
        n_chars.alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-token language scores + argmax label (deterministic
    tie-break: language name ascending)."""
    ws_arr = F.filter(F.split(F.lower(F.col(text_col)), WS_SPLIT), lambda x: x != "")
    cols = [F.col(id_col)]
    score_cols = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        c = F.size(F.filter(ws_arr, lambda x: F.array_contains(markers, x)))
        cols.append(c.alias(f"score_{lang}"))
        score_cols.append((lang, f"score_{lang}"))
    out = df.select(*cols)
    # argmax with name-asc tiebreak via a struct-max trick
    best = F.greatest(*[
        F.struct(F.col(c).alias("s"), F.lit(-ord(lang[0]) * 256 - ord(lang[1])).alias("o"),
                 F.lit(lang).alias("lang"))
        for lang, c in score_cols
    ])
    return out.withColumn("lang_pred", best["lang"])


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalization fingerprint: md5 of (lowercased, whitespace-collapsed,
    trimmed) text, plus md5 of the sorted token multiset — two standard
    near-dup-canonicalization fingerprints."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), WS_SPLIT, " "))
    toks = F.filter(F.split(F.lower(F.col(text_col)), WS_SPLIT), lambda x: x != "")
    sorted_join = F.array_join(F.array_sort(toks), " ")
    return df.select(
        id_col,
        F.md5(norm).alias("fp_norm"),
        F.md5(sorted_join).alias("fp_bag"),
    )


def curate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    per_lang_cap: int | None = None,
) -> DataFrame:
    """Training-corpus curation funnel, fused into one pass of column
    algebra + one window: (1) drop docs below a quality threshold,
    (2) collapse exact-normalized duplicates to the min-id canonical,
    (3) optionally cap the number of docs kept per predicted language,
    keeping the highest-quality ones (deterministic doc_id tiebreak).

    Scale shape: stages 1-2 are a filter + one hash-groupBy on a 16-byte
    fingerprint (shuffle carries id+fp only); stage 3 is a TWO-PHASE
    top-k: because the rank is a row_number filtered by a constant,
    Catalyst's rank-limit pushdown (SPARK-37099) plans it as
    ``WindowGroupLimit [lang_pred] ... Partial`` BEFORE the exchange —
    every map task prunes to ≤ cap rows per language locally — followed
    by the Final limit + window after the shuffle, so the one reducer a
    hot language lands on ranks at most cap × n_tasks rows, never the
    raw language partition (billions of rows at 100 TB).
    test_curate_plan_has_partial_window_limit pins that plan shape and
    test_invariance.py pins partitioning-invariance of the result. A
    hand-rolled pre-prune window keyed on (lang, spark_partition_id())
    was measured and rejected: it reaches the same cap × n_tasks bound
    but pays a second exchange. All SQL-expressible: DuckDB oracle
    `corpus_curate` checks it value-exact.

    With ``per_lang_cap=None`` no ranking is performed and no
    ``lang_rank`` column is emitted (computing a true global
    per-language rank nobody asked for would be the exact single-reducer
    scan the cap path avoids).
    """
    from pyspark.sql import Window

    q = quality_score(df, id_col=id_col, text_col=text_col).select(
        id_col, "n_tokens", "quality"
    )
    fp = fingerprint(df, id_col=id_col, text_col=text_col).select(id_col, "fp_norm")
    lang = lang_id(df, id_col=id_col, text_col=text_col).select(id_col, "lang_pred")
    scored = (
        df.select(id_col)
        .join(q, id_col)
        .join(fp, id_col)
        .join(lang, id_col)
        .filter(F.col("quality") >= min_quality)
    )
    canon = Window.partitionBy("fp_norm").orderBy(F.col(id_col).asc())
    scored = (
        scored.withColumn("_rn", F.row_number().over(canon))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if per_lang_cap is not None:
        w = Window.partitionBy("lang_pred").orderBy(
            F.col("quality").desc(), F.col(id_col).asc()
        )
        scored = (
            scored.withColumn("lang_rank", F.row_number().over(w))
            .filter(F.col("lang_rank") <= per_lang_cap)
        )
        return scored.select(id_col, "lang_pred", "n_tokens", "quality", "lang_rank")
    return scored.select(id_col, "lang_pred", "n_tokens", "quality")


def _lower_tokens(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), WS_SPLIT), lambda x: x != "")


def _ngrams(toks, n: int):
    """Array of space-joined word n-grams; empty array when the doc has
    fewer than n tokens (F.sequence would count DOWN for start > stop)."""
    if n == 1:
        return toks
    starts = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(starts, lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Intra-document repetition signals in the Gopher / MassiveText
    style (Rae et al. 2021, table A1): for each n in ``ns`` the fraction
    of n-gram occurrences that are repeats of an earlier occurrence
    (``dup_{n}gram_frac`` = (total − distinct) / total) and the share of
    the single most frequent n-gram (``top_{n}gram_frac``) — the two
    filters that catch boilerplate- and loop-generated text that
    per-token quality scores miss.

    Scale shape: pure per-row column algebra, NO shuffle and NO Python —
    the n-gram arrays, distinct counts, and the most-frequent-gram count
    (longest equal run of the sorted gram array, one F.aggregate lambda)
    all evaluate inside whole-stage codegen in the scan stage, so the op
    costs one map pass regardless of corpus size. Mirrors the reference's
    per-string term stats pass (/root/reference/src/segment.cpp term
    loop) but as a repetition census rather than an index input.
    """
    # staged projections: materialize the token array, then each n-gram
    # array, BEFORE the stats expressions — inlining the tokenize into the
    # per-gram slice() lambda re-evaluates split(lower(text)) per gram,
    # O(L²) per row (see dedup.minhash_signatures), and each gram array is
    # referenced by three stats so staging also computes it once
    tok_df = df.select(F.col(id_col), _lower_tokens(text_col).alias("_toks"))
    gram_df = tok_df.select(
        F.col(id_col),
        F.size("_toks").alias("n_tokens"),
        *[_ngrams(F.col("_toks"), n).alias(f"_g{n}") for n in ns],
    )
    cols = [F.col(id_col), F.col("n_tokens")]
    for n in ns:
        grams = F.col(f"_g{n}")
        total = F.size(grams)
        distinct = F.size(F.array_distinct(grams))
        # max occurrence count == longest run in the sorted array
        acc0 = F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        )

        def step(acc, x):
            run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
            )

        top_c = F.aggregate(F.array_sort(grams), acc0, step, lambda a: a["best"])
        safe_t = F.greatest(total, F.lit(1))
        cols.append(F.round((total - distinct) / safe_t, 6).alias(f"dup_{n}gram_frac"))
        cols.append(F.round(top_c / safe_t, 6).alias(f"top_{n}gram_frac"))
    return gram_df.select(*cols)


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents whose word
    n-grams overlap an evaluation set (the GPT-3 appendix-C / PaLM /
    Llama pretraining hygiene step). Emits per training doc the distinct
    n-gram count, how many of those occur anywhere in ``eval_df``, the
    overlap fraction, and a ``contaminated`` flag at ``threshold``.

    Scale shape: the eval side (a benchmark suite — MBs, not TBs) is
    reduced to a DISTINCT gram set and broadcast, so the 100 TB corpus
    is never shuffled for the join; the doc side is ONE pass —
    explode_outer the distinct-gram array (the outer row keeps
    zero-gram docs in the output), broadcast-left-join the eval set,
    then a single doc_id groupBy whose map-side partial agg collapses
    each doc back to one row BEFORE the exchange (a doc's gram rows are
    generated from one input row, hence colocated), so the only
    corpus-scale shuffle carries one row per document. A hot gram
    cannot blow up the join: both sides are distinct, so each
    (doc, gram) row matches at most one eval row.
    """
    # staged: tokenize once per row, THEN slice n-grams from the
    # materialized array (inline tokens re-split per gram — O(L²), see
    # dedup.minhash_signatures)
    doc_grams = (
        df.select(F.col(id_col), _lower_tokens(text_col).alias("_toks"))
        .select(
            F.col(id_col),
            F.explode_outer(F.array_distinct(_ngrams(F.col("_toks"), n))).alias("gram"),
        )
    )
    eval_grams = (
        eval_df.select(_lower_tokens(text_col).alias("_toks"))
        .select(F.explode(F.array_distinct(_ngrams(F.col("_toks"), n))).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    agg = (
        doc_grams.join(F.broadcast(eval_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_overlap"),
        )
    )
    frac = F.col("n_overlap") / F.greatest(F.col("n_grams"), F.lit(1))
    return agg.select(
        F.col(id_col),
        "n_grams",
        "n_overlap",
        F.round(frac, 6).alias("overlap_frac"),
        (frac >= F.lit(threshold)).alias("contaminated"),
    )


def decontaminate_fuzzy(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    eval_id_col: str = "doc_id",
) -> DataFrame:
    """Fuzzy benchmark decontamination: per training document, the MAX
    word-n-gram-set Jaccard similarity against any single evaluation
    document, plus which eval doc attains it and a ``contaminated``
    flag at ``threshold``. The whole-document-similarity complement to
    :func:`decontaminate` (which pools eval grams and can't tell "quotes
    one famous sentence from each of 50 eval docs" from "is a paraphrase
    of one eval doc") — the Llama-2 / GPT-4 contamination reports use
    exactly this per-eval-example overlap shape.

    EXACT, not sketched: the eval side (a benchmark suite — MBs) is
    reduced to distinct ``(eval_id, gram)`` rows and broadcast as an
    inverted gram index, so a (doc, eval) pair materializes only when
    the two share at least one gram — Jaccard 0 pairs are never
    enumerated, which is what makes exact max-Jaccard affordable where
    corpus-vs-corpus would need MinHash/LSH (see
    ``dedup.lsh_candidate_pairs``). Shuffle shape: the intersection
    count groups by (doc, eval); every gram row of one doc comes from
    one input row, hence is map-side colocated, so the partial agg
    collapses to ≤ |matched evals| rows per doc BEFORE the exchange,
    and the final per-doc max + size join are one doc-keyed shuffle.
    Worst-case fanout is bounded by the eval-suite size, not the
    corpus. Ties on Jaccard break to the smallest eval id (struct-max,
    no window).
    """
    doc_grams = df.select(
        F.col(id_col), F.array_distinct(_ngrams(_lower_tokens(text_col), n)).alias("_g")
    ).select(
        F.col(id_col),
        F.size("_g").cast("long").alias("n_grams"),
        F.explode_outer("_g").alias("gram"),
    )
    # staged: tokens materialized before the per-gram slice lambda (see
    # dedup.minhash_signatures for the O(L²) inline-reevaluation trap)
    ev_tok = eval_df.select(
        F.col(eval_id_col).alias("_ev_id"), _lower_tokens(text_col).alias("_toks")
    )
    ev_grams = ev_tok.select(
        F.col("_ev_id"), F.explode(F.array_distinct(_ngrams(F.col("_toks"), n))).alias("gram")
    )
    ev_sizes = ev_grams.groupBy("_ev_id").agg(F.count("*").alias("_n_ev"))
    inter = (
        doc_grams.join(F.broadcast(ev_grams), "gram")
        .groupBy(id_col, "n_grams", "_ev_id")
        .agg(F.count("*").alias("_n_common"))
    )
    jac = F.round(
        F.col("_n_common")
        / (F.col("n_grams") + F.col("_n_ev") - F.col("_n_common")),
        6,
    )
    best = (
        inter.join(F.broadcast(ev_sizes), "_ev_id")
        .select(F.col(id_col), F.struct(jac.alias("j"), (-F.col("_ev_id")).alias("ne")).alias("_s"))
        .groupBy(id_col)
        .agg(F.max("_s").alias("_b"))
    )
    sizes = doc_grams.select(id_col, "n_grams").groupBy(id_col).agg(F.first("n_grams").alias("n_grams"))
    out = sizes.join(best, id_col, "left")
    max_jac = F.coalesce(F.col("_b.j"), F.lit(0.0))
    return out.select(
        F.col(id_col),
        F.col("n_grams"),
        max_jac.alias("max_jaccard"),
        (-F.col("_b.ne")).alias("eval_id"),
        (max_jac >= F.lit(threshold)).alias("contaminated"),
    )


def lm_perplexity(
    df: DataFrame,
    ref_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 1.0,
    min_count: int = 1,
) -> DataFrame:
    """Bigram language-model cross-entropy / perplexity per document —
    the CCNet-style quality filter (Wenzek et al. 2020 score documents
    with an LM trained on a reference corpus and keep the low-perplexity
    head; the reference engine has no corpus-level quality model at all,
    its closest analog being the per-term idf pass at
    /root/reference/src/table.cpp term-stats loop).

    Trains an add-k-smoothed bigram model on ``ref_df`` (the clean
    reference corpus; defaults to ``df`` itself = self-perplexity) and
    scores every document in ``df``:

        p(w2 | w1) = (c2(w1 w2) + k) / (c1(w1) + k * V)
        logloss(d) = -(1/n_bigrams) * sum ln p(w_{i+1} | w_i)
        ppl(d)     = exp(logloss)

    Docs with < 2 tokens score logloss 0.0 / ppl 1.0 with n_bigrams 0
    (kept, never dropped — the downstream filter decides).

    Scale shape: the count tables are DICTIONARY-sized (unigram/bigram
    types), built in one pass each over the reference corpus; the corpus
    side collapses to one row per (doc, distinct bigram) via a map-side
    partial agg BEFORE any exchange (explode output is colocated with
    its input row), and both probability joins are many-to-one against
    DISTINCT-keyed count tables, so a hot bigram cannot multiply rows.
    V rides the plan as a broadcast 1-row aggregate — no driver collect.
    ``min_count`` prunes the bigram table's long tail (at 100 TB bigram
    types outnumber unigrams ~50:1; pruned grams fall back to the add-k
    floor exactly like unseen grams), bounding the model table while
    changing only tail scores. All SQL-expressible: oracle
    ``lm_perplexity`` checks it value-exact at 6 dp.
    """
    if not add_k > 0:
        # add_k=0 would make unseen bigrams p=0 -> log NULL, silently
        # DROPPED from the sum while still counted in n_bigrams — an
        # all-unseen doc would score ppl 1.0 (perfect). Smoothing is
        # load-bearing, not a tunable-to-zero knob.
        raise ValueError(f"add_k must be > 0, got {add_k}")
    ref = ref_df if ref_df is not None else df
    # staged projection: materialize the token array before the per-gram
    # slice() lambda, else Catalyst re-evaluates split(lower(text)) per
    # bigram — O(L²) per row (see dedup.minhash_signatures)
    ref_tok_df = ref.select(_lower_tokens(text_col).alias("_toks"))
    uni = (
        ref_tok_df.select(F.explode("_toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    bi = (
        ref_tok_df.select(F.explode(_ngrams(F.col("_toks"), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("c2"))
    )
    if min_count > 1:
        bi = bi.filter(F.col("c2") >= min_count)
    vdf = uni.agg(F.count("*").alias("_V"))

    doc_bi = (
        df.select(F.col(id_col), _lower_tokens(text_col).alias("_toks"))
        .select(F.col(id_col), F.explode(_ngrams(F.col("_toks"), 2)).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("occ"))
        .withColumn("w1", F.split(F.col("gram"), " ")[0])
    )
    k = F.lit(float(add_k))
    p = (F.coalesce(F.col("c2"), F.lit(0)) + k) / (
        F.coalesce(F.col("c1"), F.lit(0)) + k * F.col("_V")
    )
    scored = (
        doc_bi.join(bi, "gram", "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(vdf))
        .groupBy(id_col)
        .agg(
            F.sum("occ").alias("n_bigrams"),
            F.sum(F.col("occ") * F.log(p)).alias("_ll"),
        )
    )
    logloss = F.coalesce(-F.col("_ll") / F.col("n_bigrams"), F.lit(0.0))
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(logloss, 6).alias("logloss"),
            F.round(F.exp(logloss), 6).alias("ppl"),
        )
    )


def corpus_profile(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    approx: bool = False,
) -> DataFrame:
    """Per-group corpus profile: (group, n_docs, n_tokens, n_terms,
    avg_doc_len) — the census a pipeline runs before deciding dedup /
    curation budgets.

    ``approx=False`` computes the exact distinct-term count (the
    SQL-oracle baseline). ``approx=True`` swaps it for the HLL++ sketch
    (`approx_count_distinct`, rsd 2%) — the 100 TB path: fixed sketch
    memory per group instead of distinct-set state; relative error is
    pinned against the exact twin in tests/test_pipeline.py. n_docs needs
    no distinct in either mode: the docs frame is one row per doc."""
    # n_docs comes from the DOCS frame, not the token explode: empty or
    # whitespace-only docs emit zero tokens and would silently vanish from
    # the census (and inflate avg_doc_len) — a census that loses exactly
    # the junk docs it is supposed to budget for
    base = df.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    toks = tokens_view(df, id_col=id_col, text_col=text_col).join(
        df.select(id_col, group_col), id_col
    )
    nt = (
        F.approx_count_distinct("term", 0.02) if approx else F.countDistinct("term")
    ).alias("n_terms")
    tok_agg = toks.groupBy(group_col).agg(F.count("*").alias("n_tokens"), nt)
    return (
        base.join(tok_agg, group_col, "left")
        .select(
            group_col,
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_terms", F.lit(0)).alias("n_terms"),
            F.round(
                F.coalesce("n_tokens", F.lit(0)) / F.col("n_docs"), 6
            ).alias("avg_doc_len"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    vocab: "list[str] | DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-fit census vs a reference vocabulary: per doc
    (n_tokens, n_oov, oov_rate, fertility) where oov_rate is the
    fraction of (lowercased, whitespace) tokens outside *vocab* and
    fertility is BPE-ish subword pieces per whitespace token (the
    pieces-per-word metric tokenizer papers report per language — high
    fertility = the vocab fits the language badly). The standard
    pre-training census for choosing/validating a tokenizer on a new
    corpus slice; the reference has a fixed tokenizer and no notion of
    vocabulary fit.

    Two plans by vocab form, same results:

    * ``list[str]`` — vocab inlined as an array literal; the whole op is
      ONE map-only pass (no explode, no join, no shuffle — the
      quality_score shape). O(|vocab|) per token, so for control
      vocabularies (≤ a few hundred terms).
    * ``DataFrame`` with a ``term`` column — explode + broadcast
      left-join + per-doc re-aggregation: the 100 TB shape for real
      subword vocabularies (32-256k terms — far beyond array-literal
      scans but trivially broadcastable); the only exchange is the
      map-side-combined groupBy back to doc ids, and empty docs are
      kept via the left join from the id spine.

    Rates are round-6 single divisions of per-doc ints (bit-stable);
    zero-token docs emit 0.0 for both."""
    t = F.col(text_col)
    ws_arr = F.filter(F.split(F.lower(t), WS_SPLIT), lambda x: x != "")
    n_tok = F.size(ws_arr)
    n_bpe = F.size(
        F.expr(
            f"regexp_extract_all({text_col}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)"
        )
    )
    if isinstance(vocab, DataFrame):
        toks = tokens_view(df, id_col=id_col, text_col=text_col).select(
            id_col, F.lower(F.col("term")).alias("term")
        )
        v = vocab.select(F.lower(F.col("term")).alias("term")).distinct()
        flagged = toks.join(
            F.broadcast(v.withColumn("_in", F.lit(1))), "term", "left"
        )
        per_doc = flagged.groupBy(id_col).agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        return (
            df.select(id_col, n_bpe.alias("_nb"))
            .join(per_doc, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
                F.coalesce("n_oov", F.lit(0).cast("long")).alias("n_oov"),
                F.round(
                    F.when(
                        F.coalesce("n_tokens", F.lit(0)) > 0,
                        F.col("n_oov") / F.col("n_tokens"),
                    ).otherwise(F.lit(0.0)),
                    6,
                ).alias("oov_rate"),
                F.round(
                    F.when(
                        F.coalesce("n_tokens", F.lit(0)) > 0,
                        F.col("_nb") / F.col("n_tokens"),
                    ).otherwise(F.lit(0.0)),
                    6,
                ).alias("fertility"),
            )
        )
    vlit = F.array(*[F.lit(w.lower()) for w in sorted(set(vocab))])
    n_oov = F.size(F.filter(ws_arr, lambda x: ~F.array_contains(vlit, x)))
    return df.select(
        id_col,
        n_tok.cast("long").alias("n_tokens"),
        n_oov.cast("long").alias("n_oov"),
        F.round(
            F.when(n_tok > 0, n_oov / n_tok).otherwise(F.lit(0.0)), 6
        ).alias("oov_rate"),
        F.round(
            F.when(n_tok > 0, n_bpe / n_tok).otherwise(F.lit(0.0)), 6
        ).alias("fertility"),
    )


def doc_keyterms(
    df: DataFrame,
    k: int = 5,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf
    (wei = tf · ln(n_docs / df), the "significant terms" /
    keyword-extraction primitive behind tagging, faceting and
    related-content UIs). Returns (id, rank, term, tf, wei) with wei
    rounded to 6 dp and rank computed OVER the rounded value + term
    tie-break (engine-reproducible). ``min_df`` prunes hapax noise.

    The reference computes idf only to score queries; this turns the
    same statistic inward to describe each document. Shares the
    tf/df shapes of ``more_like_this`` (retrieval.py) but emits the
    seed-side weights for EVERY doc instead of a similarity join.

    Scale shape: one (doc, term) aggregation, one term-level df census
    (dictionary-sized, broadcast back), then a per-doc window whose
    partition key is the highest-cardinality column in the corpus —
    Catalyst's rank-limit pushdown (WindowGroupLimit Partial) prunes
    each map task to ≤ k rows per doc before the exchange, so the
    window shuffles O(k · n_docs), not the corpus."""
    n = df.count()
    tf = (
        tokens_view(df, id_col=id_col, text_col=text_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count("*").alias("df"))
    if min_df > 1:
        dfs = dfs.filter(F.col("df") >= min_df)
    from pyspark.sql import Window

    scored = tf.join(F.broadcast(dfs), "term").withColumn(
        "wei",
        F.round(F.col("tf") * F.log(F.lit(float(n)) / F.col("df")), 6),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("wei").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "wei")
    )


def normalize_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    form: str = "NFC",
    lowercase: bool = False,
    strip_control: bool = True,
    collapse_ws: bool = True,
) -> DataFrame:
    """Unicode text normalization / cleanup — the first stage of any
    web-scale ingestion pipeline (the reference assumes its TSV corpus is
    already clean UTF-8, `/root/reference/src/table.cpp:157-171`; a real
    crawl is not). Steps, in order:

      1. Unicode normalization to ``form`` (NFC/NFKC/NFD/NFKD) — the only
         step Spark has no builtin for, so it runs as ONE Arrow-batched
         pandas UDF (`Series.str.normalize`, vectorized C path in
         pandas/unicodedata — never row-at-a-time Python).
      2. control-character strip (C0 minus tab/newline/CR, plus DEL) —
         JVM-side regexp, whole-stage codegen.
      3. optional ASCII-semantics lowercase (`F.lower`, matches SQL
         ``lower`` — deliberately NOT Python ``str.casefold`` so the
         DuckDB oracle decides identically).
      4. whitespace collapse + trim.

    Returns (id, norm_text, changed, n_chars). Scale shape: map-only and
    shuffle-free — a 100 TB corpus streams through scan tasks once; the
    Arrow batch transfer for step 1 is the only Python boundary and it
    amortizes over `spark.sql.execution.arrow.maxRecordsPerBatch` rows.
    """
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"normalize_text: unknown unicode form {form!r}")
    import pandas as pd  # noqa: F401  (pandas_udf signature)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _unorm(s):  # type: ignore[no-untyped-def]
        return s.str.normalize(form)

    out = F.col(text_col)
    out = _unorm(out)
    if strip_control:
        out = F.regexp_replace(out, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    if lowercase:
        out = F.lower(out)
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return df.select(
        id_col,
        out.alias("norm_text"),
        (out != F.col(text_col)).alias("changed"),
        F.length(out).alias("n_chars"),
    )


# Gopher (Rae et al. 2021, appendix A1.1) stopword-presence list
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The full Gopher document-quality rule set (Rae et al. 2021,
    "Scaling Language Models", appendix A1.1) — the standard pre-training
    quality gate that `quality_score` (composite heuristic) does not
    cover rule-for-rule:

      * word count in [min_words, max_words]
      * mean word length in [min_mean_word_len, max_mean_word_len]
      * symbol-to-word ratio ('#' chars + '...' occurrences) <= 0.1
      * fraction of lines starting with a bullet (•, -, *) <= 0.9
      * fraction of lines ending in an ellipsis <= 0.3
      * fraction of words containing an alphabetic char >= 0.8
      * at least 2 distinct Gopher stopwords present

    Emits per-rule stats (6-dp rounded ratios — bit-stable vs the SQL
    oracle) + booleans + the conjunction `gopher_pass`. Pure column
    algebra: map-only, shuffle-free, whole-stage codegen end to end —
    the 100 TB shape is one streaming pass over the corpus scan.
    """
    t = F.col(text_col)
    words = F.filter(F.split(t, WS_SPLIT), lambda x: x != "")
    n_words = F.size(words)
    sum_len = F.aggregate(words, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    mean_wl = F.when(n_words > 0, F.round(sum_len / n_words, 6)).otherwise(F.lit(0.0))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    sym_ratio = F.when(n_words > 0, F.round((n_hash + n_ellipsis) / n_words, 6)).otherwise(
        F.lit(0.0)
    )
    lines = F.filter(F.split(t, r"\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike(r"^(•|-|\*)"))
    )
    n_ell_end = F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"\.\.\.$")))
    bullet_ratio = F.when(n_lines > 0, F.round(n_bullet / n_lines, 6)).otherwise(F.lit(0.0))
    ellipsis_ratio = F.when(n_lines > 0, F.round(n_ell_end / n_lines, 6)).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(words, lambda x: x.rlike("[a-zA-Z]")))
    alpha_ratio = F.when(n_words > 0, F.round(n_alpha / n_words, 6)).otherwise(F.lit(0.0))
    stop_lit = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.array_intersect(F.transform(words, lambda x: F.lower(x)), stop_lit)
    )
    f_words = (n_words >= min_words) & (n_words <= max_words)
    f_wl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    f_sym = sym_ratio <= max_symbol_ratio
    f_bullet = bullet_ratio <= max_bullet_ratio
    f_ell = ellipsis_ratio <= max_ellipsis_ratio
    f_alpha = alpha_ratio >= min_alpha_word_ratio
    f_stop = stop_hits >= min_stop_hits
    return df.select(
        id_col,
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        stop_hits.alias("stop_hits"),
        f_words.alias("pass_word_count"),
        f_wl.alias("pass_mean_word_len"),
        f_sym.alias("pass_symbol_ratio"),
        f_bullet.alias("pass_bullet"),
        f_ell.alias("pass_ellipsis"),
        f_alpha.alias("pass_alpha_words"),
        f_stop.alias("pass_stopwords"),
        (f_words & f_wl & f_sym & f_bullet & f_ell & f_alpha & f_stop).alias("gopher_pass"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunker — the RAG / embedding-index
    primitive (every doc becomes a set of <= chunk_tokens windows that a
    downstream encoder embeds; `pipeline/simsearch.py` then serves them).
    Differs from `packing.pack_sequences` (training shards CONCATENATE
    docs into fixed chunks) in that chunks here never cross documents and
    OVERLAP by chunk_tokens - stride.

    Window rule (deterministic, SQL-reproducible): starts at
    0, stride, 2·stride, … up to n - chunk_tokens, plus one tail-aligned
    start at n - chunk_tokens when the stride doesn't land on it, so the
    doc tail is always covered exactly once; docs with
    n <= chunk_tokens emit a single chunk. Empty docs emit none.

    Returns (id, chunk_id, start_token, n_tokens, chunk_text). Scale
    shape: map-only explode, shuffle-free; output rows ≈ n_tokens/stride
    per doc, each bounded by chunk_tokens — no skew amplification beyond
    doc length itself (cap upstream via `curate`).
    """
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_documents: chunk_tokens and stride must be positive")
    toks = F.filter(F.split(F.col(text_col), WS_SPLIT), lambda x: x != "")
    base = df.select(id_col, toks.alias("_toks")).filter(F.size("_toks") > 0)
    last = F.greatest(F.size("_toks") - F.lit(chunk_tokens), F.lit(0))
    starts = F.array_distinct(
        F.concat(F.sequence(F.lit(0), last, F.lit(stride)), F.array(last))
    )
    chunk = F.slice(F.col("_toks"), F.col("start_token") + 1, chunk_tokens)
    return (
        base.select(id_col, "_toks", F.posexplode(starts).alias("chunk_id", "start_token"))
        .select(
            id_col,
            "chunk_id",
            "start_token",
            F.size(chunk).alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def group_keyterms(
    df: DataFrame,
    group_col: str = "lang",
    k: int = 5,
    min_tf: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Significant terms per group (the Elasticsearch
    ``significant_terms`` aggregation / corpus-linguistics "weirdness"
    score): for each group value, the k terms most over-represented vs
    the whole corpus, scored by log-lift
    ``ln((tf_g / tot_g) / (tf_bg / tot_bg))`` — the group-level twin of
    ``doc_keyterms`` (per-document tf-idf). Background includes the
    group itself (standard lift-vs-corpus), so scores are ≥ ln of the
    group's token share and never divide by zero.

    Returns (group, rank, term, tf, score) with score rounded to 6 dp
    and rank over (rounded score desc, term asc) — engine-reproducible.
    ``min_tf`` prunes hapax noise per group.

    Scale shape: ONE corpus pass — a map-side-combined count keyed by
    (group, term); everything after (group totals, background census,
    the top-k window) runs over that dictionary-sized table, with
    Catalyst's WindowGroupLimit pruning each map task to ≤ k rows per
    group before the final exchange."""
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.filter(F.split(F.col(text_col), WS_SPLIT), lambda x: x != "")).alias(
            "term"
        ),
    )
    gt = toks.groupBy("grp", "term").agg(F.count("*").alias("tf"))
    if min_tf > 1:
        gt = gt.filter(F.col("tf") >= min_tf)
    # totals from the UNPRUNED pass would differ from the oracle if min_tf
    # filtered first on one side only — both engines prune, then total
    tot_g = gt.groupBy("grp").agg(F.sum("tf").alias("tot_g"))
    bg = gt.groupBy("term").agg(F.sum("tf").alias("tf_bg"))
    grand = gt.agg(F.sum("tf").alias("tot_bg"))
    from pyspark.sql import Window

    scored = (
        gt.join(F.broadcast(tot_g), "grp")
        .join(F.broadcast(bg), "term")
        .crossJoin(F.broadcast(grand))
        .withColumn(
            "score",
            F.round(
                F.log((F.col("tf") / F.col("tot_g")) / (F.col("tf_bg") / F.col("tot_bg"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("grp").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("grp").alias(group_col), "rank", "term", "tf", "score")
    )


# PII patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): no alternation ambiguity, no backreferences. Keys are the
# redaction tag names.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d-]{7,}\d",
}


def pii_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document PII census: occurrence counts for each pattern in
    ``PII_PATTERNS`` (emails, IPv4 addresses, international phone
    numbers) plus the total — the audit half of the standard
    pre-training privacy pass (Dolma / RedPajama ship the same stage).
    Pure JVM-side ``regexp_extract_all`` column algebra: map-only,
    shuffle-free, one streaming pass at 100 TB."""
    cols = [F.col(id_col)]
    total = F.lit(0)
    for kind, pat in PII_PATTERNS.items():
        c = F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        cols.append(c.alias(f"n_{kind}"))
        total = total + c
    cols.append(total.alias("n_pii"))
    return df.select(*cols)


def redact_pii(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Redaction half of the privacy pass: every ``PII_PATTERNS`` match
    is replaced with its ``<KIND>`` tag (``<EMAIL>``, ``<IPV4>``,
    ``<PHONE>``), applied in the dict's fixed order so engines agree
    when patterns could overlap. Returns (id, redacted_text, n_redacted).
    Map-only/shuffle-free like ``pii_stats``."""
    # count each pattern on the text AS IT IS when that pattern runs
    # (post previous replacements), so n_redacted equals the number of
    # <KIND> tags actually inserted — overlapping matches (an email whose
    # domain looks like an IP) are not double-counted
    out = F.col(text_col)
    n = F.lit(0)
    for kind, pat in PII_PATTERNS.items():
        n = n + F.size(F.regexp_extract_all(out, F.lit(pat), F.lit(0)))
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return df.select(
        id_col,
        out.alias("redacted_text"),
        n.alias("n_redacted"),
    )
