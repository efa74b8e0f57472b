"""Data-selection operators for LLM training pipelines: DSIR hashed-ngram
importance weights + Gumbel-top-k resampling, and sketch-narrowed exact
heavy hitters.

The reference engine curates nothing — its corpus is whatever the fixed
TSV contains (/root/reference/src/table.cpp corpus load); these operators
are part of the §F "absent from reference" pipeline surface, the step
BEFORE indexing: choosing which documents a 100 TB raw crawl contributes
to a training mix (DSIR, Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling") and finding the corpus's dominant
terms without an unbounded exact census (count-min sketch, Cormode &
Muthukrishnan 2005).

Engine-reproducibility rule (same as sampling.py): every hash is md5 on
a string key, so the DuckDB oracles replay each operator bit-identically
— no engine-private hash, no floats in the selection decision beyond a
shared 6-dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import _lower_tokens, _ngrams

_HEX_SPACE = float(16 ** 8)  # 8 lowercase-hex chars


def _md5_bucket(col: F.Column, salt: str, modulus: int) -> F.Column:
    """Deterministic bucket in [0, modulus): first 8 md5-hex chars of
    (value ':' salt) as an integer — the sampling.py idiom, numeric
    instead of threshold-string; bit-identical on Spark and DuckDB."""
    return (
        F.conv(F.substring(F.md5(F.concat(col, F.lit(":" + salt))), 1, 8), 16, 10)
        .cast("long")
        % modulus
    )


def _gram_rows(df: DataFrame, id_col: str | None, text_col: str) -> DataFrame:
    """Exploded lowercase unigrams + word bigrams (the DSIR feature set)
    in ONE pass: the token array is materialized once per row and the
    bigram array concatenated onto it before a single explode — no
    second scan, no per-gram re-tokenization (the staged-projection rule
    from dedup.minhash_signatures)."""
    cols = [F.col(id_col)] if id_col else []
    toks = df.select(*cols, _lower_tokens(text_col).alias("_toks"))
    grams = F.explode(F.concat(F.col("_toks"), _ngrams(F.col("_toks"), 2)))
    return toks.select(*cols, grams.alias("gram"))


def dsir_logweights(
    df: DataFrame,
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    add_k: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log importance weight (Xie et al. 2023): fit
    add-k-smoothed hashed-ngram (unigram+bigram) bag distributions on the
    TARGET corpus (p, what we want more of) and the RAW corpus (q, what
    we have), then score every raw document by

        log w(x) = Σ_b c_b(x) · (ln(t_b + k) − ln(q_b + k))
                   + n(x) · (ln(Q + k·B) − ln(T + k·B))

    where c_b(x) is the doc's count in hash bucket b, t_b/q_b the target/
    raw bucket counts, T/Q their totals, B the bucket count, n(x) = Σ c_b.
    The second term folds both smoothing denominators into one scalar so
    buckets unseen in BOTH corpora contribute exactly 0 and never need a
    row. Docs with no grams score 0.0 (log w = 0 ⇔ "no evidence").

    Scale shape (100 TB): the two bucket tables are B-sized (BOUNDED, a
    hyperparameter — not corpus-cardinality like a vocabulary), each built
    by one census pass with map-side partial aggregation; the doc side
    collapses to (doc, bucket) partials before its only shuffle, then
    joins many-to-one against the bounded bucket table (broadcastable) —
    a hot bucket cannot multiply rows. Totals ride the plan as broadcast
    1-row aggregates; no driver collect, no Python. Oracle ``dsir_weights``
    replays every hash and ln value-exact at 6 dp.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not add_k > 0:
        # k=0 would make a target-unseen bucket ln(0) = -inf; smoothing is
        # load-bearing, exactly as in textstats.lm_perplexity.
        raise ValueError(f"add_k must be > 0, got {add_k}")
    bucket = _md5_bucket(F.col("gram"), "dsir", n_buckets)
    # both bucket tables are BOUNDED (<= n_buckets rows) and consumed
    # twice (probability join + totals) — materialize them once so the
    # corpus-sized censuses beneath never recompute (the heavy_hitters /
    # mmr_rerank localCheckpoint discipline; checkpointed data is B rows)
    tgt = _gram_rows(target_df, None, text_col).select(bucket.alias("bucket"))
    tgt_b = tgt.groupBy("bucket").agg(F.count("*").alias("ct")).localCheckpoint()

    doc_b = (
        _gram_rows(df, id_col, text_col)
        .select(F.col(id_col), bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("c"))
    )
    # the raw census is a SECOND-level aggregate of the per-doc partials —
    # never a second tokenize pass over the corpus (at 100 TB the q_b
    # rollup costs one bounded shuffle of (doc, bucket) partials, not a
    # rescan). Rows stay identical to a direct census by construction.
    raw_b = doc_b.groupBy("bucket").agg(F.sum("c").alias("cq")).localCheckpoint()
    tot_t = tgt_b.agg(F.sum("ct").alias("_T"))
    tot_q = raw_b.agg(F.sum("cq").alias("_Q"))
    k = F.lit(float(add_k))
    contrib = F.col("c") * (
        F.log(F.coalesce(F.col("ct"), F.lit(0)) + k)
        - F.log(F.coalesce(F.col("cq"), F.lit(0)) + k)
    )
    kb = k * F.lit(float(n_buckets))
    scored = (
        doc_b.join(tgt_b, "bucket", "left")
        .join(raw_b, "bucket", "left")
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_grams"), F.sum(contrib).alias("_s"))
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_q))
        .select(
            F.col(id_col),
            F.col("n_grams"),
            (
                F.col("_s")
                + F.col("n_grams") * (F.log(F.col("_Q") + kb) - F.log(F.col("_T") + kb))
            ).alias("_lw"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.round(F.coalesce(F.col("_lw"), F.lit(0.0)), 6).alias("log_weight"),
        )
    )


def dsir_select(
    df: DataFrame,
    target_df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    add_k: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR's selection step: sample k documents WITHOUT replacement,
    proportionally to their importance weights, via the Gumbel-top-k
    trick — key(x) = log w(x) + Gumbel(x), take the k largest. The Gumbel
    noise is derived from md5(doc_id ':' salt) (u = (h + 0.5) / 16⁸,
    g = −ln(−ln u)), so the draw is deterministic, reproducible on any
    engine, and stable under repartitioning — ``df.sample``'s
    per-partition RNG gives none of that (see sampling.py). A salted
    re-run is the only way to "reseed", exactly like hash_sample.

    Keys are rounded to 6 dp BEFORE ranking (ties then broken by id
    ascending) so the engine and the oracle order identically even if
    their libm ln differs in the last ulp.

    Scale shape: the scoring plan is dsir_logweights'; the selection is a
    global top-k = TakeOrderedAndProject (per-partition heaps + one
    k-row merge), NEVER a global row_number window — rank is assigned
    after the k-row cut, on driver-sized data.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = dsir_logweights(df, target_df, id_col, text_col, n_buckets, add_k)
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (hv + F.lit(0.5)) / F.lit(_HEX_SPACE)  # (0, 1) exclusive
    keyed = w.select(
        F.col(id_col),
        F.col("log_weight"),
        F.round(-F.log(-F.log(u)), 6).alias("gumbel"),
    ).withColumn("sel_key", F.round(F.col("log_weight") + F.col("gumbel"), 6))
    top = keyed.orderBy(F.desc("sel_key"), F.asc(id_col)).limit(k)
    rw = Window.orderBy(F.desc("sel_key"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(rw)).select(
        "rank", id_col, "log_weight", "gumbel", "sel_key"
    )


def heavy_hitters(
    df: DataFrame,
    threshold: int,
    text_col: str = "text",
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Exact heavy hitters (terms with total count ≥ threshold) found
    WITHOUT an unbounded exact term census — the count-min-sketch
    narrowing (Cormode & Muthukrishnan 2005):

    1. ONE stacked census builds the d×w sketch: every token occurrence
       emits d (row, md5-bucket) pairs, aggregated with map-side partials
       — the only wide shuffle carries at most depth·width distinct keys
       regardless of term cardinality.
    2. A map-side pass re-hashes each occurrence, broadcast-joins the
       d sketch rows, and keeps occurrences whose estimate
       min_r(sketch[r][h_r(term)]) ≥ threshold. CMS never underestimates,
       so every true heavy hitter's occurrences ALL survive.
    3. An exact groupBy over the survivors (a tiny fraction of the
       corpus) recounts candidates and drops the sketch's false
       positives.

    The output is therefore EXACTLY ``HAVING count(*) >= threshold`` —
    invariant to depth/width (they trade pass-2 selectivity, never
    correctness), which is what lets a plain exact-SQL oracle
    (``heavy_hitters``) verify the sketched plan. The naive alternative
    — groupBy(term) over 100 TB — shuffles the full long tail of
    term cardinality to count it once and throw it away; here the tail
    dies map-side in step 2.
    """
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    tok = df.select(F.explode(_lower_tokens(text_col)).alias("term"))
    # materialize the (<= depth*width)-row sketch once — the d broadcast
    # joins below would otherwise each re-run the census (the shared-
    # subtree rule; cf. mmr_rerank's localCheckpoint discipline)
    cms = cms_rows(tok, depth, width).localCheckpoint()
    survivors = cms_estimate(tok, cms, depth, width).filter(
        F.col("_est") >= threshold
    )
    return (
        survivors.groupBy("term")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= threshold)
    )


def cms_rows(tok: DataFrame, depth: int, width: int) -> DataFrame:
    """The count-min sketch of a ``term`` column as (r, bucket, c) rows —
    ONE stacked census whose only wide shuffle carries ≤ depth·width
    keys. Sketches are MERGEABLE: sum c per (r, bucket) across any
    partition of the corpus (epochs, shards, clusters) and you have the
    sketch of the union — the property the streaming twin
    (streaming/sketch_stream.py) is built on."""
    return (
        tok.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            _md5_bucket(F.col("term"), f"cms{r}", width).alias("bucket"),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("rb")
        )
        .select(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    terms: DataFrame, cms: DataFrame, depth: int, width: int
) -> DataFrame:
    """Adds ``_est`` (the CMS count estimate: min over the d rows; NEVER
    below the true count) to a DataFrame with a ``term`` column, via d
    map-side broadcast joins of the bounded sketch. Terms hashing to
    buckets absent from the sketch estimate 0 (left join + coalesce) —
    possible when estimating terms the sketch never counted."""
    est_df = terms
    ests = []
    for r in range(depth):
        cr = cms.filter(F.col("r") == r).select(
            F.col("bucket").alias(f"_b{r}"), F.col("c").alias(f"_c{r}")
        )
        est_df = est_df.withColumn(
            f"_b{r}", _md5_bucket(F.col("term"), f"cms{r}", width)
        ).join(F.broadcast(cr), f"_b{r}", "left")
        ests.append(F.coalesce(F.col(f"_c{r}"), F.lit(0)))
    est = F.least(*ests) if depth > 1 else ests[0]
    return est_df.withColumn("_est", est).drop(
        *[f"_b{r}" for r in range(depth)], *[f"_c{r}" for r in range(depth)]
    )


def bloom_semijoin(
    df: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    keys_key_col: str | None = None,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Semi-join of a huge probe side against a small key set with a
    relational Bloom-filter pre-prune (Bloom 1970): the key set maps to
    ≤ n_bits set-bit rows (k md5 hashes per key, distinct), the probe
    side re-hashes map-side and broadcast-joins the bit table k times —
    a row survives only if ALL k of its bits are set — and only the
    survivors reach the exact semi-join. Bloom filters have NO false
    negatives, so the output is EXACTLY ``WHERE key IN (keys)`` for any
    n_bits/n_hashes (they tune pass-through selectivity, never
    correctness) — the same sketch-narrows/exact-confirms contract as
    :func:`heavy_hitters`, and what lets a plain IN-subquery oracle
    (``bloom_semijoin``) verify the sketched plan.

    Scale shape (100 TB probe, dictionary-sized keys — the decontaminate
    / id-lookup / tombstone-check shape): the naive plan shuffles the
    FULL probe side on the key to meet the key set; here the long tail
    dies inside the probe-side scan stage (k broadcast hash joins of a
    bounded ≤ n_bits bit table), and only matching-ish rows pay the
    exact semi-join's shuffle. The bit table is localCheckpoint'd once.
    """
    if n_bits < 1 or n_hashes < 1:
        raise ValueError(f"n_bits/n_hashes must be >= 1, got {n_bits}/{n_hashes}")
    kk = keys_key_col or key_col
    keys = keys_df.select(F.col(kk).cast("string").alias("_k")).distinct()
    bits = (
        keys.select(
            F.explode(
                F.array(
                    *[
                        _md5_bucket(F.col("_k"), f"bloom{h}", n_bits)
                        for h in range(n_hashes)
                    ]
                )
            ).alias("bit")
        )
        .distinct()
        .localCheckpoint()
    )
    probe = df
    for h in range(n_hashes):
        bh = bits.select(F.col("bit").alias(f"_bit{h}"))
        probe = probe.withColumn(
            f"_bit{h}", _md5_bucket(F.col(key_col).cast("string"), f"bloom{h}", n_bits)
        ).join(F.broadcast(bh), f"_bit{h}")
    survivors = probe.drop(*[f"_bit{h}" for h in range(n_hashes)])
    # exact confirm: false positives die here; semantics == plain semi-join
    return survivors.join(
        keys.hint("broadcast"),
        survivors[key_col].cast("string") == keys["_k"],
        "left_semi",
    )
