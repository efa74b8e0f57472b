"""Distributed multinomial Naive Bayes: train + classify as pure
relational algebra.

The corpus-curation stages that tag documents by domain / quality /
language (CCNet's fastText LM filter, Wenzek et al. 2020; DCLM's
quality classifier, Li et al. 2024) all reduce to "train a linear
bag-of-words model on labeled docs, score every doc". Multinomial
Naive Bayes (McCallum & Nigam 1998) is the member of that family whose
TRAINING is itself a count aggregation — so both phases are
SQL-expressible and a DuckDB oracle can verify train→predict end to
end, where fastText's SGD loop could only ever be rows-only. The
reference engine has no document classifier at all; its closest analog
is the per-term idf census (/root/reference/src/table.cpp term-stats
loop), which is exactly the shape ``nb_train`` generalizes to
per-label counts.

Model:

    p(label)        = n_docs(label) / n_docs
    p(term | label) = (cnt(term,label) + a) / (tot(label) + a*V)
    score(d, label) = ln p(label) + sum_{tok in d, tok in vocab}
                      ln p(tok | label)

Tokens outside the training vocabulary are DROPPED (the standard
multinomial-NB convention — an unseen type carries no label signal);
a doc with zero in-vocab tokens falls back to the max-prior label.

Scale shape (the lm_perplexity discipline): the model tables are
dictionary-sized — (label, term) counts, per-label totals, priors —
built in one corpus pass each with map-side partials; V and n_docs
ride the plan as broadcast 1-row aggregates, never a driver collect.
Classification collapses the corpus to one row per (doc, distinct
term) BEFORE any exchange, fans out only by the label count (a
broadcast join against the dictionary-sized label table), and the
likelihood join is many-to-one against the DISTINCT-keyed count table
so a hot term cannot multiply rows. The per-doc argmax is a
doc_id-keyed window over |labels| rows per doc — high-cardinality,
unskewed.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import _lower_tokens


class NBModel(NamedTuple):
    """Trained model as three small DataFrames (all dictionary-sized).

    labels: (label, log_prior, tot) — doc-count prior + token total
    counts: (label, term, cnt) — per-label term occurrence counts
    vdf:    1-row (``_V``) vocabulary size
    """

    labels: DataFrame
    counts: DataFrame
    vdf: DataFrame
    alpha: float


def nb_train(
    df: DataFrame,
    label_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> NBModel:
    """One-pass multinomial NB training over a labeled corpus."""
    if not alpha > 0:
        # alpha=0 makes unseen (term,label) pairs p=0 -> ln NULL, which
        # would silently drop them from the sum (cf. lm_perplexity)
        raise ValueError(f"alpha must be > 0, got {alpha}")
    toks = df.select(
        F.col(label_col).alias("label"), F.explode(_lower_tokens(text_col)).alias("term")
    )
    # the count table IS the training artifact — materialize it once
    # (dictionary-sized) so everything downstream (totals, vocab size,
    # the vocab filter and the likelihood join in nb_classify) reads it
    # instead of re-deriving the corpus census per consumer
    counts = toks.groupBy("label", "term").agg(F.count("*").alias("cnt")).localCheckpoint()
    totals = counts.groupBy("label").agg(F.sum("cnt").alias("tot"))
    census = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("_n")
    )
    ndf = df.agg(F.count("*").alias("_nd"))
    labels = (
        census.crossJoin(F.broadcast(ndf))
        .join(totals, "label")
        .select(
            "label",
            (F.log(F.col("_n")) - F.log(F.col("_nd"))).alias("log_prior"),
            "tot",
        )
    )
    vdf = counts.select("term").distinct().agg(F.count("*").alias("_V"))
    # labels is consumed twice in nb_classify (scoring + the empty-doc
    # fallback) — checkpoint it too; both are label-cardinality tiny
    return NBModel(
        labels=labels.localCheckpoint(),
        counts=counts,
        vdf=vdf.localCheckpoint(),
        alpha=float(alpha),
    )


def nb_classify(
    df: DataFrame,
    model: NBModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    all_scores: bool = False,
) -> DataFrame:
    """Score every document against the model; returns the argmax label
    per doc as (id, pred_label, log_score) — log_score rounded to 6 dp,
    ties broken to the lexicographically smallest label. With
    ``all_scores=True`` returns every (id, label, log_score, rank)
    instead (rank 1 = predicted)."""
    a = F.lit(model.alpha)
    doc_terms = (
        df.select(F.col(id_col), F.explode(_lower_tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    # in-vocab restriction: the count table's distinct terms
    vocab = model.counts.select("term").distinct()
    pairs = (
        doc_terms.join(vocab, "term")  # drop OOV types
        .crossJoin(F.broadcast(model.labels))
        .join(model.counts, ["label", "term"], "left")
    )
    ll = F.col("tf") * (
        F.log(F.coalesce(F.col("cnt"), F.lit(0)) + a)
        - F.log(F.col("tot") + a * F.col("_V"))
    )
    scored = (
        pairs.crossJoin(F.broadcast(model.vdf))
        .groupBy(id_col, "label")
        .agg((F.first("log_prior") + F.sum(ll)).alias("_score"))
    )
    # zero-in-vocab-token docs: prior-only scores for every label
    missing = (
        df.select(id_col)
        .join(scored.select(id_col).distinct(), id_col, "left_anti")
        .crossJoin(F.broadcast(model.labels))
        .select(id_col, "label", F.col("log_prior").alias("_score"))
    )
    everything = scored.unionByName(missing)
    # rank over the ROUNDED score (the doc_keyterms discipline) so a
    # last-ulp float difference can't reorder labels across engines
    w = Window.partitionBy(id_col).orderBy(
        F.round("_score", 6).desc(), F.col("label").asc()
    )
    ranked = everything.withColumn("rank", F.row_number().over(w))
    if all_scores:
        return ranked.select(
            id_col, "label", F.round("_score", 6).alias("log_score"), "rank"
        )
    return ranked.filter(F.col("rank") == 1).select(
        F.col(id_col),
        F.col("label").alias("pred_label"),
        F.round("_score", 6).alias("log_score"),
    )
