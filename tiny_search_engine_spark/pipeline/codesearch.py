"""Trigram-index code search: literal substring and regex search over a
source-code corpus via a (gram, doc_id) posting index — the Google Code
Search / Zoekt design re-expressed as Spark column algebra.

The reference engine retrieves by whole-term postings only
(/root/reference/src/table.cpp:430-470 OR-merges per-term doc lists), so it
cannot answer substring or regex queries — the bread-and-butter of code
search.  A character-trigram index closes that gap: every match of a
literal needle must contain every trigram of the needle, so the posting
index prunes the corpus to a candidate superset and an exact verify pass
finishes the job.  Regex queries go through a conservative required-literal
extractor; patterns with no provable ≥3-char literal fall back to an exact
full scan (flagged, never silent).

Scale shape (100 TB corpus, 10^12 files):

* ``trigram_postings`` is one narrow projection + explode of the corpus —
  no shuffle at all; persisted it would be bucketed by ``xxhash64(gram)``
  so query-time posting lookups are partition-pruned.  Distinct grams per
  doc are deduped inside the row (``array_distinct``) before the explode,
  never with a corpus-wide ``distinct()``.
* query planning picks the ``max_grams`` RAREST grams per query from a df
  census over just the grams the query batch needs (broadcast semi-join
  into the postings, one small groupBy).  Rarest-first keeps hot
  boilerplate grams (``"de "``, ``"the"``, ``" in"``) out of the AND-plan:
  any subset of a needle's grams still yields a sound candidate superset,
  so dropping hot grams trades a little verify work for posting reads
  bounded by the rare-gram df instead of corpus size.
* candidate generation is ``postings ⋈ broadcast(query grams)`` +
  count-distinct-equals filter — shuffle volume bounded by the chosen
  grams' posting mass, never the corpus.
* verification joins candidates back to the corpus (semi-join slice) and
  runs the exact predicate (``contains`` / ``regexp_like``) inside
  whole-stage codegen.  No Python anywhere.

Oracles: DuckDB computes the same result with a plain exact scan
(``contains(text, needle)`` / ``regexp_matches``), so the entire
prune-then-verify pipeline is value-checked end-to-end, not just the
verify step.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..hashing import xxhash64_signed


def trigram_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct character-trigram postings (gram, doc_id), case-sensitive
    (code search is case-sensitive; lowercase upstream if you want CI).

    Docs shorter than 3 chars emit no postings — they can never contain a
    ≥3-char needle, and sub-trigram needles take the scan path anyway."""
    t = F.col(text_col)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 2),
            lambda i: t.substr(i, F.lit(3)),
        )
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.when(F.length(t) >= 3, grams).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("gram"),
    )


def write_trigram_store(
    docs: DataFrame,
    path: str,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    files_per_bucket: int = 1,
) -> None:
    """Persist the posting index partitioned by
    ``pmod(xxhash64(gram), n_buckets)``.  At query time the needed buckets
    are computed DRIVER-side with the bit-exact pure-Python xxhash64
    (hashing.py, pinned against ``F.xxhash64`` in tests/test_hashing.py),
    so the parquet scan is partition-pruned to the query batch's grams —
    a lookup reads O(grams/n_buckets) of the index, never all of it.

    ``files_per_bucket`` > 1 spreads each bucket over several files
    (repartition also keys on the doc id) so a hot bucket still reads in
    parallel — at 100 TB you'd size n_buckets × files_per_bucket to the
    cluster's scan parallelism."""
    post = trigram_postings(docs, id_col=id_col, text_col=text_col)
    (
        post.withColumn(
            "bucket", F.pmod(F.xxhash64("gram"), F.lit(n_buckets)).cast("int")
        )
        .repartition(n_buckets * files_per_bucket, F.col("bucket"), F.col("doc_id"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    with open(os.path.join(path, "_trigram_meta.json"), "w") as f:
        # format 2 = tombstones in the _tombstones/ parquet side table
        # (format-1 stores carried them in this JSON; readers accept both)
        json.dump({"n_buckets": n_buckets, "format": 2}, f)


def load_trigram_postings(
    spark: SparkSession, path: str, grams: set[str] | None = None
) -> DataFrame:
    """Read a persisted posting index; with *grams*, prune the scan to the
    buckets those grams hash into (partition pruning — extra same-bucket
    grams are dropped by the downstream equi-join, so pruning is purely a
    read-volume optimization, never a correctness input).

    Delta segments (update_trigram_store) are unioned in; each segment is
    masked by the tombstones of strictly later seqs via a broadcast
    anti-join. Tombstones live in a parquet SIDE TABLE
    (``_tombstones/<seq>``), never in driver memory or the JSON meta —
    the meta file holds only counters, so a store replacing millions of
    docs per epoch grows its metadata by bytes, not id lists. Stores
    written before this layout (tombstone lists in the meta JSON) are
    still read."""
    with open(os.path.join(path, "_trigram_meta.json")) as f:
        meta = json.load(f)
    segs: list[tuple[int, DataFrame]] = [(0, spark.read.parquet(path))]
    delta_root = os.path.join(path, "_deltas")
    if os.path.isdir(delta_root):
        for name in sorted(os.listdir(delta_root)):
            segs.append(
                (int(name), spark.read.parquet(os.path.join(delta_root, name)))
            )
    # (seq, doc_id DataFrame) tombstone parts: parquet side table (the
    # explicit schema makes an all-deletes epoch's empty dir readable),
    # plus legacy meta-JSON lists from pre-format-2 stores
    tomb_parts: list[tuple[int, DataFrame]] = []
    tomb_root = os.path.join(path, "_tombstones")
    if os.path.isdir(tomb_root):
        for name in sorted(os.listdir(tomb_root)):
            tomb_parts.append(
                (
                    int(name),
                    spark.read.schema("doc_id long").parquet(
                        os.path.join(tomb_root, name)
                    ),
                )
            )
    for s, ids in meta.get("tombstones", {}).items():
        if ids:
            tomb_parts.append(
                (int(s), spark.createDataFrame([(int(i),) for i in ids], "doc_id long"))
            )
    parts: list[DataFrame] = []
    for seq, df in segs:
        later = [t for s, t in tomb_parts if s > seq]
        if later:
            t = later[0]
            for more in later[1:]:
                t = t.unionByName(more)
            df = df.join(
                F.broadcast(t.select("doc_id").distinct()), "doc_id", "left_anti"
            )
        parts.append(df.select("doc_id", "gram", "bucket"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if grams is not None:
        buckets = sorted(
            {xxhash64_signed(g.encode("utf-8")) % meta["n_buckets"] for g in grams}
        )
        out = out.filter(F.col("bucket").isin(buckets))
    return out.select("doc_id", "gram")


def update_trigram_store(
    docs_delta: DataFrame,
    path: str,
    deleted_ids: list[int] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq: int | None = None,
) -> None:
    """Incremental maintenance: append a delta posting segment for new or
    REPLACED docs and record tombstones for deleted (or replaced) doc ids.
    Readers union base + deltas and anti-join the tombstones; ``
    compact_trigram_store`` folds everything back into one base.

    Same delta-segment design as the segment store's streaming ingest
    (streaming/ingest.py): appends are partition-dir writes (no rewrite of
    the base), deletes are metadata until compaction — the only shapes
    that stay O(delta), not O(index), at 100 TB.

    *seq* defaults to the next sequence number; a streaming caller passes
    its epoch id instead, making retries idempotent (the delta dir is
    overwritten and the tombstone slot rewritten, both keyed by seq)."""
    with open(os.path.join(path, "_trigram_meta.json")) as f:
        meta = json.load(f)
    n_buckets = int(meta["n_buckets"])
    delta_root = os.path.join(path, "_deltas")
    seq = int(seq) if seq is not None else meta.get("delta_seq", 0) + 1
    if seq < int(meta.get("delta_seq", 0)):
        # only the LATEST epoch is ever legitimately retried; a lower seq
        # means a reset/second checkpoint is replaying history — its docs
        # would be silently masked by the existing later tombstones
        raise ValueError(
            f"seq {seq} rewinds behind delta_seq {meta['delta_seq']} "
            f"(stale or reset checkpoint?) — refuse instead of silently "
            f"masking the new postings"
        )
    spark = docs_delta.sparkSession
    # O(1) emptiness probe — the delta's doc ids themselves NEVER reach
    # the driver (a 100 TB store replacing millions of docs per epoch
    # must keep both the tombstone set and the metadata file O(1) on the
    # driver; the ids flow executor-side into the parquet side table)
    has_new = docs_delta.select(id_col).limit(1).count() > 0
    if has_new:
        post = trigram_postings(docs_delta, id_col=id_col, text_col=text_col)
        (
            post.withColumn(
                "bucket", F.pmod(F.xxhash64("gram"), F.lit(n_buckets)).cast("int")
            )
            .repartition(n_buckets, F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(delta_root, f"{seq:06d}"))
        )
    # tombstones are keyed by the seq at which they happened: a segment is
    # only masked by tombstones from STRICTLY LATER seqs, so a replaced
    # doc's fresh postings (written at this seq) survive their own
    # tombstone while every older copy dies. They live in a parquet side
    # table (one dir per seq, overwrite => idempotent retries), distinct
    # executor-side; deleted_ids is an API argument and may stay a small
    # driver list.
    tomb_df = docs_delta.select(F.col(id_col).cast("long").alias("doc_id")).distinct()
    if deleted_ids:
        dd = spark.createDataFrame(
            [(int(i),) for i in sorted(set(deleted_ids))], "doc_id long"
        )
        tomb_df = tomb_df.unionByName(dd).distinct()
    (
        tomb_df.repartition(1)
        .write.mode("overwrite")
        .parquet(os.path.join(path, "_tombstones", f"{seq:06d}"))
    )
    meta["delta_seq"] = max(int(meta.get("delta_seq", 0)), seq)
    with open(os.path.join(path, "_trigram_meta.json"), "w") as f:
        json.dump(meta, f)


def compact_trigram_store(
    spark: SparkSession, path: str, files_per_bucket: int = 1
) -> None:
    """Fold base + deltas − tombstones into a fresh base and clear the
    delta state (one index-sized rewrite, the amortized cost ceiling of
    the delta design)."""
    import shutil

    with open(os.path.join(path, "_trigram_meta.json")) as f:
        meta = json.load(f)
    n_buckets = int(meta["n_buckets"])
    merged = load_trigram_postings(spark, path)
    tmp = path.rstrip("/") + ".compact_tmp"
    (
        merged.withColumn(
            "bucket", F.pmod(F.xxhash64("gram"), F.lit(n_buckets)).cast("int")
        )
        .repartition(n_buckets * files_per_bucket, F.col("bucket"), F.col("doc_id"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(tmp)
    )
    # the replacement must be COMPLETE (data + meta) before the live store
    # is touched: a crash between rmtree and rename then loses at most the
    # old dir, never the meta (n_buckets would be unrecoverable)
    meta["delta_seq"] = 0
    # drop any legacy meta-JSON tombstone lists; the parquet side table
    # (_tombstones/) simply isn't copied into the fresh base
    meta.pop("tombstones", None)
    with open(os.path.join(tmp, "_trigram_meta.json"), "w") as f:
        json.dump(meta, f)
    shutil.rmtree(path)
    os.rename(tmp, path)


def search_literal_store(
    spark: SparkSession,
    store_path: str,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    **kwargs,
) -> DataFrame:
    """``search_literal`` against a persisted trigram store: loads only the
    buckets of the query batch's grams, then runs the same prune+verify."""
    grams = {g for _, ndl in queries for g in query_grams(ndl)}
    post = load_trigram_postings(spark, store_path, grams)
    return search_literal(docs, queries, postings=post, **kwargs)


def search_regex_store(
    spark: SparkSession,
    store_path: str,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    **kwargs,
) -> DataFrame:
    """``search_regex`` against a persisted trigram store: loads only the
    buckets of the patterns' required-literal grams (patterns with no
    required literal contribute none — they take the full-scan path and
    never touch the store)."""
    grams = {
        g for _, pat in queries for g in query_grams(required_literal(pat))
    }
    post = load_trigram_postings(spark, store_path, grams)
    return search_regex(docs, queries, postings=post, **kwargs)


def symbol_xref(
    docs: DataFrame,
    define_pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_def_docs: int = 100,
) -> DataFrame:
    """Symbol cross-reference: join definition sites to reference sites.

    *define_pattern* is a regex whose capture group 1 is the defined
    symbol (e.g. ``def ([a-zA-Z_][a-zA-Z0-9_]*)`` for Python defs); a
    reference is any whitespace token equal to the symbol in a DIFFERENT
    doc.  Returns (symbol, def_doc_id, ref_doc_id, n_refs) where n_refs
    is the symbol's token frequency in the referencing doc.

    Scale shape: definitions are a narrow regexp projection; the
    def→ref join is symbol-keyed (equi-join, shuffle bounded by token
    mass of defined symbols).  Symbols defined in more than
    *max_def_docs* docs are dropped before the join — a boilerplate name
    (``main``, ``test``) defined in d docs and referenced in r docs emits
    d·r rows, the same quadratic bomb as hot shingles in ngram Jaccard
    (dedup.py), and carries no cross-reference signal."""
    from .textstats import tokens_view

    defs = (
        docs.select(
            F.col(id_col).alias("def_doc_id"),
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(
                        F.col(text_col), F.lit(define_pattern), F.lit(1)
                    )
                )
            ).alias("symbol"),
        )
        .filter(F.col("symbol") != "")
        .distinct()
    )
    hot = Window.partitionBy("symbol")
    defs = (
        defs.withColumn("_dd", F.count("*").over(hot))
        .filter(F.col("_dd") <= max_def_docs)
        .drop("_dd")
    )
    tf = (
        tokens_view(docs, id_col=id_col, text_col=text_col)
        .groupBy(F.col(id_col).alias("ref_doc_id"), F.col("term").alias("symbol"))
        .agg(F.count("*").alias("n_refs"))
    )
    return (
        defs.join(tf, "symbol")
        .filter(F.col("ref_doc_id") != F.col("def_doc_id"))
        .select("symbol", "def_doc_id", "ref_doc_id", "n_refs")
    )


def query_grams(needle: str) -> list[str]:
    """The distinct trigrams of a literal needle (sorted, deterministic)."""
    return sorted({needle[i : i + 3] for i in range(len(needle) - 2)})


def required_literal(pattern: str) -> str:
    """A literal string every match of *pattern* must contain, or '' when
    none is provably required.  Conservative by construction — it only has
    to never exclude a real match (the verify pass is exact regardless):

    * alternation / groups / classes (``| ( [``) anywhere → give up;
    * ``X*``, ``X?``, ``X{`` make the preceding char optional → drop it;
    * ``X+`` keeps X (at least one occurrence) but ends the run;
    * escapes end the run (``\\d`` etc. are not literals);
    * the longest surviving run wins; runs under 3 chars are useless to a
      trigram index → ''.
    """
    j = 0
    while j < len(pattern):  # unescaped | ( [ anywhere → give up
        if pattern[j] == "\\":
            j += 2
            continue
        if pattern[j] in "|([":
            return ""
        j += 1
    runs: list[str] = []
    cur: list[str] = []
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\":
            runs.append("".join(cur))
            cur = []
            i += 2
            continue
        if c in ".^$*+?{}":
            if c in "*?{" and cur:
                cur.pop()
            if c == "+":
                runs.append("".join(cur))
                cur = []
            else:
                runs.append("".join(cur))
                cur = []
            if c == "{":
                while i < n and pattern[i] != "}":
                    i += 1
            i += 1
            continue
        cur.append(c)
        i += 1
    runs.append("".join(cur))
    best = max(runs, key=len) if runs else ""
    return best if len(best) >= 3 else ""


def _check_unique_ids(queries: list[tuple[int, str]]) -> None:
    """Duplicate query ids would merge two needles' gram sets under one id
    (an over-strict AND) — refuse loudly instead of under-matching."""
    seen: set[int] = set()
    for qid, _ in queries:
        if int(qid) in seen:
            raise ValueError(f"duplicate query_id {qid}")
        seen.add(int(qid))


def _candidates(
    post: DataFrame,
    gram_rows: list[tuple[int, str]],
    max_grams: int,
) -> DataFrame:
    """(query_id, doc_id) candidate superset: docs containing ALL of the
    ``max_grams`` rarest grams of each query.  *gram_rows* is
    [(query_id, gram)].

    The gram-df census is materialized driver-side (ONE job, output
    bounded by the batch's distinct grams — query-prep-sized, never
    corpus-sized) so the chosen-gram table is a literal: without this the
    tiny census subtree is inlined under every downstream join and
    Catalyst re-scans the posting source once per copy."""
    spark = post.sparkSession
    needed = spark.createDataFrame(
        [(g,) for g in sorted({g for _, g in gram_rows})], "gram string"
    )
    census = {
        r.gram: r.gdf
        for r in post.join(F.broadcast(needed), "gram")
        .groupBy("gram")
        .agg(F.count("*").alias("gdf"))
        .collect()
    }
    by_q: dict[int, set[str]] = {}
    for qid, g in gram_rows:
        by_q.setdefault(qid, set()).add(g)
    chosen_rows: list[tuple[int, str]] = []
    need_rows: list[tuple[int, int]] = []
    for qid, gs in by_q.items():
        ranked = sorted(gs, key=lambda g: (census.get(g, 0), g))[:max_grams]
        chosen_rows += [(qid, g) for g in ranked]
        need_rows.append((qid, len(ranked)))
    chosen = spark.createDataFrame(chosen_rows, "query_id long, gram string")
    n_chosen = spark.createDataFrame(need_rows, "query_id long, _need long")
    return (
        post.join(F.broadcast(chosen), "gram")
        # countDistinct, NOT count(*): duplicate (gram, doc) posting rows
        # (duplicate source rows, or one streaming epoch carrying two
        # versions of a doc) would push a plain count past _need and
        # silently DROP a real match — a false negative, the one failure
        # a pruning index must never have
        .groupBy("query_id", "doc_id")
        .agg(F.countDistinct("gram").alias("_hit"))
        .join(F.broadcast(n_chosen), "query_id")
        .filter(F.col("_hit") == F.col("_need"))
        .select("query_id", "doc_id")
    )


def search_literal(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    postings: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_grams: int = 8,
    allow_scan: bool = True,
) -> DataFrame:
    """Exact substring search: (query_id, doc_id, n_occurrences) for every
    doc whose text contains the needle.  *queries* is [(query_id, needle)].

    Needles with ≥1 trigram go through the posting prune; shorter needles
    (1-2 chars) require a full scan — allowed only with *allow_scan*
    (at 100 TB you'd refuse them or serve from a bigram sidecar)."""
    spark = docs.sparkSession
    _check_unique_ids(queries)
    pruned: list[tuple[int, str]] = []
    gram_rows: list[tuple[int, str]] = []
    scan: list[tuple[int, str]] = []
    for qid, needle in queries:
        if not needle:
            # contains(text, '') is vacuously true for every doc — a batch
            # query that returns the whole corpus is never what a caller
            # meant; refuse loudly (module convention)
            raise ValueError(f"empty needle for query_id {qid}")
        gs = query_grams(needle)
        if gs:
            pruned.append((int(qid), needle))
            gram_rows += [(int(qid), g) for g in gs]
        else:
            scan.append((int(qid), needle))
    if scan and not allow_scan:
        raise ValueError(
            f"needles shorter than 3 chars need a full scan: {scan!r}"
        )

    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    occ = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.col("needle"))))
        / F.length("needle")
    ).cast("long")
    parts: list[DataFrame] = []
    if pruned:
        post = (
            postings
            if postings is not None
            else trigram_postings(docs, id_col=id_col, text_col=text_col)
        )
        needles = spark.createDataFrame(pruned, "query_id long, needle string")
        cand = _candidates(post, gram_rows, max_grams)
        parts.append(
            cand.join(F.broadcast(needles), "query_id")
            .join(d, "doc_id")
            .filter(F.contains(F.col("text"), F.col("needle")))
            .select("query_id", "doc_id", occ.alias("n_occurrences"))
        )
    if scan:
        sq = spark.createDataFrame(scan, "query_id long, needle string")
        parts.append(
            d.crossJoin(F.broadcast(sq))  # labeled exact fallback, tiny side
            .filter(F.contains(F.col("text"), F.col("needle")))
            .select("query_id", "doc_id", occ.alias("n_occurrences"))
        )
    if not parts:
        return spark.createDataFrame(
            [], "query_id long, doc_id long, n_occurrences long"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def with_snippets(
    docs: DataFrame,
    hits: DataFrame,
    queries: list[tuple[int, str]],
    window: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Attach a context snippet to literal-search hits: the ±*window*
    chars around the FIRST occurrence of each query's needle.  *hits* is
    any (query_id, doc_id) frame (e.g. ``search_literal`` output);
    returns (query_id, doc_id, pos, snippet) with 1-based *pos*.

    Pure column algebra (locate/substring inside codegen); the doc side
    is the candidate semi-join slice, so snippet cost scales with result
    size, not corpus size."""
    spark = docs.sparkSession
    nd = spark.createDataFrame(
        [(int(q), s) for q, s in queries], "query_id long, needle string"
    )
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    w = int(window)
    return (
        hits.select("query_id", "doc_id")
        .join(F.broadcast(nd), "query_id")
        .join(d, "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.expr("locate(needle, text)").alias("pos"),
            F.expr(
                f"substring(text, greatest(1, locate(needle, text) - {w}), "
                f"length(needle) + {2 * w})"
            ).alias("snippet"),
        )
    )


def search_regex(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    postings: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_grams: int = 8,
    allow_scan: bool = True,
) -> DataFrame:
    """Regex search (unanchored, ``regexp_like`` semantics): (query_id,
    doc_id) for every doc whose text matches.  Patterns with a provable
    ≥3-char required literal are pruned through the trigram index; the
    rest take an exact full scan (gated by *allow_scan*)."""
    spark = docs.sparkSession
    _check_unique_ids(queries)
    pruned: list[tuple[int, str]] = []
    gram_rows: list[tuple[int, str]] = []
    scan: list[tuple[int, str]] = []
    for qid, pat in queries:
        if not pat:
            raise ValueError(f"empty pattern for query_id {qid}")
        lit = required_literal(pat)
        if lit:
            pruned.append((int(qid), pat))
            gram_rows += [(int(qid), g) for g in query_grams(lit)]
        else:
            scan.append((int(qid), pat))
    if scan and not allow_scan:
        raise ValueError(
            f"patterns with no required literal need a full scan: {scan!r}"
        )

    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    parts: list[DataFrame] = []
    if pruned:
        post = (
            postings
            if postings is not None
            else trigram_postings(docs, id_col=id_col, text_col=text_col)
        )
        pats = spark.createDataFrame(pruned, "query_id long, pattern string")
        cand = _candidates(post, gram_rows, max_grams)
        parts.append(
            cand.join(F.broadcast(pats), "query_id")
            .join(d, "doc_id")
            .filter(F.expr("regexp_like(text, pattern)"))
            .select("query_id", "doc_id")
        )
    if scan:
        sq = spark.createDataFrame(scan, "query_id long, pattern string")
        parts.append(
            d.crossJoin(F.broadcast(sq))  # labeled exact fallback, tiny side
            .filter(F.expr("regexp_like(text, pattern)"))
            .select("query_id", "doc_id")
        )
    if not parts:
        return spark.createDataFrame([], "query_id long, doc_id long")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
