"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (each op is shaped for 100 TB, not just the test tables):

* exact     — one hash-groupBy; the group key is a 128-bit digest so the
  shuffle carries 16 B + id per row.
* MinHash   — signatures are per-row column algebra (no shuffle); LSH
  banding turns near-dup search into an equi-join on (band, band_key),
  i.e. a shuffle keyed by tiny strings instead of an O(n²) cross join.
* SimHash   — per-row 32-bit signature via bit-vote column algebra;
  ``simhash_pairs`` = banded-prefix equi-join + exact Hamming filter
  (EXACT for radius < n_bands by pigeonhole, never a cross join).
* n-gram Jaccard — exploded-shingle self-equi-join + count ratio;
  bounded by shingle frequency (cap hot shingles like hot terms).
* embedding cosine — ``embedding_neardup_pairs`` brute-force baseline
  (oracle-checked) + ``embedding_neardup_pairs_lsh`` banded
  hyperplane-LSH bucket join (the 100 TB shape; exact precision,
  tunable recall).

The min-over-md5-hex MinHash trick keeps signatures ANSI-SQL-expressible
(both Spark and DuckDB produce identical lowercase hex md5), so the DuckDB
oracle can verify bit-identical signatures.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import WS_SPLIT

_LOG = logging.getLogger(__name__)

# previous hot-shingle census kept cached for reuse within ONE pair
# computation; the next _shingle_pair_counts call evicts it so a
# long-lived session never accumulates census blocks (ADVICE r4).
# persist() (not localCheckpoint) keeps lineage, so a still-held result
# plan from an earlier call recomputes instead of failing after evict.
_PREV_HOT: list[DataFrame] = []


def release_cached() -> None:
    """Evict the cached hot-shingle census from executor storage (safe
    any time — plans that still reference it recompute from lineage)."""
    while _PREV_HOT:
        _PREV_HOT.pop().unpersist()


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups keyed by md5(text): (fingerprint, n_docs,
    min_doc_id). Groups of size 1 are included (full census)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def _tokens(text_col: str):
    """Lowercased whitespace token array (SQL-expressible)."""
    return F.filter(F.split(F.lower(F.col(text_col)), WS_SPLIT), lambda x: x != "")


def _shingles_of(toks_col, n: int):
    """Word n-gram shingle array from a MATERIALIZED token-array column:
    slide with transform(sequence(...)). The argument must be a plain
    column reference — passing the tokenize expression inline makes
    Catalyst re-evaluate it inside the per-shingle slice() lambda,
    O(L²) per row (see minhash_signatures)."""
    k = F.size(toks_col) - (n - 1)
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(toks_col, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle: int = 3,
) -> DataFrame:
    """MinHash signature per doc: lane i = min over shingles of the i-th
    32-bit (8-hex-char) chunk of md5(⌊i/4⌋ || ':' || shingle). Pure
    column algebra; deterministic; cross-engine (fixed-width lowercase
    hex compares identically as strings, order-isomorphic to the 32-bit
    value).

    ONE md5 evaluation feeds FOUR lanes: chunking the 128-bit digest
    computes num_hashes/4 md5s per shingle instead of num_hashes — a
    pure CPU reduction that grows with corpus size (at sf0.1 the stage
    is overhead-dominated and the wall-clock change is within noise;
    the hash-evaluation count is the 100 TB argument). 32-bit lanes are
    the standard minhash width (Spark ML's MinHashLSH likewise);
    min-collisions inside a doc need ~2^16 distinct shingles to matter.

    Staged as tokens → shingles → md5 arrays → signatures in SEPARATE
    projections: inlining everything into one projection makes Catalyst
    re-evaluate split(lower(text)) inside every per-shingle slice()
    lambda — O(L²) string-splitting per doc, ×num_hashes — which
    measured ~10× slower at 5k docs; likewise the staged _h{j} arrays
    are each referenced by four array_min lanes, so CollapseProject
    keeps them apart and md5 runs once per (shingle, j)."""
    tok_df = df.select(F.col(id_col), _tokens(text_col).alias("_toks"))
    sh_df = tok_df.select(
        F.col(id_col), _shingles_of(F.col("_toks"), shingle).alias("_sh")
    )
    n_md5 = (num_hashes + 3) // 4

    def hasher(j: int):
        prefix = f"{j}:"
        # NB: the lambda must be unary — F.transform treats a second
        # parameter as the element-index argument
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    h_df = sh_df.select(
        F.col(id_col),
        *[
            F.transform(F.col("_sh"), hasher(j)).alias(f"_h{j}")
            for j in range(n_md5)
        ],
    )
    cols = [F.col(id_col)]
    for i in range(num_hashes):
        j, r = divmod(i, 4)
        off = 1 + 8 * r

        def lane(o: int):
            return lambda h: F.substring(h, o, 8)

        cols.append(
            F.array_min(F.transform(F.col(f"_h{j}"), lane(off))).alias(f"mh_{i}")
        )
    # docs shorter than one shingle have no signature: omit them (matches
    # the SQL oracle; also prevents an all-NULL LSH band that would bucket
    # every degenerate doc together — a skew bomb at corpus scale)
    return h_df.select(*cols).filter(F.col("mh_0").isNotNull())


def lsh_band_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle: int = 3,
) -> DataFrame:
    """LSH bucket membership: (id, band, band_key) rows — the banded
    MinHash signature exploded one row per band (band_key = md5 of the
    band's signature lanes). The shared primitive under the batch pair
    join (lsh_candidate_pairs) and the streaming bucket store
    (streaming/dedup_stream.py): two docs are candidate near-dups iff
    they share a (band, band_key) row. One projection + posexplode, so
    the shingle/signature pipeline runs once, not once per band."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle)
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)],
                )
            )
            for b in range(bands)
        ]
    )
    return sig.select(F.col(id_col), F.posexplode(band_keys).alias("band", "band_key"))


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle: int = 3,
    collapse_exact: bool = False,
) -> DataFrame:
    """MinHash-LSH: band the signature, equi-join on (band, key) →
    candidate near-dup pairs (a < b). The join is the scale path: hot
    bands behave like hot terms and are handled by AQE skew join.

    ``collapse_exact=True`` is the 100 TB shape: exact-duplicate texts
    (common-crawl-style corpora have million-doc identical clusters) are
    first collapsed to their min-id representative, so an identical
    cluster costs one row instead of O(n²) intra-bucket pairs; the
    returned pairs relate representatives, and exact members are
    recovered from ``exact_dup_groups`` without ever materialising the
    quadratic expansion. Default False matches the DuckDB oracle."""
    if collapse_exact:
        keep = (
            df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
            .groupBy("fp")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col)
        )
        df = df.join(keep, id_col, "left_semi")
    banded = lsh_band_rows(df, id_col, text_col, num_hashes, bands, shingle)
    # self-join as sort-merge over one explicit shuffle on the band key:
    # both sides canonicalize to the SAME Exchange, so the whole
    # tokenize→shingle→minhash pipeline runs ONCE and the second side is
    # a ReusedExchange — a broadcast join here would instead recompute the
    # signature pipeline per side (measured ~2× the whole-stage cost)
    banded = banded.repartition(F.col("band"), F.col("band_key"))
    a = banded.alias("a")
    b = banded.alias("b").hint("shuffle_merge")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard similar pairs: explode distinct shingles,
    self-equi-join on shingle, |∩| / (|A|+|B|-|∩|) ≥ threshold.

    Tokens are staged as a column before shingling (see _shingles_of),
    and the self-join sort-merges over ONE explicit shuffle on the
    shingle so the exploded pipeline runs once (ReusedExchange) instead
    of once per join side.

    ``max_shingle_df`` is the hot-shingle cap (the 100 TB guard): a
    shingle present in d docs emits O(d²) join rows, so one boilerplate
    line ("#include <stdio.h>") in a web-scale corpus is a cartesian
    bomb. With the cap set, shingles whose document frequency exceeds it
    are dropped from BOTH the intersection and the per-doc sizes —
    i.e. Jaccard is computed over the sub-universe of shingles with
    df ≤ cap (they carry ~no similarity signal anyway: a shingle in
    half the corpus says nothing about any particular pair). The census
    is one groupBy on the already-exploded shingles; the hot set is
    tiny by construction, so the filter is a broadcast anti-join. The
    dropped mass (#hot shingles, #occurrence rows removed) is logged."""
    counts = _shingle_pair_counts(df, id_col, text_col, shingle, max_shingle_df)
    return (
        counts.withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT pairs (Broder 1997's c(A,B) =
    |S(A)∩S(B)| / |S(A)|): pairs where one doc's shingle set is mostly
    inside the other's — the quote / sub-document / superset shape
    Jaccard structurally misses (a tweet quoted inside a long article
    has Jaccard ≈ |tweet|/|article| ≈ 0 but containment ≈ 1; the
    set-level cousin of what ExactSubstr's span census catches at the
    token level, dedup.duplicate_spans / Lee et al. 2022).

    Keeps pairs with ``max(cont_a, cont_b) >= threshold`` where
    ``cont_a = round(n_common/n_a, 6)`` (fraction of A inside B) and
    ``cont_b`` likewise; returns (id_a, id_b, n_common, cont_a,
    cont_b, containment) with id_a < id_b.

    Scale shape: identical to :func:`ngram_jaccard_pairs` — the two
    share `_shingle_pair_counts` (one explicit shingle shuffle reused
    by sizes and both join sides, optional hot-shingle df cap), only
    the final score differs. The cap note applies doubly here: a
    contained-everywhere boilerplate doc IS the hot-shingle bomb, and
    with the cap its shingles leave both numerator and denominator."""
    counts = _shingle_pair_counts(df, id_col, text_col, shingle, max_shingle_df)
    cont_a = F.round(F.col("n_common") / F.col("n_a"), 6)
    cont_b = F.round(F.col("n_common") / F.col("n_b"), 6)
    return (
        counts.withColumn("cont_a", cont_a)
        .withColumn("cont_b", cont_b)
        .withColumn("containment", F.greatest("cont_a", "cont_b"))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "n_common", "cont_a", "cont_b", "containment")
    )


def _shingle_pair_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle: int,
    max_shingle_df: int | None,
) -> DataFrame:
    """Shared exact pair machinery behind ngram_jaccard_pairs /
    containment_pairs: (id_a, id_b, n_common, n_a, n_b) for every pair
    sharing ≥ 1 (surviving) shingle, id_a < id_b. See
    ngram_jaccard_pairs for the shuffle-reuse and hot-cap rationale."""
    tok_df = df.select(F.col(id_col), _tokens(text_col).alias("_toks"))
    sh = tok_df.select(
        F.col(id_col),
        F.explode(F.array_distinct(_shingles_of(F.col("_toks"), shingle))).alias("sh"),
    )
    if max_shingle_df is not None:
        # df census -> hot set -> broadcast anti-join, mirroring the
        # posting skew census in build.py (pow2 doc-range sharding). The
        # hot set stays a DATAFRAME: persist() (materialized by the
        # count action just below) lets the anti-join's broadcast build
        # side read cached blocks instead of re-running the exploded
        # pipeline — and, unlike the previous collect()-and-reinline
        # form, the set itself never round-trips through the driver.
        # Bounded by occurrences/cap in friendly data, but against
        # adversarial boilerplate (every shingle hot) that bound is the
        # whole shingle universe — at 100 TB that must not be a driver
        # materialization. Only two scalar counts (dropped shingles /
        # occurrence mass) reach the driver, for the log line.
        # The PREVIOUS call's census is evicted here (not ours — the
        # caller's returned plan still references it lazily), so blocks
        # never pile up across calls in a long-lived session.
        release_cached()
        hot = (
            sh.groupBy("sh").agg(F.count("*").alias("sdf"))
            .filter(F.col("sdf") > max_shingle_df)
            .persist()
        )
        _PREV_HOT.append(hot)
        n_hot, occ_hot = hot.agg(
            F.count(F.lit(1)), F.coalesce(F.sum("sdf"), F.lit(0))
        ).first()
        _LOG.info(
            "ngram_jaccard_pairs hot-shingle cap df>%d: dropped %d shingles, "
            "%d occurrence rows",
            max_shingle_df, int(n_hot), int(occ_hot),
        )
        sh = sh.join(F.broadcast(hot.select("sh")), "sh", "left_anti")
        sizes = None  # from the shared shuffle below
    else:
        # per-doc distinct-shingle counts as row-local column algebra — no
        # third evaluation of the exploded pipeline, no extra shuffle
        sizes = tok_df.select(
            F.col(id_col),
            F.size(F.array_distinct(_shingles_of(F.col("_toks"), shingle))).alias("n_sh"),
        )
    sh = sh.repartition(F.col("sh"))
    if sizes is None:
        # capped path: per-doc surviving-shingle counts aggregate OVER the
        # repartition exchange, so sizes, join-left, and join-right all
        # read ONE shuffle write of the exploded+capped pipeline
        # (ReusedExchange) — the Jaccard denominator matches the capped
        # universe at no extra evaluation.
        sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b").hint("shuffle_merge")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return common.join(sa, "id_a").join(sb, "id_b")


SIMHASH_BITS = 32


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash over whitespace tokens weighted by tf.

    Bit j of md5(token) is derived from its hex nibbles (SQL-expressible
    on both engines: strpos('0123456789abcdef', nibble)); each bit votes
    +tf / -tf; signature bit = vote > 0."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), WS_SPLIT), lambda x: x != "")
    t = df.select(F.col(id_col), F.explode(toks).alias("term"))
    tf = t.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    tf = tf.withColumn("h", F.md5(F.col("term")))
    hexmap = "0123456789abcdef"
    agg_cols = []
    for j in range(SIMHASH_BITS):
        nib_val = F.expr(f"instr('{hexmap}', substring(h, {1 + j // 4}, 1)) - 1")
        bit = F.shiftright(nib_val, 3 - j % 4) % 2
        vote = F.when(bit == 1, F.col("tf")).otherwise(-F.col("tf"))
        agg_cols.append(F.sum(vote).alias(f"v{j}"))
    votes = tf.groupBy(id_col).agg(*agg_cols)
    sig = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        sig = sig + F.when(F.col(f"v{j}") > 0, F.lit(1 << (SIMHASH_BITS - 1 - j))).otherwise(0)
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: banded-prefix candidate join + exact
    Hamming filter — EXACT (full recall) for ``max_hamming < n_bands``.

    Pigeonhole: ≤ max_hamming differing bits spread over n_bands equal-
    width slices of the signature leave at least one slice identical, so
    the (band, slice-value) equi-join — a shuffle keyed by small ints,
    never a cross product — finds every qualifying pair; bit_count(xor)
    then filters candidates exactly. Same banded-join shape as the
    MinHash and hyperplane-LSH paths (one reused exchange)."""
    if max_hamming >= n_bands:
        raise ValueError("exactness needs max_hamming < n_bands (pigeonhole)")
    if SIMHASH_BITS % n_bands:
        raise ValueError("n_bands must divide the signature width")
    width = SIMHASH_BITS // n_bands
    sig = simhash(df, id_col, text_col)
    keys = F.array(*[
        F.shiftrightunsigned(F.col("simhash"), b * width).bitwiseAND(F.lit((1 << width) - 1))
        for b in range(n_bands)
    ])
    banded = sig.select(
        F.col(id_col), F.col("simhash"), F.posexplode(keys).alias("band", "key")
    ).repartition(F.col("band"), F.col("key"))
    a = banded.alias("a")
    b = banded.alias("b").hint("shuffle_merge")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t).

    Brute-force pair join — the exact baseline the DuckDB oracle checks
    and the recall reference for ``embedding_neardup_pairs_lsh`` (the
    100 TB shape: bucket-local join, no O(n²) cross product)."""
    from .simsearch import _dot, _norm

    v = df.select(F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("nrm"))
    a = v.alias("a")
    b = v.alias("b")
    dot = _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn("cosine", F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cosine",
        )
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
    n_bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Scale path for embedding near-dup: banded random-hyperplane LSH.

    ``n_bands`` independent sign-bit sketches of ``n_planes`` planes each
    (seeded ``seed + band`` — same deterministic plane construction as
    simsearch.hyperplanes); a pair collides if ANY band agrees, so for
    collision probability p = 1 - θ/π per plane the pair is found with
    1 - (1 - p^n_planes)^n_bands (≈0.95 at cosine 0.95 with 6×4).
    Candidates come from a bucket-equi-join (shuffle keyed by
    (band, bucket) — never a cross product; hot buckets are split by AQE
    skew join like hot terms), then the exact cosine filter keeps true
    pairs, so precision is exact and only recall is approximate —
    measured against the brute-force path in tests."""
    from .simsearch import _dot, _norm, hyperplanes

    band_cols = []
    for band in range(n_bands):
        bucket = F.lit(0).cast("long")
        for p, plane in enumerate(hyperplanes(dim, n_planes, seed + band)):
            arr = F.array(*[F.lit(x) for x in plane])
            bucket = bucket + F.when(_dot(F.col(vec_col), arr) > 0, F.lit(1 << p)).otherwise(0)
        band_cols.append(bucket)
    banded = df.select(
        F.col(id_col), F.posexplode(F.array(*band_cols)).alias("band", "bucket")
    ).repartition(F.col("band"), F.col("bucket"))
    a = banded.alias("a")
    b = banded.alias("b").hint("shuffle_merge")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    v = df.select(F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("nrm"))
    av = v.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), F.col("nrm").alias("_na")
    )
    bv = v.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), F.col("nrm").alias("_nb")
    )
    return (
        cand.join(av, "id_a")
        .join(bv, "id_b")
        .withColumn(
            "cosine", F.round(_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def resolve_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components over candidate pairs -> (doc_id, cluster_id),
    cluster_id = min doc_id in the component. The last stage of every dedup
    path: exact/LSH/SimHash/Jaccard emit PAIRS, but dropping duplicates
    needs transitive CLUSTERS (a~b, b~c => keep one of {a,b,c}).

    Scale shape: FRONTIER-based min-label propagation. Each round joins
    the symmetric edge list against only the labels that CHANGED last
    round (the frontier), not the full label table — after round one the
    frontier collapses to component boundaries, so per-round shuffle
    volume decays geometrically instead of staying O(V). Rounds needed =
    O(component diameter); near-dup clusters are dense (LSH emits most
    clique edges), so diameter is small even when components are huge —
    web-dedup runs of the equivalent MapReduce algorithm (Rastogi et al.,
    "Finding Connected Components in Map-Reduce", ICDE'13 hash-to-min
    family) converge in <10 rounds at billions of edges. Lineage is
    truncated every round with localCheckpoint so the plan does not grow
    with iterations; the edge list is cached once and reused. Convergence
    is detected exactly (empty frontier), not by a fixed round count.
    """
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges.cache()
    # initial label: min(self, direct neighbours); every node starts dirty
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("label"))
        .withColumnRenamed("src", "node")
        .localCheckpoint()
    )
    frontier = labels
    try:
        converged = _propagate(edges, labels, frontier, max_iters)
    finally:
        # unpersist on EVERY exit path — a Spark job failure mid-iteration
        # must not leak the cached edge list for the session lifetime
        edges.unpersist()
    return converged.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def _propagate(edges, labels, frontier, max_iters: int) -> DataFrame:
    for _ in range(max_iters):
        # step 1 — neighbour-min from the frontier only
        prop = (
            edges.join(
                frontier.withColumnRenamed("node", "fnode"),
                edges["dst"] == F.col("fnode"),
            )
            .groupBy("src")
            .agg(F.min("label").alias("cand"))
        )
        step1 = labels.join(prop, labels["node"] == prop["src"], "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("cand", "label")).alias("l1"),
            F.col("label").alias("l0"),
        )
        # step 2 — pointer jump: l2(v) = min(l1(v), l1(l1(v))). Labels are
        # always node ids present in the table, so the self-join resolves;
        # this halves label-chain length each round, turning O(diameter)
        # convergence into O(log diameter) (Shiloach-Vishkin style) —
        # the difference between ~20 rounds and ~6 on sparse chain-y
        # graphs, while clique-dense LSH graphs still finish in 2-3.
        jump = step1.select(F.col("node").alias("jnode"), F.col("l1").alias("jl"))
        merged = (
            step1.join(jump, step1["l1"] == jump["jnode"], "left")
            .select(
                "node",
                F.least(F.col("l1"), F.coalesce("jl", "l1")).alias("label"),
                "l0",
            )
            .withColumn("_chg", F.col("label") < F.col("l0"))
            .drop("l0")
            .localCheckpoint()
        )
        frontier = merged.filter(F.col("_chg")).select("node", "label")
        labels = merged.drop("_chg")
        if frontier.count() == 0:
            return labels
    # silently returning unconverged labels would split real clusters —
    # with pointer jumping, rounds ~ log2(diameter), so 50 covers any
    # graph that fits in a datacenter; hitting this means a bug
    raise RuntimeError(
        f"resolve_clusters did not converge within {max_iters} rounds"
    )


def dedup_documents(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Materialized dedup: drop every row whose id sits in a duplicate
    cluster and is not that cluster's canonical (min) id. One anti-join
    against the (small relative to the corpus) non-canonical id set —
    broadcastable whenever duplicates are <~ tens of millions; Spark's
    AQE converts the anti-join to broadcast automatically when the
    victim list is under the threshold."""
    victims = (
        resolve_clusters(pairs, id_a=id_a, id_b=id_b)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return df.join(victims, id_col, "left_anti")


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = r"\n",
    join_sep: str = "\n",
    mode: str = "drop_repeated",
    max_df: int = 1,
) -> DataFrame:
    """Paragraph/line-level dedup inside documents (the CCNet /
    RefinedWeb boilerplate-removal step): split each doc on ``sep``,
    fingerprint the trimmed paragraphs, then REWRITE each doc keeping

    * ``mode="drop_repeated"`` — only the globally FIRST occurrence of
      each paragraph (min (doc_id, pos)); later copies are cut (CCNet's
      rule), or
    * ``mode="drop_boilerplate"`` — every copy of any paragraph whose
      corpus df exceeds ``max_df`` (kills nav bars / license headers
      outright, keeps genuinely unique text).

    Returns (id, text rewritten, n_paras, n_kept); docs whose every
    paragraph is cut come back with empty text, not dropped — the caller
    decides the row's fate.

    Scale shape: the census is ONE groupBy on the 16-byte fingerprint
    whose map-side partial aggregation collapses the hot boilerplate
    keys before the exchange (deliberately NOT a window over the
    fingerprint — the billion-copy nav-bar paragraph would put a whole
    partition on one reducer); the keep decision is a fingerprint-keyed
    equi-join of paragraphs against that census (at most one census row
    per distinct paragraph), and reassembly is a per-doc groupBy whose
    collect_list is bounded by the doc's own paragraph count."""
    if mode not in ("drop_repeated", "drop_boilerplate"):
        raise ValueError(f"unknown mode {mode!r}")
    paras = (
        df.select(F.col(id_col), F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"))
        .withColumn("para", F.trim("para"))
        .filter(F.col("para") != "")
        .withColumn("fp", F.md5("para"))
    )
    census = paras.groupBy("fp").agg(
        F.count("*").alias("pdf"),
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first"),
    )
    joined = paras.join(census, "fp")
    if mode == "drop_repeated":
        keep = (F.col("first")[id_col] == F.col(id_col)) & (
            F.col("first")["pos"] == F.col("pos")
        )
    else:
        keep = F.col("pdf") <= max_df
    kept = joined.filter(keep)
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            join_sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))), lambda x: x["para"]
            ),
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    totals = paras.groupBy(id_col).agg(F.count("*").alias("n_paras"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("text", F.lit("")).alias("text"),
            F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 5,
    min_occurrences: int = 2,
) -> DataFrame:
    """Exact-substring duplicate spans at token granularity — the
    ExactSubstr rule of Lee et al. 2021 ("Deduplicating Training Data
    Makes Language Models Better"): any token window that occurs
    ``min_occurrences``+ times ANYWHERE in the corpus (other docs or the
    same doc) is a duplicated region; overlapping/adjacent duplicated
    windows merge into maximal spans. Emits one row per merged span:
    (doc_id, span_start, span_end, span_len, n_windows) with 0-based
    token offsets, end exclusive — the downstream rewrite (cut the span,
    keep the remainder) is a trivial slice over these rows. The paper
    uses a suffix array on one machine; the distributed equivalent is a
    fixed-width window census, which finds exactly the duplicated
    regions of length >= window.

    Scale shape: windows are generated per-row (colocated explode), the
    census is ONE groupBy on a 128-bit window digest (shuffle carries
    16 B + nothing else; map-side partial agg collapses each doc's
    repeats first), and the dup-marking join is many-to-one against the
    DISTINCT-keyed census, so a boilerplate window repeated millions of
    times costs one census row, never a join blowup. Span merging is a
    gaps-and-islands window per doc (one doc_id-keyed shuffle carrying
    only the duplicated positions — at healthy dup rates a small
    fraction of the corpus). All SQL-expressible: oracle ``dup_spans``.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    # staged projections: materialize the token array before the
    # per-window slice() lambda, else Catalyst re-evaluates
    # split(lower(text)) per window — O(L²) (see minhash_signatures)
    tok_df = df.select(F.col(id_col), _tokens(text_col).alias("_toks"))
    grams = F.transform(_shingles_of(F.col("_toks"), window), lambda s: F.md5(s))
    pos_fp = tok_df.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "fp")
    )
    census = (
        pos_fp.groupBy("fp")
        .agg(F.count("*").alias("occ"))
        .filter(F.col("occ") >= min_occurrences)
    )
    dup_pos = pos_fp.join(census, "fp").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    gap = F.col("pos") - F.lag("pos", 1).over(w)
    islands = dup_pos.withColumn(
        "_new", F.when(gap.isNull() | (gap > window), 1).otherwise(0)
    ).withColumn("_island", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + window).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select(
            F.col(id_col),
            F.col("span_start").cast("long"),
            F.col("span_end").cast("long"),
            (F.col("span_end") - F.col("span_start")).cast("long").alias("span_len"),
            F.col("n_windows").cast("long"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 5,
    min_occurrences: int = 2,
) -> DataFrame:
    """Apply the ExactSubstr rewrite: cut every duplicate_spans region out
    of every document and reassemble the remainder (single-space joined —
    token-granularity rewrites are whitespace-normalizing by construction,
    like the training-shard tokenize path; original token CASE is kept,
    only span *detection* lowercases). This is the rule of Lee et al.'s
    released deduplicate-text-datasets tool: ALL occurrences of a
    duplicated region are removed, including the first (pair with
    paragraph_dedup's keep-first mode when one surviving copy is wanted).
    Emits (id, text, n_tokens, n_removed); docs that lose everything stay
    as empty-text rows (the downstream length filter decides).

    Scale shape: duplicate_spans does the census work (see there); the
    rewrite adds one tiny groupBy over the span rows (bounded by the dup
    volume, not the corpus), one doc_id equi-join of spans onto the
    corpus, and a per-row index-lambda filter over the token array —
    O(tokens × spans-in-doc) inside codegen, no Python. Oracle
    ``dup_spans_removed`` replays it relationally in DuckDB.
    """
    spans = duplicate_spans(
        df, id_col=id_col, text_col=text_col, window=window,
        min_occurrences=min_occurrences,
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    # coalesce NULL text to an empty token array — same empty-row
    # convention as paragraph_dedup (text='', counts 0), never NULL/-1
    toks = F.coalesce(
        F.filter(F.split(F.col(text_col), WS_SPLIT), lambda x: x != ""),
        F.array().cast("array<string>"),
    )
    joined = df.join(per_doc, id_col, "left").select(
        F.col(id_col),
        toks.alias("_toks"),
        F.coalesce(
            "_spans", F.array().cast("array<struct<span_start:long,span_end:long>>")
        ).alias("_spans"),
    )
    # F.filter's index lambda is 0-based — matching the 0-based span offsets
    kept = F.filter(
        F.col("_toks"),
        lambda x, i: ~F.exists(
            F.col("_spans"),
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("text"),
        F.size("_toks").cast("long").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("long").alias("n_removed"),
    )
