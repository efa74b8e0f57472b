"""Tokenized training-shard materialization: the last pipeline stage —
registry tokenizer → vocabulary ids → concat-and-chunk packing →
fixed-length token-id chunks written as shard-partitioned parquet.

Composition of existing machinery, end to end on the cluster:
``tokenizer.make_tokenize_iterator`` (the build path's Arrow-batched
positional tokenizer, any registered mode incl. a learned BPE vocab),
``packing.pack_from_lengths`` (the distributed two-phase prefix sum),
and a bounded per-chunk assembly (collect_list is capped at chunk_len
elements by construction — never a whole-corpus or whole-doc state).

Scale shape (fused path, the default): token→id mapping happens INSIDE
the tokenize Arrow pass against a Spark-broadcast vocab dict (model-
sized — BPE: ~32-128k entries), so each doc leaves Python already as
its id array and NO token-level exchange exists anywhere — the only
corpus-scale shuffles are the doc-length prefix sum and the per-chunk
groupBy assembling ≤ chunk_len ids. The tokenizer pass was already
Python (the registry contract), so the dict lookup rides a pass that
exists anyway; at 100 TB this removes the two token-level shuffles
(vocab join + per-doc collect_list regroup) the join path pays.
``broadcast_vocab=False`` keeps the join path — the right shape when
the vocabulary itself is too big to broadcast. Deriving the vocabulary
from the corpus adds one census pass (map-side partial agg to the
dictionary-sized term table; its rank window is one reducer — fine for
learned vocabs; pass ``vocab`` explicitly if the raw term universe is
itself huge).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tokenizer import make_tokenize_iterator
from .packing import pack_from_lengths

_TOK_SCHEMA = "doc_id long, pos int, term string, offset int, length int, dup int"


def derive_vocab(
    tokens: DataFrame, max_vocab: int | None = None, min_freq: int = 1
) -> DataFrame:
    """(term, token_id) with dense ids ranked by (df desc, term asc) —
    deterministic on any engine (binary string collation both sides).

    ``max_vocab`` / ``min_freq`` make the model-size assumption EXPLICIT:
    downstream the vocab is collect()ed into a broadcast dict for the
    fused id-lookup pass (the same model-sized bound every tokenizer
    broadcast makes — fine at 32-256k entries, driver-fatal on an
    unbounded raw-term universe at 100 TB). Real pipelines should pass
    ``max_vocab`` (the TakeOrdered cap means only that many rows can
    ever reach the driver); the unbounded default is kept for the
    small-corpus oracle paths, whose vocab IS the whole universe."""
    if min_freq < 1:
        raise ValueError(f"min_freq must be >= 1, got {min_freq}")
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    out = tokens.groupBy("term").agg(F.count("*").alias("n"))
    if min_freq > 1:
        out = out.filter(F.col("n") >= min_freq)
    out = out.withColumn("token_id", F.row_number().over(w) - 1).select(
        "term", "token_id"
    )
    if max_vocab is not None:
        if max_vocab < 1:
            raise ValueError(f"max_vocab must be >= 1, got {max_vocab}")
        out = out.filter(F.col("token_id") < max_vocab)
    return out


def _make_lower_terms_iterator(mode: str, id_col: str, text_col: str):
    """iterator[pd.DataFrame] -> iterator[pd.DataFrame] for mapInPandas:
    one row per token occurrence, a single python-str.lower()ed ``term``
    column — the vocab-census twin of the fused-ids pass, using the SAME
    case fold so derived vocab keys always hit the fused lookup."""
    import pandas as pd

    from ..tokenizer import get_tokenizer

    tok = get_tokenizer(mode)

    def fn(batches):
        for pdf in batches:
            out: list[str] = []
            for text in pdf[text_col].to_numpy():
                if text is None:
                    continue
                out.extend(t.term.lower() for t in tok.tokens(text))
            yield pd.DataFrame({"term": pd.Series(out, dtype="object")})

    return fn


def _make_fused_ids_iterator(mode: str, id_col: str, text_col: str, vocab_bc, oov_id: int):
    """iterator[pd.DataFrame] -> iterator[pd.DataFrame] for mapInPandas:
    one row per doc, (id, ids array) — tokenize AND vocab-id lookup fused
    into the single Arrow pass (the broadcast dict lives on the worker
    once, not per task). Docs with no tokens are skipped, matching the
    join path where they simply emit no token rows."""
    import pandas as pd

    from ..tokenizer import get_tokenizer

    tok = get_tokenizer(mode)

    def fn(batches):
        vm = vocab_bc.value
        for pdf in batches:
            out_ids: list[int] = []
            out_arrs: list[list[int]] = []
            for did, text in zip(pdf[id_col].to_numpy(), pdf[text_col].to_numpy()):
                if text is None:
                    continue
                arr = [vm.get(t.term.lower(), oov_id) for t in tok.tokens(text)]
                if arr:
                    out_ids.append(did)
                    out_arrs.append(arr)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(out_ids, dtype="int64"),
                    "ids": pd.Series(out_arrs, dtype="object"),
                }
            )

    return fn


def build_chunks(
    df: DataFrame,
    tokenizer: str = "ws",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_len: int = 128,
    chunks_per_shard: int = 256,
    vocab: DataFrame | None = None,
    oov_id: int = -1,
    broadcast_vocab: bool = True,
    n_buckets: int | None = None,
) -> DataFrame:
    """The packed-chunk table: (shard_id, chunk_id, n_tokens, token_ids).
    Every chunk except the global last holds exactly ``chunk_len`` ids;
    ids come from ``vocab`` (or a corpus-derived one), OOV terms map to
    ``oov_id``. Deterministic: doc order is id order, within-doc order is
    token position, vocabulary rank is (df desc, term asc).

    ``broadcast_vocab=True`` (default) takes the FUSED path — the id
    lookup happens inside the tokenize Arrow pass against a broadcast
    vocab dict, so no token-level shuffle exists; ``False`` takes the
    join path (token explode ⋈ vocab → per-doc regroup), the right
    shape only when the vocabulary is too big to broadcast. The fused
    path case-folds in Python end to end (census AND lookup — they can
    never diverge from each other); the join path folds with JVM
    lower(). The two paths produce identical chunks whenever those
    folds agree — all ASCII and virtually all real text; the handful of
    divergent codepoints are Unicode-version skew between the Python
    and JVM runtimes (pinned in tests/test_shards.py)."""
    if chunks_per_shard < 1:
        raise ValueError(f"chunks_per_shard must be >= 1, got {chunks_per_shard}")
    if broadcast_vocab:
        # fused path: the id lookup rides the tokenize Arrow pass — no
        # token-level exchange at all (see module docstring). Collecting
        # the vocab is the same model-sized assumption broadcast makes,
        # and it is EAGER: build_chunks materializes the vocab (one
        # census pass when vocab=None) at call time rather than at
        # action time; with vocab=None the corpus is tokenized twice
        # (census + fused pass) — pass vocab explicitly to pay one.
        if vocab is None:
            # census folds case in PYTHON (same str.lower the fused
            # lookup and the tokenizer's own dup-counting use) so the
            # derived keys and the lookup keys cannot diverge on
            # codepoints where JVM and Python Unicode versions disagree
            vocab = derive_vocab(
                df.select(F.col(id_col), F.col(text_col)).mapInPandas(
                    _make_lower_terms_iterator(tokenizer, id_col, text_col),
                    "term string",
                )
            )
        vmap = {r["term"]: int(r["token_id"]) for r in vocab.collect()}
        bc = df.sparkSession.sparkContext.broadcast(vmap)
        fused_fn = _make_fused_ids_iterator(tokenizer, id_col, text_col, bc, int(oov_id))
        ids = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
            fused_fn, f"{id_col} long, ids array<long>"
        )
    else:
        tok_fn = make_tokenize_iterator(tokenizer, id_col, text_col)
        tokens = (
            df.select(F.col(id_col), F.col(text_col))
            .mapInPandas(tok_fn, _TOK_SCHEMA)
            .select(F.col(id_col), "pos", F.lower(F.col("term")).alias("term"))
        )
        if vocab is None:
            vocab = derive_vocab(tokens)
        ids = (
            tokens.join(vocab, "term", "left")
            .select(
                F.col(id_col),
                "pos",
                F.coalesce(F.col("token_id"), F.lit(int(oov_id))).cast("long").alias("tid"),
            )
            .groupBy(id_col)
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tid"))), lambda x: x["tid"]
                ).alias("ids")
            )
        )
    dl = ids.select(F.col(id_col), F.size("ids").cast("long").alias("n_tokens"))
    seg = pack_from_lengths(dl, id_col=id_col, chunk_len=chunk_len, n_buckets=n_buckets)
    pieces = seg.join(ids, id_col).select(
        "chunk_id",
        "chunk_offset",
        F.slice(F.col("ids"), F.col("doc_offset") + 1, F.col("seg_len")).alias("seg_ids"),
    )
    chunks = pieces.groupBy("chunk_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_offset", "seg_ids"))),
                lambda x: x["seg_ids"],
            )
        ).alias("token_ids")
    )
    return chunks.select(
        F.floor(F.col("chunk_id") / chunks_per_shard).alias("shard_id"),
        "chunk_id",
        F.size("token_ids").cast("long").alias("n_tokens"),
        "token_ids",
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    **kwargs,
) -> dict:
    """Write the chunk table as parquet partitioned by shard_id and
    return a summary census (chunks, shards, tokens, full/tail split).
    Idempotent overwrite; re-reading gives byte-identical chunks because
    every ordering in build_chunks is pinned."""
    chunks = build_chunks(df, **kwargs)
    chunks.write.mode("overwrite").partitionBy("shard_id").parquet(out_dir)
    spark = df.sparkSession
    back = spark.read.parquet(out_dir)
    chunk_len = int(kwargs.get("chunk_len", 128))
    row = back.agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct("shard_id").alias("n_shards"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum((F.col("n_tokens") == chunk_len).cast("int")).alias("n_full"),
    ).collect()[0]
    return {
        "path": os.path.abspath(out_dir),
        "chunk_len": chunk_len,
        "n_chunks": int(row["n_chunks"]),
        "n_shards": int(row["n_shards"]),
        "n_tokens": int(row["n_tokens"] or 0),
        "n_full_chunks": int(row["n_full"] or 0),
    }
