"""Deterministic, engine-reproducible sampling over the documents table:
Bernoulli hash-sampling, stratified sampling, and train/test splits.

A training-data pipeline needs samples that are (a) reproducible across
runs and engines (an auditor must be able to re-derive exactly which
rows were selected), (b) stable under repartitioning and cluster
resizing, and (c) computable without a shuffle. Spark's ``df.sample``
satisfies none of these — it draws from a per-partition RNG stream, so
output changes with the partition layout. The reference has no sampling
surface at all (its corpus is a fixed TSV, /root/reference/src/table.cpp
loads everything); this module is part of the §F "absent from
reference" pipeline surface.

The mechanism is the md5-hex-threshold trick this repo already uses for
MinHash lanes (dedup.py): ``bucket = substr(md5(key || ':' || salt), 1, 8)``
is a uniformly-distributed lowercase-hex string, and for FIXED-WIDTH
lowercase hex, lexicographic order == numeric order — so
``bucket < hex(floor(rate * 16^8))`` is an exact Bernoulli(rate) keep
decision that DuckDB, Spark, or any engine with md5 evaluates
bit-identically. No floats anywhere.

Scale shape (100 TB): every operator here is a pure map-side projection
+ filter — no shuffle, no aggregation, no window; Catalyst keeps it
inside one WholeStageCodegen span fused into the scan. Sampling 100 TB
costs one pass regardless of rate. The ``salt`` parameter derives
independent samples from the same corpus (e.g. eval folds) without any
state; a salted re-run is the only way to "reseed".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET_SPACE = 16 ** 8  # 8 lowercase-hex chars


def _stratum_key(value):
    """Deterministic sort key for stratum values that tolerates None
    (NULL strata are real in curation data): None sorts first."""
    return (value is not None, "" if value is None else str(value))


def rate_to_hex(rate: float) -> str:
    """The largest 8-hex-char bucket kept for a Bernoulli *rate*:
    strings strictly below it are kept. Exact for any rate in [0, 1]."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return "g"  # lexicographically above every 8-char hex string
    return format(int(rate * _BUCKET_SPACE), "08x")


def bucket_col(key_col: str, salt: str = "") -> F.Column:
    """The deterministic 8-hex-char sampling bucket for a row key."""
    return F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))), 1, 8
    )


def bucket_sql(key_col: str, salt: str = "") -> str:
    """The DuckDB/ANSI twin of :func:`bucket_col` (oracle building block)."""
    return f"substr(md5(concat(CAST({key_col} AS VARCHAR), ':{salt}')), 1, 8)"


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keeps each row iff the md5 bucket
    of its key falls below ``rate``. Same input + same salt → the same
    rows, on any engine, any partitioning, any cluster size."""
    if rate >= 1.0:
        return df
    return df.filter(bucket_col(key_col, salt) < F.lit(rate_to_hex(rate)))


def split_train_test(
    df: DataFrame, test_rate: float, key_col: str = "doc_id", salt: str = "split"
) -> DataFrame:
    """Adds a ``split`` column ('test' below the threshold, else 'train').
    Train and test are disjoint and exhaustive BY CONSTRUCTION (one
    threshold compare), and membership is stable when rows are added:
    an existing row never migrates between splits as the corpus grows —
    the property per-partition RNG sampling cannot give."""
    thr = rate_to_hex(test_rate)
    return df.withColumn(
        "split",
        F.when(bucket_col(key_col, salt) < F.lit(thr), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli rates (e.g. downsample dominant languages,
    keep all of the rare ones) in one map-side pass. *rates* maps a
    stratum value to its keep-rate; strata not listed get
    *default_rate*. The per-stratum threshold is resolved with an
    inlined CASE (a handful of literals — never a join), so the plan
    stays a scan + filter even with thousands of strata. A ``None`` key
    in *rates* matches NULL strata (a plain ``== NULL`` compare would
    silently drop them at *default_rate*)."""
    thr = F.lit(rate_to_hex(default_rate))
    for value, rate in sorted(rates.items(), key=lambda kv: _stratum_key(kv[0])):
        cond = (
            F.col(stratum_col).isNull()
            if value is None
            else F.col(stratum_col) == value
        )
        thr = F.when(cond, F.lit(rate_to_hex(rate))).otherwise(thr)
    return df.filter(bucket_col(key_col, salt) < thr)


def temperature_rates(
    counts: dict[str, int], temperature: float, total_target: int
) -> dict[str, float]:
    """Per-group keep rates for temperature-based mixture sampling (the
    multilingual-pretraining rule, e.g. mT5/XLM-R): sampling probability
    q_g ∝ n_g^(1/T) normalized, so T>1 flattens the mix toward rare
    groups and T=1 keeps natural proportions; the keep rate is the
    target group size over the actual size, capped at 1 (this op only
    downsamples — upsampling is a repeat-factor at shard-writing time).
    Pure driver-side float math over the (tiny) census, iterated in
    sorted group order so engine and oracle derive bit-identical
    thresholds from it."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    if not counts:
        return {}
    inv = 1.0 / temperature
    items = sorted(counts.items(), key=lambda kv: _stratum_key(kv[0]))
    weights = {g: float(n) ** inv for g, n in items if n > 0}
    order = sorted(weights, key=_stratum_key)
    z = sum(weights[g] for g in order)
    return {
        g: min(1.0, (total_target * weights[g] / z) / counts[g]) for g in order
    }


def mixture_sample(
    df: DataFrame,
    temperature: float,
    total_target: int,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Temperature-based data mixing in two steps: one tiny census
    (groupBy count — rows = #groups, never corpus-sized) collected to
    the driver, then the same map-side inlined-CASE hash filter as
    :func:`stratified_sample`. The corpus itself is never shuffled and
    the kept set is deterministic and engine-reproducible."""
    counts = {
        r[stratum_col]: r["n"]
        for r in df.groupBy(stratum_col).agg(F.count("*").alias("n")).collect()
    }
    rates = temperature_rates(counts, temperature, total_target)
    return stratified_sample(
        df, rates, stratum_col=stratum_col, key_col=key_col, salt=salt
    )


def stratified_sample_sql(
    table: str,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
    select: str = "*",
) -> str:
    """The DuckDB oracle twin of :func:`stratified_sample`."""
    cases = " ".join(
        (
            f"WHEN {stratum_col} IS NULL THEN '{rate_to_hex(r)}'"
            if v is None
            else f"WHEN {stratum_col} = '{v}' THEN '{rate_to_hex(r)}'"
        )
        for v, r in sorted(rates.items(), key=lambda kv: _stratum_key(kv[0]))
    )
    return (
        f"SELECT {select} FROM {table} WHERE {bucket_sql(key_col, salt)} < "
        f"(CASE {cases} ELSE '{rate_to_hex(default_rate)}' END)"
    )
