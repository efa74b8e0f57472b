"""Data-layout optimization: Z-order (Morton) clustering for
multi-column parquet pruning.

A 100 TB table is pruned at read time by parquet row-group / file
min-max statistics; sorting the write by ONE column gives tight ranges
on that column only. Interleaving the bits of several columns' bin ids
(the Z-order / Morton curve — Morton 1966, the technique behind Delta
Lake's OPTIMIZE ZORDER BY and ClickHouse/DuckDB spatial indexes) gives
each file a small hyper-rectangle in ALL the interleaved dimensions, so
selective filters on ANY of them skip most files. The reference engine
has no layout surface at all (its store is one flat TSV,
/root/reference/src/table.cpp); the engine's own postings sink already
does the 1-D version of this (bucket-clustered, term_sign-sorted writes
— build.py postings stage); this module is the general N-D primitive
for the corpus/result tables themselves.

Everything is pure column algebra: bin = clamp(floor(2^bits (v-lo)/(hi-lo)))
(uniform bins with width_bucket semantics, spelled as explicit floor
arithmetic because DuckDB has no width_bucket; production systems use
quantile bins for skewed data — documented simplification, same curve
math), then one integer expression interleaves the bits, so the oracle
(``zorder_key``) replays the key bit-identically. The clustering itself
is ``repartitionByRange(z) + sortWithinPartitions(z)`` — the standard
total-order write shape (sampled range boundaries, no global sort on one
node, no driver collect).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    bounds: list[tuple[str, float, float]], bits: int = 8
) -> Column:
    """The Morton key column for ``bounds`` = [(col, lo, hi), ...]:
    each column is uniformly binned into 2^bits buckets over [lo, hi]
    (values outside clamp to the edge bins), and bucket bits are
    interleaved round-robin — bit b of column j lands at position
    b * n_cols + j, so all columns contribute equally at every scale of
    the curve. ≤ 3 columns at 8 bits fits a long with room to spare;
    interleaving more than ~4 columns dilutes pruning on all of them
    (the documented Z-order caveat) and is refused. NULL values land in
    the TOP bin on both engines (Spark and DuckDB least/greatest both
    skip NULL operands), so NULL rows cluster together at the curve's
    end rather than poisoning the key."""
    n = len(bounds)
    if not 1 <= n <= 4:
        raise ValueError(f"zorder_key: need 1-4 columns, got {n}")
    if not 1 <= bits <= 15:
        raise ValueError(f"zorder_key: bits must be in [1, 15], got {bits}")
    z = F.lit(0).cast("long")
    for j, (col, lo, hi) in enumerate(bounds):
        if not hi > lo:
            raise ValueError(f"zorder_key: need hi > lo for {col!r}, got [{lo}, {hi}]")
        # explicit floor-arithmetic binning (width_bucket semantics, but
        # spelled out so DuckDB — which has no width_bucket — replays the
        # IDENTICAL IEEE ops): clamp to the edge bins outside [lo, hi)
        nb = 1 << bits
        b = F.floor(
            F.lit(float(nb))
            * (F.col(col).cast("double") - F.lit(float(lo)))
            / F.lit(float(hi) - float(lo))
        ).cast("long")
        b = F.greatest(F.lit(0).cast("long"), F.least(b, F.lit(nb - 1).cast("long")))
        for bit in range(bits):
            z = z + F.shiftleft(
                F.shiftrightunsigned(b, bit).bitwiseAND(F.lit(1)).cast("long"),
                bit * n + j,
            )
    return z


def zorder_key_sql(bounds: list[tuple[str, float, float]], bits: int = 8) -> str:
    """The DuckDB twin of :func:`zorder_key` (oracle building block) —
    same floor binning, same clamp, same interleave."""
    n = len(bounds)
    terms = []
    for j, (col, lo, hi) in enumerate(bounds):
        nb = 1 << bits
        b = (
            f"greatest(0, least(CAST(floor({float(nb)!r} * "
            f"(CAST({col} AS DOUBLE) - {float(lo)!r}) / {float(hi) - float(lo)!r}) "
            f"AS BIGINT), {nb - 1}))"
        )
        for bit in range(bits):
            # full parens around the shift: DuckDB binds `+` TIGHTER than
            # `<<`, so an unparenthesized sum of shift terms parses as
            # nested giant shifts and overflows
            terms.append(f"(((({b}) >> {bit}) & 1) << {bit * n + j})")
    return "(" + " + ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame,
    bounds: list[tuple[str, float, float]],
    bits: int = 8,
    n_files: int | None = None,
) -> DataFrame:
    """Rewrite ``df`` in Z-order: range-partition on the Morton key
    (sampled boundaries — each output file becomes a contiguous curve
    segment = a small hyper-rectangle in every bound column) and sort
    within partitions so row groups inside a file are tight too. Rows
    are untouched — only their order changes; write the result with
    ``.write.parquet`` and min-max pruning works on all bound columns."""
    if n_files is None:
        n_files = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.withColumn("_z", zorder_key(bounds, bits))
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: str | list[str],
    n_buckets: int,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
    database_location: str | None = None,
) -> DataFrame:
    """Persist ``df`` as a hash-bucketed (and bucket-sorted) managed
    parquet table and return the re-read DataFrame — the CO-LOCATED
    JOIN layout: two tables bucketed by the same key into the same
    bucket count join with ZERO exchange on either side (and a groupBy
    on the bucket key aggregates exchange-free), because the scan
    itself reports hash partitioning. Z-order (above) optimizes which
    FILES a filter reads; bucketing optimizes which SHUFFLES a join
    needs — one write-time shuffle amortized over every subsequent
    join/agg on that key. This is the layout the engine's own postings
    store hand-rolls with directory sharding (build.py postings sink);
    here it's the declarative catalog version for corpus/result
    tables. In production the same layout is an Iceberg ``bucket(N,
    key)`` partition transform (BASELINE.json names Iceberg as the
    primary catalog; the runtime jars are absent in this sandbox, so
    the metastore-parquet path stands in with identical semantics —
    see session.py).

    ``sort_cols`` default to ``keys`` (sorted buckets also let the
    sort-merge join skip its per-partition sort when each bucket is
    one file). ``database_location`` creates the table's database at
    an explicit path (scratch space) instead of the default warehouse.
    Bucket pruning note: like every hash layout, this accelerates
    equi-keys only — range scans still want the Z-order path.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not keys:
        raise ValueError("write_bucketed: need at least one bucket key")
    if n_buckets < 1:
        raise ValueError(f"write_bucketed: n_buckets must be >= 1, got {n_buckets}")
    spark = df.sparkSession
    if "." in table and database_location is not None:
        db = table.split(".")[0]
        spark.sql(
            f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{database_location}'"
        )
    writer = df.write.format("parquet").mode(mode).bucketBy(int(n_buckets), *keys)
    sc = keys if sort_cols is None else (
        [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    )
    if sc:
        writer = writer.sortBy(*sc)
    writer.saveAsTable(table)
    return spark.table(table)


def bounds_from_quantiles(
    df: DataFrame,
    cols: list[str],
    lower: float = 0.01,
    upper: float = 0.99,
    rel_err: float = 0.001,
) -> list[tuple[str, float, float]]:
    """Derive zorder bounds from the data itself: the [lower, upper]
    approximate quantiles of each column (Greenwald-Khanna sketch via
    ``df.stat.approxQuantile`` — one pass, driver receives 2 numbers per
    column, never the data). Uniform bins over the full min-max waste
    most of the curve on a skewed column (one outlier stretches the
    range; 99% of rows land in one bin); quantile-clipped bounds spend
    the bins on the mass, and the tails clamp to the edge bins — which
    is exactly where a pruning reader wants them."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}/{upper}")
    qs = df.stat.approxQuantile(cols, [lower, upper], rel_err)
    out = []
    for c, (lo, hi) in zip(cols, qs):
        if not hi > lo:  # constant-ish column: widen so zorder_key accepts
            hi = lo + 1.0
        out.append((c, float(lo), float(hi)))
    return out
