"""layout.py: Z-order key parity vs a pure-Python twin, clustering
row-preservation, and the actual pruning win — z-ordered files carry
tighter two-dimensional min-max boxes than a single-column sort."""

import math

import pytest
from pyspark.sql import functions as F

from tiny_search_engine_spark.pipeline import layout

BITS = 6
BOUNDS = [("x", 0.0, 64.0), ("y", 0.0, 1024.0)]


@pytest.fixture(scope="module")
def grid(spark):
    # full 64x64 factorial: every (x, y) cell exactly once — no x-y
    # correlation, so a single-column sort genuinely cannot prune the
    # other dimension
    rows = [
        (i, float(i % 64), float((i // 64) * 16))
        for i in range(4096)
    ]
    return spark.createDataFrame(rows, "rid long, x double, y double")


def _py_bucket(v, lo, hi, n):
    # clamp(floor(n (v-lo)/(hi-lo)), 0, n-1) — layout.py's explicit
    # width_bucket-semantics binning
    return max(0, min(int(math.floor(n * (v - lo) / (hi - lo))), n - 1))


def _py_z(vals, bounds, bits):
    z = 0
    n = len(bounds)
    for j, (v, (_, lo, hi)) in enumerate(zip(vals, bounds)):
        b = _py_bucket(v, lo, hi, 1 << bits)
        for bit in range(bits):
            z += ((b >> bit) & 1) << (bit * n + j)
    return z


def test_zorder_key_matches_pure_python(grid):
    got = {
        r.rid: r.z
        for r in grid.select(
            "rid", layout.zorder_key(BOUNDS, BITS).alias("z")
        ).collect()
    }
    for r in grid.collect():
        assert got[r.rid] == _py_z((r.x, r.y), BOUNDS, BITS), r.rid


def test_zorder_key_clamps_and_validates(spark):
    df = spark.createDataFrame(
        [(0, -5.0, 2000.0), (1, 63.9, 0.0)], "rid long, x double, y double"
    )
    z = {
        r.rid: r.z
        for r in df.select("rid", layout.zorder_key(BOUNDS, BITS).alias("z")).collect()
    }
    assert z[0] == _py_z((-5.0, 2000.0), BOUNDS, BITS)  # edge bins, no error
    with pytest.raises(ValueError):
        layout.zorder_key([], BITS)
    with pytest.raises(ValueError):
        layout.zorder_key(BOUNDS, bits=0)
    with pytest.raises(ValueError):
        layout.zorder_key([("x", 1.0, 1.0)], BITS)


def _file_spans(path):
    """Per-parquet-file normalized (x-span, y-span) from footer min-max
    stats — what a pruning reader sees."""
    import os

    import pyarrow.parquet as pq

    spans = []
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        xmin = ymin = float("inf")
        xmax = ymax = float("-inf")
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for c in range(rg.num_columns):
                col = rg.column(c)
                st = col.statistics
                if st is None:
                    continue
                nm = col.path_in_schema
                if nm == "x":
                    xmin, xmax = min(xmin, st.min), max(xmax, st.max)
                if nm == "y":
                    ymin, ymax = min(ymin, st.min), max(ymax, st.max)
        if xmax >= xmin and ymax >= ymin:
            spans.append(((xmax - xmin) / 63.0, (ymax - ymin) / 1008.0))
    return spans


def test_cluster_by_zorder_prunes_both_dims(grid, tmp_path):
    """The Z-order claim: min-max pruning works on EVERY bound column.
    A y-sorted layout is tight on y but every file spans ALL of x (a
    filter on x scans everything); z-ordered files are small rectangles
    in BOTH dims."""
    zdir = str(tmp_path / "zorder")
    ydir = str(tmp_path / "ysort")
    layout.cluster_by_zorder(grid, BOUNDS, BITS, n_files=16).write.parquet(zdir)
    grid.repartitionByRange(16, F.col("y")).sortWithinPartitions("y").write.parquet(ydir)

    # rows preserved exactly
    got = sorted(
        (r.rid, r.x, r.y)
        for r in grid.sparkSession.read.parquet(zdir).collect()
    )
    assert got == sorted((r.rid, r.x, r.y) for r in grid.collect())

    zs, ys = _file_spans(zdir), _file_spans(ydir)
    assert len(zs) >= 8 and len(ys) >= 8
    z_x = sum(s[0] for s in zs) / len(zs)
    z_y = sum(s[1] for s in zs) / len(zs)
    y_x = sum(s[0] for s in ys) / len(ys)
    assert y_x > 0.9  # single-column sort: no pruning at all on x
    assert z_x < 0.6 and z_y < 0.6  # z-order: real pruning on BOTH dims


def test_zorder_key_null_goes_to_top_bin(spark):
    df = spark.createDataFrame([(0, None, 8.0)], "rid long, x double, y double")
    z = df.select(layout.zorder_key(BOUNDS, BITS).alias("z")).collect()[0].z
    assert z == _py_z((63.999, 8.0), BOUNDS, BITS)  # x clamps to bin 2^BITS-1


def test_bounds_from_quantiles_clips_outliers(spark):
    rows = [(i, float(i % 100)) for i in range(2000)] + [(9999, 1e12)]
    df = spark.createDataFrame(rows, "rid long, v double")
    ((c, lo, hi),) = layout.bounds_from_quantiles(df, ["v"], 0.01, 0.99)
    assert c == "v" and lo < 5 and hi < 200  # the 1e12 outlier is clipped
    const = spark.createDataFrame([(0, 7.0), (1, 7.0)], "rid long, v double")
    ((_, lo2, hi2),) = layout.bounds_from_quantiles(const, ["v"])
    assert hi2 > lo2  # constant column widened, zorder_key accepts it
    with pytest.raises(ValueError):
        layout.bounds_from_quantiles(df, ["v"], 0.9, 0.2)


def test_write_bucketed_colocated_join_and_agg(spark, tmp_path):
    a = spark.range(0, 200).select(F.col("id").alias("k"), (F.col("id") % 7).alias("va"))
    b = spark.range(0, 200, 2).select(F.col("id").alias("k"), (F.col("id") % 5).alias("vb"))
    loc = str(tmp_path / "bktdb")
    ta = layout.write_bucketed(a, "tse_bkt_test.ta", "k", 8, database_location=loc)
    tb = layout.write_bucketed(b, "tse_bkt_test.tb", "k", 8, database_location=loc)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = ta.join(tb, "k").select("k", "va", "vb")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located: the sort-merge join runs with NO shuffle on either side
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        got = {(r["k"], r["va"], r["vb"]) for r in j.collect()}
        assert got == {(i, i % 7, i % 5) for i in range(0, 200, 2)}
        # and a groupBy on the bucket key aggregates exchange-free
        gplan = (
            ta.groupBy("k").count()._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in gplan, gplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_write_bucketed_roundtrip_values_and_validation(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k long, v string"
    )
    back = layout.write_bucketed(
        df, "tse_bkt_test.rt", ["k"], 4, database_location=str(tmp_path / "db2")
    )
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b"), (3, None)}
    assert dict(back.dtypes) == dict(df.dtypes)
    with pytest.raises(ValueError):
        layout.write_bucketed(df, "tse_bkt_test.bad", "k", 0)
    with pytest.raises(ValueError):
        layout.write_bucketed(df, "tse_bkt_test.bad", [], 4)
