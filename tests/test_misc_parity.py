"""Small-surface parity: A2 config parser, D11 significant-digit rounding,
C8 highlight, E-table scalar equivalences."""

import math

from tiny_search_engine_spark.config_file import ConfigFile
from tiny_search_engine_spark.features import export_feature_map, round_sig


def test_config_file_parsing(tmp_path):
    p = tmp_path / "sys.conf"
    p.write_text(
        "# comment\n"
        "INDEX_FILE : ./index/url.list.utf8\n"
        "MAX_RESULT_NUM : 20\n"
        "THRESHOLD:0.75\n"
        "FLAG : true\n"
        "MAX_RESULT_NUM : 30\n"  # later duplicate wins
        "no_colon_line\n"
    )
    c = ConfigFile(str(p))
    assert c.get_str("INDEX_FILE") == "./index/url.list.utf8"
    assert c.get_int("MAX_RESULT_NUM") == 30
    assert c.get_float("THRESHOLD") == 0.75
    assert c.get_bool("FLAG") is True
    assert c.get_int("MISSING", 7) == 7
    assert c.get_int("INDEX_FILE", 9) == 9  # unparsable → default


def test_round_sig_is_significant_digits():
    # the reference rounds to 3 SIGNIFICANT digits (math_util.h:153-159),
    # not 3 decimals: 0.0123456 → 0.0123, 123.456 → 123
    assert round_sig(0.0123456) == 0.0123
    assert round_sig(123.456) == 123.0
    assert round_sig(0.000999999) == 0.001
    assert round_sig(-5.6789) == -5.68
    assert round_sig(0.0) == 0.0
    assert math.isinf(round_sig(float("inf")))


def test_export_feature_map():
    out = export_feature_map({"F_QU_BM25": 12.3456, "F_QU_VSM": 0.98765})
    assert out == {"F_QU_BM25": 12.3, "F_QU_VSM": 0.988}


def test_highlight(spark):
    from tiny_search_engine_spark.query import ANSI_NONE, ANSI_RED, highlight

    df = spark.createDataFrame(
        [(1, "def merge(index): return index")], "doc_id long, content string"
    )
    out = highlight(df, "merge index").collect()[0]["content_highlighted"]
    assert f"{ANSI_RED}merge{ANSI_NONE}" in out
    assert out.count(f"{ANSI_RED}index{ANSI_NONE}") == 2
    assert "def" in out and f"{ANSI_RED}def" not in out


def test_scalar_surface_equivalents(spark):
    """E-table spot checks (SURVEY.md §2 E): Spark builtins match the
    reference's scalar semantics."""
    from pyspark.sql import functions as F

    row = (
        spark.createDataFrame([("Hello", "kitten", "sitting", "日本語abc")], "a string, b string, c string, u string")
        .select(
            F.lower("a").alias("lo"),
            F.levenshtein("b", "c").alias("ed"),
            F.length("u").alias("chars"),  # unicode chars, not bytes
            F.xxhash64(F.lower(F.lit("ABC"))).alias("sign"),
        )
        .collect()[0]
    )
    assert row["lo"] == "hello"
    assert row["ed"] == 3
    assert row["chars"] == 6
    from tiny_search_engine_spark.hashing import term_sign

    assert row["sign"] == term_sign("ABC") == term_sign("abc")


def test_ltr_rerank_linear_model(spark):
    """D12 plumbing: feature.conf densification order + batch predict +
    model-score re-sort (xgboost itself is import-gated like the
    reference's #ifdef XGBOOST default-off)."""
    import numpy as np
    import pytest

    from tiny_search_engine_spark import ltr

    ids = ltr.load_feature_conf()
    assert len(ids) == 32  # uncommented feature.conf entries
    assert ids["F_QU_BM25"] == 4 and ids["F_Q_LEN"] == 37

    row = ltr.featurize({"F_QU_BM25": 2.5, "F_QU_VSM": 0.5, "F_UNKNOWN": 9.0}, ids)
    assert row.shape == (38,)
    assert row[4] == 2.5 and row[28] == 0.5 and row.sum() == 3.0

    rows = [
        (0, 1, {"F_QU_BM25": 2.0, "F_QU_VSM": 0.5}),
        (0, 2, {"F_QU_BM25": 1.0, "F_QU_VSM": 0.9}),
        (1, 3, {"F_QU_BM25": 3.0}),
    ]
    df = spark.createDataFrame(rows, "query_id long, doc_id long, features map<string,double>")
    w = np.zeros(38)
    w[ids["F_QU_BM25"]] = 1.0
    w[ids["F_QU_VSM"]] = 10.0
    out = ltr.rerank(df, ltr.LinearModel(weights=w), ids).collect()
    got = {(r["query_id"], r["rank"]): (r["doc_id"], round(r["final_score"], 6)) for r in out}
    assert got[(0, 1)] == (2, 10.0)  # 1.0*1 + 0.9*10
    assert got[(0, 2)] == (1, 7.0)
    assert got[(1, 1)] == (3, 3.0)

    with pytest.raises(ImportError):
        ltr.try_load_xgboost("/nonexistent")
