"""Deterministic hash-sampling ops: determinism, partitioning invariance,
growth stability, split disjointness, stratified rates. DuckDB-oracle
equivalence runs in scripts/check_oracles.py + the driver."""

import hashlib

import pytest
from pyspark.sql import functions as F

from tiny_search_engine_spark.pipeline import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"text {i}", ["en", "zh", "es", "de"][i % 4], "synth", 10 + i)
        for i in range(400)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _py_keep(key, salt, rate):
    h = hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8]
    return h < sampling.rate_to_hex(rate)


def test_rate_to_hex_edges():
    assert sampling.rate_to_hex(0.0) == "00000000"
    assert sampling.rate_to_hex(1.0) == "g"  # above every hex bucket
    assert sampling.rate_to_hex(0.5) == "80000000"
    with pytest.raises(ValueError):
        sampling.rate_to_hex(1.5)


def test_hash_sample_matches_pure_python(docs):
    got = sorted(
        r.doc_id for r in sampling.hash_sample(docs, 0.3, salt="s1").collect()
    )
    want = sorted(i for i in range(400) if _py_keep(i, "s1", 0.3))
    assert got == want
    assert 0 < len(got) < 400


def test_hash_sample_partitioning_invariant(docs):
    a = sorted(r.doc_id for r in sampling.hash_sample(docs.repartition(2), 0.3).collect())
    b = sorted(r.doc_id for r in sampling.hash_sample(docs.repartition(13), 0.3).collect())
    assert a == b


def test_hash_sample_growth_stable(docs):
    """Adding rows never changes an existing row's membership — the
    property per-partition RNG sampling (df.sample) lacks."""
    small = docs.filter(F.col("doc_id") < 200)
    in_small = set(r.doc_id for r in sampling.hash_sample(small, 0.3).collect())
    in_full = set(
        r.doc_id
        for r in sampling.hash_sample(docs, 0.3).collect()
        if r.doc_id < 200
    )
    assert in_small == in_full


def test_salt_gives_independent_samples(docs):
    a = set(r.doc_id for r in sampling.hash_sample(docs, 0.3, salt="a").collect())
    b = set(r.doc_id for r in sampling.hash_sample(docs, 0.3, salt="b").collect())
    assert a != b  # different folds
    # both still ~30%: md5 uniformity at n=400 (loose 3-sigma bounds)
    assert 70 <= len(a) <= 170 and 70 <= len(b) <= 170


def test_split_train_test_disjoint_exhaustive(docs):
    split = sampling.split_train_test(docs, 0.25)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["train"] + counts["test"] == 400
    # membership matches the pure-python rule
    test_ids = set(r.doc_id for r in split.filter(F.col("split") == "test").collect())
    assert test_ids == {i for i in range(400) if _py_keep(i, "split", 0.25)}


def test_stratified_rates(docs):
    got = sampling.stratified_sample(
        docs, {"en": 1.0, "zh": 0.0}, stratum_col="lang", default_rate=0.5
    )
    by_lang = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["en"] == 100  # rate 1.0 keeps every row
    assert "zh" not in by_lang  # rate 0.0 keeps none
    # default 0.5 strata match the pure-python rule exactly
    for lang in ("es", "de"):
        want = sum(
            1 for i in range(400)
            if ["en", "zh", "es", "de"][i % 4] == lang and _py_keep(i, "", 0.5)
        )
        assert by_lang[lang] == want


def test_sampling_plan_is_shuffle_free(docs):
    df = sampling.hash_sample(docs, 0.3)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side scan + filter


def test_temperature_rates_math():
    from tiny_search_engine_spark.pipeline.sampling import temperature_rates

    counts = {"en": 800, "de": 150, "zh": 50}
    # T=1: natural proportions -> target_g = total * n_g / N -> rate = total/N for all
    r1 = temperature_rates(counts, 1.0, 100)
    assert all(abs(v - 0.1) < 1e-12 for v in r1.values())
    # T=2 flattens: rare groups keep a larger fraction than dominant ones
    r2 = temperature_rates(counts, 2.0, 100)
    assert r2["zh"] > r2["de"] > r2["en"]
    # rates are capped at 1 even when the target exceeds the group size
    r3 = temperature_rates(counts, 8.0, 900)
    assert r3["zh"] == 1.0
    assert all(0.0 < v <= 1.0 for v in r3.values())
    import pytest as _pt

    with _pt.raises(ValueError):
        temperature_rates(counts, 0.0, 100)
    assert temperature_rates({}, 2.0, 100) == {}


def test_mixture_sample_deterministic_and_flattening(spark):
    from tiny_search_engine_spark.pipeline.sampling import mixture_sample, temperature_rates

    rows = [(i, "en" if i < 800 else ("de" if i < 950 else "zh")) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = mixture_sample(df, temperature=2.0, total_target=200).collect()
    kept2 = mixture_sample(df.repartition(7), temperature=2.0, total_target=200).collect()
    assert sorted(r["doc_id"] for r in kept) == sorted(r["doc_id"] for r in kept2)
    # per-group keep fraction tracks the derived rate (hash-exact Bernoulli)
    from collections import Counter

    got = Counter(r["lang"] for r in kept)
    rates = temperature_rates({"en": 800, "de": 150, "zh": 50}, 2.0, 200)
    for g, n in (("en", 800), ("de", 150), ("zh", 50)):
        # 4-sigma binomial bound on the empirical keep fraction
        tol = 4.0 * (rates[g] * (1 - rates[g]) / n) ** 0.5 + 1e-9
        assert abs(got[g] / n - rates[g]) < tol, g
    # flattening: zh keeps a larger share of itself than en does
    assert got["zh"] / 50 > got["en"] / 800


def test_mixture_and_stratified_with_null_stratum(spark):
    from tiny_search_engine_spark.pipeline.sampling import (
        mixture_sample,
        stratified_sample,
        temperature_rates,
    )

    # temperature_rates tolerates a None group key
    r = temperature_rates({None: 50, "en": 150}, 2.0, 100)
    assert set(r) == {None, "en"} and 0 < r[None] <= 1.0
    rows = [(i, "en" if i % 2 == 0 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    # NULL strata are matched by the None rate key, not silently dropped
    kept = stratified_sample(df, {None: 1.0, "en": 0.0}, stratum_col="lang").collect()
    assert len(kept) == 100 and all(x["lang"] is None for x in kept)
    # mixture_sample end-to-end with nulls present: no crash, nulls kept
    out = mixture_sample(df, temperature=2.0, total_target=100).collect()
    assert any(x["lang"] is None for x in out)
