"""Sign parity: pure-Python XXH64 == Spark F.xxhash64 (the engine's JVM-side
hot path and the golden model must agree bit-for-bit)."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tiny_search_engine_spark.hashing import term_sign, xxhash64_signed


def test_spark_parity_basic(spark):
    strs = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "abcdefghi", "x" * 31, "x" * 32, "x" * 33, "x" * 100,
        "hello world", "ünicøde 测试", "return", "def", "the",
    ]
    df = spark.createDataFrame([(s,) for s in strs], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    got = {r["s"]: r["h"] for r in df.collect()}
    for s in strs:
        assert xxhash64_signed(s.encode()) == got[s], s


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_sign_deterministic(s):
    assert term_sign(s) == term_sign(s)
    # the invariant is sign = hash(lower(term)) — NOT upper/lower agreement
    # (e.g. 'ß'.upper() == 'SS', found by hypothesis)
    assert term_sign(s) == term_sign(s.lower())
    assert -(2**63) <= term_sign(s) < 2**63


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40))
@settings(max_examples=100, deadline=None)
def test_sign_ascii_case_insensitive(s):
    assert term_sign(s.upper()) == term_sign(s.lower())
