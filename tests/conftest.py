import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiny_search_engine_spark.build import BuildConfig, build_index
from tiny_search_engine_spark.golden.model import GoldenIndex
from tiny_search_engine_spark.hashing import doc_sign
from tiny_search_engine_spark.session import get_spark
from tiny_search_engine_spark.synth import (
    make_stopwords,
    make_synonyms,
    source_files,
    source_files_local,
)

N_TINY = 300


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tse_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "6g"},
    )
    yield s


@pytest.fixture(scope="session")
def tiny_corpus():
    return source_files_local(N_TINY, seed=42)


@pytest.fixture(scope="session")
def stopwords():
    return make_stopwords()


@pytest.fixture(scope="session")
def synonyms():
    return make_synonyms()


@pytest.fixture(scope="session")
def tiny_store(spark, stopwords, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ix") / "store")
    src = source_files(spark, N_TINY, seed=42)
    cfg = BuildConfig(
        tokenizer="code",
        stopwords=frozenset(stopwords),
        postings_per_shard=64,  # tiny → forces multi-shard skew splitting
        block_size=16,  # tiny → forces multi-block lists
    )
    return build_index(spark, src, out, cfg)


@pytest.fixture(scope="session")
def tiny_golden(tiny_corpus, stopwords):
    ix = GoldenIndex(stopwords=stopwords, mode="code")
    for d in tiny_corpus:
        ix.add_doc(doc_sign(d["repo"], d["path"], d["commit"]), d["content"])
    ix.finalize()
    return ix
