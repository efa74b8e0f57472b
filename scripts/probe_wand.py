"""WAND query-path decomposition probe.

Builds one store, then times for a fixed query batch, at the given
parallelism:
  A. postings scan + joins only (JVM side, no python)          [joined.count]
  B. shuffle + applyInPandas with a no-op python fn            [group echo]
  C. the real wand_topk                                        [full]
and reports the decode volume (sum n_docs over joined rows = posting
entries shipped to python, incl. per-query replication).

Usage: python scripts/probe_wand.py [n_docs] [n_queries] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import pandas as pd
    from pyspark.sql import functions as F

    from tiny_search_engine_spark.build import BuildConfig, build_index
    from tiny_search_engine_spark.config import QueryConfig
    from tiny_search_engine_spark.query import QueryEngine
    from tiny_search_engine_spark.session import get_spark, scratch_dir
    from tiny_search_engine_spark.synth import make_queries, make_stopwords, source_files

    spark = get_spark(app_name=f"tse_wprobe_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    work = scratch_dir("tse_wprobe_")
    src = source_files(spark, n_docs, seed=42).cache()
    src.count()
    cfg = BuildConfig(tokenizer="code", stopwords=frozenset(make_stopwords()),
                      write_tokens=False, copy_content=False,
                      per_bucket_metrics=False)
    store = build_index(spark, src, os.path.join(work, "store"), cfg)
    queries = [(i, q) for i, q in enumerate(make_queries(n_queries, seed=7))]
    eng = QueryEngine(spark, store, QueryConfig(profile="standard", compat="fixed"))

    # decompose the batched doc-group plan (query.py wand_topk)
    import pandas as pd
    qis = eng.query_infos(queries, with_weights=False)
    qdict = {}
    signs_set = set()
    for qi in qis:
        terms = []
        for i, s in enumerate(qi.signs):
            if qi.dups[i] > 1:
                continue
            terms.append((s, qi.term_map[s][0]))
            signs_set.add(s)
        if terms:
            qdict[qi.query_id] = terms
    signs = sorted(signs_set)
    from tiny_search_engine_spark.build import POSTING_BUCKETS
    buckets = sorted({s % POSTING_BUCKETS for s in signs})
    post = eng._cached("postings").filter(
        F.col("bucket").isin(buckets) & F.col("term_sign").isin(signs))
    ts = eng._cached("term_stats").select("term_sign", "idf").filter(
        F.col("term_sign").isin(signs))
    joined = post.join(F.broadcast(ts), "term_sign")

    def timeit(label, fn, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: best {best:.2f}s")
        return best

    v = joined.agg(F.count("*").alias("rows"), F.sum("n_docs").alias("entries"),
                   F.sum("bytes_total").alias("bytes")).collect()[0]
    print(f"matched postings rows={v['rows']} entries={v['entries']:,} bytes={v['bytes']:,}")
    print(f"n_queries={n_queries} qdict={len(qdict)}")

    t0 = time.time()
    eng.query_infos(queries, with_weights=False)
    print(f"driver query prep: {time.time()-t0:.2f}s")

    timeit("A scan+join count (JVM)", lambda: joined.count())
    timeit("C full wand_topk", lambda: eng.wand_topk(queries, k=20).count())

    import shutil
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
