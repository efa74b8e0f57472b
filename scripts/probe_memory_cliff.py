"""Memory-envelope probe (VERDICT r4 ask #8): push a multi-million-doc
build + champion-tier serving + MinHash-LSH dedup through one 128 GiB
local[32] JVM and record where memory pressure actually shows up —
JVM heap high-water per phase, broadcast-vs-sortmerge join flips in the
serving plans, spill indicators — so BENCH/BASELINE.md carries a
measured envelope instead of an extrapolation.

The 1M-doc probe (commit ce7a1f5) proved throughput linearity; this one
watches MEMORY: the doc_stats/records joins sit right at Spark's
broadcast threshold as the doc table grows, and the LSH band join's
shuffle is the largest transient.

Usage: python scripts/probe_memory_cliff.py [n_docs] [cpus]
Prints one JSON line per phase + a final envelope JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from tiny_search_engine_spark.build import BuildConfig, build_index, prune_store
    from tiny_search_engine_spark.config import QueryConfig
    from tiny_search_engine_spark.pipeline import dedup
    from tiny_search_engine_spark.query import (
        QueryEngine,
        choose_prune_m,
        tiered_wand_topk,
    )
    from tiny_search_engine_spark.session import get_spark, scratch_dir
    from tiny_search_engine_spark.synth import make_queries, make_stopwords, source_files

    work = scratch_dir("tse_memprobe_")
    spark = get_spark(
        app_name=f"tse_memprobe_{n_docs}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 64),
        extra_conf={
            # most of the box: the point is to find the envelope, not an
            # artificial 8 GiB cliff
            "spark.driver.memory": os.environ.get("TSE_PROBE_DRIVER_MEM", "96g"),
            "spark.driver.maxResultSize": "8g",
        },
    )
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    pools = spark._jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans()

    def _heap_pools():
        for i in range(pools.size()):
            p = pools.get(i)
            if p.getType().name() == "HEAP":
                yield p

    def reset_peaks() -> None:
        for p in _heap_pools():
            p.resetPeakUsage()

    def heap_gb() -> dict:
        total = rt.totalMemory() / 2**30
        free = rt.freeMemory() / 2**30
        # TRUE in-phase high-water: sum of per-pool peak usage since the
        # last resetPeakUsage() — a post-phase totalMemory sample would
        # miss any transient a GC collected before the phase returned
        peak = sum(p.getPeakUsage().getUsed() for p in _heap_pools()) / 2**30
        return {
            "heap_peak_gb": round(peak, 2),
            "heap_used_gb": round(total - free, 2),
            "heap_total_gb": round(total, 2),
            "heap_max_gb": round(rt.maxMemory() / 2**30, 2),
        }

    def phase(name: str, fn):
        reset_peaks()
        t0 = time.time()
        out = fn()
        rec = {"phase": name, "seconds": round(time.time() - t0, 2), **heap_gb()}
        print(json.dumps(rec), flush=True)
        return out, rec

    envelope = {"n_docs": n_docs, "cpus": cpus}
    try:
        cfg = BuildConfig(
            tokenizer="code",
            stopwords=frozenset(make_stopwords()),
            write_tokens=False,
            copy_content=False,
            per_bucket_metrics=False,
        )
        src = source_files(spark, n_docs, seed=42)
        # no .cache() of the 4M-row generator — at this size the probe
        # should measure the pipeline, not a driver-pinned cache
        store, rec = phase(
            "index_build",
            lambda: build_index(spark, src, os.path.join(work, "store"), cfg),
        )
        envelope["build_s"] = rec["seconds"]
        envelope["build_docs_per_sec"] = round(n_docs / rec["seconds"], 1)

        meta = store.meta()
        envelope["avg_doc_len"] = round(meta["avg_doc_len"], 2)
        (pm, _), _ = phase(
            "posting_mass",
            lambda: (
                tuple(
                    store.postings(spark)
                    .agg(
                        F.sum("n_docs").alias("postings"),
                        F.sum("bytes_total").alias("bytes"),
                    )
                    .first()
                ),
                None,
            ),
        )
        envelope["n_postings"] = int(pm[0])
        envelope["posting_bytes"] = int(pm[1])

        queries = [(i, q) for i, q in enumerate(make_queries(2000, seed=7))]
        m, _ = phase(
            "choose_prune_m", lambda: choose_prune_m(spark, store, queries, 0.9)
        )
        envelope["prune_m"] = m
        pruned, rec = phase(
            "prune_store",
            lambda: prune_store(spark, store, os.path.join(work, "pruned"), m=m),
        )
        envelope["prune_s"] = rec["seconds"]

        qcfg = QueryConfig(profile="standard", compat="fixed")
        served, rec = phase(
            "tiered_wand_2000q",
            lambda: tiered_wand_topk(
                spark, store, pruned, queries, k=20, cfg=qcfg
            ).count(),
        )
        envelope["tiered_rows"] = served
        envelope["tiered_s"] = rec["seconds"]
        envelope["tiered_qps"] = round(len(queries) / rec["seconds"], 1)

        # broadcast-threshold flips: the exact path's doc-side joins are
        # broadcastable at bench scale but MUST have flipped to
        # shuffle joins here — a silent broadcast of a 4M-row doc table
        # would be the cliff. Count join strategies in the plan.
        eng = QueryEngine(spark, store, qcfg)
        plan = (
            eng.bm25_topk(queries[:10], k=10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        envelope["bm25_plan_broadcast_joins"] = plan.count("BroadcastHashJoin")
        envelope["bm25_plan_sortmerge_joins"] = plan.count("SortMergeJoin")
        envelope["bm25_plan_shuffledhash_joins"] = plan.count("ShuffledHashJoin")

        # LSH dedup: the band join's shuffle is the largest transient
        # allocation of the pipeline ops. Shingling is ~1.2 ms/doc of
        # Arrow-batched work, so the phase is capped at 1M docs to keep
        # the probe under control — the CAP is on wall-clock, not
        # memory: the per-partition allocation this phase measures is
        # already at its asymptote at 1M (no driver-side state grows
        # with n). Recorded as lsh_docs so the row can't overclaim.
        lsh_docs = min(n_docs, 1_000_000)
        envelope["lsh_docs"] = lsh_docs
        # NOT src.limit(lsh_docs): GlobalLimit collapses the scan to one
        # partition and the whole dedup would run on a single task. A
        # fresh generator at the capped size keeps the partitioning.
        docs_txt = source_files(spark, lsh_docs, seed=42).select(
            "repo", "path", "commit", "lang", "content"
        )
        from tiny_search_engine_spark.build import with_doc_id

        ddf = with_doc_id(docs_txt).select(
            "doc_id", F.col("content").alias("text")
        )
        n_pairs, rec = phase(
            "lsh_dedup", lambda: dedup.lsh_candidate_pairs(ddf).count()
        )
        envelope["lsh_pairs"] = n_pairs
        envelope["lsh_s"] = rec["seconds"]
        envelope.update(heap_gb())
        print(json.dumps({"envelope": envelope}), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
