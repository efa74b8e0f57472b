"""Stage-level scaling probe: build + query at two parallelism levels,
printing per-stage seconds (from the build lineage) and CPU utilization.
Diagnostic tool behind scaling_bench.py tuning.

Usage: python scripts/probe_scaling.py [n_docs] [n_queries] [cpus...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from tiny_search_engine_spark.session import get_spark
from tiny_search_engine_spark.synth import source_files, make_stopwords, make_queries
from tiny_search_engine_spark.build import build_index, BuildConfig
from tiny_search_engine_spark.query import QueryEngine
from tiny_search_engine_spark.config import QueryConfig

cpus = {cpus}
n_docs = {n_docs}
n_queries = {n_queries}
spark = get_spark(app_name=f"tse_probe_{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
src = source_files(spark, n_docs, seed=42).cache()
src.count()
from tiny_search_engine_spark.session import scratch_dir
work = scratch_dir(f"tse_probe_{cpus}_")
t0 = time.time()
store = build_index(spark, src, os.path.join(work, "store"),
                    BuildConfig(tokenizer="code",
                                stopwords=frozenset(make_stopwords()),
                                write_tokens=False))
build_s = time.time() - t0
with open(os.path.join(store.lineage_path, "build.json")) as f:
    stages = json.load(f)["stage_seconds"]
queries = [(i, q) for i, q in enumerate(make_queries(n_queries, seed=7))]
eng = QueryEngine(spark, store, QueryConfig(profile="standard", compat="fixed"))
t0 = time.time()
qi = eng.query_infos(queries)
prep_s = time.time() - t0
t0 = time.time()
n_res = eng.wand_topk(queries, k=20).count()
query_s = time.time() - t0
shutil.rmtree(work, ignore_errors=True)
spark.stop()
print("CHILD_RESULT " + json.dumps({{
    "cpus": cpus, "build_s": round(build_s, 2), "stages": stages,
    "docs_per_sec": round(n_docs / build_s, 1),
    "qprep_s": round(prep_s, 2), "query_s": round(query_s, 2),
    "qps": round(n_queries / query_s, 2), "n_results": n_res,
}}))
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    cpu_list = [int(c) for c in sys.argv[3:]] or [2, 8]
    for cpus in cpu_list:
        code = CHILD.format(repo=REPO, cpus=cpus, n_docs=n_docs, n_queries=n_queries)
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=3600)
        printed = False
        for line in out.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                print(line)
                printed = True
        if not printed:
            print(f"FAILED cpus={cpus}\n{out.stdout[-1500:]}\n{out.stderr[-2500:]}")


if __name__ == "__main__":
    main()
