"""WAND phase decomposition across parallelism widths, one shared store.

Builds the store ONCE (resumable dir on tmpfs), then for each width runs a
fresh JVM timing: split stage only (routed.count), split+score
(per_shard.count), and the full wand_topk, with one warm-up rep and
best-of-N kept. Also reports the effective S (doc-group fan).

Usage: python scripts/probe_wand2.py [n_docs] [n_queries] [widths csv] [S_override]
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from tiny_search_engine_spark.session import get_spark
from tiny_search_engine_spark.build import SegmentStore
from tiny_search_engine_spark.config import QueryConfig
from tiny_search_engine_spark.query import QueryEngine
from tiny_search_engine_spark.synth import make_queries

cpus = {cpus}
spark = get_spark(app_name=f"tse_wp2_{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus)
store = SegmentStore({store!r})
queries = [(i, q) for i, q in enumerate(make_queries({n_queries}, seed=7))]
qcfg = QueryConfig(profile="standard", compat="fixed")
if {s_override}:
    qcfg.query_doc_fan = {s_override}
eng = QueryEngine(spark, store, qcfg)
par = spark.sparkContext.defaultParallelism
S = qcfg.query_doc_fan or max(4, 1 << (2 * par - 1).bit_length())
print(f"width={{cpus}} S={{S}}", flush=True)

def timeit(label, fn, reps=3):
    fn()  # warm-up
    best = min((lambda t0=time.time(): (fn(), time.time() - t0)[1])() for _ in range(reps))
    print(f"width={{cpus}} {{label}}: {{best:.2f}}s", flush=True)
    return best

timeit("full wand_topk", lambda: eng.wand_topk(queries, k=20).count())
spark.stop()
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    widths = [int(w) for w in (sys.argv[3] if len(sys.argv) > 3 else "2,8,32").split(",")]
    s_override = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    store_dir = f"/dev/shm/tse_probe_store_{n_docs}"
    if not os.path.exists(os.path.join(store_dir, "_meta.json")):
        build = f"""
import sys
sys.path.insert(0, {REPO!r})
from tiny_search_engine_spark.session import get_spark
from tiny_search_engine_spark.synth import source_files, make_stopwords
from tiny_search_engine_spark.build import build_index, BuildConfig
spark = get_spark(app_name="tse_wp2_build", master="local[32]", shuffle_partitions=32)
src = source_files(spark, {n_docs}, seed=42).cache(); src.count()
build_index(spark, src, {store_dir!r},
            BuildConfig(tokenizer="code", stopwords=frozenset(make_stopwords()),
                        write_tokens=False, copy_content=False,
                        per_bucket_metrics=False))
spark.stop()
"""
        subprocess.run([sys.executable, "-c", build], check=True,
                       stderr=subprocess.DEVNULL)
        print(f"store built at {store_dir}", flush=True)

    for cpus in widths:
        code = CHILD.format(repo=REPO, cpus=cpus, store=store_dir,
                            n_queries=n_queries, s_override=s_override)
        subprocess.run([sys.executable, "-c", code], check=True,
                       stderr=subprocess.DEVNULL)


if __name__ == "__main__":
    main()
