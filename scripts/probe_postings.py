"""Isolate the postings-stage + WAND-query scaling anomaly.

Builds doc_term/term_stats ONCE (shared dir), then in fresh JVMs re-runs
only the postings stage (resume-skip of earlier stages) and a WAND query
batch at each parallelism level, printing wall + process CPU time.

Usage: python scripts/probe_postings.py [n_docs] [cpus...]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
from tiny_search_engine_spark.session import get_spark
from tiny_search_engine_spark.synth import source_files, make_stopwords
from tiny_search_engine_spark.build import build_index, BuildConfig

spark = get_spark(app_name="probe_seed", master="local[8]", shuffle_partitions=8)
src = source_files(spark, {n_docs}, seed=42)
build_index(spark, src, {store!r},
            BuildConfig(tokenizer="code", stopwords=frozenset(make_stopwords()),
                        write_tokens=False))
spark.stop()
print("SEED_DONE")
"""

CHILD = r"""
import json, os, shutil, sys, time, glob
sys.path.insert(0, {repo!r})
from tiny_search_engine_spark.session import get_spark
from tiny_search_engine_spark.synth import make_stopwords, make_queries
from tiny_search_engine_spark.build import build_index, BuildConfig
from tiny_search_engine_spark.query import QueryEngine
from tiny_search_engine_spark.config import QueryConfig

cpus = {cpus}
store_dir = {store!r}
# wipe only the postings stage
shutil.rmtree(os.path.join(store_dir, "postings"), ignore_errors=True)
spark = get_spark(app_name=f"probe_post_{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
t0 = time.time(); c0 = time.process_time()
build_index(spark, None, store_dir,
            BuildConfig(tokenizer="code", stopwords=frozenset(make_stopwords()),
                        write_tokens=False))
post_s = time.time() - t0
queries = [(i, q) for i, q in enumerate(make_queries(200, seed=7))]
eng = QueryEngine(spark, SegStore := __import__("tiny_search_engine_spark.build", fromlist=["SegmentStore"]).SegmentStore(store_dir),
                  QueryConfig(profile="standard", compat="fixed"))
t0 = time.time()
n = eng.wand_topk(queries, k=20).count()
q_s = time.time() - t0
t0 = time.time()
n2 = eng.wand_topk(queries, k=20).count()
q2_s = time.time() - t0
spark.stop()
print("CHILD_RESULT " + json.dumps({{
    "cpus": cpus, "postings_s": round(post_s, 2),
    "wand_s": round(q_s, 2), "wand2_s": round(q2_s, 2), "n": n,
}}))
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpu_list = [int(c) for c in sys.argv[2:]] or [2, 8]
    work = tempfile.mkdtemp(prefix="tse_ppost_")
    store = os.path.join(work, "store")
    try:
        out = subprocess.run(
            [sys.executable, "-c", BUILD.format(repo=REPO, n_docs=n_docs, store=store)],
            capture_output=True, text=True, timeout=3600,
        )
        if "SEED_DONE" not in out.stdout:
            print(f"seed failed:\n{out.stdout[-1500:]}\n{out.stderr[-2500:]}")
            return
        for cpus in cpu_list:
            code = CHILD.format(repo=REPO, cpus=cpus, store=store)
            out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                                 text=True, timeout=3600)
            hit = [l for l in out.stdout.splitlines() if l.startswith("CHILD_RESULT ")]
            print(hit[0] if hit else f"FAILED cpus={cpus}\n{out.stdout[-1500:]}\n{out.stderr[-2500:]}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
