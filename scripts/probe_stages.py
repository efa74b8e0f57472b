"""Event-log-based stage profile of the index build + WAND query.

Runs one build at the given parallelism with Spark event logging on, then
prints per-stage: wall duration, task count, sum of task run time, and the
implied parallelism (task-time / wall). Finds where cores sit idle.

Usage: python scripts/probe_stages.py [n_docs] [cpus]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from tiny_search_engine_spark.build import BuildConfig, build_index
    from tiny_search_engine_spark.config import QueryConfig
    from tiny_search_engine_spark.query import QueryEngine
    from tiny_search_engine_spark.session import get_spark, scratch_dir
    from tiny_search_engine_spark.synth import make_queries, make_stopwords, source_files

    evdir = scratch_dir("tse_evlog_")
    work = scratch_dir("tse_pstage_")
    spark = get_spark(
        app_name=f"tse_pstage_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    src = source_files(spark, n_docs, seed=42).cache()
    src.count()
    t0 = time.time()
    store = build_index(
        spark, src, os.path.join(work, "store"),
        BuildConfig(tokenizer="code", stopwords=frozenset(make_stopwords()),
                    write_tokens=False),
    )
    build_s = time.time() - t0
    queries = [(i, q) for i, q in enumerate(make_queries(200, seed=7))]
    eng = QueryEngine(spark, store, QueryConfig(profile="standard", compat="fixed"))
    t0 = time.time()
    eng.wand_topk(queries, k=20).count()
    query_s = time.time() - t0
    spark.stop()

    stages: dict[int, dict] = {}
    paths = [p for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
             if os.path.isfile(p) and "appstatus" not in os.path.basename(p)]
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    stages[sid] = {
                        "name": si["Stage Name"].split("\n")[0][:70],
                        "tasks": si["Number of Tasks"],
                        "wall_s": round((si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000, 2),
                        "task_s": 0.0,
                        "gc_s": 0.0,
                        "py_s": 0.0,
                    }
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    if sid not in stages:
                        stages[sid] = {"name": "?", "tasks": 0, "wall_s": 0,
                                       "task_s": 0.0, "gc_s": 0.0, "py_s": 0.0}
                    tm = ev.get("Task Metrics") or {}
                    stages[sid]["task_s"] += tm.get("Executor Run Time", 0) / 1000
                    stages[sid]["gc_s"] += tm.get("JVM GC Time", 0) / 1000
    print(f"build_s={build_s:.1f} query_s={query_s:.1f} cpus={cpus} n_docs={n_docs}")
    tot_wall = sum(s["wall_s"] for s in stages.values())
    print(f"sum stage wall {tot_wall:.1f}s  (gaps = driver time: {build_s + query_s - tot_wall:.1f}s)")
    for sid in sorted(stages):
        s = stages[sid]
        par = s["task_s"] / s["wall_s"] if s["wall_s"] else 0
        print(f"stage {sid:3d} wall={s['wall_s']:7.2f}s tasks={s['tasks']:4d} "
              f"tasktime={s['task_s']:7.1f}s par={par:5.2f} gc={s['gc_s']:5.1f}s  {s['name']}")
    shutil.rmtree(evdir, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
