"""Event-log stage profile of ONE fast-path index build (bench config) —
per-stage wall, task core-seconds, GC — to compare core-WORK across
parallelism widths (is the wide build doing more total work?).

Usage: python scripts/probe_build_stages.py [n_docs] [cpus]
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from tiny_search_engine_spark.build import BuildConfig, build_index
    from tiny_search_engine_spark.session import get_spark, scratch_dir
    from tiny_search_engine_spark.synth import make_stopwords, source_files

    evdir = scratch_dir("tse_bevlog_")
    work = scratch_dir("tse_bstage_")
    spark = get_spark(
        app_name=f"tse_bstage_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    cfg = BuildConfig(tokenizer="code", stopwords=frozenset(make_stopwords()),
                      write_tokens=False, copy_content=False,
                      per_bucket_metrics=False)
    src = source_files(spark, n_docs, seed=42).cache()
    src.count()
    # warm-up
    w = source_files(spark, max(10_000, n_docs // 5), seed=43).cache()
    w.count()
    build_index(spark, w, os.path.join(work, "warm"), cfg)
    w.unpersist()
    warm_mark = time.time() * 1000
    t0 = time.time()
    build_index(spark, src, os.path.join(work, "store"), cfg)
    build_s = time.time() - t0
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
                    if si.get("Submission Time", 0) < warm_mark:
                        continue
                    sid = si["Stage ID"]
                    stages.setdefault(sid, {"task_s": 0.0, "gc_s": 0.0, "py_s": 0.0})
                    stages[sid].update({
                        "name": si["Stage Name"].split("\n")[0][:60],
                        "tasks": si["Number of Tasks"],
                        "wall_s": round((si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000, 2),
                        "sub": si.get("Submission Time", 0),
                    })
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    if sid not in stages:
                        stages[sid] = {"name": "?", "tasks": 0, "wall_s": 0.0,
                                       "task_s": 0.0, "gc_s": 0.0, "py_s": 0.0, "sub": 0}
                    tm = ev.get("Task Metrics") or {}
                    stages[sid]["task_s"] += tm.get("Executor Run Time", 0) / 1000
                    stages[sid]["gc_s"] += tm.get("JVM GC Time", 0) / 1000

    timed = {k: s for k, s in stages.items() if s.get("wall_s") and s.get("sub", 0) >= warm_mark}
    tot_task = sum(s["task_s"] for s in timed.values())
    tot_gc = sum(s["gc_s"] for s in timed.values())
    print(f"cpus={cpus} n_docs={n_docs} build_s={build_s:.1f} "
          f"total_task_core_s={tot_task:.1f} total_gc_s={tot_gc:.1f}")
    for sid in sorted(timed):
        s = timed[sid]
        par = s["task_s"] / s["wall_s"] if s["wall_s"] else 0
        print(f"stage {sid:3d} wall={s['wall_s']:7.2f}s tasks={s.get('tasks',0):4d} "
              f"core_s={s['task_s']:7.1f} par={par:5.2f} gc={s['gc_s']:5.1f}  {s.get('name','?')}")
    shutil.rmtree(evdir, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
