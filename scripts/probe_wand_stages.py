"""Event-log stage profile of ONE wand_topk batch over the shared probe
store (see probe_wand2.py — builds /dev/shm/tse_probe_store_<n>).

Usage: python scripts/probe_wand_stages.py [n_docs] [n_queries] [cpus] [S]
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
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    s_override = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from tiny_search_engine_spark.build import SegmentStore
    from tiny_search_engine_spark.config import QueryConfig
    from tiny_search_engine_spark.query import QueryEngine
    from tiny_search_engine_spark.session import get_spark, scratch_dir
    from tiny_search_engine_spark.synth import make_queries

    evdir = scratch_dir("tse_wevlog_")
    spark = get_spark(
        app_name=f"tse_wstage_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    store = SegmentStore(f"/dev/shm/tse_probe_store_{n_docs}")
    queries = [(i, q) for i, q in enumerate(make_queries(n_queries, seed=7))]
    qcfg = QueryConfig(profile="standard", compat="fixed")
    if s_override:
        qcfg.query_doc_fan = s_override
    eng = QueryEngine(spark, store, qcfg)
    eng.wand_topk(queries, k=20).count()  # warm-up
    warm_mark = time.time() * 1000  # stages before this are warm-up
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
                    if si.get("Submission Time", 0) < warm_mark:
                        continue
                    sid = si["Stage ID"]
                    stages.setdefault(sid, {"task_s": 0.0, "gc_s": 0.0})
                    stages[sid].update({
                        "name": si["Stage Name"].split("\n")[0][:70],
                        "tasks": si["Number of Tasks"],
                        "wall_s": round((si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000, 2),
                    })
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    if sid not in stages:
                        stages[sid] = {"name": "?", "tasks": 0, "wall_s": 0.0,
                                       "task_s": 0.0, "gc_s": 0.0}
                    tm = ev.get("Task Metrics") or {}
                    stages[sid]["task_s"] += tm.get("Executor Run Time", 0) / 1000
                    stages[sid]["gc_s"] += tm.get("JVM GC Time", 0) / 1000
    print(f"query_s={query_s:.2f} cpus={cpus} S={s_override or 'auto'} n_queries={n_queries}")
    timed = [s for s in stages.values() if s.get("wall_s")]
    tot_wall = sum(s["wall_s"] for s in timed)
    print(f"sum stage wall {tot_wall:.1f}s  (gaps/driver: {query_s - tot_wall:.1f}s)")
    for sid in sorted(k for k, s in stages.items() if s.get("wall_s")):
        s = stages[sid]
        par = s["task_s"] / s["wall_s"] if s["wall_s"] else 0
        print(f"stage {sid:3d} wall={s['wall_s']:7.2f}s tasks={s.get('tasks',0):4d} "
              f"tasktime={s['task_s']:7.1f}s par={par:5.2f} gc={s['gc_s']:5.1f}s  {s.get('name','?')}")
    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()
