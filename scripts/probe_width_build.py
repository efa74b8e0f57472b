"""Probe: why is index build at local[32] slower than local[8]?

Runs the scaling-bench build (same config, taskset-pinned fresh JVM per
width) once per width after a warm-up, and prints per-stage seconds from
the store lineage. Diagnostic only — not part of bench.py.

Usage: python scripts/probe_width_build.py [n_docs] [widths_csv]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from tiny_search_engine_spark.session import get_spark, scratch_dir
from tiny_search_engine_spark.synth import source_files, make_stopwords
from tiny_search_engine_spark.build import build_index, BuildConfig

cpus = {cpus}
n_docs = {n_docs}
spark = get_spark(app_name=f"probe_w{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
cfg = BuildConfig(tokenizer="code", stopwords=frozenset(make_stopwords()),
                  write_tokens=False, copy_content=False,
                  per_bucket_metrics=False)
src = source_files(spark, n_docs, seed=42).cache()
src.count()
work = scratch_dir(f"probe_w{cpus}_")

# warm-up (1/5 size, discarded)
wsrc = source_files(spark, max(10_000, n_docs // 5), seed=43).cache()
wsrc.count()
build_index(spark, wsrc, os.path.join(work, "warm"), cfg)
wsrc.unpersist()
shutil.rmtree(os.path.join(work, "warm"), ignore_errors=True)

t0 = time.time()
store = build_index(spark, src, os.path.join(work, "store"), cfg)
build_s = time.time() - t0
with open(os.path.join(store.lineage_path, "build.json")) as f:
    stages = json.load(f)["stage_seconds"]
print("RESULT " + json.dumps({{"cpus": cpus, "build_s": round(build_s, 2),
                               "stages": stages}}))
shutil.rmtree(work, ignore_errors=True)
spark.stop()
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    widths = [int(w) for w in (sys.argv[2] if len(sys.argv) > 2 else "8,32").split(",")]
    for cpus in widths:
        code = CHILD.format(repo=REPO, cpus=cpus, n_docs=n_docs)
        cmd = [sys.executable, "-c", code]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["/usr/bin/taskset", "-c", f"0-{cpus - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        hit = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not hit:
            print(f"child {cpus} failed:\n{out.stdout[-1500:]}\n{out.stderr[-2000:]}")
            continue
        print(hit[0])


if __name__ == "__main__":
    main()
