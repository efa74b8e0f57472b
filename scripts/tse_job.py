#!/usr/bin/env python
"""Thin spark-submit launcher: ships with --py-files, dispatches to
tiny_search_engine_spark.jobs
(build | query | grep | shards | select | classify).

    spark-submit --py-files dist/tiny_search_engine_spark.zip \
        scripts/tse_job.py build --source iceberg:db.repos --out /store

When the zip is on --py-files, Spark puts it on every executor's (and the
driver's) sys.path; the repo-root fallback below covers bare
``python scripts/tse_job.py`` invocations during development.
"""

import os
import sys

try:
    from tiny_search_engine_spark.jobs import main
except ImportError:  # dev invocation without --py-files
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tiny_search_engine_spark.jobs import main

if __name__ == "__main__":
    raise SystemExit(main())
