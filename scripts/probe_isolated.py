#!/usr/bin/env python
"""Isolated per-query measurement + formatted-plan capture.

Usage:  python scripts/probe_isolated.py [--plans DIR] [--reps N] q1 q2 ...

For each named registered query: builds the DataFrame fresh per rep
(mirroring bench.py: build + noop sink are the timed unit), records
cold + N warm reps, and (with --plans) writes the .explain("formatted")
output to DIR/<name>.txt.  Caches are cleared between queries exactly
like bench.py so numbers are comparable.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_query_engine_spark.queries import all_queries  # noqa: E402
from csv_query_engine_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _clear(spark):
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    for rdd in spark.sparkContext._jvm.scala.collection.JavaConverters.mapAsJavaMap(
        jsc.getPersistentRDDs()
    ).values():
        rdd.unpersist(False)


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    reps = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    spark = get_spark(app_name="probe_isolated")
    queries = all_queries()
    # untimed JVM warmup
    queries["flagship_region_nation_revenue"](spark, SF_DIR).write.mode(
        "overwrite"
    ).format("noop").save()
    _clear(spark)

    out: dict[str, dict] = {}
    import gc

    for name in names:
        fn = queries[name]
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        times = []
        for r in range(1 + reps):
            start = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - start, 3))
            if r == 0 and plans_dir:
                os.makedirs(plans_dir, exist_ok=True)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain(mode="formatted")
                with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                    f.write(buf.getvalue())
        _clear(spark)
        out[name] = {"cold": times[0], "warm": times[1:]}
        print(f"ISOLATED {name}: cold={times[0]} warm={times[1:]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
