#!/usr/bin/env python
"""Same-session A/B of the round-14 eager cache pins.

Usage:  python scripts/probe_pins_ab.py [--reps N] q1 q2 ...

For each named registered query, measures bench-identical cold+warm
pairs with common.EAGER_PINS True and False, INTERLEAVED
(on, off, on, off ...) so host drift cancels, clearing the SQL cache
and persistent RDDs between pairs exactly like bench.py. Reports the
min warm and min cold per arm. The pins are semantically inert (a
count() on a persisted DataFrame); this probe measures only their cost
at bench SF vs the cache-race re-runs they prevent.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_query_engine_spark.pipeline import common  # noqa: E402
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
    reps = 2
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    spark = get_spark(app_name="probe_pins_ab")
    queries = all_queries()
    queries["flagship_region_nation_revenue"](spark, SF_DIR).write.mode(
        "overwrite"
    ).format("noop").save()
    _clear(spark)

    import gc

    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        res = {"on": {"cold": [], "warm": []}, "off": {"cold": [], "warm": []}}
        for r in range(reps):
            for arm in ("on", "off") if r % 2 == 0 else ("off", "on"):
                common.EAGER_PINS = arm == "on"
                gc.collect()
                spark.sparkContext._jvm.System.gc()
                for kind in ("cold", "warm"):
                    start = time.perf_counter()
                    df = fn(spark, SF_DIR)
                    df.write.mode("overwrite").format("noop").save()
                    res[arm][kind].append(round(time.perf_counter() - start, 3))
                _clear(spark)
        common.EAGER_PINS = True
        out[name] = {
            "on_cold": min(res["on"]["cold"]),
            "on_warm": min(res["on"]["warm"]),
            "off_cold": min(res["off"]["cold"]),
            "off_warm": min(res["off"]["warm"]),
            "raw": res,
        }
        print(
            f"{name}: pins ON cold={out[name]['on_cold']} warm={out[name]['on_warm']}"
            f" | OFF cold={out[name]['off_cold']} warm={out[name]['off_warm']}",
            flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
