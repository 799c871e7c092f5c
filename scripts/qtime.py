#!/usr/bin/env python
"""Isolated per-query timing for optimization work (round 13).

Times the named queries with the noop sink (guide §1.4), min/median
over n runs, with the same cross-query cache isolation as bench.py.
Also supports --explain to dump .explain("formatted") per query.

Usage:
  python scripts/qtime.py [--sf DIR] [-n N] [--explain DIR] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from db_mapreduce_project_spark import registry
from db_mapreduce_project_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="DIR")
    ap.add_argument("--suffix", default="", help="filename suffix for explain dumps")
    ap.add_argument(
        "--cold",
        action="store_true",
        help="clearCache between same-query repeats (round-13 ADVICE: "
        "the default warm mode flatters cache-introducing changes; "
        "use --cold when A/B-ing a change that adds .cache())",
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    registry.load_all_queries()
    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footers
    registry.QUERIES["wordcount"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for name in args.queries:
        fn = registry.QUERIES[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
            spark.catalog.clearCache()
        runs = []
        for _ in range(args.n):
            if args.cold:
                spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        runs.sort()
        out[name] = {
            "min": round(runs[0], 3),
            "median": round(runs[len(runs) // 2], 3),
            "max": round(runs[-1], 3),
        }
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
