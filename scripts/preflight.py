#!/usr/bin/env python
"""Pre-flight smoke gate: analyze + materialize one row of EVERY
registered query against the CURRENT fixtures.

The round-2 lesson: 165 locally-green queries can all go red at once
when the fixture generator changes an encoding (events.ts moved from
TIMESTAMP(NANOS) to plain timestamp[us]/TIMESTAMP_NTZ and broke every
epoch cast and watermark).  Analysis errors are cheap to catch — this
sweeps `.explain()` (catches AnalysisException at plan time) plus a
`limit(1)` materialization (catches runtime codegen/UDF failures) for
each query at sf0.001 and fails loudly with the query name.

Run BEFORE bench.py in any round:  python scripts/preflight.py

Exit 0 = every registered query plans and executes on the current
fixtures.  ~1-2 min at sf0.001.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from db_mapreduce_project_spark import registry
from db_mapreduce_project_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    registry.load_all_queries()
    names = args.queries or sorted(registry.QUERIES)
    spark = get_spark("preflight")
    failures: list[tuple[str, str]] = []
    for name in names:
        t0 = time.time()
        try:
            df = registry.QUERIES[name](spark, args.sf)
            # plan-time gate: resolves + optimizes the full plan
            df._jdf.queryExecution().executedPlan()
            # runtime gate: one row through the physical operators
            df.limit(1).collect()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"{type(exc).__name__}: {exc}"))
            print(f"[FAIL] {name}: {type(exc).__name__}: {exc}", flush=True)
            continue
        print(f"[ ok ] {name} ({time.time() - t0:.1f}s)", flush=True)

    print(f"\n{len(names) - len(failures)}/{len(names)} queries pre-flight clean")
    for name, err in failures:
        print(f"  FAILED: {name}: {err.splitlines()[0][:200]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
