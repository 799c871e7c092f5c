#!/usr/bin/env python
"""Run the local oracle-parity check for all (or selected)
registered queries.

Usage: python scripts/run_parity.py [--sf DIR] [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from db_mapreduce_project_spark import registry
from db_mapreduce_project_spark.oracle_check import check_query
from db_mapreduce_project_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    registry.load_all_queries()
    names = args.queries or sorted(registry.QUERIES)
    spark = get_spark("parity-check")
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            res = check_query(spark, name, args.sf)
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"[ERR ] {name}: {type(exc).__name__}: {exc}")
            continue
        dt = time.time() - t0
        print(f"{res}  ({dt:.1f}s)")
        if not res.ok:
            failures += 1
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
