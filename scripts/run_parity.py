#!/usr/bin/env python
"""Run the local oracle-parity check for all (or selected)
registered queries.

With --json PATH, also writes a CORRECTNESS-shaped artifact — one
record per query `{rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}` — so full local sweeps are durable,
diffable evidence (the driver samples ~50 queries per round; this
covers all of them).

Usage: python scripts/run_parity.py [--sf DIR] [--json PATH] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from db_mapreduce_project_spark import registry
from db_mapreduce_project_spark.oracle_check import check_query
from db_mapreduce_project_spark.session import get_spark


def _record(res) -> dict:
    """CompareResult -> CORRECTNESS_r*.json record shape."""
    if res.name.endswith("(rows-only)"):
        return {
            "rows_match": True,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": res.spark_rows,
            "oracle_rows": None,
            "err": None,
            "mode": "rows-only",
        }
    # structured flags from CompareResult — never parse the
    # human-readable error strings (they are display text, not API)
    return {
        "rows_match": res.rows_ok,
        "schema_match": res.schema_ok,
        "hash_match": res.ok,
        "spark_rows": res.spark_rows,
        "oracle_rows": res.oracle_rows,
        "err": "; ".join(res.errors) if res.errors else None,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", dest="json_path", default=None)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    registry.load_all_queries()
    names = args.queries or sorted(registry.QUERIES)
    spark = get_spark("parity-check")
    records: dict[str, dict] = {}
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            try:
                res = check_query(spark, name, args.sf)
            finally:
                # several dedup/similarity queries .cache()
                # intermediates that stay pinned after
                # materialization; across a 179-query sweep those
                # dead blocks would crowd the block manager
                spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"[ERR ] {name}: {type(exc).__name__}: {exc}")
            records[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(exc).__name__}: {exc}",
            }
            continue
        dt = time.time() - t0
        print(f"{res}  ({dt:.1f}s)")
        records[name.removesuffix(" (rows-only)")] = _record(res)
        if not res.ok:
            failures += 1
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    if args.json_path:
        with open(args.json_path, "w", encoding="utf-8") as f:
            json.dump(records, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"archived -> {args.json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
