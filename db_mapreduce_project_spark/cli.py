"""Interactive SQL shell / one-shot query runner — the engine's
front-end, replacing the reference's console TUI
(maprdeuce.cpp:1232-1427: drawMainScreen / showMenuOptions /
tryProgram) with the obvious Spark-native surface: fixture tables
registered as temp views + free-form Spark SQL, plus the named
queries from the registry.

Usage:
    python -m db_mapreduce_project_spark.cli                      # REPL
    python -m db_mapreduce_project_spark.cli "SELECT count(*) FROM lineitem"
    python -m db_mapreduce_project_spark.cli --query wordcount    # named query
    python -m db_mapreduce_project_spark.cli --list               # list names
    python -m db_mapreduce_project_spark.cli --sf /root/testdata/sf0.01 ...

Driver-side display is capped (`--max-rows`, default 50) — the shell
never collects an unbounded result, so pointing it at a 100 TB
warehouse is safe: `show(n)` runs a limit-pushdown plan, not a full
materialization.
"""

from __future__ import annotations

import argparse
import sys

from . import registry
from .io import DEFAULT_SF_DIR, TABLES, load_table
from .session import get_spark


def register_views(spark, sf_dir: str) -> None:
    """Expose every fixture table as a temp view for free-form SQL."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark, sql: str, max_rows: int) -> None:
    df = spark.sql(sql)
    df.show(n=max_rows, truncate=False)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="db_mapreduce_project_spark.cli")
    ap.add_argument("sql", nargs="?", help="one-shot SQL statement")
    ap.add_argument("--sf", default=DEFAULT_SF_DIR, help="fixture dir")
    ap.add_argument("--query", help="run a named registry query")
    ap.add_argument("--list", action="store_true", help="list named queries")
    ap.add_argument("--max-rows", type=int, default=50)
    ap.add_argument("--explain", action="store_true", help="print the physical plan instead of rows")
    args = ap.parse_args(argv)

    registry.load_all_queries()
    if args.list:
        for name in sorted(registry.QUERIES):
            tag = "oracle" if name in registry.ORACLES else "rows-only"
            print(f"{name}  [{tag}]")
        return 0

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("WARN")
    register_views(spark, args.sf)

    if args.query:
        df = registry.QUERIES[args.query](spark, args.sf)
        if args.explain:
            df.explain("formatted")
        else:
            df.show(n=args.max_rows, truncate=False)
        return 0

    if args.sql:
        run_sql(spark, args.sql, args.max_rows)
        return 0

    # REPL: one statement per line, like the reference's menu loop
    # but over the full SQL surface instead of three fixed modes.
    print(f"tables: {', '.join(TABLES)}  (sf_dir={args.sf})")
    print("enter SQL, or :q to quit, :names for registry queries")
    while True:
        try:
            line = input("sql> ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            return 0
        if not line:
            continue
        if line in {":q", ":quit", "exit"}:
            return 0
        if line == ":names":
            print(" ".join(sorted(registry.QUERIES)))
            continue
        try:
            run_sql(spark, line, args.max_rows)
        except Exception as exc:  # noqa: BLE001 — REPL must survive bad SQL
            print(f"error: {type(exc).__name__}: {exc}", file=sys.stderr)


if __name__ == "__main__":
    raise SystemExit(main())
