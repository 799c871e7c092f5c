"""Query registry — the single source of truth for the driver
contract (__spark_entry__.py) and for the parity tests.

Every operator the engine claims (SURVEY.md §2) registers here as a
named query callable `(spark, sf_dir) -> DataFrame`, optionally with
an equivalent DuckDB-runnable ANSI SQL oracle.  Queries without an
oracle (non-SQL-expressible ops: LSH, stateful streaming, pandas-UDF
pipelines) get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in QUERIES:
        raise ValueError(f"duplicate query registration: {name}")
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def query(name: str, oracle: str | None = None):
    """Decorator form of :func:`register`."""

    def deco(fn: QueryFn) -> QueryFn:
        register(name, fn, oracle)
        return fn

    return deco


def load_all_queries() -> None:
    """Import every operator module (each registers its queries on
    import).  Idempotent."""
    from .functions import udfs  # noqa: F401
    from .operators import (  # noqa: F401
        assembly,
        avi,
        behavior,
        classic,
        classic2,
        classic3,
        clustering,
        corpus_stats,
        curation,
        dedup,
        extended,
        frequent,
        functions_sweep,
        graph,
        incremental,
        intervals,
        jpeg,
        layout,
        lm,
        mp3,
        multimodal,
        profiling,
        relational,
        retrieval,
        rollups,
        selection,
        sharding,
        skew,
        sketches,
        semistructured,
        similarity,
        text_analysis,
        timeseries,
        tokenizer,
        tokenizer_unigram,
        windows,
        wordcount,
    )
    from .sources import wordfile_source  # noqa: F401
    from .streaming import jobs, stateful  # noqa: F401
