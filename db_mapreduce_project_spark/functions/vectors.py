"""Vector math over array<float> columns — pure Catalyst
higher-order functions (codegen'd, JVM-side; no UDF, no collect).

Determinism contract: every reduction casts elements to double
FIRST and folds left-to-right from a 0.0 seed.  The DuckDB oracles
use list_transform + list_reduce with the same order, so results
are bit-identical across engines — which lets similarity thresholds
and top-k ranks compare exactly after 6dp rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<float> columns, accumulated in
    double, left-to-right."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2sq(a: Column | str) -> Column:
    """Squared L2 norm."""
    return F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def l2(a: Column | str) -> Column:
    return F.sqrt(l2sq(a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (fixtures have no zero vectors; guarded
    with NULLIF anyway so ANSI mode never divides by zero)."""
    denom = F.nullif(l2(a) * l2(b), F.lit(0.0))
    return dot(a, b) / denom


# DuckDB SQL fragments implementing the SAME folds (for oracles).
def duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def duck_l2(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
        f"(acc, v) -> acc + v))"
    )


def duck_cosine(a: str, b: str) -> str:
    return f"({duck_dot(a, b)} / nullif({duck_l2(a)} * {duck_l2(b)}, 0.0))"
