"""Local replica of the driver's correctness gate: run each
registered query on Spark AND its DuckDB oracle over the same
parquet fixtures, compare row count + column names + exact values
(order-insensitive).  Used by tests/ and scripts/run_parity.py so
mismatches surface before the driver sees them.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from .io import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_cell(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, np.ndarray):
        return _canon_cell(v.tolist())
    if isinstance(v, np.generic):
        return _canon_cell(v.item())
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest roundtrip repr — exact double identity
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return f"{type(v).__name__}:{v!r}"


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Columns sorted by name, every cell canonicalized, rows
    sorted — mirrors the driver's order-insensitive value hash."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    out.sort()
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    errors: list[str] = field(default_factory=list)
    # structured per-dimension flags (the driver CORRECTNESS record
    # shape) — set by compare_frames; consumers must use these, not
    # parse the human-readable `errors` strings
    schema_ok: bool = True
    rows_ok: bool = True
    values_ok: bool = True

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for e in self.errors[:5]:
            msg += f"\n    {e}"
        return msg


def _normalize_numeric(df: pd.DataFrame) -> pd.DataFrame:
    """Unify integer dtypes (int32/int64 -> int64) and decode
    categoricals so canonical cells agree; leaves floats alone."""
    out = df.copy()
    for c in out.columns:
        dt = out[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            out[c] = out[c].astype("Int64")
        elif pd.api.types.is_float_dtype(dt) and str(dt) != "float64":
            out[c] = out[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(dt):
            out[c] = pd.to_datetime(out[c]).dt.tz_localize(None) if getattr(out[c].dt, "tz", None) else out[c]
    return out


def compare_frames(
    name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame
) -> CompareResult:
    errors: list[str] = []
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        errors.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return CompareResult(
            name,
            False,
            len(spark_pdf),
            len(oracle_pdf),
            errors,
            schema_ok=False,
            rows_ok=len(spark_pdf) == len(oracle_pdf),
            values_ok=False,
        )
    schema_ok = True
    for c in s_cols:
        sd = str(spark_pdf[c].dtype).lower().replace("int64", "i8").replace(
            "int32", "i4"
        )
        od = str(oracle_pdf[c].dtype).lower().replace("int64", "i8").replace(
            "int32", "i4"
        )
        # datetime64[us] vs [ns] is a pandas detail, not engine schema
        if sd.startswith("datetime64") and od.startswith("datetime64"):
            continue
        if len(spark_pdf) and (sd == "object" or od == "object"):
            continue  # strings/arrays — checked by value canon
        if sd != od:
            errors.append(f"dtype differs for {c!r}: spark={sd} oracle={od}")
            schema_ok = False
    s = canonical_rows(_normalize_numeric(spark_pdf))
    o = canonical_rows(_normalize_numeric(oracle_pdf))
    rows_ok = len(s) == len(o)
    if not rows_ok:
        errors.append(f"row counts differ: {len(s)} vs {len(o)}")
    values_ok = s == o
    if not values_ok:
        sset, oset = set(s), set(o)
        only_s = list(sset - oset)[:3]
        only_o = list(oset - sset)[:3]
        if only_s:
            errors.append(f"rows only in spark: {only_s}")
        if only_o:
            errors.append(f"rows only in oracle: {only_o}")
        if not only_s and not only_o:
            errors.append("multiset mismatch (duplicate multiplicities)")
    return CompareResult(
        name,
        not errors,
        len(s),
        len(o),
        errors,
        schema_ok=schema_ok,
        rows_ok=rows_ok,
        values_ok=values_ok,
    )


def check_query(spark, name: str, sf_dir: str) -> CompareResult:
    from .registry import ORACLES, QUERIES

    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        ok = True  # rows-only: just require it ran
        return CompareResult(name + " (rows-only)", ok, len(spark_pdf), -1)
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(ORACLES[name]).df()
    finally:
        con.close()
    return compare_frames(name, spark_pdf, oracle_pdf)
