"""Scalar / higher-order function library (SURVEY.md §2.2 rows
"String functions" .. "Array/map/JSON functions").

Everything here is built from `pyspark.sql.functions` so it stays
JVM-side inside whole-stage codegen; Python/pandas UDFs appear only
in `udfs.py` where they are the explicit pluggable-map/reduce
surface the reference lacked.
"""
