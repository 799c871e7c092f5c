"""Operator/query modules.  Each module registers named queries
(with DuckDB oracles where SQL-expressible) via `registry.register`.
"""
