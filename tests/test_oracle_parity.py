"""Differential testing against the DuckDB oracle (SURVEY.md §5.2
item 2) — the same comparison the driver's t2 gate runs, executed
at sf0.001 for speed.  scripts/run_parity.py covers sf0.01."""

import pytest

from db_mapreduce_project_spark import registry
from db_mapreduce_project_spark.oracle_check import check_query

registry.load_all_queries()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    res = check_query(spark, name, sf_dir)
    assert res.ok, str(res)
