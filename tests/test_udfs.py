"""UDF tiers agree with the expression tier (SURVEY.md §7 Phase 4:
re-express the tokenizer as a UDF, check equality with the
built-in version)."""

from db_mapreduce_project_spark import registry


def _wc_rows(df):
    return sorted((r["word"], r["cnt"]) for r in df.collect())


def test_pandas_udf_tokenizer_equals_builtin(spark, sf_dir):
    builtin = registry.QUERIES["wordcount"](spark, sf_dir)
    udf = registry.QUERIES["udf_wordcount"](spark, sf_dir)
    assert _wc_rows(builtin) == _wc_rows(udf)


def test_applyinpandas_zscore_shape(spark, sf_dir):
    df = registry.QUERIES["applyinpandas_zscore"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    # z-scores of a full group mean ~0
    zs = [r["z"] for r in rows]
    assert abs(sum(zs) / len(zs)) < 0.1


def test_parameterized_sql(spark, sf_dir):
    """Spark 4 named-parameter SQL: same engine, injection-safe
    textual surface."""
    from db_mapreduce_project_spark.io import register_temp_views

    register_temp_views(spark, sf_dir)
    got = spark.sql(
        "SELECT count(*) AS n FROM orders WHERE o_totalprice > :thresh",
        args={"thresh": 200000.0},
    ).collect()[0]["n"]
    expected = spark.sql(
        "SELECT count(*) AS n FROM orders WHERE o_totalprice > 200000.0"
    ).collect()[0]["n"]
    assert got == expected and got > 0
