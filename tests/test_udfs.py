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
