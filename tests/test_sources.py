"""Source/sink surface: csv/json/text round-trips, overwrite
semantics (the reference's remove_befor_map_file, maprdeuce.cpp:
428-455, replaced by SaveMode.Overwrite), and the reference's exact
'word count' text sink format (maprdeuce.cpp:322-329)."""

import glob

from pyspark.sql import functions as F

from db_mapreduce_project_spark.io import load_table
from db_mapreduce_project_spark.sources.readers import (
    read_csv,
    read_json,
    read_text,
)
from db_mapreduce_project_spark.sources.writers import (
    write_csv,
    write_parquet,
    write_wordcount_text,
)


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    back = read_csv(
        spark, path, "n_nationkey int, n_name string, n_regionkey int"
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation.collect())
    )


def test_json_roundtrip(spark, sf_dir, tmp_path):
    region = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_json")
    region.write.mode("overwrite").json(path)
    back = read_json(spark, path, "r_regionkey int, r_name string")
    assert sorted(map(tuple, back.select("r_regionkey", "r_name").collect())) == sorted(
        map(tuple, region.collect())
    )


def test_parquet_overwrite_idempotent(spark, sf_dir, tmp_path):
    region = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_pq")
    write_parquet(region, path)
    write_parquet(region, path)  # second write must replace, not append
    assert spark.read.parquet(path).count() == region.count()


def test_wordcount_text_sink_format(spark, sf_dir, tmp_path):
    """Sink output replicates the reference: '"word count"' lines,
    sorted ascending."""
    from db_mapreduce_project_spark.functions.text import words

    docs = load_table(spark, sf_dir, "documents")
    wc = (
        words(docs, "text")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    path = str(tmp_path / "result_txt")
    write_wordcount_text(wc, path)
    lines = []
    for f in sorted(glob.glob(path + "/part-*")):
        with open(f) as fh:
            lines += [ln.rstrip("\n") for ln in fh]
    assert lines == sorted(lines)
    assert all(len(ln.split(" ")) == 2 for ln in lines)
    word, cnt = lines[0].split(" ")
    assert cnt.isdigit()
    back = read_text(spark, path)
    assert back.count() == wc.count()
