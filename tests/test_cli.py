"""CLI front-end smoke: named-query runner, one-shot SQL, --list,
and --explain all work against the fixtures (the reference's TUI
surface, maprdeuce.cpp:1232-1427, re-expressed as a SQL shell)."""

from db_mapreduce_project_spark.cli import main

SF = "/root/testdata/sf0.001"


def test_cli_named_query(spark, capsys):
    assert main(["--query", "wordcount", "--sf", SF, "--max-rows", "5"]) == 0
    out = capsys.readouterr().out
    assert "word" in out and "cnt" in out


def test_cli_one_shot_sql(spark, capsys):
    assert main(["SELECT count(*) AS n FROM region", "--sf", SF]) == 0
    assert "5" in capsys.readouterr().out  # 5 TPC-H regions


def test_cli_list_names(spark, capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "wordcount" in out and "dedup_minhash_lsh" in out


def test_cli_explain(spark, capsys):
    assert main(["--query", "q6_forecast_revenue", "--sf", SF, "--explain"]) == 0
    assert "Physical Plan" in capsys.readouterr().out
