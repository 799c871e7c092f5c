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


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    write_parquet(orders, path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = back.queryExecution.executedPlan.toString() if hasattr(
        back, "queryExecution"
    ) else back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    expected = orders.where(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected


def test_bucketed_write_joins_without_shuffle(spark, sf_dir, tmp_path):
    from db_mapreduce_project_spark.plans.inspect import count_exchanges
    from db_mapreduce_project_spark.sources.writers import (
        write_bucketed_table,
    )

    orders = load_table(spark, sf_dir, "orders")
    write_bucketed_table(
        orders, "orders_bkt", "o_custkey", num_buckets=4,
        path=str(tmp_path / "orders_bkt"),
    )
    try:
        t = spark.table("orders_bkt")
        agg = t.groupBy("o_custkey").count()
        # aggregation on the bucket key: data already co-located
        assert count_exchanges(agg) == 0, agg._jdf.queryExecution().executedPlan().toString()
        a = t.select("o_custkey", "o_totalprice")
        b = t.select("o_custkey", "o_orderkey")
        joined = a.join(b, "o_custkey")
        assert count_exchanges(joined) == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bkt")


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from db_mapreduce_project_spark.plans.inspect import pushed_filters
    from db_mapreduce_project_spark.sources.readers import read_orc
    from db_mapreduce_project_spark.sources.writers import write_orc

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(nation, path)
    back = read_orc(spark, path)
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in nation.collect()
    )
    # ORC scans take predicate pushdown like parquet
    filtered = back.where(back.n_nationkey > 10)
    assert "n_nationkey" in pushed_filters(filtered)


def test_observed_write_metrics(spark, sf_dir):
    # Observation metrics ride the job's own pass: row count + null
    # tally collected without a second scan
    from db_mapreduce_project_spark.operators.profiling import observed_write

    docs = load_table(spark, sf_dir, "documents")
    got = observed_write(
        docs,
        "docs_quality",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_text": F.sum(F.isnull("text").cast("long")),
            "n_langs": F.approx_count_distinct("lang"),  # observe() forbids exact distinct
        },
    )
    assert got["n_rows"] == docs.count()
    assert got["n_null_text"] == 0
    assert got["n_langs"] >= 1


def test_range_clustered_write_has_disjoint_file_ranges(spark, sf_dir, tmp_path):
    from db_mapreduce_project_spark.sources.writers import (
        write_range_clustered_parquet,
    )

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_clustered")
    write_range_clustered_parquet(orders, path, "o_orderkey", partitions=4)
    # per-file [min,max] spans of the cluster column must not overlap
    spans = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        part = spark.read.parquet(f)
        row = part.agg(
            F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
        ).collect()[0]
        spans.append((row["lo"], row["hi"]))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, f"overlapping file ranges {spans}"
    # and the clustered copy still holds all rows
    assert spark.read.parquet(path).count() == orders.count()


def test_zordered_write_prunes_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order layout property: per-file min/max spans stay tight on
    BOTH interleaved keys, so point predicates on either column rule
    out most files — 1-D range clustering only achieves this for its
    single sort key."""
    from db_mapreduce_project_spark.sources.writers import (
        write_zordered_parquet,
    )

    l = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "lineitem_z")
    write_zordered_parquet(l, path, "l_partkey", "l_suppkey", partitions=8)

    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) >= 4
    spans = []
    for f in files:
        row = (
            spark.read.parquet(f)
            .agg(
                F.min("l_partkey").alias("plo"),
                F.max("l_partkey").alias("phi"),
                F.min("l_suppkey").alias("slo"),
                F.max("l_suppkey").alias("shi"),
            )
            .collect()[0]
        )
        spans.append(row)

    stats = l.agg(
        F.max("l_partkey").alias("pmax"), F.max("l_suppkey").alias("smax")
    ).collect()[0]

    def admit_fraction(key_lo, key_hi, probes):
        admits = sum(
            1
            for v in probes
            for s in spans
            if s[key_lo] <= v <= s[key_hi]
        )
        return admits / (len(probes) * len(spans))

    p_probes = [1 + i * stats["pmax"] // 8 for i in range(8)]
    s_probes = [1 + i * stats["smax"] // 8 for i in range(8)]
    # each point predicate must rule out files on BOTH dimensions
    assert admit_fraction("plo", "phi", p_probes) <= 0.7
    assert admit_fraction("slo", "shi", s_probes) <= 0.7
    # and the clustered copy still holds all rows
    assert spark.read.parquet(path).count() == l.count()


def test_wordfile_custom_datasource_roundtrip(spark, sf_dir, tmp_path):
    # the reference's text sink read back through the Spark-4 Python
    # DataSource connector: same rows, declared schema, one input
    # partition per file
    from db_mapreduce_project_spark.registry import QUERIES
    from db_mapreduce_project_spark.sources.wordfile_source import (
        register_wordfile_source,
    )

    wc = QUERIES["wordcount"](spark, sf_dir)
    path = str(tmp_path / "wordfile_out")
    write_wordcount_text(wc, path)

    register_wordfile_source(spark)
    back = spark.read.format("wordfile").option("path", path).load()
    assert back.schema.simpleString() == "struct<word:string,cnt:bigint>"
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, wc.collect())
    )


def test_wordfile_datasource_partitions_per_file(spark, tmp_path):
    from db_mapreduce_project_spark.sources.wordfile_source import (
        register_wordfile_source,
    )

    d = tmp_path / "many"
    d.mkdir()
    (d / "part-00000.txt").write_text("alpha 3\nbeta 2\n")
    (d / "part-00001.txt").write_text("gamma 7\n")

    register_wordfile_source(spark)
    back = spark.read.format("wordfile").option("path", str(d)).load()
    assert back.rdd.getNumPartitions() == 2
    assert sorted(map(tuple, back.collect())) == [
        ("alpha", 3),
        ("beta", 2),
        ("gamma", 7),
    ]


def test_wordfile_datasource_writer_roundtrip(spark, sf_dir, tmp_path):
    # df.write.format("wordfile") — parallel per-partition writer,
    # no coalesce(1): N partitions -> N part files, rename-on-commit.
    # Read-after-write must reproduce the frame exactly and agree
    # with the single-file write_wordcount_text golden sink.
    import glob as _glob

    from db_mapreduce_project_spark.registry import QUERIES
    from db_mapreduce_project_spark.sources.wordfile_source import (
        register_wordfile_source,
    )

    register_wordfile_source(spark)
    wc = QUERIES["wordcount"](spark, sf_dir)
    path = str(tmp_path / "wf_writer")
    wc.repartition(4).write.format("wordfile").mode("overwrite").save(path)

    parts = _glob.glob(path + "/part-*")
    assert len(parts) == 4  # one file per partition, no single-writer
    assert not _glob.glob(path + "/.part-*")  # temps all committed

    back = spark.read.format("wordfile").option("path", path).load()
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, wc.collect())
    )

    # matches the golden single-file sink line-for-line once sorted
    golden = str(tmp_path / "wf_golden")
    write_wordcount_text(wc, golden)
    golden_lines = sorted(
        line
        for p in _glob.glob(golden + "/part-*")
        for line in open(p, encoding="utf-8").read().splitlines()
        if line
    )
    written_lines = sorted(
        line
        for p in parts
        for line in open(p, encoding="utf-8").read().splitlines()
        if line
    )
    assert written_lines == golden_lines

    # overwrite truncates: a second write leaves exactly one job's files
    wc.repartition(2).write.format("wordfile").mode("overwrite").save(path)
    assert len(_glob.glob(path + "/part-*")) == 2
    back2 = spark.read.format("wordfile").option("path", path).load()
    assert back2.count() == wc.count()

    # append adds files without clobbering (uuid-suffixed names)
    wc.repartition(1).write.format("wordfile").mode("append").save(path)
    assert len(_glob.glob(path + "/part-*")) == 3
    back3 = spark.read.format("wordfile").option("path", path).load()
    assert back3.count() == 2 * wc.count()


def test_dynamic_partition_pruning_on_partitioned_write(spark, sf_dir, tmp_path):
    # hive-partitioned sink + dimension filter => Catalyst injects a
    # dynamicpruningexpression into the fact scan's PartitionFilters:
    # at 100 TB the fact side reads ONLY the partitions the filtered
    # dim selects, decided at runtime from the broadcast result
    fact_path = str(tmp_path / "orders_by_year")
    dim_path = str(tmp_path / "year_dim")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "oyear", F.year("o_orderdate")
    )
    o.write.partitionBy("oyear").mode("overwrite").parquet(fact_path)
    spark.range(1990, 2010).select(
        F.col("id").cast("int").alias("oyear"),
        F.concat(F.lit("t"), F.col("id")).alias("tag"),
    ).write.mode("overwrite").parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).where(F.col("tag") == "t1995")
    j = fact.join(dim, "oyear").groupBy("tag").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower()


def test_wordfile_datasource_filter_pushdown(spark, tmp_path):
    # comparison filters on word/cnt evaluate inside the reader
    # (pushFilters keeps them); results match post-scan filtering
    from db_mapreduce_project_spark.sources.wordfile_source import (
        WordFileReader,
        register_wordfile_source,
    )
    from pyspark.sql.datasource import EqualTo, GreaterThan, StringStartsWith

    d = tmp_path / "wf"
    d.mkdir()
    (d / "part-00000.txt").write_text("alpha 3\nbeta 2\ngamma 7\nalpine 9\n")

    register_wordfile_source(spark)
    base = spark.read.format("wordfile").option("path", str(d)).load()
    got = sorted(
        map(tuple, base.where("cnt > 2 AND word LIKE 'al%'").collect())
    )
    assert got == [("alpha", 3), ("alpine", 9)]

    # unit-level: the reader keeps supported filters, returns the rest
    r = WordFileReader({"path": str(d)})
    leftover = list(
        r.pushFilters(
            [
                GreaterThan(("cnt",), 2),
                StringStartsWith(("word",), "al"),
                EqualTo(("other_col",), 1),
            ]
        )
    )
    assert len(r.filters) == 2
    assert len(leftover) == 1
    rows = [
        (w, c)
        for batch in r.read(next(iter(r.partitions())))
        for w, c in zip(
            batch.column("word").to_pylist(), batch.column("cnt").to_pylist()
        )
    ]
    assert sorted(rows) == [("alpha", 3), ("alpine", 9)]


def test_compact_small_files(spark, sf_dir, tmp_path):
    # 64 tiny files -> compaction rewrites into the computed count,
    # preserving every row; target sized so multiple outputs remain
    import glob as _glob

    from db_mapreduce_project_spark.sources.writers import compact_parquet

    e = load_table(spark, sf_dir, "events")
    small = str(tmp_path / "small")
    e.repartition(64).write.parquet(small)
    assert len(_glob.glob(small + "/part-*.parquet")) == 64

    compacted = str(tmp_path / "compacted")
    n_out = compact_parquet(spark, small, compacted, target_bytes=256 * 1024)
    files = _glob.glob(compacted + "/part-*.parquet")
    assert len(files) == n_out < 64
    assert spark.read.parquet(compacted).count() == e.count()


def test_parquet_merge_schema_evolution(spark, sf_dir, tmp_path):
    # v1 files lack a column added in v2: mergeSchema unions the
    # footers; v1 rows read NULL for the new column
    from db_mapreduce_project_spark.sources.readers import (
        read_parquet_merged,
    )

    path = str(tmp_path / "evolving")
    r = load_table(spark, sf_dir, "region")
    r.select("r_regionkey", "r_name").write.parquet(path)
    r.select(
        "r_regionkey", "r_name", F.lit(7).alias("r_version")
    ).write.mode("append").parquet(path)

    merged = read_parquet_merged(spark, path)
    assert set(merged.columns) == {"r_regionkey", "r_name", "r_version"}
    assert merged.count() == 2 * r.count()
    assert merged.where(F.col("r_version").isNull()).count() == r.count()


def test_json_permissive_captures_corrupt_records(spark, tmp_path):
    from db_mapreduce_project_spark.sources.readers import (
        read_json_permissive,
    )

    p = tmp_path / "feed.json"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        "this is not json\n"
        '{"id": 2, "v": "also ok"}\n'
        '{"id": "wrong-type"}\n'
    )
    df = read_json_permissive(spark, str(p), "id bigint, v string")
    rows = df.collect()
    assert len(rows) == 4
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["id"] for r in good} == {1, 2}
    assert len(bad) == 2  # the raw payloads are preserved for quarantine
    assert any("not json" in r["_corrupt_record"] for r in bad)


def test_json_permissive_structtype_schema(spark, tmp_path):
    # ADVICE r3: the StructType branch must also capture corrupt
    # rows (it used to silently null them), and must not mutate
    # the caller's schema object
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from db_mapreduce_project_spark.sources.readers import (
        read_json_permissive,
    )

    p = tmp_path / "feed.json"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        "garbage line\n"
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("v", StringType())]
    )
    df = read_json_permissive(spark, str(p), schema)
    assert "_corrupt_record" in df.columns
    rows = df.collect()
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and "garbage" in bad[0]["_corrupt_record"]
    # caller's StructType untouched
    assert [f.name for f in schema.fields] == ["id", "v"]


def test_compact_parquet_rejects_in_place(spark, sf_dir, tmp_path):
    # ADVICE r3: overwrite-mode delete-before-read would destroy the
    # input if in_path == out_path
    import pytest as _pytest

    from db_mapreduce_project_spark.sources.writers import compact_parquet

    path = str(tmp_path / "data")
    load_table(spark, sf_dir, "region").write.parquet(path)
    with _pytest.raises(ValueError, match="must differ"):
        compact_parquet(spark, path, str(tmp_path / "data"))
    # input survived the rejected call
    assert spark.read.parquet(path).count() == 5


def test_compressed_text_and_jsonl_sources(spark, sf_dir, tmp_path):
    """Compressed arrival formats — how 100 TB of crawl data
    actually lands: gzip JSONL written OUTSIDE Spark (stdlib gzip,
    the upstream-producer path) and zstd text written by Spark
    itself, both read back transparently by the normal readers.
    Operational note the test encodes: gzip/zstd text files are
    NON-SPLITTABLE — each file decompresses in one task, so
    upstream file sizing (not maxPartitionBytes) sets the scan
    parallelism for compressed corpora."""
    import gzip
    import json as _json

    from db_mapreduce_project_spark.sources.readers import read_json

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .limit(50)
        .collect()
    )

    # gzip JSONL produced outside Spark
    gz_dir = tmp_path / "docs_jsonl_gz"
    gz_dir.mkdir()
    with gzip.open(gz_dir / "part-000.json.gz", "wt", encoding="utf-8") as f:
        for r in docs:
            f.write(_json.dumps(
                {"doc_id": r["doc_id"], "lang": r["lang"], "text": r["text"]}
            ) + "\n")
    back = read_json(
        spark, str(gz_dir), "doc_id bigint, lang string, text string"
    )
    got = {(r["doc_id"], r["lang"], r["text"]) for r in back.collect()}
    assert got == {(r["doc_id"], r["lang"], r["text"]) for r in docs}
    # non-splittable: the single .gz file scans as one partition
    assert back.rdd.getNumPartitions() == 1

    # gzip-compressed text written by Spark, read back by Spark
    gz_txt_dir = str(tmp_path / "docs_text_gz")
    lines = spark.createDataFrame(
        [(r["text"],) for r in docs], "value string"
    ).coalesce(1)
    lines.write.option("compression", "gzip").mode("overwrite").text(gz_txt_dir)
    import os

    assert any(
        f.endswith(".gz") for f in os.listdir(gz_txt_dir)
    ), os.listdir(gz_txt_dir)
    back_txt = sorted(r["value"] for r in spark.read.text(gz_txt_dir).collect())
    assert back_txt == sorted(r["text"] for r in docs)
