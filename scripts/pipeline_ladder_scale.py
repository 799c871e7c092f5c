#!/usr/bin/env python
"""1M-document rung for the COMPOSED C4 curation pipeline —
VERDICT r10 #5: the dedup and ANN flagships have corpus-scale
certification rungs, but `c4_pipeline_end_to_end` (gates ->
line-dedup rewrite -> DSIR selection) was only ever certified at
fixture scale.  This ladder runs the identical composition
(curation.c4_pipeline_from — the registered query's own builder) on
the bounded-family expanded corpus and records per-stage walls and
survivor counts, the closest 100 TB rehearsal this sandbox allows.

Stage protocol (ann_recall_scale discipline): each boundary is its
own materializing action — gate survivor counts, the line-dedup
rewrite (localCheckpoint, exactly as the pipeline itself stages
it), DSIR weights, and the full composed chain end-to-end as the
ground-truth total (its own fresh run, NOT the sum of the stage
actions).

Corpus note: the dedup ladder's expand_families geometry suffixes
every WORD with a family tag — measured here to collapse the
Gopher gate to a 1.1% pass rate (the suffix inflates mean word
length past the gate band), which would starve every downstream
stage.  The pipeline rung instead uses a PLAIN expansion: `copies`
rows per base doc, text unchanged except one unique tail token —
natural word statistics for the gates, and every LINE of a base
doc appears `copies` times corpus-wide, which is exactly the
boilerplate geometry the C4 line-dedup stage exists for (its
group-by-line shuffle is linear in corpus size, no quadratic
hazard).

Writes rows into $PIPELINE_LADDER_OUT (default
PIPELINE_LADDER_r12.json — seeded with the r11 rungs so linearity
reads in one file).  Usage:
  python scripts/pipeline_ladder_scale.py [copies ...]  (default 200)

Round-12 (VERDICT r11 #5): the 2M rung (copies=400) confirms the
dominant line-dedup rewrite stage is linear in corpus size.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from db_mapreduce_project_spark.io import load_table
from db_mapreduce_project_spark.operators.curation import (
    _doc_segments,
    c4_pipeline_from,
    dsir_importance_weights_from,
    line_dedup_from,
)
from db_mapreduce_project_spark.operators.text_analysis import (
    gopher_rules_from,
    rep_lines_from,
)
from db_mapreduce_project_spark.session import get_spark
from scripts.dedup_ladder_scale import FAM_SIZE, SF_DIR


def expand_plain(d, copies: int):
    """`copies` rows per base doc, text unchanged except a unique
    tail token; doc_id = base * 10_000 + copy (collision-free for
    base < 1e7).  Natural-stats expansion for the gate stages —
    see the module docstring for why expand_families' word
    suffixing cannot be used here."""
    # the id encoding allots 4 decimal digits to the copy index; a
    # larger rung would silently collide copy ids across bases and
    # corrupt the pinned survivor counts (round-12 ADVICE)
    assert copies <= 10_000, (
        f"expand_plain: copies={copies} exceeds the 10_000 slots of "
        "the base*10_000+copy id encoding"
    )
    return d.select(
        F.col("doc_id").alias("base_id"),
        "text",
        F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("copy"),
    ).select(
        (F.col("base_id") * 10_000 + F.col("copy")).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" uc"), F.col("copy").cast("string")
        ).alias("text"),
    )


def _merge_dump(records: list, out_path: str) -> None:
    old = []
    if os.path.exists(out_path):
        try:
            old = json.load(open(out_path))
        except (OSError, ValueError):
            old = []
    merged = {(r["family"], r["copies"]): r for r in old}
    merged.update({(r["family"], r["copies"]): r for r in records})
    json.dump(list(merged.values()), open(out_path, "w"), indent=1)


def main() -> None:
    rungs = [int(a) for a in sys.argv[1:]] or [200]
    spark = get_spark("pipeline-ladder-scale")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        os.environ.get("PIPELINE_LADDER_OUT", "PIPELINE_LADDER_r12.json"),
    )
    records = []
    for copies in rungs:
        scratch = tempfile.mkdtemp(prefix=f"c4_rung_{copies}x_")
        t0 = time.perf_counter()
        # expand keeps only (doc_id, text); re-join lang/source
        # (gate + segment columns) from the base by base id
        expanded = expand_plain(
            base.select("doc_id", "text"), copies
        ).withColumn("base_id", (F.col("doc_id") / 10_000).cast("long"))
        (
            expanded.join(
                base.select(
                    F.col("doc_id").alias("base_id"), "lang", "source"
                ),
                "base_id",
            )
            .select("doc_id", "text", "lang", "source")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(scratch, "documents.parquet"))
        )
        docs = spark.read.parquet(
            os.path.join(scratch, "documents.parquet")
        )
        n_docs = docs.count()
        build_sec = round(time.perf_counter() - t0, 2)
        print(f"== rung {copies}x: {n_docs} docs, build {build_sec}s",
              flush=True)

        stages: dict[str, dict] = {}

        def stage(name: str, df) -> None:
            t0 = time.perf_counter()
            n = df.count()
            stages[name] = {
                "rows": n,
                "sec": round(time.perf_counter() - t0, 2),
            }
            print(f"   {name}: {stages[name]}", flush=True)

        g = gopher_rules_from(docs, require_stops=False).where(
            "keep"
        ).select("doc_id")
        stage("gopher_keep", g)
        r = rep_lines_from(docs).where("keep").select("doc_id")
        stage("rep_lines_keep", r)
        survivors = docs.join(g, "doc_id").join(r, "doc_id")
        stage("gate_survivors", survivors)
        # localCheckpoint is EAGER: the rewrite (and the whole gate
        # lineage above it) materializes AT THIS ASSIGNMENT, so the
        # materialization is timed here explicitly — the subsequent
        # count is a cheap checkpoint scan and would otherwise hide
        # the stage's real cost (first run recorded 0.21 s for a
        # 1M-doc rewrite, which was the scan, not the work)
        t0 = time.perf_counter()
        rewritten = line_dedup_from(
            _doc_segments(survivors)
        ).localCheckpoint()
        stages["line_dedup_rewrite_materialize"] = {
            "rows": None,
            "sec": round(time.perf_counter() - t0, 2),
        }
        print(
            f"   line_dedup_rewrite_materialize: "
            f"{stages['line_dedup_rewrite_materialize']}",
            flush=True,
        )
        stage("line_dedup_rewritten", rewritten)
        redocs = rewritten.join(
            docs.select("doc_id", "lang"), "doc_id"
        ).select("doc_id", F.col("new_text").alias("text"), "lang")
        w = dsir_importance_weights_from(redocs)
        stage("dsir_weights", w)
        selected = w.where("keep")
        stage("dsir_selected", selected)

        # ground-truth total: the registered composition, one fresh
        # end-to-end action (not the sum of the stage actions)
        t0 = time.perf_counter()
        n_out = c4_pipeline_from(docs).count()
        total_sec = round(time.perf_counter() - t0, 2)
        print(f"   end_to_end: {n_out} rows in {total_sec}s", flush=True)

        row = {
            "family": "c4_pipeline_end_to_end",
            "copies": copies,
            "docs": n_docs,
            "fam_size": FAM_SIZE,
            "stages": stages,
            "end_to_end_rows": n_out,
            "end_to_end_sec": total_sec,
            "sf": SF_DIR,
        }
        records.append(row)
        _merge_dump(records, out_path)
        print(json.dumps(row), flush=True)
        spark.catalog.clearCache()
        shutil.rmtree(scratch, ignore_errors=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
