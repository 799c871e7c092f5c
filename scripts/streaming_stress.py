#!/usr/bin/env python
"""Streaming-sink stress ladder (round-8 verdict #2): the three
stateful sinks — left-outer join, full-outer join, TTL dedup — run
at 1x and 10x events through TIME-SLICED staging (one micro-batch
per 72 h slice), recording the state store's rows/bytes per
micro-batch from StreamingQueryProgress, to show:

  * state stays BOUNDED under the watermark: peak state rows track
    the eviction horizon (a couple of slices), not the corpus —
    the property that lets these sinks ingest 100 TB without the
    state store becoming a second copy of the input;
  * eviction actually happens (numRowsRemoved > 0 across batches);
  * output is scale-exact: the 10x corpus is 10 disjoint clone
    universes (user/event ids shifted, timestamps identical, so the
    watermark sequence is unchanged), hence rows_out(10x) must be
    EXACTLY 10 * rows_out(1x) — a correctness check at a scale the
    DuckDB oracle never runs at;
  * state partitions sized UP with volume (8 at 1x -> 32 at 10x,
    the _state_partitions knob production turns).

Writes/merges stream_sink_* family rows into STRESS_LADDER_r9.json.

Usage: python scripts/streaming_stress.py [copies ...]   (default 1 10)
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
from db_mapreduce_project_spark.session import get_spark
from db_mapreduce_project_spark.streaming.jobs import (
    _stage_events_time_slices,
    _state_partitions,
    read_dedup_pairs,
    stream_dedup_within_watermark,
    stream_full_outer_attribution,
    stream_left_outer_attribution,
)

USER_SHIFT = 10_000_000
EVENT_SHIFT = 100_000_000


def expand_events(e, copies: int):
    """`copies` disjoint clone universes of the events fixture:
    user/event ids shifted per copy, timestamps and values IDENTICAL
    — the watermark sequence (a function of event times only) is
    unchanged, so per-batch state must scale linearly in copies and
    the emitted set must be exactly copies x the base set."""
    return (
        e.withColumn(
            "copy", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
        )
        .select(
            (
                F.col("event_id")
                + F.col("copy").cast("long") * EVENT_SHIFT
            ).alias("event_id"),
            (
                F.col("user_id")
                + F.col("copy").cast("long") * USER_SHIFT
            ).alias("user_id"),
            "event_type",
            "ts",
            "value",
        )
    )


def state_series(q) -> list[dict]:
    """Per-micro-batch state-store metrics from recentProgress."""
    series = []
    for p in q.recentProgress:
        if not isinstance(p, dict):  # StreamingQueryProgress object
            p = json.loads(p.json)
        ops = p.get("stateOperators") or []
        if not ops:
            continue
        series.append(
            {
                "batch": p["batchId"],
                "rows_in": sum(
                    s.get("numInputRows", 0)
                    for s in p.get("sources", [])
                ),
                "state_rows": sum(s["numRowsTotal"] for s in ops),
                "state_updated": sum(s["numRowsUpdated"] for s in ops),
                "state_removed": sum(s["numRowsRemoved"] for s in ops),
                "state_bytes": sum(s["memoryUsedBytes"] for s in ops),
            }
        )
    return series


def run_sink(spark, name, builder, fixture_dir, n_parts, sentinel):
    root = tempfile.mkdtemp(prefix=f"stress_{name}_")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    stage = _stage_events_time_slices(
        spark, fixture_dir, flush_sentinel=sentinel
    )
    t0 = time.perf_counter()
    with _state_partitions(spark, n_parts):
        q = builder(spark, fixture_dir, out, ckpt, source_dir=stage)
        if not q.awaitTermination(1800):
            q.stop()
            raise TimeoutError(name)
    sec = round(time.perf_counter() - t0, 2)
    series = state_series(q)
    if name == "stream_sink_dedup_within_watermark":
        rows_out = read_dedup_pairs(spark, out).count()
    else:
        rows_out = spark.read.parquet(out).count()
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)
    return sec, rows_out, series


def main() -> None:
    rungs = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark("streaming-stress")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "events")
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRESS_LADDER_r9.json",
    )
    sinks = [
        ("stream_sink_left_outer_join", stream_left_outer_attribution, True),
        ("stream_sink_full_outer_join", stream_full_outer_attribution, True),
        (
            "stream_sink_dedup_within_watermark",
            lambda sp, sf, out, ckpt, source_dir: stream_dedup_within_watermark(
                sp, sf, out, ckpt, source_dir=source_dir
            ),
            False,
        ),
    ]
    results: list[dict] = []

    for copies in rungs:
        fixture = tempfile.mkdtemp(prefix=f"events_{copies}x_")
        expand_events(base, copies).repartition(8).write.mode(
            "overwrite"
        ).parquet(os.path.join(fixture, "events.parquet"))
        n_events = spark.read.parquet(
            os.path.join(fixture, "events.parquet")
        ).count()
        # size state partitions UP with volume — the production knob
        n_parts = 8 if copies == 1 else 32
        print(f"== rung {copies}x: {n_events} events, "
              f"{n_parts} state partitions", flush=True)
        for name, builder, sentinel in sinks:
            sec, rows_out, series = run_sink(
                spark, name, builder, fixture, n_parts, sentinel
            )
            peak = max(s["state_rows"] for s in series)
            peak_bytes = max(s["state_bytes"] for s in series)
            removed = sum(s["state_removed"] for s in series)
            row = {
                "family": name,
                "copies": copies,
                "events": n_events,
                "state_partitions": n_parts,
                "sec": sec,
                "out_rows": rows_out,
                "n_batches": len(series),
                "peak_state_rows": peak,
                "peak_state_bytes": peak_bytes,
                "total_removed": removed,
                "peak_state_frac_of_input": round(peak / n_events, 4),
                "state_series": series,
                "sf": "/root/testdata/sf0.1",
            }
            results.append(row)
            print(
                json.dumps(
                    {k: v for k, v in row.items() if k != "state_series"}
                ),
                flush=True,
            )
        shutil.rmtree(fixture, ignore_errors=True)

    old: list[dict] = []
    if os.path.exists(out_path):
        try:
            old = json.load(open(out_path))
        except (OSError, ValueError):
            old = []
    key = lambda r: (r["family"], r.get("copies"))  # noqa: E731
    merged = {key(r): r for r in old}
    merged.update({key(r): r for r in results})
    # cross-rung scale-exactness: disjoint clone universes with an
    # unchanged watermark sequence must emit EXACTLY copies x base
    for r in merged.values():
        base = merged.get((r["family"], 1))
        if base and r["copies"] > 1:
            r["out_rows_expected"] = base["out_rows"] * r["copies"]
            r["scale_exact"] = r["out_rows"] == r["out_rows_expected"]
    with open(out_path, "w") as f:
        json.dump(list(merged.values()), f, indent=1)
    print(f"wrote {out_path} ({len(merged)} rows)")


if __name__ == "__main__":
    main()
