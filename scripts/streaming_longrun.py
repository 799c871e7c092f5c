#!/usr/bin/env python
"""Long-running streaming certification (round-9 verdict #6): the
TTL-dedup sink across >= 50 micro-batches at the 10x events rung.

The stress ladder (scripts/streaming_stress.py) proves state is
bounded and output scale-exact, but it replays availableNow in
~12-16 batches — a short life.  Continuous operation has its own
failure modes (state-store compaction debt, checkpoint growth,
per-batch overhead creeping up with batch count), none of which a
12-batch replay can exhibit.  This harness slices the 10x corpus
into 12-hour files (one micro-batch each → ~60 batches over the
30-day fixture) and records PER-BATCH WALL (batchDuration) and the
state series, to show:

  * batch duration stays FLAT — the mean duration of the last
    third of batches is within noise of the middle third (no
    upward slope with batch count);
  * state stays FLAT after the watermark horizon fills — the
    last-third peak does not exceed the overall peak, and eviction
    continues every batch;
  * output equals the exact distinct set (the same correctness
    contract the oracle checks at fixture scale).

Writes STREAMING_LONGRUN_r10.json; floors pinned in
tests/test_streaming_state_bounds.py.

Usage: python scripts/streaming_longrun.py [copies] [slice_hours]
       (default 10 12)
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
)
from scripts.streaming_stress import expand_events


def series_with_duration(q) -> list[dict]:
    out = []
    for p in q.recentProgress:
        if not isinstance(p, dict):
            p = json.loads(p.json)
        ops = p.get("stateOperators") or []
        if not ops:
            continue
        out.append(
            {
                "batch": p["batchId"],
                "batch_ms": p.get("batchDuration"),
                "rows_in": sum(
                    s.get("numInputRows", 0) for s in p.get("sources", [])
                ),
                "state_rows": sum(s["numRowsTotal"] for s in ops),
                "state_removed": sum(s["numRowsRemoved"] for s in ops),
                "state_bytes": sum(s["memoryUsedBytes"] for s in ops),
            }
        )
    return out


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    slice_hours = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark("streaming-longrun")
    spark.sparkContext.setLogLevel("ERROR")
    # recentProgress must retain every batch of the long run
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "200")
    base = load_table(spark, "/root/testdata/sf0.1", "events")

    fixture = tempfile.mkdtemp(prefix=f"events_long_{copies}x_")
    expand_events(base, copies).repartition(8).write.mode(
        "overwrite"
    ).parquet(os.path.join(fixture, "events.parquet"))
    ev = spark.read.parquet(os.path.join(fixture, "events.parquet"))
    n_events = ev.count()
    exact_rows = (
        ev.select(
            "user_id", "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .distinct()
        .count()
    )

    stage = _stage_events_time_slices(
        spark, fixture, slice_hours=slice_hours
    )
    n_slices = len(os.listdir(stage))
    print(
        f"== longrun: {n_events} events, {n_slices} slices of "
        f"{slice_hours}h", flush=True
    )
    root = tempfile.mkdtemp(prefix="longrun_dww_")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    t0 = time.perf_counter()
    with _state_partitions(spark, 32, no_data_batches=False):
        q = stream_dedup_within_watermark(
            spark, None, out, ckpt, source_dir=stage
        )
        if not q.awaitTermination(3600):
            q.stop()
            raise TimeoutError("longrun dww")
    sec = round(time.perf_counter() - t0, 2)
    series = series_with_duration(q)
    rows_out = read_dedup_pairs(spark, out).count()
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(fixture, ignore_errors=True)

    n = len(series)
    third = max(1, n // 3)
    mid = series[third : 2 * third]
    last = series[2 * third :]
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    artifact = {
        "family": "stream_sink_dedup_within_watermark",
        "copies": copies,
        "events": n_events,
        "slice_hours": slice_hours,
        "state_partitions": 32,
        "sec": sec,
        "n_batches": n,
        "out_rows": rows_out,
        "out_rows_exact": exact_rows,
        "peak_state_rows": max(s["state_rows"] for s in series),
        "mid_third_mean_batch_ms": round(
            mean([s["batch_ms"] for s in mid]), 1
        ),
        "last_third_mean_batch_ms": round(
            mean([s["batch_ms"] for s in last]), 1
        ),
        "mid_third_mean_state_rows": round(
            mean([s["state_rows"] for s in mid]), 1
        ),
        "last_third_mean_state_rows": round(
            mean([s["state_rows"] for s in last]), 1
        ),
        "batches_with_eviction": sum(
            1 for s in series if s["state_removed"] > 0
        ),
        "series": series,
        "sf": "/root/testdata/sf0.1",
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STREAMING_LONGRUN_r10.json",
    )
    json.dump(artifact, open(out_path, "w"), indent=1)
    print(
        json.dumps({k: v for k, v in artifact.items() if k != "series"}),
        flush=True,
    )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
