#!/usr/bin/env python
"""RocksDB vs HDFS-backed state store A/B on the TTL-dedup sink at
a dedup-ladder rung (round-14, VERDICT r13 #2).

The DWW sink is the state-heaviest streaming query (a seen-set per
(user, event_type, day) key, ~11 micro-batches through time-sliced
staging).  This script replays it at `copies` x the events fixture
(disjoint clone universes — the streaming_stress expansion, so the
watermark sequence is unchanged and state scales linearly) under
both state-store providers, INTERLEAVED (H/R/H/R...), and records
wall + per-batch state metrics.  The provider only changes where
state lives, never what is emitted; the emitted-row count is
asserted equal across providers.

Usage: python scripts/rocksdb_state_ab.py [copies] [iters]
Writes STREAM_ROCKSDB_AB_r14.json.
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

from db_mapreduce_project_spark.io import load_table
from db_mapreduce_project_spark.session import get_spark
from db_mapreduce_project_spark.streaming.jobs import (
    _stage_events_time_slices,
    _state_partitions,
    read_dedup_pairs,
    stream_dedup_within_watermark,
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from streaming_stress import expand_events, state_series  # noqa: E402

PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming."
        "state.HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    ),
}


def run_once(spark, fixture_dir: str, provider: str) -> dict:
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key)
    spark.conf.set(key, PROVIDERS[provider])
    root = tempfile.mkdtemp(prefix=f"rocksab_{provider}_")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    try:
        stage = _stage_events_time_slices(spark, fixture_dir)
        t0 = time.perf_counter()
        with _state_partitions(spark, 4, no_data_batches=False):
            q = stream_dedup_within_watermark(
                spark, fixture_dir, out, ckpt, source_dir=stage
            )
            if not q.awaitTermination(1800):
                q.stop()
                raise TimeoutError(provider)
        sec = round(time.perf_counter() - t0, 2)
        series = state_series(q)
        rows_out = read_dedup_pairs(spark, out).count()
        return {
            "provider": provider,
            "sec": sec,
            "rows_out": rows_out,
            "n_batches": len(series),
            "peak_state_rows": max(
                (s["state_rows"] for s in series), default=0
            ),
            "state_removed_total": sum(
                s["state_removed"] for s in series
            ),
        }
    finally:
        spark.conf.set(key, old)
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("rocksdb-state-ab")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fixture = tempfile.mkdtemp(prefix="rocksab_fixture_")
    base = load_table(spark, sf, "events")
    expand_events(base, copies).repartition(8).write.mode(
        "overwrite"
    ).parquet(os.path.join(fixture, "events.parquet"))

    rows = []
    for it in range(iters):
        for prov in ("hdfs", "rocksdb"):
            r = run_once(spark, fixture, prov)
            r["iter"] = it
            r["copies"] = copies
            rows.append(r)
            print(r, file=sys.stderr)
    outs = {r["rows_out"] for r in rows}
    assert len(outs) == 1, f"providers emitted different sets: {outs}"
    art = {
        "copies": copies,
        "rows_out": outs.pop(),
        "runs": rows,
        "min_sec": {
            p: min(r["sec"] for r in rows if r["provider"] == p)
            for p in ("hdfs", "rocksdb")
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STREAM_ROCKSDB_AB_r14.json",
    )
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(json.dumps(art["min_sec"]))
    shutil.rmtree(fixture, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
