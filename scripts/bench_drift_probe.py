#!/usr/bin/env python
"""Round-11 drift attribution probe (VERDICT r10, next-round #1).

BENCH_r10 (driver run) read `doc_char_entropy` at min 2.72 s /
median 2.79 s and `corpus_source_overlap` at min 3.58 s / median
4.89 s, while the builder's same-code close-out run read 0.65 s and
1.08 s — a 4-5x split on files untouched since round 9 (verified by
git diff).  Both queries are the suite's most CPU-saturating shapes
(char-level explode ~70M rows; shingle explode + distinct +
self-join), so the standing hypothesis is external CPU steal on the
driver box: a co-running process eats cores, and the queries whose
speedup depends on all 32 of them inflate 4-5x while
fixed-overhead-dominated queries barely move (the +8.6% suite
drift).

This probe tests that hypothesis by measurement: it runs the two
drifting queries plus a low-parallelism control under
  (a) idle — the box as-is, and
  (b) contended — N_HOGS busy-loop python processes spinning,
with the exact bench.py protocol (noop sink, min-of-3, cache
isolation), recording wall min/median, the JVM's /proc CPU-second
delta, and loadavg.  If (b) reproduces the driver's walls while JVM
CPU seconds stay ~flat, the drift is attributed: environment, not
code.  Writes BENCH_DRIFT_r11.json.

Usage: python scripts/bench_drift_probe.py [n_hogs] (default 24)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from db_mapreduce_project_spark import registry
from db_mapreduce_project_spark.session import get_spark

PROBE_QUERIES = [
    "doc_char_entropy",  # driver 2.72 s vs builder 0.65 s
    "corpus_source_overlap",  # driver 3.58 s vs builder 1.08 s
    "q14_promo_revenue",  # control: one join + scalar agg, little
    # parallel section — should inflate far less under steal
    "stream_sink_dedup_within_watermark",  # VERDICT item 7: driver
    # 9.74 s vs builder 7.42 s; the r9->r10 jobs.py diff is
    # provably parameter-neutral on this path (slice_hours defaults
    # to the old constant; no_data_batches=False predates r10), so
    # any residual split must also be environment
]
N_ITER = 3


def _spin() -> None:  # busy-loop hog: pure user-mode CPU steal
    x = 1
    while True:
        x = (x * 1103515245 + 12345) % (1 << 31)


def _membw() -> None:
    """Memory-bandwidth hog: stream-copy a 256 MB numpy buffer.
    A register spin loop steals cycles but no cache/bandwidth;
    Spark's explode + hash-agg path is bandwidth-hungry, so a
    co-running JVM (another Spark job, a DuckDB sweep) is better
    modeled by streaming loads/stores than by spinning."""
    import numpy as np

    a = np.zeros(32 * 1024 * 1024, dtype=np.float64)  # 256 MB
    b = np.empty_like(a)
    while True:
        np.copyto(b, a)
        np.copyto(a, b)


def _jvm_cpu_sec(pid: int) -> float:
    with open(f"/proc/{pid}/stat", "rb") as f:
        fields = f.read().rsplit(b")", 1)[1].split()
    return (int(fields[11]) + int(fields[12])) / os.sysconf("SC_CLK_TCK")


def run_condition(spark, sf_dir: str, label: str) -> dict:
    jvm_pid = spark.sparkContext._gateway.proc.pid
    out: dict = {"condition": label, "load1": round(os.getloadavg()[0], 2)}
    for name in PROBE_QUERIES:
        runs = []
        cpu0 = _jvm_cpu_sec(jvm_pid)
        for _ in range(N_ITER):
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        cpu1 = _jvm_cpu_sec(jvm_pid)
        spark.catalog.clearCache()
        runs.sort()
        out[name] = {
            "min": round(runs[0], 3),
            "median": round(runs[len(runs) // 2], 3),
            "jvm_cpu_sec": round(cpu1 - cpu0, 2),
            "eff_parallelism": round((cpu1 - cpu0) / sum(runs), 1),
        }
    return out


def main() -> None:
    n_hogs = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all_queries()
    spark = get_spark("bench-drift-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up (bench.py protocol), then one UNMEASURED pass of the
    # probe queries: the first execution of each generated plan pays
    # JIT compilation (measured: doc_char_entropy burned 16.1 JVM
    # cpu-sec cold vs 6.9 warm over 3 runs) — without this pass the
    # first condition would absorb all of it and the A/B inverts
    registry.QUERIES["wordcount"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    run_condition(spark, sf_dir, "warmup_discard")

    conditions = [run_condition(spark, sf_dir, "idle")]

    for label, target in (
        (f"cpu_spin_{n_hogs}_hogs", _spin),
        (f"membw_{n_hogs}_hogs", _membw),
    ):
        hogs = [
            mp.Process(target=target, daemon=True) for _ in range(n_hogs)
        ]
        for h in hogs:
            h.start()
        time.sleep(2)  # let loadavg/scheduler settle
        try:
            conditions.append(run_condition(spark, sf_dir, label))
        finally:
            for h in hogs:
                h.terminate()
            for h in hogs:
                h.join()
        time.sleep(2)

    payload = {
        "hypothesis": "BENCH_r10 driver-run inflation on "
        "doc_char_entropy/corpus_source_overlap is external CPU "
        "steal (co-running load on the driver box), not a code or "
        "plan change",
        "protocol": "bench.py noop-sink min-of-3 with cache "
        "isolation; JVM cpu from /proc stat deltas; hogs are "
        "busy-loop python processes",
        "driver_r10": {
            "doc_char_entropy": {"min": 2.72, "median": 2.79},
            "corpus_source_overlap": {"min": 3.58, "median": 4.89},
        },
        "builder_r10_closeout": {
            "doc_char_entropy": 0.65,
            "corpus_source_overlap": 1.08,
        },
        "cpu_count": os.cpu_count(),
        "conditions": conditions,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DRIFT_r11.json",
    )
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
