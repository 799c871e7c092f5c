#!/usr/bin/env python
"""Attribute dedup_minhash_lsh_j03's in-run bench variance
(round-12, VERDICT r11 #6): the j03 headliner read median 4.3 /
max 9.7 s inside one min-of-3 in the round-11 driver bench — the
widest spread of any new headliner.  Candidate attributions:

  * GC — the query caches two frames (_capped_shingle_hashes and
    the 32x2 band index, dedup.py:411/418); a collection landing
    mid-run shows up as a wall spike WITH a matching JVM-CPU spike
    and nonzero executor GC-time delta;
  * external contention — the BENCH_DRIFT_r11 signature: wall
    spike with FLAT JVM CPU (the box was stalled, not the JVM);
  * a real candidate-surface spike — impossible within one probe
    (the plan and data are identical per run), so per-run
    candidate counts are pinned once to document it.

Protocol: N back-to-back runs in one session (noop sink,
clearCache between runs so each run rebuilds its caches — the
bench's cross-query isolation discipline applied per-run), each
run recording wall, JVM-CPU delta (/proc), GC-time delta (Spark
status tracker via the executor metrics of the local executor),
and load1.  Writes $J03_PROBE_OUT (default J03_VARIANCE_r12.json).

Usage: python scripts/j03_variance_probe.py [n_runs]  (default 8)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from db_mapreduce_project_spark import registry
from db_mapreduce_project_spark.session import get_spark

from bench import _canary_once, _jvm_cpu_sec, _loadavg1, materialize


def _gc_time_ms(spark) -> int | None:
    """Cumulative GC milliseconds of the local JVM (all Spark
    executors share it in local mode), via the Java management
    beans — the direct GC attribution channel."""
    try:
        jvm = spark.sparkContext._jvm
        beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        return sum(
            beans.get(i).getCollectionTime() for i in range(beans.size())
        )
    except Exception:
        return None


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all_queries()
    spark = get_spark("j03-variance-probe")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        jvm_pid: int | None = spark.sparkContext._gateway.proc.pid
    except AttributeError:
        jvm_pid = None

    # warm-up + canary baseline (the bench protocol's arbiter)
    materialize(registry.QUERIES["wordcount"](spark, sf_dir))
    canary_base = min(_canary_once(spark) for _ in range(3))

    runs = []
    for i in range(n_runs):
        spark.catalog.clearCache()
        load = _loadavg1()
        cpu0 = _jvm_cpu_sec(jvm_pid)
        gc0 = _gc_time_ms(spark)
        t0 = time.perf_counter()
        materialize(registry.QUERIES["dedup_minhash_lsh_j03"](spark, sf_dir))
        wall = time.perf_counter() - t0
        cpu1 = _jvm_cpu_sec(jvm_pid)
        gc1 = _gc_time_ms(spark)
        row = {
            "run": i,
            "wall_sec": round(wall, 3),
            "jvm_cpu_sec": round(cpu1 - cpu0, 2)
            if cpu0 is not None and cpu1 is not None
            else None,
            "gc_ms": (gc1 - gc0)
            if gc0 is not None and gc1 is not None
            else None,
            "load1": load,
        }
        runs.append(row)
        print(json.dumps(row), flush=True)

    canary_end = round(_canary_once(spark) / canary_base, 2)
    walls = sorted(r["wall_sec"] for r in runs)
    out = {
        "query": "dedup_minhash_lsh_j03",
        "sf_dir": sf_dir,
        "n_runs": n_runs,
        "min": walls[0],
        "median": walls[len(walls) // 2],
        "max": walls[-1],
        "canary_base_sec": round(canary_base, 3),
        "canary_end_ratio": canary_end,
        "runs": runs,
        "reading": (
            "wall spike + proportional jvm_cpu spike + gc_ms spike = GC "
            "on the cached band index; wall spike + flat jvm_cpu = "
            "external contention (BENCH_DRIFT_r11 signature); flat "
            "everything = the r11 spread was not reproducible on a "
            "clean box"
        ),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        os.environ.get("J03_PROBE_OUT", "J03_VARIANCE_r12.json"),
    )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
