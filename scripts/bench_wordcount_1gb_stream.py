#!/usr/bin/env python
"""The 1 GiB word-count corpus through the STREAMING flagship
(round-8 verdict #7): the same deterministic corpus as
scripts/bench_wordcount_1gb.py (WC1GB.json's 13.25 s batch run),
replayed as a structured stream — readStream.text over the corpus
files, a handful of files per micro-batch, complete-mode word
counts into a memory sink under Trigger.availableNow.

Records end-to-end stream wall time next to the batch number and
asserts row-for-row equality of the final streaming state vs the
batch GROUP BY — the unified batch/stream semantics claim, proven
at the reference benchmark's own scale instead of only at the
fixture scale (tests/test_streaming.py).

Writes WC1GB_STREAM.json.

Usage: python scripts/bench_wordcount_1gb_stream.py [n_lines] \
           [files_per_trigger]
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

from db_mapreduce_project_spark.functions.text import words
from db_mapreduce_project_spark.session import get_spark
from scripts.bench_wordcount_1gb import build_corpus


def main() -> None:
    n_lines = int(sys.argv[1]) if len(sys.argv) > 1 else 23_000_000
    files_per_trigger = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    spark = get_spark("bench-1gb-wordcount-stream")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="wc1gb_stream_")
    corpus = os.path.join(root, "corpus")
    try:
        nbytes = build_corpus(spark, corpus, n_lines)
        n_files = sum(
            1
            for f in os.listdir(corpus)
            if not f.startswith((".", "_"))
        )

        # ---- timed: the availableNow streaming replay ----
        t0 = time.perf_counter()
        text = (
            spark.readStream.option(
                "maxFilesPerTrigger", files_per_trigger
            ).text(corpus)
        )
        counts = (
            words(text, "value")
            .groupBy("word")
            .agg(F.count("*").alias("cnt"))
        )
        q = (
            counts.writeStream.format("memory")
            .queryName("wc1gb_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(3600):
            q.stop()
            raise TimeoutError("stream did not finish in 1 h")
        stream_sec = round(time.perf_counter() - t0, 2)
        n_batches = len(q.recentProgress)

        # ---- equality vs the batch flagship, row for row ----
        stream_rows = spark.table("wc1gb_stream")
        batch_rows = (
            words(spark.read.text(corpus), "value")
            .groupBy("word")
            .agg(F.count("*").alias("cnt"))
        )
        diff = stream_rows.exceptAll(batch_rows).count() + batch_rows.exceptAll(
            stream_rows
        ).count()
        stats = stream_rows.agg(
            F.count("*").alias("d"), F.sum("cnt").alias("t")
        ).collect()[0]

        payload = {
            "metric": "wordcount_1gb_streaming_end_to_end",
            "corpus_bytes": nbytes,
            "corpus_gib": round(nbytes / 2**30, 3),
            "lines": n_lines,
            "corpus_files": n_files,
            "files_per_trigger": files_per_trigger,
            "micro_batches": n_batches,
            "distinct_words": stats.d,
            "total_words": int(stats.t),
            "value": stream_sec,
            "unit": "sec",
            "rows_diff_vs_batch": diff,
            "batch_reference": "WC1GB.json",
        }
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "WC1GB_STREAM.json",
        )
        with open(out, "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(payload), flush=True)
        assert diff == 0, "streaming result differs from batch"
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
