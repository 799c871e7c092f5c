#!/usr/bin/env python
"""A/B the Arrow/BLAS cell assignment at the scaled-cells 1M rung
(round 11): ANN_RECALL_r11.json measured the binary serving path at
412.7 s at 1M/1024 cells with the Catalyst assign — the O(n*cells*d)
interpreted argmax the stage rows blame for ~75% of the family's
wall at this geometry.  ivf_assign_arrow computes the identical
argmax as one float64 matmul per Arrow batch (the trained-quantizer
+ BLAS-encode shape a cluster serving tier uses).  This script
re-measures binary_hamming_rerank with fast_assign=True on the
same rung construction and merges the row into $ANN_RECALL_OUT
(default ANN_RECALL_r11.json) as path
`binary_hamming_rerank_blas_assign` — recall certified against the
same exact float64 ground truth, so the speedup is proven
loss-free, not asserted.

Usage: python scripts/ann_fast_assign_ab.py [copies]  (default 500)
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

import numpy as np

from db_mapreduce_project_spark.io import load_table
from db_mapreduce_project_spark.operators.retrieval import exact_rerank_tail
from db_mapreduce_project_spark.operators.similarity import (
    RERANK_MARGIN,
    TOPK,
    binary_hamming_cands_from,
    derive_n_cells,
)
from db_mapreduce_project_spark.session import get_spark
from scripts.ann_recall import measure
from scripts.ann_recall_scale import (
    NOISE,
    exact_truth_numpy,
    expand_perturbed_explode,
)


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    spark = get_spark("ann-fast-assign-ab")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        "vec_id", "embedding"
    )
    scratch = tempfile.mkdtemp(prefix=f"ann_fast_{copies}x_")
    expand_perturbed_explode(base, copies).repartition(32).write.mode(
        "overwrite"
    ).parquet(os.path.join(scratch, "embeddings.parquet"))
    rung = spark.read.parquet(os.path.join(scratch, "embeddings.parquet"))
    n = rung.count()
    cells = derive_n_cells(n)
    probe = 8
    print(f"== rung {n} vectors, cells {cells}", flush=True)

    t0 = time.perf_counter()
    pdf = rung.toPandas()
    ids = pdf["vec_id"].to_numpy()
    vecs = np.vstack(pdf["embedding"].to_numpy()).astype("float64")
    del pdf
    exact = exact_truth_numpy(ids, vecs)
    del ids, vecs
    print(
        f"   truth: {len(exact)} queries in "
        f"{round(time.perf_counter() - t0, 2)}s",
        flush=True,
    )

    which = {
        p
        for p in os.environ.get("FAST_AB_PATHS", "binary,ivfadc").split(",")
        if p
    }
    rows = []
    if "binary" in which:
        rows.append(
            {
                "corpus": f"sf0.1 x {copies} ({n} vectors)",
                "path": "binary_hamming_rerank_blas_assign",
                "params": {
                    "cells": cells,
                    "probe": probe,
                    "rerank_c": "adaptive",
                    "margin": RERANK_MARGIN,
                    "assign": "ivf_assign_arrow (float64 BLAS matmul "
                    "per Arrow batch; identical argmax + tie-break)",
                    "state": {
                        "sign_bytes": n * 8,
                        "cell_assign_bytes": n * 4,
                    },
                },
                **measure(
                    exact_rerank_tail(
                        rung,
                        binary_hamming_cands_from(
                            rung,
                            n_cells=cells,
                            n_probe=probe,
                            margin=RERANK_MARGIN,
                            fast_assign=True,
                        ),
                    ),
                    exact,
                ),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    if "ivfadc" in which:
        from db_mapreduce_project_spark.operators.retrieval import (
            ivfadc_rerank_from,
        )

        rows.append(
            {
                "corpus": f"sf0.1 x {copies} ({n} vectors)",
                "path": "ivfadc_rerank_adaptive_blas_assign",
                "params": {
                    "cells": cells,
                    "probe": probe,
                    "rerank_c": "adaptive",
                    "margin": RERANK_MARGIN,
                    "assign": "ivf_assign_arrow",
                },
                **measure(
                    ivfadc_rerank_from(
                        rung,
                        None,
                        cells,
                        probe,
                        fast_assign=True,
                    ),
                    exact,
                ),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    shutil.rmtree(scratch, ignore_errors=True)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        os.environ.get("ANN_RECALL_OUT", "ANN_RECALL_r12.json"),
    )
    try:
        with open(out_path) as f:
            artifact = json.load(f)
    except (OSError, ValueError):
        # same self-describing skeleton as scripts/ann_recall_scale.py
        # and ann_binary_scale.py (round-12 ADVICE): a fresh artifact
        # must carry the recall definition and noise metadata no
        # matter which script creates it
        artifact = {
            "topk": TOPK,
            "recall_def": "pooled |approx ∩ exact| / |exact|; exact = "
            "brute-force cosine top-k (driver-side float64 BLAS over "
            "the collected rung), ties cos DESC n_id ASC",
            "noise": NOISE,
            "measurements": [],
        }
    key = lambda r: (  # noqa: E731
        r["corpus"],
        r["path"],
        json.dumps(r["params"], sort_keys=True),
    )
    merged = {key(r): r for r in artifact["measurements"]}
    merged.update({key(r): r for r in rows})
    artifact["measurements"] = list(merged.values())
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path} ({len(merged)} measurements)")


if __name__ == "__main__":
    main()
