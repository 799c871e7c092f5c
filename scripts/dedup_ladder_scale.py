#!/usr/bin/env python
"""1M-document certification rungs for the flagship dedup paths
(round-9 verdict #5) — the ANN-ladder protocol applied to dedup:
wall time + candidate/output counts + RECALL VS EXACT at corpus
scales the DuckDB oracle never executes.

Corpus: the sf0.1 documents (5000 docs, ~54 words each) expanded
`copies`x with BOUNDED near-dup families — unlike the key-shift
stress ladder (where all copies of a doc form ONE family and pair
output grows quadratically in copies), every word of copy c gets a
family suffix {base_doc_id}x{c // FAM_SIZE} (base-doc-scoped, so
no 3-gram can match across families OR across base docs) and each
copy appends one unique tail token:

  * copies within a family (same suffix) are near-identical
    (Jaccard ~0.9 — they differ only in the tail token's shingles);
  * copies across families share NO shingles (every word-3-gram
    carries the suffix), so families are mutually invisible;
  * family size stays FAM_SIZE at every rung — the real-corpus
    geometry (bounded duplicate clusters, corpus-scaling identity
    count), so pair output scales LINEARLY in corpus size:
    docs/FAM_SIZE families x C(FAM_SIZE, 2) pairs.

Recall is computed distributively (inner join of the approximate
pair set against the exact pair set — nothing corpus-sized is ever
collected):

  * minhash_lsh vs the exact DF-capped shingle-Jaccard join —
    reported POOLED and BY JACCARD BAND (J >= 0.5, J >= 0.8).  On
    this geometry the exact set is family pairs (J ~0.8-0.95 after
    the unique tails and the DF cap), where 8x4 banding collides
    with probability ~0.999+; the designed under-sampling of
    marginal word-soup pairs (collision probability 1-(1-J^4)^8 is
    ~0.003 at J=0.1) was measured separately on the
    collided-suffix corpus variant: pooled 0.55 vs banded 0.994 /
    1.0 at J>=0.5 / J>=0.8 over 901680 exact pairs at 100k docs —
    banded recall separates the designed trade-off from a defect;
  * containment_ensemble vs the exact containment join — the
    deterministic-recall-1 construction, asserted at scale.

Writes DEDUP_LADDER_r10.json.  Usage:
  python scripts/dedup_ladder_scale.py [copies ...]   (default 20 200)
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
from db_mapreduce_project_spark.operators.dedup import (
    containment_pairs_ensemble_from,
    containment_pairs_from,
    jaccard_pairs_from,
    minhash_pairs_from,
)
from db_mapreduce_project_spark.session import get_spark

FAM_SIZE = 10
SF_DIR = "/root/testdata/sf0.1"


def expand_families(d, copies: int, marginal: bool = False):
    """`copies` rows per base doc with family-suffixed words (family
    = base doc x (copy // FAM_SIZE) — the suffix carries BOTH, so
    families are mutually invisible across base docs too, exactly as
    the module docstring specifies; a bare copy//FAM_SIZE suffix
    collides across base docs, letting stopword-ish 3-grams build
    DF-cap-sized cross-family postings whose d-squared join output
    explodes at the 1M rung) and a per-copy unique tail token;
    doc_id = base * 10_000 + copy (collision-free for base < 1e7).

    `marginal=True` drops the base-doc scoping (suffix = copy //
    FAM_SIZE alone) — the --marginal-probe corpus: common 3-grams
    then DO collide across base docs up to the DF cap, populating
    the exact pair set with low-Jaccard word-soup pairs.  Only safe
    at the 100k rung (the exact twin's join output grows with the
    shared-shingle d-squared; the 1M-rung attempt spilled ~200 GB
    and disk-OOMed — measured, which is WHY the certification rungs
    use the bounded geometry)."""
    # NOTE: the family suffix must come from the BASE doc id, and
    # Spark 4 resolves a same-select reference to `doc_id` against
    # the new lateral alias (base*10000+copy) — so the base id is
    # renamed to an unambiguous `base_id` first
    fam = (
        (F.col("copy") / FAM_SIZE).cast("int").cast("string")
        if marginal
        else F.concat(
            F.col("base_id").cast("string"),
            F.lit("x"),
            (F.col("copy") / FAM_SIZE).cast("int").cast("string"),
        )
    )
    suffixed = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.concat(w, F.lit("f"), fam),
        ),
        " ",
    )
    return d.select(
        F.col("doc_id").alias("base_id"),
        "text",
        F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("copy"),
    ).select(
        (F.col("base_id") * 10_000 + F.col("copy")).alias("doc_id"),
        F.concat(
            suffixed, F.lit(" uc"), F.col("copy").cast("string")
        ).alias("text"),
    )


def _norm_pairs(df):
    """Canonical unordered (doc_a, doc_b): jaccard frames already
    carry doc_a < doc_b; containment frames carry directional
    (contained_id, container_id)."""
    cols = set(df.columns)
    if "contained_id" in cols:
        return df.select(
            F.least("contained_id", "container_id").alias("doc_a"),
            F.greatest("contained_id", "container_id").alias("doc_b"),
        )
    return df.select("doc_a", "doc_b")


def timed_pairs(fn, docs, keep_jaccard: bool = False) -> tuple:
    t0 = time.perf_counter()
    out = fn(docs)
    cols = (
        ["doc_a", "doc_b", "jaccard"]
        if keep_jaccard and "jaccard" in out.columns
        else None
    )
    df = (
        out.select(*cols) if cols else _norm_pairs(out)
    ).localCheckpoint(eager=True)
    n = df.count()
    return df, n, round(time.perf_counter() - t0, 2)


def recall_vs(approx_df, exact_df, n_exact: int) -> float:
    matched = approx_df.select("doc_a", "doc_b").join(
        exact_df.select("doc_a", "doc_b"), ["doc_a", "doc_b"]
    ).count()
    return round(matched / n_exact, 4) if n_exact else 1.0


def banded_recall(approx_df, exact_j_df, lo: float) -> dict:
    """Recall restricted to exact pairs with jaccard >= lo."""
    band = exact_j_df.where(F.col("jaccard") >= lo)
    n = band.count()
    return {
        "band": f"J>={lo}",
        "exact_rows": n,
        "recall": recall_vs(approx_df, band, n),
    }


def _merge_dump(records: list, out_path: str) -> None:
    """Merge this run's records into the artifact keyed by
    (family, copies) — partial runs and the --marginal-probe pass
    extend the certification rungs instead of replacing them."""
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
    args = [a for a in sys.argv[1:] if a != "--marginal-probe"]
    marginal = "--marginal-probe" in sys.argv[1:]
    rungs = [int(a) for a in args] or ([20] if marginal else [20, 200])
    suffix = "_marginal_mix" if marginal else ""
    spark = get_spark("dedup-ladder-scale")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_base = base.count()
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        os.environ.get("DEDUP_LADDER_OUT", "DEDUP_LADDER_r11.json"),
    )
    records = []
    for copies in rungs:
        scratch = tempfile.mkdtemp(prefix=f"dedup_rung_{copies}x_")
        t0 = time.perf_counter()
        expand_families(base, copies, marginal).repartition(32).write.mode(
            "overwrite"
        ).parquet(os.path.join(scratch, "documents.parquet"))
        docs = spark.read.parquet(os.path.join(scratch, "documents.parquet"))
        n_docs = docs.count()
        build_sec = round(time.perf_counter() - t0, 2)
        print(
            f"== rung {copies}x: {n_docs} docs "
            f"({n_base * copies // FAM_SIZE} families of {FAM_SIZE}), "
            f"build {build_sec}s",
            flush=True,
        )

        # exact ground truths (run once, reused by both recalls)
        print("-- jaccard_pairs_exact ...", flush=True)
        ex_j, n_ex_j, sec_ex_j = timed_pairs(
            jaccard_pairs_from, docs, keep_jaccard=True
        )
        print(f"   {n_ex_j} rows in {sec_ex_j}s", flush=True)
        print("-- containment_exact ...", flush=True)
        ex_c, n_ex_c, sec_ex_c = timed_pairs(containment_pairs_from, docs)
        print(f"   {n_ex_c} rows in {sec_ex_c}s", flush=True)
        print("-- minhash_lsh_pairs ...", flush=True)
        mh, n_mh, sec_mh = timed_pairs(minhash_pairs_from, docs)
        print(f"   {n_mh} rows in {sec_mh}s", flush=True)
        print("-- containment_ensemble ...", flush=True)
        en, n_en, sec_en = timed_pairs(containment_pairs_ensemble_from, docs)
        print(f"   {n_en} rows in {sec_en}s", flush=True)

        for fam, n, sec, rec, exact_name, n_exact in (
            ("jaccard_pairs_exact", n_ex_j, sec_ex_j, 1.0, None, n_ex_j),
            ("containment_exact", n_ex_c, sec_ex_c, 1.0, None, n_ex_c),
            (
                "minhash_lsh_pairs",
                n_mh,
                sec_mh,
                recall_vs(mh, ex_j, n_ex_j),
                "jaccard_pairs_exact",
                n_ex_j,
            ),
            (
                "containment_ensemble",
                n_en,
                sec_en,
                recall_vs(en, ex_c, n_ex_c),
                "containment_exact",
                n_ex_c,
            ),
        ):
            rec_row = {
                "family": fam + suffix,
                "copies": copies,
                "docs": n_docs,
                "fam_size": FAM_SIZE,
                "sec": sec,
                "out_rows": n,
                "recall_vs_exact": rec,
                "exact_twin": (exact_name + suffix) if exact_name else None,
                "exact_rows": n_exact,
                "sf": SF_DIR,
                "heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            }
            if fam == "minhash_lsh_pairs":
                rec_row["recall_bands"] = [
                    banded_recall(mh, ex_j, lo)
                    for lo in (0.3, 0.414, 0.5, 0.8)
                ]
                if marginal:
                    rec_row["note"] = (
                        "collided-suffix probe corpus: the exact set "
                        "includes low-J word-soup pairs the 8x4 "
                        "banding under-samples BY DESIGN (collision "
                        "probability 1-(1-J^4)^8 ~0.003 at J=0.1) — "
                        "pooled vs banded recall separates the "
                        "designed trade-off from a defect"
                    )
            records.append(rec_row)
            print(json.dumps(rec_row), flush=True)

        # dump the four main family rows BEFORE the preset loop: a
        # preset-pass crash (e.g. heap exhaustion on a wider
        # banding at a new rung) must not lose the completed
        # measurements (round 13 — the first 2M attempt lost ~22
        # minutes of rows exactly this way)
        _merge_dump(records, out_path)

        # round-11 preset rows (VERDICT r10 #4): each banding
        # preset measured on the SAME corpus and exact pair set —
        # banded recall at every preset's design threshold
        # separates S-curve choice from defect.  j05 (the 8x4
        # default) is the minhash_lsh_pairs row above.  Presets run
        # on every marginal-probe rung; on bounded-family rungs
        # they are opt-in via DEDUP_LADDER_PRESETS=j03[,j04] (the
        # round-13 2M certification runs j03 there, VERDICT r12
        # #6).
        preset_filter = os.environ.get("DEDUP_LADDER_PRESETS", "")
        if marginal or preset_filter:
            from db_mapreduce_project_spark.operators.dedup import (
                MH_PRESETS,
            )

            wanted = [p for p in preset_filter.split(",") if p]
            for preset, (p_bands, p_rows) in MH_PRESETS.items():
                if preset == "j05":
                    continue
                if not marginal and preset not in wanted:
                    continue
                print(f"-- minhash preset {preset} "
                      f"({p_bands}x{p_rows}) ...", flush=True)
                pmh, n_pmh, sec_pmh = timed_pairs(
                    lambda dd: minhash_pairs_from(
                        dd, bands=p_bands, rows=p_rows
                    ),
                    docs,
                )
                row = {
                    "family": f"minhash_lsh_pairs_{preset}" + suffix,
                    "copies": copies,
                    "docs": n_docs,
                    "bands": p_bands,
                    "rows_per_band": p_rows,
                    "sec": sec_pmh,
                    "out_rows": n_pmh,
                    "recall_vs_exact": recall_vs(pmh, ex_j, n_ex_j),
                    "exact_twin": "jaccard_pairs_exact" + suffix,
                    "exact_rows": n_ex_j,
                    "recall_bands": [
                        banded_recall(pmh, ex_j, lo)
                        for lo in (0.3, 0.414, 0.5, 0.8)
                    ],
                    "sf": SF_DIR,
                    "heap": os.environ.get(
                        "SPARK_GRAFT_DRIVER_MEM", "8g"
                    ),
                }
                records.append(row)
                print(json.dumps(row), flush=True)
                _merge_dump(records, out_path)
        # merge-dump after EVERY rung: a later-rung crash (heap/disk
        # at the 1M exact ground truth) must not lose completed
        # rungs, and probe passes extend rather than replace
        _merge_dump(records, out_path)
        spark.catalog.clearCache()
        shutil.rmtree(scratch, ignore_errors=True)
    _merge_dump(records, out_path)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
