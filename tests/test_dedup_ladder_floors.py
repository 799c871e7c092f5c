"""Corpus-scale dedup certification floors (round-9 verdict #5).

DEDUP_LADDER_r10.json is produced by scripts/dedup_ladder_scale.py:
bounded near-dup families (FAM_SIZE=10, base-doc-scoped suffixes so
families are mutually invisible and pair output scales LINEARLY in
corpus size — the real-corpus geometry), approximate paths measured
against their exact twins with DISTRIBUTED recall joins.  Every
number is deterministic (seeded-free construction: suffixes and
tails are pure functions of doc_id/copy), so re-running the script
reproduces the artifact.
"""

import json
import os

FAM = 10


def _rows():
    path = os.path.join(
        os.path.dirname(__file__), "..", "DEDUP_LADDER_r10.json"
    )
    return json.load(open(path))


def _get(rows, family, copies):
    for r in rows:
        if r["family"] == family and r["copies"] == copies:
            return r
    raise AssertionError((family, copies))


def _expected_pairs(r):
    # docs/FAM_SIZE families x C(FAM_SIZE, 2) pairs — the linear
    # pair-growth identity of the bounded-family geometry
    return r["docs"] // FAM * (FAM * (FAM - 1) // 2)


def test_dedup_ladder_100k_floors():
    rows = _rows()
    ex_j = _get(rows, "jaccard_pairs_exact", 20)
    assert ex_j["docs"] == 100_000
    assert ex_j["out_rows"] == _expected_pairs(ex_j) == 450_000
    ex_c = _get(rows, "containment_exact", 20)
    assert ex_c["out_rows"] == 450_000

    mh = _get(rows, "minhash_lsh_pairs", 20)
    # 8x4 banding collides on J~0.9 family pairs with p ~0.999:
    # measured 0.9997 pooled AND in both bands
    assert mh["recall_vs_exact"] >= 0.995, mh
    for band in mh["recall_bands"]:
        assert band["recall"] >= 0.995, band

    en = _get(rows, "containment_ensemble", 20)
    # deterministic recall 1 by construction — EXACT at scale
    assert en["recall_vs_exact"] == 1.0, en
    assert en["out_rows"] == ex_c["out_rows"], en


def test_dedup_ladder_1m_floors():
    rows = _rows()
    ex_j = _get(rows, "jaccard_pairs_exact", 200)
    assert ex_j["docs"] == 1_000_000
    # the linear-growth identity holds at 10x the corpus: 4.5M
    # pairs, exactly 10x the 100k rung — NOT quadratic
    assert ex_j["out_rows"] == _expected_pairs(ex_j) == 4_500_000

    mh = _get(rows, "minhash_lsh_pairs", 200)
    assert mh["recall_vs_exact"] >= 0.995, mh

    en = _get(rows, "containment_ensemble", 200)
    assert en["recall_vs_exact"] == 1.0, en
    assert en["out_rows"] == _get(rows, "containment_exact", 200)["out_rows"]


def test_dedup_ladder_marginal_probe():
    """--marginal-probe rows (collided-suffix corpus, 100k docs):
    the exact set gains ~450k low-Jaccard word-soup pairs on top of
    the 450k family pairs, and the pooled-vs-banded split shows the
    banding's DESIGNED trade-off: pooled 0.55 (marginal pairs
    under-sampled at collision probability ~0.003) vs >= 0.99 in
    both J-bands.  The containment ensemble stays EXACT even on the
    mixed corpus — its recall-1 construction is geometry-free."""
    rows = _rows()
    ex = _get(rows, "jaccard_pairs_exact_marginal_mix", 20)
    assert ex["out_rows"] == 901_680  # family + marginal pairs

    mh = _get(rows, "minhash_lsh_pairs_marginal_mix", 20)
    assert 0.5 <= mh["recall_vs_exact"] <= 0.65, mh  # the designed gap
    for band in mh["recall_bands"]:
        assert band["recall"] >= 0.99, band

    en = _get(rows, "containment_ensemble_marginal_mix", 20)
    assert en["recall_vs_exact"] == 1.0, en


def _rows_r11():
    path = os.path.join(
        os.path.dirname(__file__), "..", "DEDUP_LADDER_r11.json"
    )
    return json.load(open(path))


def test_minhash_preset_floors_marginal_mix():
    """Round-11 banding presets (VERDICT r10 #4), measured on the
    collided-suffix marginal-mix corpus at 100k docs against the
    exact Jaccard pair set (901680 pairs, ~44% of them low-J word
    soup).  Each preset must reach banded recall >= 0.95 AT ITS
    DESIGN THRESHOLD (the J where its S-curve first collides with
    p >= 0.95):
      j03 (32x2) at J>=0.3  — measured 1.0 (and 1.0 in EVERY band);
      j04 (16x2) at J>=0.414 — measured 0.9996;
      j05 (8x4 default) at J>=0.5 — measured 0.9939 (unchanged).
    Pooled recall stays ~0.55-0.60 BY DESIGN (the word-soup tail is
    what banding exists to skip); the preset rows make the S-curve
    choice a measured knob instead of a fixed trade-off."""
    rows = _rows_r11()

    def band(r, name):
        for b in r["recall_bands"]:
            if b["band"] == name:
                return b["recall"]
        raise AssertionError(name)

    j03 = _get(rows, "minhash_lsh_pairs_j03_marginal_mix", 20)
    assert (j03["bands"], j03["rows_per_band"]) == (32, 2)
    assert band(j03, "J>=0.3") >= 0.95, j03["recall_bands"]
    assert band(j03, "J>=0.8") == 1.0

    j04 = _get(rows, "minhash_lsh_pairs_j04_marginal_mix", 20)
    assert (j04["bands"], j04["rows_per_band"]) == (16, 2)
    assert band(j04, "J>=0.414") >= 0.95, j04["recall_bands"]

    j05 = _get(rows, "minhash_lsh_pairs_marginal_mix", 20)
    assert band(j05, "J>=0.5") >= 0.95, j05["recall_bands"]
    # the j03 preset costs ~1.5x the default's wall for its
    # deterministic-at-0.3 curve — keep the relation loose (walls
    # drift) but assert it stays the same order of magnitude
    assert j03["sec"] < 5 * j05["sec"], (j03["sec"], j05["sec"])


def test_containment_ensemble_marginal_mix_geometry_boundary():
    """Round-11 stage profile (VERDICT r10 #6): on the
    collided-suffix geometry the prefix filter is geometry-defeated
    — the positional filter cuts only ~1.5% (54.9M -> 54.0M
    collision rows) and distinct candidates (~47M) approach the
    full co-occurrence set, so the ensemble degenerates to
    'exact + stratum/distinct/verify overhead', bounded near ~2x
    the exact twin (r11 idle measurements: 32.3 vs 17.2 s; the
    r10 224.6 s absolute reading carries the same run-environment
    contention BENCH_DRIFT_r11 attributes for the bench drift).
    Recall stays EXACTLY 1.0 in both regimes — the degradation is
    cost-only, never correctness."""
    rows = _rows_r11()
    en = _get(rows, "containment_ensemble_marginal_mix", 20)
    ex = _get(rows, "containment_exact_marginal_mix", 20)
    assert en["recall_vs_exact"] == 1.0, en
    assert en["out_rows"] == ex["out_rows"], (en, ex)
    # cost-boundary: same order as exact on adversarial geometry
    assert en["sec"] < 4 * ex["sec"], (en["sec"], ex["sec"])

    prof = None
    for r in rows:
        if r["family"] == "containment_ensemble_stageprof_marginal_mix":
            prof = r
    assert prof is not None
    st = prof["stages"]
    # the filter is geometry-defeated: positional cut < 5%, and
    # distinct candidates within 15% of the oriented collisions
    assert (
        st["collisions_after_positional"]["rows"]
        > 0.95 * st["collisions_oriented"]["rows"]
    )
    assert (
        st["candidates_distinct"]["rows"]
        > 0.8 * st["collisions_after_positional"]["rows"]
    )
    assert st["verified"]["rows"] == ex["out_rows"]


def test_c4_pipeline_1m_rung_floors():
    """Round-11 composed-pipeline rung (VERDICT r10 #5,
    PIPELINE_LADDER_r11.json): the registered c4 chain
    (c4_pipeline_from — the exact oracle-certified composition) at
    1M docs with per-stage survivor counts.  The counts are
    deterministic (plain expansion is a pure function of
    doc_id/copy) — two independent runs reproduced them exactly —
    so they are pinned as equalities."""
    path = os.path.join(
        os.path.dirname(__file__), "..", "PIPELINE_LADDER_r11.json"
    )
    rows = json.load(open(path))
    r = rows[0] if len(rows) == 1 else _get(rows, "c4_pipeline_end_to_end", 200)
    assert r["docs"] == 1_000_000
    st = r["stages"]
    assert st["gopher_keep"]["rows"] == 556_200
    assert st["gate_survivors"]["rows"] == 556_200
    assert st["rep_lines_keep"]["rows"] == 1_000_000
    assert st["line_dedup_rewritten"]["rows"] == 556_200
    assert st["dsir_weights"]["rows"] == 398_759
    assert st["dsir_selected"]["rows"] == 173_432
    assert r["end_to_end_rows"] == st["dsir_weights"]["rows"]
    # the rewrite materialization dominates (group-by-line over the
    # full corpus) — presence pinned, wall not asserted
    assert "line_dedup_rewrite_materialize" in st


def test_dedup_ladder_r11_bounded_rungs():
    """Round-11 re-run of the bounded certification rungs (clean
    box, DEDUP_LADDER_r11.json): the linearity identity and recall
    floors reproduce r10 exactly — exact pairs 450k/4.5M at
    100k/1M docs, minhash recall 0.9997/0.9998, ensemble exactly
    1.0 at both rungs.  The walls also CORRECT a r10 economics
    claim: the clean exact twin reads 28.3 s at 1M (r10's 68.1 s
    was contention), so the ensemble's value is its deterministic
    recall-1 guarantee at a bounded ~2-2.6x cost multiple, not a
    wall win — recorded in SCALE.md."""
    rows = _rows_r11()
    for copies, docs in ((20, 100_000), (200, 1_000_000)):
        ex_j = _get(rows, "jaccard_pairs_exact", copies)
        assert ex_j["docs"] == docs
        assert ex_j["out_rows"] == _expected_pairs(ex_j)
        ex_c = _get(rows, "containment_exact", copies)
        assert ex_c["out_rows"] == ex_j["out_rows"]
        mh = _get(rows, "minhash_lsh_pairs", copies)
        assert mh["recall_vs_exact"] >= 0.995, mh
        en = _get(rows, "containment_ensemble", copies)
        assert en["recall_vs_exact"] == 1.0, en
        assert en["out_rows"] == ex_c["out_rows"], en


def test_pipeline_ladder_r12_2m_rung_linearity():
    """Round-12 (VERDICT r11 #5): the 2M-doc rung confirms the
    composed C4 pipeline's scaling story, pinned from
    PIPELINE_LADDER_r12.json + C4_DSIR_AB_r12.json:

    * survivor counts scale exactly 2x (same gate rates, same
      line-dedup geometry, DSIR selection within 0.3%);
    * the DOMINANT line-dedup rewrite is sub-linear: <= 2x wall at
      2x data (measured 1.70x at the default 32 partitions);
    * the raw end-to-end super-linearity at 32 partitions (2.60x)
      is per-partition DSIR bigram-stream SPILL, not algorithmic:
      at 128 shuffle partitions the identical pipeline reads
      <= 2.1x (measured 1.88x) with identical output rows — the
      size-partitions-to-the-corpus discipline as data."""
    import json
    import os

    base = json.load(
        open(
            os.path.join(
                os.path.dirname(__file__), "..", "PIPELINE_LADDER_r12.json"
            )
        )
    )
    r1 = [r for r in base if r["copies"] == 200][0]
    r2 = [r for r in base if r["copies"] == 400][0]
    assert r2["docs"] == 2 * r1["docs"] == 2_000_000
    s1, s2 = r1["stages"], r2["stages"]
    for st in ("gopher_keep", "gate_survivors", "line_dedup_rewritten"):
        assert s2[st]["rows"] == 2 * s1[st]["rows"], st
    assert abs(r2["end_to_end_rows"] - 2 * r1["end_to_end_rows"]) <= (
        0.003 * 2 * r1["end_to_end_rows"]
    )
    rw1 = s1["line_dedup_rewrite_materialize"]["sec"]
    rw2 = s2["line_dedup_rewrite_materialize"]["sec"]
    assert rw2 / rw1 <= 2.2, (rw1, rw2)  # dominant stage linear

    ab = json.load(
        open(
            os.path.join(
                os.path.dirname(__file__), "..", "C4_DSIR_AB_r12.json"
            )
        )
    )
    wide = [
        r
        for r in ab["rungs"]
        if r["copies"] == 400 and r["shuffle_partitions"] == 128
    ][0]
    assert wide["end_to_end_rows"] == r2["end_to_end_rows"]
    assert wide["end_to_end_sec"] / r1["end_to_end_sec"] <= 2.1, wide
    # the 32-partition DSIR spill is the documented super-linear term
    assert wide["stages"]["dsir_weights"]["sec"] < 0.5 * (
        s2["dsir_weights"]["sec"]
    )


def test_pipeline_ladder_r13_stock_config_linearity():
    """Round-13 (VERDICT r12 #2): the C4 2M rung re-run at STOCK
    engine config — no hand-set shuffle width anywhere.  get_spark
    now starts every shuffle at
    spark.sql.adaptive.coalescePartitions.initialPartitionNum=512
    and lets AQE coalesce down to ~advisoryPartitionSizeInBytes,
    so post-coalesce width derives from the data instead of a
    constant.  Pinned from PIPELINE_LADDER_r13.json:

    * outputs identical to the r12 rungs (same gate rates, same
      survivor/selection counts at both 1M and 2M);
    * end-to-end <= 1.7x for 2x data (measured 1.43x: 28.2 ->
      40.3 s) — linear WITHOUT the r12 A/B's hand-set 128
      partitions;
    * the DSIR bigram stage no longer spills: its wall is flat
      across the doubling (5.87 -> 5.89 s; at the old fixed width
      32 it read 28.3 s at 2M)."""
    import json
    import os

    here = os.path.dirname(__file__)
    r13 = json.load(open(os.path.join(here, "..", "PIPELINE_LADDER_r13.json")))
    r12 = json.load(open(os.path.join(here, "..", "PIPELINE_LADDER_r12.json")))
    rows13 = {r["copies"]: r for r in r13}
    rows12 = {r["copies"]: r for r in r12}
    for copies in (200, 400):
        a, b = rows13[copies], rows12[copies]
        assert a["docs"] == b["docs"]
        assert a["end_to_end_rows"] == b["end_to_end_rows"], copies
        for st in ("gopher_keep", "gate_survivors", "line_dedup_rewritten",
                   "dsir_weights", "dsir_selected"):
            assert a["stages"][st]["rows"] == b["stages"][st]["rows"], (
                copies, st)
    r1, r2 = rows13[200], rows13[400]
    assert r2["end_to_end_sec"] / r1["end_to_end_sec"] <= 1.7, (r1, r2)
    d1 = r1["stages"]["dsir_weights"]["sec"]
    d2 = r2["stages"]["dsir_weights"]["sec"]
    assert d2 <= 2.0 * d1, (d1, d2)  # no spill cliff
    rw1 = r1["stages"]["line_dedup_rewrite_materialize"]["sec"]
    rw2 = r2["stages"]["line_dedup_rewrite_materialize"]["sec"]
    assert rw2 / rw1 <= 2.2, (rw1, rw2)


def _rows_r13():
    path = os.path.join(
        os.path.dirname(__file__), "..", "DEDUP_LADDER_r13.json"
    )
    return json.load(open(path))


def test_dedup_ladder_r13_2m_floors():
    """Round-13 (VERDICT r12 #6): the dedup ladder's 2M rung under
    the bounded-family design, seeded with the r11 rungs and run at
    24g heap (the 8g default OOM-crashed the 32-band j03 pass and
    read 4x walls from per-partition spill — the heap is stamped in
    every row).  Floors:

    * the linear pair-count identity holds at 2M: 9M exact pairs =
      exactly 2x the 1M rung (bounded families, never quadratic);
    * minhash default recall 0.9999 pooled AND in every J-band
      (>= the r11 1M floor), j03 recall EXACTLY 1.0 in every band
      at 2M (its design guarantee carried to scale), ensemble
      exactly 1.0 with out_rows == exact;
    * scaling: the same-session warm A/B (stageprof rows, shuffle
      on tmpfs to bypass a measured ext4-writeback box epoch)
      reads full-pipeline 1.75x for 2x data — linear; the
      single-shot ladder walls are noisier (best observed 3.04x,
      first-run JIT + epoch) and are NOT the scaling claim."""
    rows = _rows_r13()
    ex1 = _get(rows, "jaccard_pairs_exact", 200)
    ex2 = _get(rows, "jaccard_pairs_exact", 400)
    assert ex2["docs"] == 2_000_000
    assert ex2["out_rows"] == _expected_pairs(ex2) == 9_000_000
    assert ex2["out_rows"] == 2 * ex1["out_rows"]

    mh = _get(rows, "minhash_lsh_pairs", 400)
    assert mh["recall_vs_exact"] >= 0.999, mh
    for band in mh["recall_bands"]:
        assert band["recall"] >= 0.999, band

    j03 = _get(rows, "minhash_lsh_pairs_j03", 400)
    assert j03["recall_vs_exact"] == 1.0, j03
    for band in j03["recall_bands"]:
        assert band["recall"] == 1.0, band
    j03_1m = _get(rows, "minhash_lsh_pairs_j03", 200)
    assert j03_1m["recall_vs_exact"] == 1.0, j03_1m

    en = _get(rows, "containment_ensemble", 400)
    assert en["recall_vs_exact"] == 1.0, en
    assert en["out_rows"] == _get(rows, "containment_exact", 400)["out_rows"]

    p1 = _get(rows, "minhash_lsh_pairs_stageprof", 200)
    p2 = _get(rows, "minhash_lsh_pairs_stageprof", 400)
    assert p2["out_rows"] == mh["out_rows"]  # identical output
    assert p2["sec"] / p1["sec"] <= 2.2, (p1["sec"], p2["sec"])
