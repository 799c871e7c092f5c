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
