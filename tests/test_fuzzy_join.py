"""Fuzzy edit-distance join: candidate-stage guarantees.

The candidate stage (length-band equi-join + shared-q-gram count
filter, operators/functions_sweep.py) must (a) never lose a true
pair — recall 1 vs a brute-force python levenshtein reference —
and (b) actually prune: far-apart-length pairs never meet the
band join, and gram-disjoint long strings die at the count filter.
The physical plan must contain only equi-joins (no BNLJ /
cartesian), the property the round-7 verdict flagged as missing.
"""

from __future__ import annotations

import re

from db_mapreduce_project_spark.operators.functions_sweep import (
    fuzzy_candidates_from,
    fuzzy_name_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


NAMES = [
    "red bolt",
    "red bolts",          # dist 1 to red bolt
    "rod bolt",           # dist 1 to red bolt
    "blue gear",
    "blue gears",
    "x",                  # shorter than q
    "xy",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",   # 30 chars
    "bbbbbbbbbbbbbbbbbbbbbbbbbbbbbb",   # 30 chars, gram-disjoint
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaabb",   # 30 chars, dist 2 to the a-run
]


def _names_df(spark):
    return spark.createDataFrame([(n,) for n in NAMES], "name string")


def test_fuzzy_recall_matches_bruteforce(spark):
    for k, q in ((1, 2), (2, 2), (3, 3)):
        got = {
            (r.na, r.nb, r.dist)
            for r in fuzzy_name_pairs(_names_df(spark), k=k, q=q).collect()
        }
        want = {
            (a, b, _lev(a, b))
            for i, a in enumerate(NAMES)
            for b in NAMES[i + 1 :]
            if _lev(a, b) <= k
            for a, b in [(min(a, b), max(a, b))]
        }
        assert got == want, f"k={k} q={q}"


def test_far_length_pair_never_a_candidate(spark):
    # len 1-2 vs len 30: bands 0 and 10 at k=2 — the band equi-join
    # cannot produce the pair, so it is never levenshtein-compared
    cands = {
        (r.na, r.nb)
        for r in fuzzy_candidates_from(_names_df(spark), k=2, q=2).collect()
    }
    for short in ("x", "xy"):
        for long in NAMES[7:]:
            assert (min(short, long), max(short, long)) not in cands


def test_gram_filter_prunes_same_band_pair(spark):
    # the two gram-disjoint 30-char runs share a band (|Δlen| = 0)
    # but 0 shared bigrams < bound 30-1-2*2 = 25: pruned pre-verify
    cands = {
        (r.na, r.nb)
        for r in fuzzy_candidates_from(_names_df(spark), k=2, q=2).collect()
    }
    a_run, b_run, ab_run = NAMES[7], NAMES[8], NAMES[9]
    assert (a_run, b_run) not in cands
    # ...while the true dist-2 neighbor of the a-run survives it
    assert (min(a_run, ab_run), max(a_run, ab_run)) in cands


def test_fuzzy_plan_has_no_bnlj(spark):
    from db_mapreduce_project_spark.registry import QUERIES, load_all_queries
    from tests.conftest import SF_CORRECT

    load_all_queries()
    for qn in ("fuzzy_levenshtein", "fuzzy_join_names"):
        plan = (
            QUERIES[qn](spark, SF_CORRECT)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert not re.search(
            r"BroadcastNestedLoopJoin|CartesianProduct", plan
        ), qn
        assert re.search(r"BroadcastHashJoin|SortMergeJoin", plan), qn


def test_jaro_winkler_matches_duckdb_reference():
    """The from-scratch JW scorer must agree with DuckDB's
    independent implementation to exact 1e-6 quantization on random
    pairs (the differential test that certified it before wiring)."""
    import random

    import duckdb

    from db_mapreduce_project_spark.operators.functions_sweep import (
        _jaro_winkler_py,
    )

    rng = random.Random(11)
    cases = [
        (
            "".join(rng.choice("abcde ") for _ in range(rng.randrange(0, 14))),
            "".join(rng.choice("abcde ") for _ in range(rng.randrange(0, 14))),
        )
        for _ in range(2000)
    ] + [("", ""), ("a", ""), ("martha", "marhta"), ("red bolt", "rod bolt")]
    con = duckdb.connect()
    con.execute("create table t(a varchar, b varchar)")
    con.executemany("insert into t values (?,?)", cases)
    want = [
        r[0]
        for r in con.execute(
            "select jaro_winkler_similarity(a, b) from t"
        ).fetchall()
    ]
    for (a, b), w in zip(cases, want):
        got = _jaro_winkler_py(a, b)
        assert int(w * 1e6 + 0.5) == int(got * 1e6 + 0.5), (a, b, w, got)
