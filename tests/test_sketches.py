"""Sketch-contract tests: the properties the DuckDB value-hash
oracle cannot state (it reproduces the estimates; these pin that the
estimates obey the published guarantees against exact ground truth).
"""

import pytest
from pyspark.sql import functions as F

from db_mapreduce_project_spark.operators import sketches as sk
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def kmv_row(spark):
    return sk.sketch_kmv_distinct(spark, SF_CORRECT).collect()[0]


def test_kmv_exact_when_not_full(spark, kmv_row):
    # fixture vocab (31 words) < K: the sketch holds every distinct
    # hash, so the estimate must BE the exact count
    assert kmv_row.k_retained == kmv_row.n_exact < sk.KMV_K
    assert kmv_row.kmv_est == kmv_row.n_exact
    assert kmv_row.err == 0
    assert 0 < kmv_row.h_k < sk.KMV_M


def test_kmv_estimate_within_sampling_error(spark, tmp_path):
    # synthetic corpus with vocab >> K exercises the estimator:
    # KMV relative SD ~ 1/sqrt(k-2) ~ 6.3% at k=256; allow 4 sigma
    n_vocab = 5000
    docs = spark.range(n_vocab).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("srcX").alias("source"),
        F.lit(8).cast("bigint").alias("n_chars"),
    )
    td = str(tmp_path / "kmv")
    docs.write.parquet(td + "/documents.parquet")
    row = sk.sketch_kmv_distinct(spark, td).collect()[0]
    assert row.n_exact == n_vocab
    assert row.k_retained == sk.KMV_K
    rel = abs(row.kmv_est - row.n_exact) / row.n_exact
    assert rel < 0.25, (row.kmv_est, row.n_exact)
    assert row.err == row.kmv_est - row.n_exact


def test_cms_one_sided_error(spark):
    # the count-min guarantee: est >= true for EVERY key
    rows = sk.sketch_cms_frequency(spark, SF_CORRECT).collect()
    assert len(rows) > 0
    assert all(r.cms_est >= r.true_cnt for r in rows)
    assert all(r.overcount == r.cms_est - r.true_cnt for r in rows)


def test_cms_epsilon_bound(spark):
    # overcount <= e * N / width at >= 1 - (1/e)^depth per key;
    # assert the MEDIAN probe obeys the expected-error bound N/width
    # (loose: 4x) — a broken hash/min would blow this out
    df = sk.sketch_cms_frequency(spark, SF_CORRECT)
    n_events = (
        df.sparkSession.read.parquet(SF_CORRECT + "/events.parquet").count()
    )
    overs = sorted(r.overcount for r in df.collect())
    median_over = overs[len(overs) // 2]
    assert median_over <= 4 * n_events / sk.CMS_WIDTH


def test_bloom_no_false_negatives(spark):
    # every true benchmark word must be bloom-positive
    rows = sk.sketch_bloom_decontaminate(spark, SF_CORRECT).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_bloom_pos >= r.n_true_pos, r
        assert r.n_false_pos == r.n_bloom_pos - r.n_true_pos
        assert r.n_bloom_pos <= r.n_probe_words


def test_bloom_false_positive_rate_sane(spark):
    # with n inserted keys, fp rate ~ (1 - e^{-kn/m})^k; fixture
    # vocab is tiny vs m=2^20 so the rate must be far below 1%
    rows = sk.sketch_bloom_decontaminate(spark, SF_CORRECT).collect()
    total_probe = sum(r.n_probe_words for r in rows)
    total_fp = sum(r.n_false_pos for r in rows)
    assert total_fp / total_probe < 0.01


def test_bloom_planted_membership(spark):
    # plant: word in benchmark -> positive; word absent -> with m
    # huge and 4 probes, an arbitrary fresh word must be negative
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma", "en", "src0", 16),
            (1, "alpha zeta", "en", "src1", 10),
            (2, "qqqquuuxxyy", "en", "src2", 11),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            r.source: r
            for r in sk.sketch_bloom_decontaminate(spark, td).collect()
        }
    assert out["src1"].n_true_pos == 1  # 'alpha'
    assert out["src1"].n_bloom_pos >= 1
    assert out["src2"].n_true_pos == 0
    assert out["src2"].n_false_pos == out["src2"].n_bloom_pos


# ------------------------------------------------------------- t-digest


def _exact_rank(sorted_vals, x):
    """Number of values <= x (bisect on the exact sorted corpus)."""
    import bisect

    return bisect.bisect_right(sorted_vals, x)


def test_tdigest_rank_error_bound(spark):
    # every probe's estimate must land within the k0 scale bound of
    # the exact order statistic: rank error <= ~2n/delta (cluster
    # cap 2n/delta, interpolation adds at most another half-cap)
    import numpy as np

    li = (
        sk.load_table(spark, SF_CORRECT, "lineitem")
        .select(F.col("l_extendedprice").alias("v"))
    )
    exact = np.sort(np.array([r.v for r in li.collect()]))
    n = len(exact)
    rows = sk.tdigest_quantiles_from(li).collect()
    assert [r.permille for r in rows] == list(sk.TD_PERMILLE)
    assert all(r.n == n for r in rows)
    bound = 2.0 * n / sk.TD_DELTA + 2
    for r in rows:
        err = abs(_exact_rank(list(exact), r.est) - r.permille / 1000.0 * n)
        assert err <= bound, (r.permille, r.est, err, bound)
        assert exact[0] <= r.est <= exact[-1]


def test_tdigest_shard_merge_matches_single_pass(spark):
    # mergeability: centroids built over S shards then merged obey
    # the same rank bound as a single-shard (one-pass) digest, and
    # the two estimates agree within twice the bound
    import numpy as np

    li = (
        sk.load_table(spark, SF_CORRECT, "lineitem")
        .select(F.col("l_extendedprice").alias("v"))
    )
    exact = np.sort(np.array([r.v for r in li.collect()]))
    n = len(exact)
    bound = 2.0 * n / sk.TD_DELTA + 2
    one = {r.permille: r.est for r in
           sk.tdigest_quantiles_from(li, shards=1).collect()}
    many = {r.permille: r.est for r in
            sk.tdigest_quantiles_from(li, shards=16).collect()}
    for p in sk.TD_PERMILLE:
        for est in (one[p], many[p]):
            err = abs(_exact_rank(list(exact), est) - p / 1000.0 * n)
            assert err <= bound, (p, est, err)
        r1 = _exact_rank(list(exact), one[p])
        r2 = _exact_rank(list(exact), many[p])
        assert abs(r1 - r2) <= 2 * bound


def test_tdigest_compress_invariants():
    # pure-core properties: total weight conserved, means sorted,
    # cluster cap respected (single heavy points exempt), and the
    # centroid count stays O(delta)
    import numpy as np

    rng = np.random.RandomState(7)
    v = rng.lognormal(3.0, 1.5, size=20000)
    m, w = sk.td_compress(v, np.ones_like(v), delta=sk.TD_DELTA)
    assert abs(w.sum() - len(v)) < 1e-6
    assert np.all(np.diff(m) >= 0)
    cap = 2.0 * len(v) / sk.TD_DELTA
    assert np.all(w <= cap + 1e-9)
    assert len(m) <= 2 * sk.TD_DELTA
    # probe sweep: every permille decile within the rank bound
    exact = np.sort(v)
    bound = 2.0 * len(v) / sk.TD_DELTA + 2
    for q in np.arange(0.05, 1.0, 0.05):
        est = sk.td_quantile(m, w, float(v.min()), float(v.max()), q)
        r = np.searchsorted(exact, est, side="right")
        assert abs(r - q * len(v)) <= bound, (q, est)


def test_builtin_approx_percentile_rank_bound(spark):
    # percentile_approx's GK-style guarantee: rank error <= n/acc
    # (plus slack for the merge of per-partition summaries)
    import bisect

    rows = sk.approx_percentile_builtin(spark, SF_CORRECT).collect()
    li = (
        sk.load_table(spark, SF_CORRECT, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .collect()
    )
    by_flag = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append(r.l_extendedprice)
    for r in rows:
        vals = sorted(by_flag[r.l_returnflag])
        n = len(vals)
        assert r.n == n
        bound = 2.0 * n / sk.AP_ACCURACY + 2
        for q, est in ((0.5, r.p50), (0.9, r.p90), (0.99, r.p99)):
            rank = bisect.bisect_right(vals, est)
            assert abs(rank - q * n) <= bound, (r.l_returnflag, q, est)
            assert vals[0] <= est <= vals[-1]
