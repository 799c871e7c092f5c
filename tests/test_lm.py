"""Kneser–Ney held-out scoring: semantics pinned against an
independent pure-Python reference model on planted corpora (the
DuckDB oracle shares the pipeline's shape; this reference is built
directly from the Chen & Goodman formulas)."""

import pytest
from pyspark.sql import functions as F

from db_mapreduce_project_spark.operators import lm
from tests.conftest import SF_CORRECT


def _mkdocs(spark, rows):
    return spark.createDataFrame(
        [
            (i, text, lang, "srcT", len(text))
            for i, (text, lang) in enumerate(rows)
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


def _ref_kn(train_texts, eval_texts):
    """Reference: integer KN with quarter discounts, ppm fixed
    point, quantizing exactly where a fixed-point pipeline must
    (pcont to ppm, then the per-instance division)."""
    from collections import Counter, defaultdict

    bg = Counter()
    for t in train_texts:
        w = [x for x in t.lower().strip().split() if x]
        for a, b in zip(w, w[1:]):
            bg[(a, b)] += 1
    cnt_a = Counter()
    n1p_a = Counter()
    n1p_b = Counter()
    for (a, b), c in bg.items():
        cnt_a[a] += c
        n1p_a[a] += 1
        n1p_b[b] += 1
    n1p_tot = len(bg)
    pcont = {b: (n * lm.KN_PPM) // n1p_tot for b, n in n1p_b.items()}

    out = {}
    for doc_id, t in eval_texts.items():
        w = [x for x in t.lower().strip().split() if x]
        ps, unseen = [], 0
        for a, b in zip(w, w[1:]):
            if not a or not b:
                continue
            if a in cnt_a:
                p = (
                    max(4 * bg.get((a, b), 0) - 3, 0) * lm.KN_PPM
                    + 3 * n1p_a[a] * pcont.get(b, 0)
                ) // (4 * cnt_a[a])
            else:
                p = pcont.get(b, 0)
            p = max(p, 1)
            if (a, b) not in bg:
                unseen += 1
            ps.append(p)
        bits = [lm.KN_LOG2_PPM - (x.bit_length() - 1) for x in ps]
        out[doc_id] = {
            "n_bigrams": len(ps),
            "n_unseen": unseen,
            "score_ppm": sum(ps) // len(ps),
            "ppl_mbits": (sum(bits) * 1000) // len(ps),
        }
    return out


def test_kn_matches_reference_on_planted_corpus(spark):
    # even doc_ids train, odd score; eval hits all three branches:
    # seen bigram, unseen bigram w/ seen context, unseen context
    rows = [
        ("the cat sat on the mat", "en"),  # 0 train
        ("the cat sat on the hat", "en"),  # 1 eval: seen + unseen
        ("the dog sat on the mat", "en"),  # 2 train
        ("zz qq the cat", "en"),  # 3 eval: unseen context zz
    ]
    docs = _mkdocs(spark, rows)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r.doc_id: r.asDict()
            for r in lm.doc_kn_perplexity(spark, td).collect()
        }
    ref = _ref_kn(
        [rows[0][0], rows[2][0]], {1: rows[1][0], 3: rows[3][0]}
    )
    assert set(got) == set(ref)
    for doc_id, want in ref.items():
        g = got[doc_id]
        for k, v in want.items():
            assert g[k] == v, (doc_id, k, g, want)


def test_kn_probabilities_sane_on_fixture(spark):
    rows = lm.doc_kn_perplexity(spark, SF_CORRECT).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.doc_id % 2 == 1  # only held-out docs scored
        assert 1 <= r.score_ppm <= lm.KN_PPM
        assert 0 <= r.ppl_mbits <= lm.KN_LOG2_PPM * 1000
        assert 0 <= r.n_unseen <= r.n_bigrams
        assert 1 <= r.rk <= lm.KN_WORST_K


def test_kn_unseen_word_floors_at_one(spark):
    # eval doc made of words the train half never saw: every
    # transition is unseen-context + unseen-word -> p = 1,
    # surprisal = 20 bits exactly
    rows = [
        ("aa bb aa bb", "en"),  # 0 train
        ("xx yy zz xx", "en"),  # 1 eval, fully novel
    ]
    docs = _mkdocs(spark, rows)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        out = lm.doc_kn_perplexity(spark, td).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == 1
    assert r.n_unseen == r.n_bigrams == 3
    assert r.score_ppm == 1
    assert r.ppl_mbits == lm.KN_LOG2_PPM * 1000


def test_kn_smoothing_orders_seen_above_unseen(spark):
    # two eval docs, identical length: one repeats train bigrams,
    # one is novel -> the novel doc must score strictly worse
    rows = [
        ("red fox red fox red fox", "en"),  # 0 train
        ("red fox red fox red fox", "en"),  # 1 eval, all seen
        ("red dog red dog red dog", "en"),  # 2 train (vocab overlap)
        ("fox red dog blue fox dog", "en"),  # 3 eval, mostly unseen
    ]
    docs = _mkdocs(spark, rows)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        out = {r.doc_id: r for r in lm.doc_kn_perplexity(spark, td).collect()}
    assert out[3].ppl_mbits > out[1].ppl_mbits
    assert out[3].score_ppm < out[1].score_ppm


# ---------------------------------------------------------------
# Trigram interpolated KN (doc_kn3_perplexity)
# ---------------------------------------------------------------


def _ref_kn3(train_texts, eval_texts):
    """Independent trigram interpolated-KN reference built straight
    from the Chen & Goodman recursion with the same fixed-point
    quantization points."""
    from collections import Counter

    tri = Counter()
    for t in train_texts:
        w = [x for x in t.lower().strip().split() if x]
        for a, b, c in zip(w, w[1:], w[2:]):
            tri[(a, b, c)] += 1
    cnt_ab = Counter()
    n1p_ab = Counter()
    n1p_dbc = Counter()
    n1p_ddc = Counter()
    for (a, b, c), n in tri.items():
        cnt_ab[(a, b)] += n
        n1p_ab[(a, b)] += 1
        n1p_dbc[(b, c)] += 1
        n1p_ddc[c] += 1
    n1p_db_d = Counter()
    n1p_b_d = Counter()
    for (b, c), n in n1p_dbc.items():
        n1p_db_d[b] += n
        n1p_b_d[b] += 1
    n1p_tot = len(tri)
    pcont = {c: (n * lm.KN_PPM) // n1p_tot for c, n in n1p_ddc.items()}

    def p2(b, c):
        if (b, c) in n1p_dbc:
            return (
                max(4 * n1p_dbc[(b, c)] - 3, 0) * lm.KN_PPM
                + 3 * n1p_b_d[b] * pcont.get(c, 0)
            ) // (4 * n1p_db_d[b])
        if b in n1p_db_d:
            return (3 * n1p_b_d[b] * pcont.get(c, 0)) // (4 * n1p_db_d[b])
        return pcont.get(c, 0)

    out = {}
    for doc_id, t in eval_texts.items():
        w = [x for x in t.lower().strip().split() if x]
        ps, unseen = [], 0
        for a, b, c in zip(w, w[1:], w[2:]):
            if (a, b) in cnt_ab:
                p = (
                    max(4 * tri.get((a, b, c), 0) - 3, 0) * lm.KN_PPM
                    + 3 * n1p_ab[(a, b)] * p2(b, c)
                ) // (4 * cnt_ab[(a, b)])
            else:
                p = p2(b, c)
            p = max(p, 1)
            if (a, b, c) not in tri:
                unseen += 1
            ps.append(p)
        if not ps:
            continue
        bits = [lm.KN_LOG2_PPM - (x.bit_length() - 1) for x in ps]
        out[doc_id] = {
            "n_trigrams": len(ps),
            "n_unseen": unseen,
            "score_ppm": sum(ps) // len(ps),
            "ppl_mbits": (sum(bits) * 1000) // len(ps),
        }
    return out


def test_kn3_matches_reference_on_planted_corpus(spark):
    # hits all backoff branches: seen trigram; unseen trigram with
    # seen (a,b); unseen (a,b) with seen b; unseen b
    rows = [
        ("the cat sat on the mat today", "en"),  # 0 train
        ("the cat sat on the hat today", "en"),  # 1 eval
        ("the dog sat on the mat today", "en"),  # 2 train
        ("zz qq ww the cat sat", "en"),  # 3 eval (unseen b early)
    ]
    docs = _mkdocs(spark, rows)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r.doc_id: r.asDict()
            for r in lm.doc_kn3_perplexity(spark, td).collect()
        }
    ref = _ref_kn3(
        [rows[0][0], rows[2][0]], {1: rows[1][0], 3: rows[3][0]}
    )
    assert set(got) == set(ref)
    for doc_id, want in ref.items():
        g = got[doc_id]
        for k, v in want.items():
            assert g[k] == v, (doc_id, k, g, want)


def test_kn3_longer_context_sharpens_seen_text(spark):
    # a held-out doc REPEATING the train text verbatim must score
    # higher (more probable) under the trigram model than a shuffled
    # doc over the same vocabulary
    rows = [
        ("one two three four five one two three four five", "en"),  # 0 train
        ("one two three four five one two three four five", "en"),  # 1 eval
        ("one two three four five six seven eight nine ten", "en"),  # 2 train
        ("five one four two three five four one three two", "en"),  # 3 eval
    ]
    docs = _mkdocs(spark, rows)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            r.doc_id: r for r in lm.doc_kn3_perplexity(spark, td).collect()
        }
    assert out[1].score_ppm > out[3].score_ppm
    assert out[1].ppl_mbits < out[3].ppl_mbits
