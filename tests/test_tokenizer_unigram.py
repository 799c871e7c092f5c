"""Unigram-LM segmentation: the distributed Viterbi must agree
with a from-scratch Python reference of the same spec (inventory,
quantized log-probs, DP tie-break) — the check the DuckDB oracle
cannot provide alone, since both engines could share a spec-level
bug.  Plus structural invariants on the real fixture."""

import math

from pyspark.sql import functions as F

from db_mapreduce_project_spark.io import load_table
from db_mapreduce_project_spark.operators.tokenizer_unigram import (
    UNI_MAXP,
    UNI_MULTI,
    UNI_SCALE,
    unigram_edges,
    unigram_pieces,
    unigram_segment_words,
    unigram_viterbi,
    unigram_vocab,
)

SF = "/root/testdata/sf0.001"


def _ref_pieces(word_freqs: dict[str, int]):
    """Reference inventory: all substrings <= UNI_MAXP weighted by
    word freq; keep singles + top UNI_MULTI multis; li =
    floor(ln(cnt/total) * UNI_SCALE)."""
    cnt: dict[str, int] = {}
    for w, f in word_freqs.items():
        for i in range(1, len(w) + 1):
            for ln in range(1, min(UNI_MAXP, i) + 1):
                p = w[i - ln : i]
                cnt[p] = cnt.get(p, 0) + f
    singles = {p: c for p, c in cnt.items() if len(p) == 1}
    multis = dict(
        sorted(
            ((p, c) for p, c in cnt.items() if len(p) >= 2),
            key=lambda kv: (-kv[1], kv[0]),
        )[:UNI_MULTI]
    )
    kept = {**singles, **multis}
    total = sum(kept.values())
    return {
        p: (c, math.floor(math.log(c / total) * UNI_SCALE))
        for p, c in kept.items()
    }


def _ref_viterbi(word: str, pieces) -> tuple[int, list[str]]:
    """Reference DP: best[i] = max over j of best[j] + li, ties to
    the smallest j (edges iterated j ascending under strict >)."""
    n = len(word)
    best = [0] + [None] * n
    bp = [-1] * (n + 1)
    for i in range(1, n + 1):
        cands = []
        for ln in range(1, min(UNI_MAXP, i) + 1):
            j = i - ln
            p = word[j:i]
            if p in pieces:
                cands.append((j, pieces[p][1]))
        cands.sort()
        b_score, b_j = None, -1
        for j, li in cands:
            s = best[j] + li
            if b_score is None or s > b_score:
                b_score, b_j = s, j
        best[i], bp[i] = b_score, b_j
    parts, pos = [], n
    while pos > 0:
        parts.insert(0, word[bp[pos] : pos])
        pos = bp[pos]
    return best[n], parts


def _tiny_corpus(spark):
    lines = [
        "the spark window joins the spark stream",
        "window functions window the stream",
        "spark spark spark streaming window pipeline",
        "unigram pieces segment the corpus corpus",
    ]
    return spark.createDataFrame([(t,) for t in lines], ["text"])


def test_unigram_matches_reference_on_tiny_corpus(spark):
    d = _tiny_corpus(spark)
    vocab = unigram_vocab(d)
    wf = {r["word"]: r["freq"] for r in vocab.collect()}
    ref = _ref_pieces(wf)

    got_pieces = {
        r["piece"]: (r["cnt"], r["li"])
        for r in unigram_pieces(vocab).collect()
    }
    assert got_pieces == ref

    seg = unigram_viterbi(
        unigram_edges(vocab, unigram_pieces(vocab))
    ).collect()
    assert len(seg) == len(wf)
    for r in seg:
        score, parts = _ref_viterbi(r["word"], ref)
        assert r["score"] == score, r["word"]
        assert r["seg"] == "|".join(parts), (r["word"], r["seg"], parts)
        assert r["n_pieces"] == len(parts)


def test_unigram_segmentation_covers_word_exactly(spark):
    """Closure invariant on the real fixture: every emitted
    segmentation concatenates back to its word, every piece is
    <= UNI_MAXP chars, and the score is the exact sum of the
    emitted pieces' quantized log-probs."""
    rows = unigram_segment_words(spark, SF).collect()
    assert len(rows) == 25
    d = load_table(spark, SF, "documents")
    li = {
        r["piece"]: r["li"]
        for r in unigram_pieces(unigram_vocab(d)).collect()
    }
    for r in rows:
        parts = r["seg"].split("|")
        assert "".join(parts) == r["word"]
        assert all(1 <= len(p) <= UNI_MAXP for p in parts)
        assert r["n_pieces"] == len(parts)
        assert r["score"] == sum(li[p] for p in parts), r["word"]


def test_unigram_scores_are_optimal_vs_greedy(spark):
    """The DP score must be >= any other valid segmentation's
    score; compare against the greedy longest-match segmentation
    (a valid segmentation that is NOT generally optimal)."""
    d = load_table(spark, SF, "documents")
    vocab = unigram_vocab(d)
    li = {r["piece"]: r["li"] for r in unigram_pieces(vocab).collect()}
    for r in unigram_segment_words(spark, SF).collect():
        w, pos, greedy = r["word"], 0, []
        while pos < len(w):
            for ln in range(min(UNI_MAXP, len(w) - pos), 0, -1):
                if w[pos : pos + ln] in li:
                    greedy.append(w[pos : pos + ln])
                    pos += ln
                    break
        gscore = sum(li[p] for p in greedy)
        assert r["score"] >= gscore, (w, r["seg"], greedy)


def test_unigram_pieces_closure(spark):
    """Every character of every vocab word is in the inventory as
    a single-char piece — any word is segmentable."""
    d = load_table(spark, SF, "documents")
    vocab = unigram_vocab(d)
    pieces = unigram_pieces(vocab)
    singles = {
        r["piece"] for r in pieces.where(F.length("piece") == 1).collect()
    }
    chars = (
        vocab.select(F.explode(F.split("word", "")).alias("c"))
        .where(F.col("c") != "")
        .distinct()
        .collect()
    )
    assert {r["c"] for r in chars} <= singles
