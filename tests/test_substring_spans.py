"""Maximal-span coalescing for substring dedup (round-7 verdict
#2): planted duplicated regions must come back as ONE maximal span
with the documented stride-grid quantization at the edges — not as
a pile of fixed-width windows.

Fixture geometry (SPAN_LEN=40, SPAN_STRIDE=10): windows start at
every multiple of 10; two docs share a window only when the
duplicated region covers a full 40-char window at the SAME offset
mod 10 in both docs.
"""

import pyspark.sql.functions as F

from db_mapreduce_project_spark.operators.dedup import (
    SPAN_LEN,
    SPAN_STRIDE,
    maximal_spans_from,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _mk(n, seed):
    """Deterministic aperiodic filler (seeded RNG — a polynomial in
    i mod 26 is periodic and plants accidental duplicates)."""
    import random

    rng = random.Random(seed)
    return "".join(chr(ord("A") + rng.randrange(26)) for _ in range(n))


def test_single_duplicated_region_coalesces_to_one_span(spark):
    """A 120-char block planted stride-aligned in both docs: the 9
    matching windows (offsets 50..130 in A, 70..150 in B, one
    diagonal) must coalesce to ONE span of exactly 120 chars
    (120 - 40 divisible by 10 -> zero quantization loss here)."""
    block = _mk(120, seed=99)
    a = _mk(50, 1) + block + _mk(47, 2)
    b = _mk(70, 3) + block + _mk(33, 4)
    out = maximal_spans_from(_docs(spark, [(1, a), (2, b)])).collect()
    assert len(out) == 1, out
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["start_a"] == 50 and r["start_b"] == 70
    assert r["span_len"] == 120
    assert r["n_windows"] == (120 - SPAN_LEN) // SPAN_STRIDE + 1


def test_cross_boundary_extent_quantizes_at_the_tail(spark):
    """A 95-char block: true extent 95, but the last full window
    starts at offset 50 within the block (50+40=90 <= 95 < 100), so
    the reported maximal span is 90 — extent error strictly less
    than SPAN_STRIDE at each edge, never more.  This is the
    documented contract; the pre-coalescing query could only report
    disjoint 40-char windows."""
    block = _mk(95, seed=42)
    a = _mk(30, 5) + block + _mk(35, 6)
    b = _mk(60, 7) + block + _mk(45, 8)
    out = maximal_spans_from(_docs(spark, [(1, a), (2, b)])).collect()
    assert len(out) == 1, out
    r = out[0]
    assert r["start_a"] == 30 and r["start_b"] == 60
    assert r["span_len"] == 90  # 95 quantized down to the stride grid
    assert r["span_len"] > SPAN_LEN  # genuinely coalesced, not one window


def test_two_separate_copies_make_two_islands(spark):
    """The same 40-char block planted TWICE in doc B (different
    offsets) vs once in doc A: two diagonals -> two maximal spans,
    both exactly one window long; coalescing must not bridge
    distinct occurrences."""
    block = _mk(40, seed=7)
    a = _mk(20, 9) + block + _mk(30, 10)
    b = _mk(10, 11) + block + _mk(30, 12) + block + _mk(20, 13)
    out = maximal_spans_from(_docs(spark, [(1, a), (2, b)])).collect()
    assert len(out) == 2, out
    assert all(r["span_len"] == SPAN_LEN and r["n_windows"] == 1 for r in out)
    assert {r["start_b"] for r in out} == {10, 80}
    assert all(r["start_a"] == 20 for r in out)


def test_unaligned_duplicate_is_invisible_by_contract(spark):
    """A duplicate at mismatched stride phase (offset 30 in A,
    offset 73 in B) shares no window hash — the strided family's
    documented recall limit (suffix-array exactness is the
    escalation path).  The coalescer must return nothing rather
    than something wrong."""
    block = _mk(80, seed=21)
    a = _mk(30, 14) + block + _mk(30, 15)
    b = _mk(73, 16) + block + _mk(27, 17)
    out = maximal_spans_from(_docs(spark, [(1, a), (2, b)])).collect()
    assert out == []


def test_fixture_spans_are_exact_character_matches(spark):
    """The upgraded output contract: every reported span's
    characters are IDENTICAL across the pair (the in-pipeline
    substring verify makes hash-collision false spans impossible) —
    re-checked here independently in Python against the raw texts."""
    from db_mapreduce_project_spark.io import load_table

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    texts = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}
    rows = maximal_spans_from(d).collect()
    assert rows
    for r in rows:
        sa = texts[r["doc_a"]][r["start_a"] : r["start_a"] + r["span_len"]]
        sb = texts[r["doc_b"]][r["start_b"] : r["start_b"] + r["span_len"]]
        assert sa == sb and len(sa) == r["span_len"], r


def test_fixture_spans_are_maximal_and_consistent(spark):
    """On the real fixture: every reported span is self-consistent
    (length on the stride grid, window count matches length) and
    spans of one (pair, diagonal) never overlap (maximality —
    adjacent islands would have merged)."""
    from db_mapreduce_project_spark.io import load_table

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    rows = maximal_spans_from(d).collect()
    assert rows, "fixture contains cross-doc duplicated spans"
    seen = {}
    for r in rows:
        assert (r["span_len"] - SPAN_LEN) % SPAN_STRIDE == 0
        assert r["n_windows"] == (r["span_len"] - SPAN_LEN) // SPAN_STRIDE + 1
        key = (r["doc_a"], r["doc_b"], r["start_a"] - r["start_b"])
        seen.setdefault(key, []).append((r["start_a"], r["span_len"]))
    for key, spans in seen.items():
        spans.sort()
        for (s1, l1), (s2, _) in zip(spans, spans[1:]):
            # maximality: next island starts strictly beyond the
            # previous one's last window + one stride gap
            assert s2 > s1 + l1 - SPAN_LEN + SPAN_STRIDE, (key, spans)
