"""Property-based differential test of the C4 keep-first span
dedup: on ARBITRARY (doc_id, idx, seg) relations drawn from a tiny
segment pool (dense duplication — the adversarial regime for
keep-first bookkeeping), line_dedup_from must equal an independent
Python reference model computing the same semantics by direct
iteration: an occurrence survives iff its span is globally unique
OR it is the (doc_id, idx)-minimal occurrence; documents rewrite as
their kept segments in idx order.

Covers the cases a planted test can miss: duplicate spans WITHIN a
doc, the keeper itself holding later duplicate occurrences,
interleaved doc ids, single-doc corpora, and docs whose every span
is suppressed."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_mapreduce_project_spark.operators.curation import line_dedup_from

SEGS = ["red fox", "blue jay", "green elm", "gold hen"]

OCCS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # doc_id
        st.sampled_from(SEGS),
    ),
    min_size=1,
    max_size=16,
)


def _model(occ):
    """Independent reference: occ = [(doc_id, idx, seg)]."""
    first = {}
    counts = {}
    for doc, idx, seg in occ:
        counts[seg] = counts.get(seg, 0) + 1
        key = (doc, idx)
        if seg not in first or key < first[seg]:
            first[seg] = key
    out = {}
    for doc, idx, seg in sorted(occ):
        n_segs, n_rm, kept = out.get(doc, (0, 0, []))
        keep = counts[seg] == 1 or first[seg] == (doc, idx)
        out[doc] = (
            n_segs + 1,
            n_rm + (0 if keep else 1),
            kept + ([seg] if keep else []),
        )
    return {
        doc: (n, r, " ".join(k)) for doc, (n, r, k) in out.items()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=OCCS)
def test_line_dedup_equals_reference_model(spark, pairs):
    # per-doc idx assignment in arrival order (idx unique per doc)
    seen: dict[int, int] = {}
    occ = []
    for doc, seg in pairs:
        idx = seen.get(doc, 0)
        seen[doc] = idx + 1
        occ.append((doc, idx, seg))
    d = spark.createDataFrame(occ, "doc_id bigint, idx int, seg string")
    got = {
        r.doc_id: (r.n_segs, r.n_removed, r.new_text)
        for r in line_dedup_from(d).collect()
    }
    assert got == _model(occ)
