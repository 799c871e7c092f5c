"""Property-based differential test of the containment candidate
schemes: on ARBITRARY small corpora drawn from a tiny word pool
(dense random shingle overlap — the adversarial regime for
candidate generation), the size-stratified prefix path and the
delta prefix path must EQUAL their exact ground truths, because
their candidate recall is deterministic (prefix-filter lemma) and
the verify is exact.  The bottom-K path is intentionally NOT held
to equality (its recall is probabilistic by design) — asserting
subset-of-exact for it instead.

This is the strongest form of the round-6 acceptance test: not one
planted corpus, but every corpus hypothesis can construct, with
mixed strata, duplicate documents, empty and sub-shingle-length
documents, and ties in set size."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_mapreduce_project_spark.operators.dedup import (
    containment_pairs_bottomk_from,
    containment_pairs_ensemble_from,
    containment_pairs_from,
)

# tiny pool => dense overlap; doc lengths span several strata and
# include docs with fewer than 3 tokens (zero shingles)
WORDS = ["alpha", "bravo", "cat", "dove", "elm", "fox", "gnu", "hen"]
DOC = st.lists(st.sampled_from(WORDS), min_size=0, max_size=24).map(
    " ".join
)


def _rows(df):
    return sorted(
        (r["contained_id"], r["container_id"], r["n_common"],
         round(r["containment"], 9))
        for r in df.collect()
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(DOC, min_size=2, max_size=10))
def test_ensemble_equals_exact_on_arbitrary_corpora(spark, texts):
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    exact = _rows(containment_pairs_from(d))
    strat = _rows(containment_pairs_ensemble_from(d))
    assert strat == exact
    probed = {
        (r[0], r[1]) for r in _rows(containment_pairs_bottomk_from(d))
    }
    assert probed <= {(r[0], r[1]) for r in exact}
