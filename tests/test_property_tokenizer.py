"""Property-based differential test of the tokenizer contract
(SURVEY.md §1.3): the Spark pipeline must agree with a pure-Python
executable model of the reference semantics (split on single space
-> keep [a-zA-Z] only -> lowercase -> drop empties;
maprdeuce.cpp:204-229,242) on arbitrary generated text, including
unicode, digits, tabs, and pathological whitespace."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from db_mapreduce_project_spark.functions.text import words


def reference_model_tokens(line: str) -> list[str]:
    """Line-exact Python model of the reference tokenizer."""
    out = []
    for tok in line.split(" "):
        w = "".join(
            c.lower()
            for c in tok
            if ("a" <= c <= "z") or ("A" <= c <= "Z")
        )
        if w:
            out.append(w)
    return out


TEXT = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"),
        whitelist_characters=" \t'[]-é漢–",
    ),
    max_size=80,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=st.lists(TEXT, min_size=1, max_size=10))
def test_tokenizer_matches_reference_model(spark, lines):
    df = spark.createDataFrame(
        [(i, line) for i, line in enumerate(lines)],
        "doc_id long, text string",
    )
    got = {
        r["word"]: r["cnt"]
        for r in words(df, "text")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    expected = Counter(
        w for line in lines for w in reference_model_tokens(line)
    )
    assert got == dict(expected)
