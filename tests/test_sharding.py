"""Training-export sharding: the distributed prefix sum must stay
bucket-parallel (no corpus-wide single-partition window), and the
greedy token-budget contract must hold exactly."""

import duckdb

from db_mapreduce_project_spark import registry
from db_mapreduce_project_spark.operators.sharding import (
    SHARD_TOKEN_BUDGET,
    _doc_token_offsets,
)
from db_mapreduce_project_spark.plans.inspect import physical_plan

SF = "/root/testdata/sf0.01"


def _total_tokens() -> int:
    return duckdb.sql(
        "SELECT CAST(sum(CASE WHEN len(trim(text)) = 0 THEN 0 "
        "ELSE len(string_split_regex(trim(text), '\\s+')) END) AS BIGINT) "
        f"FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]


def test_prefix_sum_window_is_bucket_partitioned(spark):
    # The corpus-scale running sum must shuffle on the hash-range
    # bucket (parallel across N_PREFIX_BUCKETS); a plan whose only
    # window exchange is SinglePartition would funnel the whole
    # corpus through one task at 100 TB.
    plan = physical_plan(_doc_token_offsets(spark, SF))
    assert "hashpartitioning(bucket" in plan
    # and the 64-row cross-bucket offset table broadcasts back.
    assert "BroadcastHashJoin" in plan


def test_shard_budget_contract(spark):
    rows = (
        registry.QUERIES["training_shard_assignment"](spark, SF)
        .collect()
    )
    ids = [r.shard_id for r in rows]
    assert ids[0] == 0 and ids == sorted(set(ids))
    # a gap (empty shard) is only legal when some single document
    # exceeds the budget and straddles whole shards on its own
    max_tok = duckdb.sql(
        "SELECT max(CASE WHEN len(trim(text)) = 0 THEN 0 "
        "ELSE len(string_split_regex(trim(text), '\\s+')) END) "
        f"FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    if max_tok <= SHARD_TOKEN_BUDGET:
        assert ids == list(range(len(ids)))
    assert sum(r.sum_tokens for r in rows) == _total_tokens()
    # greedy contract: the first doc of shard k+1 starts at or past
    # the (k+1)*budget boundary, so cumulative tokens through shard
    # k reach that boundary for every non-final shard.
    cum = 0
    for r in rows[:-1]:
        cum += r.sum_tokens
        assert cum >= (r.shard_id + 1) * SHARD_TOKEN_BUDGET


def test_packing_stats_invariants(spark):
    rows = registry.QUERIES["sequence_packing_stats"](spark, SF).collect()
    assert sum(r.sum_tokens for r in rows) == _total_tokens()
    for r in rows:
        assert 0 <= r.n_crossing <= r.n_docs
        assert r.max_spans >= 1
