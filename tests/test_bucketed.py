"""Bucketed-table co-located join: the recurring clip↔transcript
equi-join planned with ZERO Exchange — the write-once layout that
replaces a per-run 100-TB shuffle (sources/bucketed.py has the full
argument). Asserts the plan, the result parity vs an ordinary join,
and bucket-count-mismatch fallback behavior."""

from __future__ import annotations

import pytest

from dataflow_flex_templates_spark.sources.bucketed import (
    co_located_join,
    join_exchange_count,
    no_broadcast,
    write_bucketed,
)


@pytest.fixture(scope="module")
def spark():
    from dataflow_flex_templates_spark.session import get_spark

    s = get_spark("test-bucketed", cores=4)
    yield s


def _clean(spark, *names):
    """Drop catalog entries AND stale warehouse dirs (a table written
    by a dead session leaves its directory behind without a catalog
    row, and saveAsTable refuses the location)."""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    for t in names:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        path = warehouse.removeprefix("file:") + "/" + t
        shutil.rmtree(path, ignore_errors=True)


@pytest.fixture(scope="module")
def tables(spark):
    _clean(spark, "bk_clips", "bk_trans", "bk_trans_4")
    clips = spark.createDataFrame(
        [(f"c{i:04d}", 1000 + i % 7) for i in range(400)],
        "clip_id string, dur_ms long")
    trans = spark.createDataFrame(
        [(f"c{i:04d}", f"text {i}") for i in range(0, 400, 2)],
        "clip_id string, transcript string")
    write_bucketed(clips, "bk_clips", ["clip_id"], 8,
                   sort_cols=["clip_id"])
    write_bucketed(trans, "bk_trans", ["clip_id"], 8,
                   sort_cols=["clip_id"])
    write_bucketed(trans, "bk_trans_4", ["clip_id"], 4,
                   sort_cols=["clip_id"])
    yield
    _clean(spark, "bk_clips", "bk_trans", "bk_trans_4")


def test_bucketed_join_zero_exchange_and_parity(spark, tables):
    with no_broadcast(spark):
        out = co_located_join(spark, "bk_clips", "bk_trans", "clip_id")
        assert join_exchange_count(out) == 0, \
            out._jdf.queryExecution().executedPlan().toString()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        got = sorted(map(tuple, out.collect()))
    # parity vs the ordinary (shuffling) join on the same data
    want = sorted(map(tuple,
                      spark.table("bk_clips")
                      .join(spark.table("bk_trans"), "clip_id")
                      .collect()))
    assert got == want and len(got) == 200


def test_bucket_count_mismatch_still_correct(spark, tables):
    """A 8-vs-4-bucket join stays CORRECT (Spark shuffles or coalesces
    the mismatched side) — the no-Exchange guarantee just no longer
    holds, which is the operational reason both sides of a recurring
    join must standardize one bucket count."""
    with no_broadcast(spark):
        out = co_located_join(spark, "bk_clips", "bk_trans_4", "clip_id")
        assert out.count() == 200


def test_bucket_pruning_on_key_equality(spark, tables):
    """Equality filter on the bucket key scans a 1/8 bucket subset —
    the scan node advertises the selected buckets. Measured gotcha:
    `autoBucketedScan` DISABLES bucketed reads when no downstream
    operator consumes the partitioning ("Bucketed: false (disabled by
    query planner)") — which silently forfeits bucket PRUNING on
    point lookups too; a lookup-heavy workload should pin it off."""
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        df = spark.table("bk_clips").filter("clip_id = 'c0007'")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan and \
            "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert df.count() == 1
    finally:
        spark.conf.set(key, old)
