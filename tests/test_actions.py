"""Actions (SURVEY §2.7 X1-X4) + drop-empty-rows (P6) + token
substitution through run_job (P7)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dataflow_flex_templates_spark.graph.actions import run_action, run_actions
from dataflow_flex_templates_spark.graph.build import drop_empty_rows, run_job
from dataflow_flex_templates_spark.spec.model import Action
from dataflow_flex_templates_spark.spec.parser import parse_job_spec


def test_sql_action(spark):
    spark.range(5).createOrReplaceTempView("act_five")
    res = run_action(spark, Action(
        name="count", action_type="cypher",
        options={"cypher": "SELECT * FROM act_five WHERE id > 1"}))
    assert res == {"name": "count", "type": "cypher", "rows": 3}


def test_http_action_uses_injected_fn(spark):
    calls = []

    def fake_http(method, url, params, headers):
        calls.append((method, url, params, headers))
        return "ok"

    res = run_action(spark, Action(
        name="hook", action_type="http_post",
        options={"url": "http://example.test/h", "a": "1"},
        headers={"x-token": "t"}), http_fn=fake_http)
    assert res["response_chars"] == 2
    assert calls == [("post", "http://example.test/h", {"a": "1"},
                      {"x-token": "t"})]


def test_phase_filtering(spark):
    spark.sql("SELECT 1").createOrReplaceTempView("one_row")
    actions = [
        Action(name="pre", action_type="cypher", execute_after="start",
               options={"cypher": "SELECT * FROM one_row"}),
        Action(name="post", action_type="cypher", execute_after="edges",
               options={"cypher": "SELECT * FROM one_row"}),
    ]
    assert [r["name"] for r in run_actions(spark, actions, "start")] == ["pre"]
    assert [r["name"] for r in run_actions(spark, actions, "edges")] == ["post"]


def test_unknown_action_type_raises(spark):
    with pytest.raises(ValueError, match="unknown action"):
        run_action(spark, Action(name="x", action_type="smoke_signal"))


def test_actions_through_run_job(spark):
    """Preload action creates the view the source reads (D1 ordering:
    start actions run before source resolution); a loads action runs
    after targets."""
    spark.range(10).select(
        F.col("id").cast("string").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    ).createOrReplaceTempView("act_base")
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "bigquery", "name": "s",
                     "query": "SELECT * FROM act_view"}],
        "targets": [{"node": {
            "source": "s", "name": "K", "mode": "merge",
            "mappings": {"labels": ["\"K\""], "keys": ["k"],
                         "properties": {"strings": ["v"]}},
        }}],
        "actions": [
            {"name": "mkview", "type": "cypher", "execute_after": "start",
             "options": [{"cypher":
                          "CREATE OR REPLACE TEMP VIEW act_view AS "
                          "SELECT * FROM act_base WHERE k <> '3'"}]},
            {"name": "post_count", "type": "bigquery", "execute_after": "loads",
             "options": [{"sql": "SELECT count(*) AS n FROM act_view"}]},
        ],
    }))
    res = run_job(spark, spec)
    assert res.target_frames["K"].count() == 9
    names = [r["name"] for r in res.action_results]
    assert names == ["mkview", "post_count"]


def test_token_substitution_through_run_job(spark):
    spark.range(6).select(
        F.col("id").cast("string").alias("k"),
        (F.col("id") % 2 == 0).cast("string").alias("even"),
    ).createOrReplaceTempView("tok_base")
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "bigquery", "name": "s",
                     "query": "SELECT * FROM tok_base WHERE even = '$want'"}],
        "targets": [{"node": {
            "source": "s", "name": "T", "mode": "append",
            "mappings": {"labels": ["\"T\""], "keys": ["k"]},
        }}],
    }))
    res = run_job(spark, spec, runtime_tokens={"want": "true"})
    assert res.target_frames["T"].count() == 3


def test_execute_after_name_batch(spark):
    """D1 named barrier (GcpToNeo4j.java:333-336, BeamBlock.java:38-104):
    an action named after target A fires right after A and observes
    EXACTLY A's rows — target B, declared later, does not exist yet, so
    an action peeking at B at A's barrier fails; the same action named
    after B succeeds and sees both."""
    spark.range(8).select(
        F.col("id").cast("string").alias("k"),
        (F.col("id") * 2).alias("v"),
    ).createOrReplaceTempView("named_base")

    def spec(probe_sql):
        return parse_job_spec(json.dumps({
            "sources": [{"type": "bigquery", "name": "s",
                         "query": "SELECT * FROM named_base"}],
            "targets": [
                {"node": {"source": "s", "name": "A", "mode": "append",
                          "transform": {"where": "v < 8"},
                          "mappings": {"labels": ["\"A\""], "keys": ["k"],
                                       "properties": {"longs": ["v"]}}}},
                {"node": {"source": "s", "name": "B", "mode": "append",
                          "mappings": {"labels": ["\"B\""], "keys": ["k"]}}},
            ],
            "actions": [
                {"name": "after_a", "type": "cypher",
                 "execute_after": "node", "execute_after_name": "A",
                 "options": [{"cypher": probe_sql}]},
                {"name": "tail", "type": "cypher", "execute_after": "loads",
                 "options": [{"cypher": "SELECT 1 AS one"}]},
            ],
        }))

    spark.catalog.dropTempView("target_B")
    res = run_job(spark, spec(
        "CREATE OR REPLACE TEMP VIEW seen_at_a AS "
        "SELECT count(*) AS n FROM target_A"))
    assert [r["name"] for r in res.action_results] == ["after_a", "tail"]
    # observed exactly A's (filtered) rows: v < 8 → ids 0..3
    assert spark.table("seen_at_a").first()["n"] == 4

    # peeking at the NOT-yet-declared target B from A's barrier fails
    spark.catalog.dropTempView("target_B")
    with pytest.raises(Exception, match="target_B"):
        run_job(spark, spec("SELECT count(*) FROM target_B"))

    # ...but a named barrier on B itself sees both targets
    sp = spec("SELECT count(*) FROM target_B")
    sp.actions[0].execute_after_name = "B"
    res2 = run_job(spark, sp)
    assert [r["name"] for r in res2.action_results] == ["after_a", "tail"]
    assert res2.action_results[0]["rows"] == 1


def test_execute_after_name_source(spark):
    """Named barrier on a SOURCE: fires at source declaration, before
    any target runs."""
    spark.range(3).select(F.col("id").cast("string").alias("k")) \
        .createOrReplaceTempView("src_base")
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "bigquery", "name": "mysrc",
                     "query": "SELECT * FROM src_base"}],
        "targets": [{"node": {
            "source": "mysrc", "name": "N", "mode": "append",
            "mappings": {"labels": ["\"N\""], "keys": ["k"]}}}],
        "actions": [
            {"name": "on_src", "type": "cypher",
             "execute_after": "source", "execute_after_name": "mysrc",
             "options": [{"cypher": "SELECT count(*) AS n FROM src_base"}]},
        ],
    }))
    res = run_job(spark, spec)
    assert res.action_results[0] == {"name": "on_src", "type": "cypher",
                                     "rows": 1}


def test_execute_after_name_unknown_warns():
    from dataflow_flex_templates_spark.spec.validator import (
        validate_job_spec,
    )

    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "bigquery", "name": "s", "query": "SELECT 1"}],
        "targets": [{"node": {"source": "s", "name": "N", "mode": "append",
                              "mappings": {"labels": ["\"N\""],
                                           "keys": ["k"]}}}],
        "actions": [{"name": "ghost", "type": "cypher",
                     "execute_after": "node",
                     "execute_after_name": "NoSuchTarget",
                     "options": [{"cypher": "SELECT 1"}]}],
    }))
    warnings = validate_job_spec(spec)
    assert any("NoSuchTarget" in w for w in warnings)


def test_drop_empty_rows(spark):
    df = spark.createDataFrame(
        [("a", 1), (None, None), ("b", None), (None, 2), (None, None)],
        "s string, n int")
    out = drop_empty_rows(df)
    assert out.count() == 3
