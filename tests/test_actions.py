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


def test_drop_empty_rows(spark):
    df = spark.createDataFrame(
        [("a", 1), (None, None), ("b", None), (None, 2), (None, None)],
        "s string, n int")
    out = drop_empty_rows(df)
    assert out.count() == 3
