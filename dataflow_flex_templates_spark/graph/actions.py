"""Pre/post action execution (SURVEY.md §2.7 X1–X4, §2.8 D1).

The reference's actions are its only "procedures": arbitrary Cypher /
BigQuery SQL statements and HTTP GET/POST webhooks, run either before
the pipeline (preload: ``execute_after == start``,
actions/preload/*.java, JobSpec.getPreloadActions:81-89) or wired into
the DAG behind ``Wait.on`` barriers (actions/transforms/*.java,
GcpToNeo4j.runBeamActions:313-339).

Spark mapping: SQL-type actions (`cypher` / `bigquery`) run as
``spark.sql`` against the session catalog; HTTP actions run driver-side
(urllib, header passthrough per utils/HttpUtils.java:30-59). The
Wait.on dependency queue (utils/BeamBlock.java) collapses to
driver-side sequencing — ``run_job`` calls :func:`run_actions` at each
phase boundary (start → sources → nodes → edges/loads), since Spark
actions are already blocking.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from collections.abc import Callable

from pyspark.sql import SparkSession

from dataflow_flex_templates_spark.spec.model import Action

#: execute_after values handled at each driver-side phase boundary.
PHASES: dict[str, tuple[str, ...]] = {
    "start": ("start", "preloads"),
    "sources": ("sources", "source"),
    "nodes": ("nodes", "node"),
    "edges": ("edges", "edge", "loads", "async", "action"),
}


def _default_http(method: str, url: str, params: dict, headers: dict) -> str:
    """HTTP GET/POST with options passed as query params / form body and
    header passthrough (utils/HttpUtils.java:30-59)."""
    data = None
    if method == "get" and params:
        url = url + ("&" if "?" in url else "?") + urllib.parse.urlencode(params)
    elif method == "post":
        data = urllib.parse.urlencode(params).encode()
    req = urllib.request.Request(url, data=data, headers=headers or {},
                                 method=method.upper())
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        return resp.read().decode(errors="replace")


def run_action(
    spark: SparkSession,
    action: Action,
    http_fn: Callable[[str, str, dict, dict], str] | None = None,
) -> dict:
    """Execute one action; returns a result summary (name, type, detail).

    Dispatch parity with actions/ActionFactory.java:17-37:
      cypher / bigquery → SQL statement against the session catalog
        (options key ``cypher`` or ``sql``), row count logged like
        BigQueryActionTransform.java:31-50;
      http_get / http_post → webhook with options as params
        (PreloadHttpGetAction.java:27-46); injectable ``http_fn`` so
        tests run without a network.
    """
    at = action.action_type.lower()
    opts = dict(action.options)
    if at in ("cypher", "bigquery"):
        stmt = opts.get("cypher") or opts.get("sql") or opts.get("query")
        if not stmt:
            raise ValueError(f"action {action.name}: no SQL statement in options")
        df = spark.sql(stmt)
        n = df.count() if df.columns else 0
        return {"name": action.name, "type": at, "rows": n}
    if at in ("http_get", "http_post"):
        url = opts.pop("url", "")
        if not url:
            raise ValueError(f"action {action.name}: no url in options")
        fn = http_fn or _default_http
        body = fn(at.split("_")[1], url, opts, action.headers)
        return {"name": action.name, "type": at,
                "response_chars": len(body or "")}
    raise ValueError(f"unknown action type: {action.action_type}")


def run_actions(
    spark: SparkSession,
    actions: list[Action],
    phase: str,
    http_fn: Callable[[str, str, dict, dict], str] | None = None,
) -> list[dict]:
    """Run every UNNAMED action whose ``execute_after`` lands in
    ``phase``, in spec order (the reference's queue preserves
    registration order). Actions carrying ``execute_after_name`` are
    excluded here — they fire at their named predecessor's barrier via
    :func:`run_named_actions` (D1, GcpToNeo4j.java:333-336 +
    utils/BeamBlock.java:38-104: a name, when present, overrides the
    typed queue)."""
    accepted = PHASES[phase]
    results = []
    for a in actions:
        if a.execute_after_name:
            continue
        if (a.execute_after or "loads").lower() in accepted:
            results.append(run_action(spark, a, http_fn=http_fn))
    return results


def run_named_actions(
    spark: SparkSession,
    actions: list[Action],
    name: str,
    http_fn: Callable[[str, str, dict, dict], str] | None = None,
) -> list[dict]:
    """Run every action whose ``execute_after_name`` equals ``name`` —
    called right after the named source/target completes. Matches
    BeamBlock.waitOnCollection's by-name lookup: the name alone selects
    the wait target; the ``execute_after`` type is ignored when a name
    is present (the reference registers the signal under the name)."""
    results = []
    for a in actions:
        if a.execute_after_name == name:
            results.append(run_action(spark, a, http_fn=http_fn))
    return results


def summarize(results: list[dict]) -> str:
    return json.dumps(results, default=str)
