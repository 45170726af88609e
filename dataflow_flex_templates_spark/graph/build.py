"""End-to-end job runner: JobSpec → per-target relations → canonical
``nodes`` / ``relationships`` outputs.

Mirrors the reference's run loop (GcpToNeo4j.run:164-295, SURVEY.md
§3.2): shared-source reuse when no target re-queries (:197-202), node
targets before edge targets (D2, InputRefactoring.java:75-81), writers
with merge/append semantics (CypherGenerator.java:28-82 → here: dedup +
table write). Dependency barriers (D1, Wait.on/BeamBlock) collapse to
driver-side sequencing — Spark actions are blocking.

Canonical output shapes (FIXTURES.md "Expected-output conventions"):
  nodes(label, key_name, key_value, properties map<string,string>)
  relationships(type, src_label, src_key, tgt_label, tgt_key,
                properties map<string,string>)
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflow_flex_templates_spark.plans.compiler import (
    apply_target,
    compile_target,
)
from dataflow_flex_templates_spark.sources.readers import read_source
from dataflow_flex_templates_spark.spec.model import JobSpec, Target, TargetType
from dataflow_flex_templates_spark.spec.refactor import refactor_job_spec
from dataflow_flex_templates_spark.spec.validator import validate_job_spec


@dataclass
class JobResult:
    """Per-target relations plus the canonical graph tables."""

    target_frames: dict[str, DataFrame] = dc_field(default_factory=dict)
    nodes: DataFrame | None = None
    relationships: DataFrame | None = None
    action_results: list[dict] = dc_field(default_factory=list)
    #: W6 index/constraint intents (schema_manifest)
    manifest: list[dict] = dc_field(default_factory=list)


def _canonical_nodes(spark: SparkSession, target: Target, df: DataFrame) -> DataFrame:
    ct = compile_target(target, df.columns)
    label = target.labels[0] if target.labels else target.name
    key_name = ct.key_cols[0] if ct.key_cols else ""
    prop_entries = []
    for c in ct.prop_cols:
        if c in df.columns:
            prop_entries.extend([F.lit(c), F.col(c).cast("string")])
    props = (F.create_map(*prop_entries) if prop_entries
             else F.create_map().cast("map<string,string>"))
    return df.select(
        F.lit(label).alias("label"),
        F.lit(key_name).alias("key_name"),
        F.concat_ws("\x1f", *[F.col(k).cast("string") for k in ct.key_cols]).alias("key_value"),
        props.alias("properties"),
    )


def _canonical_edges(spark: SparkSession, target: Target, df: DataFrame) -> DataFrame:
    ct = compile_target(target, df.columns)
    src_label = next((m.label for m in target.mappings
                      if m.fragment.value == "source" and m.role.value == "key"), "")
    tgt_label = next((m.label for m in target.mappings
                      if m.fragment.value == "target" and m.role.value == "key"), "")
    prop_entries = []
    for c in ct.prop_cols:
        if c in df.columns:
            prop_entries.extend([F.lit(c), F.col(c).cast("string")])
    props = (F.create_map(*prop_entries) if prop_entries
             else F.create_map().cast("map<string,string>"))
    return df.select(
        F.lit(target.edge_type).alias("type"),
        F.lit(src_label).alias("src_label"),
        F.concat_ws("\x1f", *[F.col(k).cast("string") for k in ct.src_key_cols]).alias("src_key"),
        F.lit(tgt_label).alias("tgt_label"),
        F.concat_ws("\x1f", *[F.col(k).cast("string") for k in ct.tgt_key_cols]).alias("tgt_key"),
        props.alias("properties"),
    )


def drop_empty_rows(df: DataFrame) -> DataFrame:
    """P6: remove rows whose values are ALL null
    (transforms/DeleteEmptyRowsFn.java:12-29)."""
    return df.na.drop(how="all")


def schema_manifest(spec: JobSpec) -> list[dict]:
    """W6 index/constraint DDL analogue.

    The reference emits ``CREATE INDEX/CONSTRAINT IF NOT EXISTS`` per
    indexed/unique/mandatory/node-key property before loading
    (database/CypherGenerator.java:131-158, executed by
    Neo4jRowWriterTransform.java:41-54). Parquet/Iceberg has no
    secondary indexes, so the same intents are recorded as a manifest
    (one entry per would-be DDL statement) for the lineage/metadata
    layer; ``mandatory`` additionally becomes a runtime null-filter +
    metric in the compiler (plans/compiler.py).
    """
    from dataflow_flex_templates_spark.plans.compiler import compile_target
    from dataflow_flex_templates_spark.spec.model import RoleType

    out: list[dict] = []
    for t in spec.targets:
        if not t.active:
            continue
        labels = t.labels or [t.name]
        ct = compile_target(t)
        for m, name in ct.out_cols:
            if m.role == RoleType.key:
                out.append({"kind": "node_key", "labels": labels,
                            "property": name, "target": t.name})
            if m.unique:
                out.append({"kind": "unique", "labels": labels,
                            "property": name, "target": t.name})
            # index_all_properties promotes every property to indexed
            # (ModelUtils.java:385: key || indexed || indexAllProperties)
            if ((m.indexed or spec.config.index_all_properties)
                    and m.role != RoleType.key):
                out.append({"kind": "index", "labels": labels,
                            "property": name, "target": t.name})
            if m.mandatory:
                out.append({"kind": "not_null", "labels": labels,
                            "property": name, "target": t.name})
    return out


def run_job(
    spark: SparkSession,
    spec: JobSpec,
    source_frames: dict[str, DataFrame] | None = None,
    runtime_tokens: dict[str, str] | None = None,
    http_fn=None,
    read_query: str = "",
    input_file_pattern: str = "",
) -> JobResult:
    """Execute a job spec in batch mode.

    ``source_frames`` lets callers bind pre-built DataFrames to source
    names (e.g. an Iceberg/parquet scan or a test fixture) instead of
    reading from ``source.uri`` — the Spark-native analogue of the
    template's runtime ``inputFilePattern`` override.
    """
    from dataflow_flex_templates_spark.graph.actions import (
        run_actions,
        run_named_actions,
    )

    refactor_job_spec(spec, runtime_tokens,
                      read_query=read_query,
                      input_file_pattern=input_file_pattern)
    validate_job_spec(spec)

    result = JobResult()
    result.manifest = schema_manifest(spec)
    # Preload actions (execute_after=start) run before anything else
    # (JobSpec.getPreloadActions:81-89, GcpToNeo4j.run:173).
    result.action_results += run_actions(spark, spec.actions, "start", http_fn)
    # Shared-source reuse (the reference's one CSE optimization,
    # GcpToNeo4j.java:197-202): one scan per source, fanned out to all
    # of its targets. Catalyst reuses identical subplans; for multi-
    # target fan-out over an expensive scan, callers may persist().
    frames: dict[str, DataFrame] = {}
    for name, src in spec.sources.items():
        if source_frames and name in source_frames:
            frames[name] = source_frames[name]
        else:
            frames[name] = read_source(spark, src)
        # D1 named barrier: actions waiting on THIS source by name
        # (execute_after_name) fire as soon as it is declared.
        result.action_results += run_named_actions(
            spark, spec.actions, name, http_fn)

    result.action_results += run_actions(spark, spec.actions, "sources", http_fn)

    node_frames: list[DataFrame] = []
    edge_frames: list[DataFrame] = []
    # D2: nodes before edges (already sorted by refactor_job_spec).
    nodes_done = False
    for target in spec.targets:
        if not target.active:
            continue
        if target.target_type == TargetType.edge and not nodes_done:
            # Phase boundary: every node target declared → node actions.
            result.action_results += run_actions(
                spark, spec.actions, "nodes", http_fn)
            nodes_done = True
        src_df = frames[target.source]
        for u in target.transform.union:
            # multi-shard ingest: append BEFORE join/where/group so the
            # whole transform sees one logical source
            src_df = src_df.unionByName(frames[u],
                                        allowMissingColumns=True)
        if target.transform.join is not None:
            from dataflow_flex_templates_spark.plans.compiler import (
                apply_join,
            )

            j = target.transform.join
            src_df = apply_join(src_df, frames[j.with_source], j)
        out = apply_target(spark, src_df, target)
        result.target_frames[target.name] = out
        if target.target_type == TargetType.node:
            node_frames.append(_canonical_nodes(spark, target, out))
        else:
            edge_frames.append(_canonical_edges(spark, target, out))
        # D1 named barrier (GcpToNeo4j.java:333-336 / BeamBlock.java:
        # 38-104): the completed target is published as a temp view so
        # an execute_after_name action observes EXACTLY its named
        # predecessor's rows (targets declared later do not exist yet).
        from dataflow_flex_templates_spark.plans.compiler import (
            make_valid_identifier,
        )

        out.createOrReplaceTempView(
            f"target_{make_valid_identifier(target.name)}")
        result.action_results += run_named_actions(
            spark, spec.actions, target.name, http_fn)
    if not nodes_done:
        result.action_results += run_actions(spark, spec.actions, "nodes", http_fn)
    result.action_results += run_actions(spark, spec.actions, "edges", http_fn)

    if node_frames:
        result.nodes = node_frames[0]
        for f in node_frames[1:]:
            result.nodes = result.nodes.unionByName(f)
    if edge_frames:
        result.relationships = edge_frames[0]
        for f in edge_frames[1:]:
            result.relationships = result.relationships.unionByName(f)
    return result
