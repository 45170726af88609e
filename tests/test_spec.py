"""Spec-layer unit tests.

Mirrors the reference's own JUnit coverage
(src/test/java/.../GoogleToNeo4jTest.java:47-114) plus both mapping
grammars parsed from the reference's fixture specs verbatim.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from dataflow_flex_templates_spark.spec.model import (
    FragmentType,
    RoleType,
    SaveMode,
    TargetType,
)
from dataflow_flex_templates_spark.spec.parser import parse_job_spec
from dataflow_flex_templates_spark.spec.refactor import (
    refactor_job_spec,
    replace_variable_tokens,
)
from dataflow_flex_templates_spark.spec.validator import (
    SpecValidationError,
    validate_job_spec,
)

REF_SPECS = Path("/root/reference/src/test/resources/testing-specs")
REF_VERBOSE = REF_SPECS / "verbose-syntax"

needs_ref = pytest.mark.skipif(not REF_SPECS.exists(), reason="reference specs absent")


@needs_ref
def test_parse_text_northwind_transposed():
    spec = parse_job_spec(REF_SPECS / "text-northwind-jobspec.json")
    assert set(spec.sources) == {"1k orders"}
    src = spec.sources["1k orders"]
    assert src.field_names[0] == "customer_id" and len(src.field_names) == 20
    assert src.csv_format == "EXCEL"

    assert len(spec.targets) == 3
    cust, prod, edge = spec.targets
    assert cust.target_type == TargetType.node
    assert cust.save_mode == SaveMode.merge
    assert cust.labels == ["Customer"]
    keys = cust.mappings_by(FragmentType.node, RoleType.key)
    assert [(m.field, m.name) for m in keys] == [("customer_id", "Customer Id")]
    assert all(m.unique and m.indexed for m in keys)
    assert cust.transform.group and not cust.transform.aggregations

    assert prod.labels == ["Product"]
    assert [a.expr for a in prod.transform.aggregations] == [
        "SUM(unit_price*quantity)",
        "SUM(quantity)",
    ]
    assert prod.transform.order_by == "product_name ASC"
    assert prod.transform.limit == -1
    # typed property buckets (strings/doubles/longs)
    by_name = {m.name: m for m in prod.mappings}
    assert by_name["Product Name"].type.value == "String"
    assert by_name["Total product order amount"].type.value == "Float"
    assert by_name["Total product quantity"].type.value == "Long"

    assert edge.target_type == TargetType.edge
    assert edge.edge_type == "Purchases"
    src_keys = edge.mappings_by(FragmentType.source, RoleType.key)
    tgt_keys = edge.mappings_by(FragmentType.target, RoleType.key)
    assert [m.field for m in src_keys] == ["customer_id"]
    assert [m.label for m in src_keys] == ["Customer"]
    assert [m.field for m in tgt_keys] == ["product_id"]
    assert [m.label for m in tgt_keys] == ["Product"]


@needs_ref
def test_parse_verbose_grammar():
    spec = parse_job_spec(REF_VERBOSE / "bq-northwind-jobspec.json")
    assert len(spec.targets) == 3
    cust = spec.targets[0]
    assert cust.labels == ["Customer"]
    key = cust.mappings_by(FragmentType.node, RoleType.key)[0]
    # role==key forces unique=indexed=true (VerboseMappingMapper:31-34)
    assert key.unique and key.indexed and key.name == "CustomerId"
    prod = spec.targets[1]
    by_name = {m.name: m for m in prod.mappings if m.role == RoleType.property}
    assert by_name["Amount"].type.value == "Float"
    assert by_name["Quantity"].type.value == "Integer"


@needs_ref
def test_parse_inline_sources():
    spec = parse_job_spec(REF_SPECS / "inline-northwind-jobspec.json")
    (src,) = spec.sources.values()
    assert src.inline, "inline rows parsed"
    assert len(src.field_names) == 20


def test_token_substitution():
    # Reference test: GoogleToNeo4jTest.java:92-97 ($var SQL substitution)
    sql = "SELECT * FROM t WHERE id = $id AND name = '$name'"
    out = replace_variable_tokens(sql, {"id": "7", "name": "bob"})
    assert out == "SELECT * FROM t WHERE id = 7 AND name = 'bob'"
    # unknown tokens survive untouched
    assert replace_variable_tokens("$x $y", {"x": "1"}) == "1 $y"


def test_refactor_orders_nodes_first():
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "text", "name": "s", "uri": "/tmp/x.csv",
                     "ordered_field_names": "a,b"}],
        "targets": [
            {"edge": {"source": "s", "name": "E", "mappings": {
                "type": "\"T\"",
                "source": {"label": "\"A\"", "key": "a"},
                "target": {"label": "\"B\"", "key": "b"}}}},
            {"node": {"source": "s", "name": "N", "mappings": {
                "labels": ["\"A\""], "keys": ["a"]}}},
        ],
    }))
    refactor_job_spec(spec)
    assert [t.name for t in spec.targets] == ["N", "E"]


def test_validator_rejects_missing_key():
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "text", "name": "s", "uri": "x",
                     "ordered_field_names": "a"}],
        "targets": [{"node": {"source": "s", "name": "N",
                              "mappings": {"labels": ["\"A\""]}}}],
    }))
    with pytest.raises(SpecValidationError) as e:
        validate_job_spec(spec)
    assert "key" in str(e.value)


def test_validator_order_by_in_source_sql():
    # Reference: InputValidator.java:91-98 hard-rejects ORDER BY in
    # source SQL; we keep it as a warning (Spark handles it) and as an
    # error in strict mode.
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "bigquery", "name": "s",
                     "query": "SELECT a FROM t ORDER BY a"}],
        "targets": [{"node": {"source": "s", "name": "N",
                              "mappings": {"labels": ["\"A\""], "keys": ["a"]}}}],
    }))
    warnings = validate_job_spec(spec)
    assert any("ORDER BY" in w for w in warnings)
    with pytest.raises(SpecValidationError):
        validate_job_spec(spec, strict_order_by=True)


def test_validator_strict_mode_unknown_options():
    """strict=True restores InputValidator.java:175-184 hard-errors on
    non-whitelisted job options (default: warning, since plain options
    double as $token values here)."""
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "bigquery", "name": "s",
                     "query": "SELECT 1 AS a"}],
        "targets": [{"node": {"source": "s", "name": "N",
                              "mappings": {"labels": ["\"A\""],
                                           "keys": ["a"]}}}],
        "options": [{"mystery_knob": "7"}],
    }))
    warnings = validate_job_spec(spec)
    assert any("mystery_knob" in w for w in warnings)
    with pytest.raises(SpecValidationError, match="mystery_knob"):
        validate_job_spec(spec, strict=True)


def test_duplicate_mapping_rejected():
    from dataflow_flex_templates_spark.spec.parser import SpecParseError
    with pytest.raises(SpecParseError):
        parse_job_spec(json.dumps({
            "sources": [{"type": "text", "name": "s", "uri": "x",
                         "ordered_field_names": "a"}],
            "targets": [{"node": {"source": "s", "name": "N", "mappings": {
                "labels": ["\"A\""], "keys": ["a"],
                "properties": {"indexed": ["a", "a"]}}}}],
        }))


def test_config_keys_wired_correctly():
    spec = parse_job_spec(json.dumps({
        "config": {"node_write_batch_size": 7000, "node_write_parallelism": 3,
                   "edge_write_batch_size": 900, "edge_write_parallelism": 2},
        "sources": [{"type": "text", "name": "s", "uri": "x",
                     "ordered_field_names": "a"}],
        "targets": [{"node": {"source": "s", "name": "N",
                              "mappings": {"labels": ["\"A\""], "keys": ["a"]}}}],
    }))
    # the reference swaps these (Config.java:29-33 bug); we do not
    assert spec.config.node_batch_size == 7000
    assert spec.config.node_parallelism == 3
    assert spec.config.edge_batch_size == 900
    assert spec.config.edge_parallelism == 2


def test_schema_manifest_w6():
    """W6 DDL analogue: index/constraint intents per target
    (CypherGenerator.java:131-158)."""
    import json as _json

    from dataflow_flex_templates_spark.graph.build import schema_manifest
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    spec = parse_job_spec(_json.dumps({
        "sources": [{"type": "bigquery", "name": "s", "query": "SELECT 1"}],
        "targets": [{
            "name": "C", "type": "node", "source": "s", "mode": "merge",
            "mappings": [
                {"constant": "Customer", "role": "label"},
                {"field": "cid", "name": "cid", "role": "key",
                 "type": "Long"},
                {"field": "em", "name": "email", "role": "property",
                 "type": "String", "unique": True},
                {"field": "nm", "name": "name", "role": "property",
                 "type": "String", "indexed": True, "mandatory": True},
            ],
        }],
    }))
    man = schema_manifest(spec)
    kinds = {(e["kind"], e["property"]) for e in man}
    assert ("node_key", "cid") in kinds
    assert ("unique", "email") in kinds
    assert ("index", "name") in kinds
    assert ("not_null", "name") in kinds
    # un-flagged property is NOT indexed by default...
    assert ("index", "email") not in kinds

    # ...but index_all_properties promotes every property
    # (ModelUtils.java:385: key || indexed || indexAllProperties)
    spec.config.index_all_properties = True
    kinds_all = {(e["kind"], e["property"])
                 for e in schema_manifest(spec)}
    assert ("index", "email") in kinds_all


def test_runtime_read_query_override(tmp_path):
    """OptionsParamsMapper:20-23 + InputRefactoring.rewriteSource:83-100:
    readQuery / inputFilePattern replace source SQL/URI at runtime."""
    import json as _json

    from dataflow_flex_templates_spark.spec.parser import parse_job_spec
    from dataflow_flex_templates_spark.spec.refactor import refactor_job_spec

    spec = parse_job_spec(_json.dumps({
        "sources": [{"type": "bigquery", "name": "s",
                     "query": "SELECT * FROM spec_default"}],
        "targets": [{"node": {
            "source": "s", "name": "N",
            "mappings": {"labels": ["\"N\""], "keys": [{"a": "a"}]},
        }}],
    }))
    refactor_job_spec(spec, {"tbl": "runtime_t"},
                      read_query="SELECT * FROM $tbl")
    assert spec.sources["s"].query == "SELECT * FROM runtime_t"


def test_probe_schema_and_metadata_only(spark):
    """S2 zero-cost schema probe + S5 metadata-only scan
    (BigQueryImpl.java:77-92; TextSourceFileMetadataToRow.java:27-31)."""
    import json as _json

    from dataflow_flex_templates_spark.sources.readers import (
        metadata_only,
        probe_schema,
    )
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    spark.createDataFrame([(1, "x")], "a int, b string") \
        .createOrReplaceTempView("probe_src")
    spec = parse_job_spec(_json.dumps({
        "sources": [{"type": "bigquery", "name": "s",
                     "query": "SELECT a, b FROM probe_src"}],
        "targets": [{"node": {
            "source": "s", "name": "N",
            "mappings": {"labels": ["\"N\""], "keys": [{"a": "a"}]},
        }}],
    }))
    src = spec.sources["s"]
    schema = probe_schema(spark, src)
    assert [f.name for f in schema.fields] == ["a", "b"]
    empty = metadata_only(spark, src)
    assert empty.count() == 0 and empty.schema == schema


def test_reference_fixture_sweep():
    """Every job-spec fixture shipped in the reference's test resources
    parses, refactors, and validates through our spec layer verbatim
    (both grammars, inline blobs with '~'/newline separators, JSON
    inline arrays, Spark-connector-style options lists)."""
    import glob
    import os

    from dataflow_flex_templates_spark.spec.parser import parse_job_spec
    from dataflow_flex_templates_spark.spec.refactor import refactor_job_spec
    from dataflow_flex_templates_spark.spec.validator import validate_job_spec

    base = "/root/reference/src/test/resources/testing-specs"
    if not os.path.isdir(base):
        import pytest
        pytest.skip("reference fixtures not present")
    paths = sorted(glob.glob(base + "/*.json")
                   + glob.glob(base + "/verbose-syntax/*.json"))
    paths = [p for p in paths if "connection" not in p]
    assert len(paths) == 10
    for p in paths:
        with open(p) as f:
            spec = parse_job_spec(f.read())
        refactor_job_spec(spec)
        validate_job_spec(spec)
        assert spec.sources and spec.targets, p
