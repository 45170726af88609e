"""End-to-end batch job tests: the reference's flagship 3-target
northwind job (text-northwind-jobspec.json) over a deterministic
synthetic orders table, verified against a DuckDB oracle.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

import duckdb
import pandas as pd
import pytest

REF_SPEC = Path("/root/reference/src/test/resources/testing-specs/text-northwind-jobspec.json")

FIELDS = ("customer_id,contact_name,company_name,seller_id,seller_first_name,"
          "seller_last_name,seller_title,product_id,product_name,category_name,"
          "supplier_name,supplier_postal_code,supplier_country,order_id,order_date,"
          "shipped_date,required_date,quantity,unit_price,discount").split(",")


def synth_orders(n: int = 1000) -> pd.DataFrame:
    """Deterministic northwind-shaped all-string rows (FIXTURES.md F2)."""
    rng = random.Random(42)
    rows = []
    for i in range(n):
        cust = f"C{rng.randrange(40):03d}"
        prod = rng.randrange(60)
        rows.append({
            "customer_id": cust,
            "contact_name": f"contact {cust}",
            "company_name": f"company {cust}",
            "seller_id": str(rng.randrange(10)),
            "seller_first_name": "fn", "seller_last_name": "ln",
            "seller_title": "rep",
            "product_id": str(prod),
            "product_name": f"product {prod:03d}",
            "category_name": f"cat{prod % 7}",
            "supplier_name": f"sup{prod % 11}",
            "supplier_postal_code": "00000", "supplier_country": "US",
            "order_id": str(10000 + i),
            "order_date": f"2024-01-{(i % 28) + 1:02d}",
            "shipped_date": f"2024-02-{(i % 28) + 1:02d}",
            "required_date": f"2024-03-{(i % 28) + 1:02d}",
            "quantity": str(rng.randrange(1, 20)),
            "unit_price": f"{rng.randrange(100, 10000) / 100:.2f}",
            "discount": "0.0",
        })
    return pd.DataFrame(rows, columns=FIELDS)


@pytest.fixture(scope="module")
def job(spark):
    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    pdf = synth_orders()
    sdf = spark.createDataFrame(pdf)
    spec = parse_job_spec(REF_SPEC)
    result = run_job(spark, spec, source_frames={"1k orders": sdf})
    return pdf, result


def test_customer_nodes_group_dedup(job):
    pdf, result = job
    cust = result.target_frames["Customer"].toPandas()
    oracle = duckdb.sql(
        "SELECT customer_id, contact_name, company_name FROM pdf "
        "GROUP BY 1,2,3"
    ).df()
    assert len(cust) == len(oracle) == pdf["customer_id"].nunique()
    got = set(map(tuple, cust[["Customer_Id", "Contact_Name", "Company_Name"]].values))
    want = set(map(tuple, oracle.values))
    assert got == want


def test_product_nodes_aggregations(job):
    """The reference's Products target GROUPs BY *all* mapped fields
    (product_id + contact_name + company_name + product_name) then
    MERGE collapses per key. Check: one node per product, and its
    aggregate values come from one of the grouped-oracle rows."""
    pdf, result = job
    prod = result.target_frames["Products"].toPandas()
    assert len(prod) == pdf["product_id"].nunique()
    oracle = duckdb.sql(
        "SELECT product_id, contact_name, company_name, "
        "SUM(CAST(unit_price AS DOUBLE)*CAST(quantity AS DOUBLE)) AS amt, "
        "SUM(CAST(quantity AS BIGINT)) AS qty "
        "FROM pdf GROUP BY 1,2,3"
    ).df()
    want = {(r["product_id"], r["contact_name"], round(r["amt"], 6), int(r["qty"]))
            for _, r in oracle.iterrows()}
    got = {(r["product_id"], r["contact_name"],
            round(r["Total_product_order_amount"], 6),
            int(r["Total_product_quantity"]))
           for _, r in prod.iterrows()}
    assert got <= want


def test_single_key_aggregation_exact(spark):
    """Exact aggregate parity when the group key IS the natural key
    (no MERGE ambiguity): SUM expressions per product."""
    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    pdf = synth_orders(500)
    sdf = spark.createDataFrame(pdf)
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "text", "name": "s", "uri": "unused",
                     "ordered_field_names": ",".join(FIELDS)}],
        "targets": [{"node": {"source": "s", "name": "P", "mode": "merge",
                              "transform": {"group": True, "aggregations": [
                                  {"expr": "SUM(unit_price*quantity)", "field": "amt"},
                                  {"expr": "SUM(quantity)", "field": "qty"}]},
                              "mappings": {"labels": ["\"Product\""],
                                           "keys": ["product_id"],
                                           "properties": {
                                               "doubles": ["amt"],
                                               "longs": ["qty"]}}}}],
    }))
    out = run_job(spark, spec, source_frames={"s": sdf}).target_frames["P"].toPandas()
    oracle = duckdb.sql(
        "SELECT product_id, "
        "SUM(CAST(unit_price AS DOUBLE)*CAST(quantity AS DOUBLE)) AS amt, "
        "SUM(CAST(quantity AS BIGINT)) AS qty FROM pdf GROUP BY 1").df()
    got = {r["product_id"]: (round(r["amt"], 6), int(r["qty"]))
           for _, r in out.iterrows()}
    want = {r["product_id"]: (round(r["amt"], 6), int(r["qty"]))
            for _, r in oracle.iterrows()}
    assert got == want


def test_purchase_edges(job):
    pdf, result = job
    edges = result.target_frames["Purchase Edges"].toPandas()
    oracle = duckdb.sql(
        "SELECT customer_id, product_id, "
        "SUM(CAST(unit_price AS DOUBLE)*CAST(quantity AS DOUBLE)) AS amt, "
        "SUM(CAST(quantity AS BIGINT)) AS qty "
        "FROM pdf GROUP BY 1,2"
    ).df()
    assert len(edges) == len(oracle)
    rel = result.relationships.toPandas()
    assert (rel["type"] == "Purchases").all()
    assert set(rel["src_label"]) == {"Customer"}
    assert set(rel["tgt_label"]) == {"Product"}


def test_canonical_nodes_shape(job):
    _, result = job
    nodes = result.nodes.toPandas()
    assert set(nodes.columns) == {"label", "key_name", "key_value", "properties"}
    assert set(nodes["label"]) == {"Customer", "Product"}


def test_merge_dedup_last_writer_wins(spark):
    """MERGE on key without grouping: last arrival wins per key
    (Cypher MERGE..SET semantics, CypherGenerator.java:63-71)."""
    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec
    from dataflow_flex_templates_spark.sources.readers import all_string_schema
    from dataflow_flex_templates_spark.plans.compiler import ORDINAL_COL
    import pyspark.sql.functions as F

    rows = [("k1", "v1"), ("k1", "v2"), ("k2", "a"), ("k1", "v3"), ("k2", "b")]
    sdf = (spark.createDataFrame(rows, schema=all_string_schema(["k", "v"]))
           .coalesce(1)
           .withColumn(ORDINAL_COL, F.monotonically_increasing_id()))
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "text", "name": "s", "uri": "unused",
                     "ordered_field_names": "k,v"}],
        "targets": [{"node": {"source": "s", "name": "N", "mode": "merge",
                              "mappings": {"labels": ["\"T\""], "keys": ["k"],
                                           "properties": {"strings": ["v"]}}}}],
    }))
    out = run_job(spark, spec, source_frames={"s": sdf}).target_frames["N"].toPandas()
    got = dict(zip(out["k"], out["v"]))
    assert got == {"k1": "v3", "k2": "b"}


def test_where_order_limit(spark):
    """P4 filter + O1 sort + O3 limit through the generated SQL."""
    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    pdf = synth_orders(200)
    sdf = spark.createDataFrame(pdf)
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "text", "name": "s", "uri": "unused",
                     "ordered_field_names": ",".join(FIELDS)}],
        "targets": [{"node": {"source": "s", "name": "Top", "mode": "append",
                              "transform": {"group": True,
                                            "where": "CAST(quantity AS INT) > 10",
                                            "order_by": "product_id DESC",
                                            "limit": 5},
                              "mappings": {"labels": ["\"P\""], "keys": ["product_id"]}}}],
    }))
    out = run_job(spark, spec, source_frames={"s": sdf}).target_frames["Top"].toPandas()
    assert len(out) == 5
    oracle = duckdb.sql(
        "SELECT product_id FROM pdf WHERE CAST(quantity AS INT) > 10 "
        "GROUP BY 1 ORDER BY product_id DESC LIMIT 5").df()
    assert list(out["product_id"]) == list(oracle["product_id"])


def test_mandatory_and_defaults(spark):
    """Mandatory → null-filter; default → constant fallback
    (DataCastingUtils.java:79-89)."""
    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec
    from dataflow_flex_templates_spark.sources.readers import all_string_schema

    rows = [("a", "1"), ("b", None), (None, "3")]
    sdf = spark.createDataFrame(rows, schema=all_string_schema(["k", "v"]))
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "text", "name": "s", "uri": "unused",
                     "ordered_field_names": "k,v"}],
        "targets": [{
            "name": "N", "type": "node", "source": "s", "mode": "append",
            "mappings": [
                {"constant": "T", "name": "T", "role": "label"},
                {"field": "k", "name": "k", "role": "key", "mandatory": True},
                {"field": "v", "name": "v", "role": "property",
                 "type": "Long", "default": "0"},
            ],
        }],
    }))
    out = run_job(spark, spec, source_frames={"s": sdf}).target_frames["N"].toPandas()
    assert len(out) == 2  # null key filtered by mandatory
    got = dict(zip(out["k"], out["v"]))
    assert got == {"a": 1, "b": 0}


def test_try_cast_failure_is_null(spark):
    """Cast failure → null (DataCastingUtils.java:121-124)."""
    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec
    from dataflow_flex_templates_spark.sources.readers import all_string_schema

    rows = [("a", "12"), ("b", "not_a_number"), ("c", "2024-01-05")]
    sdf = spark.createDataFrame(rows, schema=all_string_schema(["k", "v"]))
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "text", "name": "s", "uri": "unused",
                     "ordered_field_names": "k,v"}],
        "targets": [{
            "name": "N", "type": "node", "source": "s", "mode": "append",
            "mappings": [
                {"constant": "T", "name": "T", "role": "label"},
                {"field": "k", "name": "k", "role": "key"},
                {"field": "v", "name": "num", "role": "property", "type": "Long"},
            ],
        }],
    }))
    out = run_job(spark, spec, source_frames={"s": sdf}).target_frames["N"].toPandas()
    got = {r["k"]: r["num"] for _, r in out.iterrows()}
    assert got["a"] == 12
    assert pd.isna(got["b"]) and pd.isna(got["c"])


def test_reference_inline_spec_verbatim(spark):
    """The reference's own inline-northwind-jobspec.json (97 embedded
    CSV rows, '~' row separator, EXCEL dialect with quoted fields) runs
    end-to-end; node/edge counts equal the independent pandas oracle.
    Guards the quoted-comma CSV tokenization
    (TextParserUtils.parseDelimitedLine parity)."""
    import os

    import pandas as pd

    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    path = ("/root/reference/src/test/resources/testing-specs/"
            "inline-northwind-jobspec.json")
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference fixtures not present")
    with open(path) as f:
        spec = parse_job_spec(f.read())
    src = next(iter(spec.sources.values()))
    pdf = pd.DataFrame(src.inline, columns=src.field_names)
    assert all(len(r) == len(src.field_names) for r in src.inline)

    res = run_job(spark, spec)
    nodes = {r["label"]: r["count"] for r in
             res.nodes.groupBy("label").count().collect()}
    assert nodes["Customer"] == pdf["customer_id"].nunique()
    assert nodes["Product"] == pdf["product_id"].nunique()
    assert (res.relationships.count()
            == pdf.groupby(["customer_id", "product_id"]).ngroups)


def test_musicians_connector_options_spec(spark):
    """The reference's json-musicians-jobspec-options-syntax.json
    (Spark-connector-style options, NO targets array) runs end-to-end:
    targets are synthesized from the relationship.* options. The
    reference merely whitelists these options (InputValidator.java:35-44)
    without building anything — we make the spec runnable."""
    import os

    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    path = ("/root/reference/src/test/resources/testing-specs/"
            "verbose-syntax/json-musicians-jobspec-options-syntax.json")
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference fixtures not present")
    with open(path) as f:
        spec = parse_job_spec(f.read())
    res = run_job(spark, spec)
    nodes = {r["label"]: r["count"] for r in
             res.nodes.groupBy("label").count().collect()}
    # 4 musicians (all named John *), 2 distinct instruments
    assert nodes == {"Musician": 4, "Instrument": 2}
    edges = res.relationships.toPandas()
    assert (edges["type"] == "PLAYS").all()
    assert len(edges) == 4  # one PLAYS edge per musician
    # target-node properties flow through (instrument_color → color)
    inst = res.target_frames["Instrument"].toPandas()
    assert set(inst.columns) >= {"name", "color"}


def test_all_property_types_cast(spark):
    """All 14 reference PropertyType values (model/enums/
    PropertyType.java) map through the typed projection
    (utils/BeamUtils.java:72-123 semantics in SURVEY §1.3)."""
    import json as _json

    from pyspark.sql import types as T

    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    spark.createDataFrame(
        [("1", "7", "8", "1.5", "2.25", "9.125", "true", "2024-03-01",
          "2024-03-01 10:11:12", "abc", "13:14:15", "POINT(1 2)", "86400",
          "10:00:00", "2024-03-01T10:11:12")],
        "s string, i string, l string, f string, d string, dec string, "
        "b string, dt string, ldt string, ba string, tm string, pt string, "
        "dur string, lt string, zdt string").createOrReplaceTempView("typed_src")
    mappings = [
        {"constant": "T", "role": "label"},
        {"field": "s", "name": "c_string", "role": "key", "type": "String"},
        {"field": "i", "name": "c_int", "role": "property", "type": "Integer"},
        {"field": "l", "name": "c_long", "role": "property", "type": "Long"},
        {"field": "f", "name": "c_float", "role": "property", "type": "Float"},
        {"field": "dec", "name": "c_dec", "role": "property",
         "type": "BigDecimal"},
        {"field": "b", "name": "c_bool", "role": "property", "type": "Boolean"},
        {"field": "dt", "name": "c_date", "role": "property", "type": "Date"},
        {"field": "ldt", "name": "c_ldt", "role": "property",
         "type": "LocalDateTime"},
        {"field": "ba", "name": "c_bytes", "role": "property",
         "type": "ByteArray"},
        {"field": "tm", "name": "c_time", "role": "property", "type": "Time"},
        {"field": "pt", "name": "c_point", "role": "property", "type": "Point"},
        {"field": "dur", "name": "c_dur", "role": "property",
         "type": "Duration"},
        {"field": "lt", "name": "c_lt", "role": "property",
         "type": "LocalTime"},
        {"field": "zdt", "name": "c_dt", "role": "property",
         "type": "DateTime"},
    ]
    spec = parse_job_spec(_json.dumps({
        "sources": [{"type": "bigquery", "name": "s",
                     "query": "SELECT * FROM typed_src"}],
        "targets": [{"name": "T", "type": "node", "source": "s",
                     "mode": "append", "mappings": mappings}],
    }))
    out = run_job(spark, spec).target_frames["T"]
    dt = dict(out.dtypes)
    # SURVEY §1.3 mapping table
    assert dt["c_string"] == "string"
    assert dt["c_int"] == "bigint" and dt["c_long"] == "bigint"
    # Float lands as double end-to-end: the reference coerces FLOAT →
    # double at write time (DataCastingUtils.rowToNeo4jDataMap:159-162)
    assert dt["c_float"] == "double"
    assert dt["c_dec"].startswith("decimal")
    assert dt["c_bool"] == "boolean"
    assert dt["c_date"] == "date"
    assert dt["c_ldt"] == "timestamp" and dt["c_dt"] == "timestamp"
    assert dt["c_bytes"] == "binary"
    assert dt["c_time"] == "string" and dt["c_point"] == "string"
    assert dt["c_dur"].startswith("decimal")
    r = out.collect()[0]
    assert r["c_int"] == 7 and r["c_long"] == 8
    assert r["c_bool"] is True
    assert str(r["c_date"]) == "2024-03-01"
    assert r["c_point"] == "POINT(1 2)"
    assert bytes(r["c_bytes"]) == b"abc"


def test_text_spec_verbatim_with_runtime_uri(spark, tmp_path):
    """The reference's text-northwind-jobspec.json runs verbatim with a
    runtime inputFilePattern override (its gs:// URI replaced), over a
    CSV materialized from the inline fixture's own 97 rows — and
    produces the same graph as the inline spec (same data, different
    source operator + mapping grammar details)."""
    import csv
    import os

    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    base = "/root/reference/src/test/resources/testing-specs"
    if not os.path.isdir(base):
        import pytest
        pytest.skip("reference fixtures not present")
    with open(f"{base}/inline-northwind-jobspec.json") as f:
        inline_spec = parse_job_spec(f.read())
    src = next(iter(inline_spec.sources.values()))
    csv_path = str(tmp_path / "orders.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        for row in src.inline:
            w.writerow(row)

    with open(f"{base}/text-northwind-jobspec.json") as f:
        text_spec = parse_job_spec(f.read())
    res_text = run_job(spark, text_spec, input_file_pattern=csv_path)
    res_inline = run_job(spark, inline_spec)

    t_nodes = {r["label"]: r["count"] for r in
               res_text.nodes.groupBy("label").count().collect()}
    i_nodes = {r["label"]: r["count"] for r in
               res_inline.nodes.groupBy("label").count().collect()}
    assert t_nodes == i_nodes
    assert (res_text.relationships.count()
            == res_inline.relationships.count())
    # W6 manifest flows from the text spec's indexed/key declarations
    kinds = {(m["kind"], m["property"]) for m in res_text.manifest}
    assert ("node_key", "Customer_Id") in kinds
    assert ("index", "Contact_Name") in kinds


def test_bq_spec_verbatim_with_read_query_override(spark):
    """The reference's bq-northwind-jobspec.json runs verbatim with a
    runtime readQuery override (its BigQuery three-part table swapped
    for a catalog view seeded with the inline fixture's rows) — same
    graph as the inline spec."""
    import os

    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.sources.readers import (
        all_string_schema,
    )
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    base = "/root/reference/src/test/resources/testing-specs"
    if not os.path.isdir(base):
        import pytest
        pytest.skip("reference fixtures not present")
    with open(f"{base}/inline-northwind-jobspec.json") as f:
        inline_spec = parse_job_spec(f.read())
    src = next(iter(inline_spec.sources.values()))
    rows = [[None if c is None else str(c) for c in r] for r in src.inline]
    spark.createDataFrame(rows, schema=all_string_schema(src.field_names)) \
        .createOrReplaceTempView("v_customer_orders")

    with open(f"{base}/bq-northwind-jobspec.json") as f:
        bq_spec = parse_job_spec(f.read())
    res_bq = run_job(spark, bq_spec,
                     read_query="SELECT * FROM v_customer_orders")
    res_inline = run_job(spark, inline_spec)
    b_nodes = {r["label"]: r["count"] for r in
               res_bq.nodes.groupBy("label").count().collect()}
    i_nodes = {r["label"]: r["count"] for r in
               res_inline.nodes.groupBy("label").count().collect()}
    assert b_nodes == i_nodes
    assert res_bq.relationships.count() == res_inline.relationships.count()


def test_grouped_merge_typed_keys_still_dedup(spark):
    """A grouped MERGE target whose key carries a type cast must keep
    the LWW dedup: grouping runs on RAW strings, so ' 1', '1', '01'
    are three groups that collapse to ONE typed key — without the
    dedup the merge table would emit duplicate keys (the all-string
    CSV ingest path)."""
    import json

    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    spark.createDataFrame(
        [("1", "a"), (" 1", "b"), ("01", "c"), ("2", "d"), ("oops", "e")],
        "k string, v string").createOrReplaceTempView("typed_key_base")
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "bigquery", "name": "s",
                     "query": "SELECT * FROM typed_key_base"}],
        "targets": [{
            "name": "T", "type": "node", "source": "s", "mode": "merge",
            "transform": {"group": True},
            "mappings": [
                {"constant": "T", "role": "label"},
                {"field": "k", "name": "key", "role": "key",
                 "type": "Long"},
            ],
        }],
    }))
    out = run_job(spark, spec).target_frames["T"].toPandas()
    # one row per POST-CAST key: 1, 2, and null (parse failure)
    assert len(out) == 3, out
    assert sorted(out["key"].fillna(-1)) == [-1, 1, 2]

    # control: a cast-free key keeps the dedup-elision fast path and
    # yields one row per raw group
    spec2 = parse_job_spec(json.dumps({
        "sources": [{"type": "bigquery", "name": "s",
                     "query": "SELECT * FROM typed_key_base"}],
        "targets": [{
            "name": "T2", "type": "node", "source": "s", "mode": "merge",
            "transform": {"group": True},
            "mappings": [
                {"constant": "T2", "role": "label"},
                {"field": "k", "name": "key", "role": "key"},
            ],
        }],
    }))
    out2 = run_job(spark, spec2).target_frames["T2"]
    assert out2.count() == 5
    # the elision is real: no extra aggregate beyond the GROUP BY
    plan = out2._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("aggregate") == 1, plan


def test_automap_generates_properties(spark):
    """automap=true auto-maps every unmapped source column as a
    property (completing the reference's parsed-but-unimplemented
    roadmap flag, TargetMapper.java:64 / docs/README.md:183); grouped
    targets ignore it (auto columns would change the GROUP BY set)."""
    import json

    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    spark.createDataFrame(
        [("1", "alice", "x@y.z", "7"), ("2", "bob", "b@y.z", "9")],
        "uid string, uname string, email string, score string",
    ).createOrReplaceTempView("automap_base")

    def spec(extra_target=None):
        tgt = {"name": "U", "type": "node", "source": "s",
               "mode": "append", "automap": True,
               "mappings": [
                   {"constant": "User", "role": "label"},
                   {"field": "uid", "name": "user_id", "role": "key",
                    "type": "Long"}]}
        if extra_target:
            tgt.update(extra_target)
        return parse_job_spec(json.dumps({
            "sources": [{"type": "bigquery", "name": "s",
                         "query": "SELECT * FROM automap_base"}],
            "targets": [tgt],
        }))

    out = run_job(spark, spec()).target_frames["U"]
    # uid is consumed by the explicit user_id mapping; the three
    # unmapped columns are auto-added as string properties
    assert sorted(out.columns) == ["email", "score", "uname", "user_id"]
    rows = {r["user_id"]: r for r in out.collect()}
    assert rows[1]["email"] == "x@y.z" and rows[2]["uname"] == "bob"

    # grouped target: automap is ignored (GROUP BY set unchanged)
    grouped = spec({"transform": {
        "group": True,
        "aggregations": [{"expr": "count(*)", "field": "n"}]},
        "mappings": [
            {"constant": "User", "role": "label"},
            {"field": "uid", "name": "user_id", "role": "key"},
            {"field": "n", "name": "n", "role": "property",
             "type": "Long"}]})
    gout = run_job(spark, grouped).target_frames["U"]
    assert sorted(gout.columns) == ["n", "user_id"]
