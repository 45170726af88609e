"""Join transform inside the job spec — the reference's own roadmap
item ("Supporting join transformations inside the job",
docs/README.md:182), never parsed or implemented there; this engine's
grammar ships it in both batch and streaming (stream-static)."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


def _parse(d):
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    return parse_job_spec(json.dumps(d))


def _two_source_spec(how="inner", on=("k",), with_source="dim",
                     group=False):
    tr = {"join": {"with": with_source, "on": list(on), "how": how}}
    maps = [
        {"constant": "Fact", "role": "label"},
        {"field": "k", "name": "k", "role": "key", "type": "Long"},
    ]
    if group:
        tr["group"] = True
        tr["aggregations"] = [{"expr": "sum(v)", "field": "total_v"}]
        maps += [{"field": "grp", "name": "grp", "role": "key",
                  "type": "String"},
                 {"field": "total_v", "name": "total_v",
                  "role": "property", "type": "Long"}]
        maps[1] = {"field": "grp", "name": "grp", "role": "key",
                   "type": "String"}
        del maps[2]
    else:
        maps += [{"field": "v", "name": "v", "role": "property",
                  "type": "Long"},
                 {"field": "grp", "name": "grp", "role": "property",
                  "type": "String"}]
    return {
        "sources": [
            {"type": "bigquery", "name": "fact", "query": "SELECT 1"},
            {"type": "bigquery", "name": "dim", "query": "SELECT 1"},
        ],
        "targets": [{"name": "Fact", "type": "node", "source": "fact",
                     "mode": "append", "transform": tr,
                     "mappings": maps}],
    }


def test_join_spec_parse_and_validate():
    from dataflow_flex_templates_spark.spec.validator import (
        SpecValidationError,
        validate_job_spec,
    )

    spec = _parse(_two_source_spec())
    j = spec.targets[0].transform.join
    assert (j.with_source, j.on, j.how) == ("dim", ["k"], "inner")
    validate_job_spec(spec)

    for bad, msg in [
        (_two_source_spec(with_source="nope"), "unknown source"),
        (_two_source_spec(with_source="fact"), "different source"),
        (_two_source_spec(on=()), "at least one 'on' key"),
        (_two_source_spec(how="cross"), "inner|left"),
    ]:
        with pytest.raises(SpecValidationError, match=msg):
            validate_job_spec(_parse(bad))


def test_batch_join_transform(spark):
    from dataflow_flex_templates_spark.graph.build import run_job

    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (1, 11)], "k long, v long")
    # dim carries: the group column, a colliding column (v — must NOT
    # clobber the fact side), and an unused extra
    dim = spark.createDataFrame(
        [(1, "a", 999, "x"), (2, "b", 999, "y")],
        "k long, grp string, v long, extra string")

    out = run_job(spark, _parse(_two_source_spec("inner")),
                  source_frames={"fact": fact, "dim": dim}) \
        .target_frames["Fact"]
    rows = sorted((r["k"], r["v"], r["grp"]) for r in out.collect())
    assert rows == [(1, 10, "a"), (1, 11, "a"), (2, 20, "b")]

    out = run_job(spark, _parse(_two_source_spec("left")),
                  source_frames={"fact": fact, "dim": dim}) \
        .target_frames["Fact"]
    rows = sorted((r["k"], r["v"], r["grp"]) for r in out.collect())
    assert rows == [(1, 10, "a"), (1, 11, "a"), (2, 20, "b"),
                    (3, 30, None)]

    # grouped target over a JOINED column: group by dim.grp, sum fact.v
    out = run_job(spark, _parse(_two_source_spec("inner", group=True)),
                  source_frames={"fact": fact, "dim": dim}) \
        .target_frames["Fact"]
    rows = sorted((r["grp"], r["total_v"]) for r in out.collect())
    assert rows == [("a", 21), ("b", 20)]


def test_stream_static_join_matches_batch(spark):
    """A row target joining the clip stream to an inline codec
    dimension (stream-static join) commits exactly what the batch
    engine produces for the same spec over the same input."""
    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.streaming.spec_stream import (
        SpecStreamJob,
        event_time_ordinal,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        clips_spark_schema,
        make_clips_pdf,
    )

    spec_dict = {
        "sources": [
            {"type": "bigquery", "name": "clips", "query": "SELECT 1"},
            {"type": "text", "name": "codecs",
             "ordered_field_names": "codec,vendor",
             "data": [["pcm_s16le", "acme"], ["pcm_f32le", "acme"],
                      ["ulaw", "bell"]]},
        ],
        "targets": [{
            "name": "Clip", "type": "node", "source": "clips",
            "mode": "merge",
            "transform": {"join": {"with": "codecs", "on": ["codec"],
                                   "how": "left", "broadcast": True}},
            "mappings": [
                {"constant": "Clip", "role": "label"},
                {"field": "clip_id", "name": "clip_id", "role": "key",
                 "type": "String"},
                {"field": "codec", "name": "codec", "role": "property",
                 "type": "String"},
                {"field": "vendor", "name": "vendor", "role": "property",
                 "type": "String"},
                {"field": "dur_ms", "name": "dur_ms", "role": "property",
                 "type": "Long"},
            ]}],
    }

    root = tempfile.mkdtemp(prefix="join_stream_")
    try:
        inp = os.path.join(root, "input")
        pdf = make_clips_pdf(120, seed=13, dup_rate=0.05, late_rate=0.0,
                             max_dur_ms=300)
        chunk = len(pdf) // 4 + 1
        for i in range(0, len(pdf), chunk):
            spark.createDataFrame(pdf.iloc[i:i + chunk],
                                  schema=clips_spark_schema()) \
                .coalesce(1).write.mode("append").parquet(inp)

        job = SpecStreamJob(
            _parse(spec_dict), input_dir=inp,
            input_schema=clips_spark_schema(),
            output_dir=os.path.join(root, "out"),
            checkpoint_dir=os.path.join(root, "ckpt"),
            watermark="60 seconds", max_files_per_trigger=2)
        job.run_to_completion(spark, timeout_s=600)
        got = sorted(
            (r["clip_id"], r["codec"], r["vendor"], r["dur_ms"])
            for r in job.read_merged(spark, "Clip").collect())

        raw = spark.read.schema(clips_spark_schema()).parquet(inp)
        res = run_job(spark, _parse(spec_dict), source_frames={
            "clips": event_time_ordinal(raw, "event_time")})
        want = sorted(
            (r["clip_id"], r["codec"], r["vendor"], r["dur_ms"])
            for r in res.target_frames["Clip"].collect())
        assert got == want and len(got) > 0
        assert {v for _, _, v, _ in got} == {"acme", "bell"}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_union_transform_batch_and_validation(spark):
    """Union transform: shards re-assemble before the transform;
    missing columns null-fill; validator rejects unknown/self names;
    SpecStreamJob rejects union outright (batch-only semantics)."""
    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.validator import (
        SpecValidationError,
        validate_job_spec,
    )

    def spec_d(union):
        return {
            "sources": [
                {"type": "bigquery", "name": "a", "query": "SELECT 1"},
                {"type": "bigquery", "name": "b", "query": "SELECT 1"},
            ],
            "targets": [{"name": "T", "type": "node", "source": "a",
                         "mode": "append",
                         "transform": {"union": union},
                         "mappings": [
                             {"constant": "T", "role": "label"},
                             {"field": "k", "name": "k", "role": "key",
                              "type": "Long"},
                             {"field": "v", "name": "v",
                              "role": "property", "type": "Long"},
                         ]}],
        }

    fa = spark.createDataFrame([(1, 10)], "k long, v long")
    fb = spark.createDataFrame([(2,)], "k long")  # missing v → null
    out = run_job(spark, _parse(spec_d(["b"])),
                  source_frames={"a": fa, "b": fb}).target_frames["T"]
    assert sorted((r["k"], r["v"]) for r in out.collect()) == \
        [(1, 10), (2, None)]

    for union, msg in [(["nope"], "unknown source"),
                       (["a"], "different source")]:
        with pytest.raises(SpecValidationError, match=msg):
            validate_job_spec(_parse(spec_d(union)))

    from dataflow_flex_templates_spark.streaming.spec_stream import (
        SpecStreamJob,
    )

    with pytest.raises(ValueError, match="batch-only"):
        SpecStreamJob(_parse(spec_d(["b"])), input_dir="/tmp/x",
                      input_schema="k long, v long",
                      output_dir="/tmp/y", checkpoint_dir="/tmp/z")


def test_windowed_target_with_join(spark):
    """A WINDOWED grouped target whose group key comes from a joined
    static dimension (stream-static join ahead of the stateful
    windowed aggregate) matches the batch GROUP BY over the joined
    input."""
    import duckdb

    from dataflow_flex_templates_spark.streaming.spec_stream import (
        SpecStreamJob,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        clips_spark_schema,
        make_clips_pdf,
    )

    spec_dict = {
        "sources": [
            {"type": "bigquery", "name": "clips", "query": "SELECT 1"},
            {"type": "text", "name": "codecs",
             "ordered_field_names": "codec,vendor",
             "data": [["pcm_s16le", "acme"], ["pcm_f32le", "acme"],
                      ["ulaw", "bell"]]},
        ],
        "targets": [{
            "name": "VendorWindow", "type": "node", "source": "clips",
            "mode": "merge",
            "transform": {
                "join": {"with": "codecs", "on": ["codec"],
                         "how": "inner", "broadcast": True},
                "group": True,
                "window": {"type": "tumbling", "duration": "10 seconds"},
                "aggregations": [
                    {"expr": "count(*)", "field": "n_clips"},
                    {"expr": "sum(dur_ms)", "field": "total_ms"},
                ],
            },
            "mappings": [
                {"constant": "VendorWindow", "role": "label"},
                {"field": "vendor", "name": "vendor", "role": "key",
                 "type": "String"},
                {"field": "n_clips", "name": "n_clips",
                 "role": "property", "type": "Long"},
                {"field": "total_ms", "name": "total_ms",
                 "role": "property", "type": "Long"},
            ],
        }],
    }

    root = tempfile.mkdtemp(prefix="join_win_")
    try:
        inp = os.path.join(root, "input")
        pdf = make_clips_pdf(150, seed=17, dup_rate=0.0, late_rate=0.0,
                             max_dur_ms=300)
        chunk = len(pdf) // 4 + 1
        for i in range(0, len(pdf), chunk):
            spark.createDataFrame(pdf.iloc[i:i + chunk],
                                  schema=clips_spark_schema()) \
                .coalesce(1).write.mode("append").parquet(inp)

        job = SpecStreamJob(
            _parse(spec_dict), input_dir=inp,
            input_schema=clips_spark_schema(),
            output_dir=os.path.join(root, "out"),
            checkpoint_dir=os.path.join(root, "ckpt"),
            watermark="60 seconds", max_files_per_trigger=2)
        job.run_to_completion(spark, timeout_s=600)
        got = job.read_merged(spark, "VendorWindow").toPandas()
        if got["window_start"].dt.tz is None:
            got["window_start"] = \
                got["window_start"].dt.tz_localize("UTC")

        vendor = {"pcm_s16le": "acme", "pcm_f32le": "acme",
                  "ulaw": "bell"}
        pdf2 = pdf.assign(vendor=pdf["codec"].map(vendor))
        oracle = duckdb.sql(
            "SELECT time_bucket(INTERVAL 10 SECONDS, event_time) ws, "
            "vendor, count(*) n, sum(dur_ms) tot FROM pdf2 "
            "GROUP BY 1, 2").df()
        om = {(r["ws"], r["vendor"]): (r["n"], r["tot"])
              for _, r in oracle.iterrows()}
        assert len(got) == len(om) > 0
        for _, r in got.iterrows():
            assert (r["n_clips"], r["total_ms"]) == \
                om[(r["window_start"], r["vendor"])]
    finally:
        shutil.rmtree(root, ignore_errors=True)
