"""W7 audit-format parity: the pure-Python Avro container writer/reader
(streaming/avro_io.py) and the avro_type=avro audit tee
(GcsLogTransform.java:38-67, Config.java:15)."""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from datetime import datetime, timezone

import pytest


def test_avro_roundtrip_types(spark):
    """Every supported column type survives a distributed write →
    driver read round trip, including nulls."""
    from dataflow_flex_templates_spark.streaming.avro_io import (
        read_avro_dir,
        write_avro_dir,
    )

    rows = [
        ("a", 1, 1.5, float(2.25), True, b"\x00\x01",
         datetime(2025, 1, 1, 12, 0, 0, 123456, tzinfo=timezone.utc)),
        (None, None, None, None, None, None, None),
        ("unicode ✓", -(2**40), -0.125, float(-1.0), False, b"",
         datetime(2024, 6, 30, tzinfo=timezone.utc)),
    ]
    schema = ("s string, l long, d double, f float, b boolean, "
              "raw binary, ts timestamp")
    df = spark.createDataFrame(rows, schema).repartition(3)
    root = tempfile.mkdtemp(prefix="avro_rt_")
    try:
        n = write_avro_dir(df, root)
        assert n == 3
        files = [f for f in os.listdir(root) if f.endswith(".avro")]
        assert files  # one file per non-empty partition
        back = read_avro_dir(spark, root)
        got = sorted(back.toPandas().fillna("∅").astype(str)
                     .itertuples(index=False))
        want = sorted(df.toPandas().fillna("∅").astype(str)
                      .itertuples(index=False))
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_avro_header_is_spec_compliant():
    """Container layout per the public Avro spec: magic, metadata map
    with schema+codec, sync marker repeated after each block."""
    import pandas as pd

    from dataflow_flex_templates_spark.streaming.avro_io import (
        read_avro_file,
        write_avro_file,
    )

    schema = {"type": "record", "name": "audit",
              "fields": [{"name": "k", "type": ["null", "string"]},
                         {"name": "v", "type": ["null", "long"]}]}
    pdf = pd.DataFrame({"k": ["x", "y", None], "v": [1, None, 3]})
    fn = tempfile.mktemp(suffix=".avro")
    try:
        assert write_avro_file(fn, pdf, schema) == 3
        raw = open(fn, "rb").read()
        assert raw[:4] == b"Obj\x01"
        assert b"avro.schema" in raw and b"avro.codec" in raw
        back = read_avro_file(fn)
        assert list(back["k"]) == ["x", "y", None]
        assert [-1 if pd.isna(x) else int(x)
                for x in back["v"]] == [1, -1, 3]
    finally:
        if os.path.exists(fn):
            os.remove(fn)


def test_avro_dir_write_is_idempotent(spark):
    """Task-retry safety: re-running the distributed write into the
    same directory REPLACES each partition's file (deterministic name
    + atomic rename) instead of appending uuid-named duplicates."""
    from dataflow_flex_templates_spark.streaming.avro_io import (
        read_avro_dir,
        write_avro_dir,
    )

    df = spark.createDataFrame(
        [(str(i), i) for i in range(20)], "k string, v long").repartition(4)
    root = tempfile.mkdtemp(prefix="avro_idem_")
    try:
        write_avro_dir(df, root)
        files1 = sorted(f for f in os.listdir(root) if f.endswith(".avro"))
        write_avro_dir(df, root)  # simulated retry of every task
        files2 = sorted(f for f in os.listdir(root) if f.endswith(".avro"))
        assert files1 == files2
        back = read_avro_dir(spark, root)
        assert back.count() == 20
        assert back.select("k").distinct().count() == 20
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_avro_reads_negative_metadata_block_count():
    """Per the Avro spec a NEGATIVE map block count is followed by the
    block's byte size before the entries (a fast-skip aid other
    writers emit). Our writer always emits positive counts, but the
    reader must accept spec-compliant files from other tools."""
    import io

    import pandas as pd

    from dataflow_flex_templates_spark.streaming.avro_io import (
        _write_bytes,
        _write_long,
        read_avro_file,
        write_avro_file,
    )

    schema = {"type": "record", "name": "audit",
              "fields": [{"name": "k", "type": ["null", "string"]},
                         {"name": "v", "type": ["null", "long"]}]}
    pdf = pd.DataFrame({"k": ["x", "y"], "v": [1, 2]})
    fn = tempfile.mktemp(suffix=".avro")
    try:
        write_avro_file(fn, pdf, schema)
        raw = open(fn, "rb").read()
        # rewrite the header with a negative-count metadata block
        entries = io.BytesIO()
        _write_bytes(entries, b"avro.schema")
        _write_bytes(entries, json.dumps(schema).encode())
        _write_bytes(entries, b"avro.codec")
        _write_bytes(entries, b"null")
        hdr = io.BytesIO()
        hdr.write(b"Obj\x01")
        _write_long(hdr, -2)                    # negative entry count
        _write_long(hdr, len(entries.getvalue()))  # block byte size
        hdr.write(entries.getvalue())
        _write_long(hdr, 0)                     # end of map
        # splice: locate original header end (map terminator 0x00
        # before the 16-byte sync) by re-deriving the writer's layout
        orig = io.BytesIO()
        orig.write(b"Obj\x01")
        _write_long(orig, 2)
        orig.write(entries.getvalue())
        _write_long(orig, 0)
        assert raw.startswith(orig.getvalue())
        rewritten = hdr.getvalue() + raw[len(orig.getvalue()):]
        open(fn, "wb").write(rewritten)
        back = read_avro_file(fn)
        assert list(back["k"]) == ["x", "y"]
        assert back["v"].astype(int).tolist() == [1, 2]
    finally:
        if os.path.exists(fn):
            os.remove(fn)


def test_avro_rejects_nested_types(spark):
    from dataflow_flex_templates_spark.streaming.avro_io import (
        avro_schema_for,
    )

    df = spark.createDataFrame([([1, 2],)], "arr array<int>")
    with pytest.raises(ValueError, match="unsupported column type"):
        avro_schema_for(df.schema)


def test_spec_stream_audit_avro(spark):
    """avro_type=avro in the spec config routes the audit tee through
    the Avro writer; the audit rows read back equal the input row
    count, matching the parquet tee's contract."""
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec
    from dataflow_flex_templates_spark.streaming.avro_io import read_avro_dir
    from dataflow_flex_templates_spark.streaming.spec_stream import (
        SpecStreamJob,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        clips_spark_schema,
        make_clips_df,
    )

    spec = parse_job_spec(json.dumps({
        "config": {"avro_type": "avro"},
        "sources": [{"type": "bigquery", "name": "clips",
                     "query": "SELECT 1"}],
        "targets": [{
            "name": "Clip", "type": "node", "source": "clips",
            "mode": "merge",
            "mappings": [
                {"constant": "Clip", "role": "label"},
                {"field": "clip_id", "name": "clip_id", "role": "key",
                 "type": "String"},
                {"field": "codec", "name": "codec", "role": "property",
                 "type": "String"},
            ],
        }],
    }))
    assert spec.config.audit_format == "avro"

    root = tempfile.mkdtemp(prefix="avro_audit_")
    try:
        clips = make_clips_df(spark, 60, seed=7, dup_rate=0.0,
                              late_rate=0.0, max_dur_ms=300)
        n_in = clips.count()
        clips.repartition(2).write.mode("overwrite").parquet(f"{root}/in")
        job = SpecStreamJob(
            spec, input_dir=f"{root}/in",
            input_schema=clips_spark_schema(),
            output_dir=f"{root}/out", checkpoint_dir=f"{root}/ckpt",
            max_files_per_trigger=1,
            prepare_fn=lambda df: df.drop("bytes"),
            audit_dir=f"{root}/audit")
        job.run_to_completion(spark)
        batches = [d for d in os.listdir(f"{root}/audit")
                   if d.startswith("batch=")]
        assert batches
        total = 0
        for b in batches:
            back = read_avro_dir(spark, os.path.join(root, "audit", b))
            total += back.count()
            assert "clip_id" in back.columns
        assert total == n_in
    finally:
        shutil.rmtree(root, ignore_errors=True)
