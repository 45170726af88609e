#!/usr/bin/env python
"""spark-submit entry point for the continuous clip→graph pipeline.

Cluster usage (north_rule: "run via spark-submit --py-files on
multi-executor clusters at N and 4N executors"):

    # package the engine once
    scripts/make_pyfiles_zip.sh                 # -> dist/engine.zip

    spark-submit \
      --master yarn --deploy-mode cluster \
      --num-executors 16 --executor-cores 8 --executor-memory 16g \
      --py-files dist/engine.zip \
      scripts/submit_clip_graph.py \
      --input  s3://bucket/clips/          \
      --output s3://bucket/graph/          \
      --checkpoint s3://bucket/ckpt/clip_graph \
      --spec   jobspec.json                \
      --watermark "60 seconds" --continuous

Run the SAME command with --num-executors N and 4N on identical input
to evidence the throughput-scaling criterion; in the sandbox,
``python bench.py`` does the equivalent at local[2] vs local[8].

With --spec, the JSON job spec drives the pipeline (SpecStreamJob —
the reference's job-spec language, streaming); without it, the
hardwired ClipGraphJob flagship runs.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="clip table path/dir")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--spec", help="job-spec JSON path (SpecStreamJob)")
    ap.add_argument("--watermark", default="60 seconds")
    ap.add_argument("--max-files-per-trigger", type=int, default=32)
    ap.add_argument("--audit-dir", default=None)
    ap.add_argument("--state-dedup-key", default=None)
    ap.add_argument("--ignore-corrupt-files", action="store_true",
                    help="skip unreadable input files instead of "
                         "failing the micro-batch")
    ap.add_argument("--compact-every", type=int, default=0,
                    help="fold row-table micro-batch files into the "
                         "base every N batches (0 = never)")
    ap.add_argument("--continuous", action="store_true",
                    help="run until killed (default: availableNow drain)")
    ap.add_argument("--timeout-s", type=int, default=24 * 3600)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    # Under spark-submit the session/master comes from the launcher;
    # getOrCreate() attaches to it (local runs fall back to defaults).
    spark = SparkSession.builder.appName("clip-graph").getOrCreate()

    from dataflow_flex_templates_spark.streaming.metrics import (
        ProgressRecorder,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        clips_spark_schema,
    )

    rec = ProgressRecorder()
    spark.streams.addListener(rec)

    if args.spec:
        from pyspark.sql import functions as F

        from dataflow_flex_templates_spark.functions.audio import (
            normalize_transcript,
            with_audio_features,
        )
        from dataflow_flex_templates_spark.spec.parser import parse_job_spec
        from dataflow_flex_templates_spark.streaming.spec_stream import (
            SpecStreamJob,
        )

        with open(args.spec) as f:
            spec = parse_job_spec(f.read())

        def prepare(df):
            return (with_audio_features(df)
                    .withColumn("transcript_norm",
                                normalize_transcript(F.col("transcript")))
                    .drop("bytes"))

        job = SpecStreamJob(
            spec,
            input_dir=args.input,
            input_schema=clips_spark_schema(),
            output_dir=args.output,
            checkpoint_dir=args.checkpoint,
            watermark=args.watermark,
            max_files_per_trigger=args.max_files_per_trigger,
            prepare_fn=prepare,
            prepare_preserves="*",
            audit_dir=args.audit_dir,
            state_dedup_key=args.state_dedup_key,
            compact_every=args.compact_every,
            ignore_corrupt_files=args.ignore_corrupt_files,
        )
        q = job.start(spark, available_now=not args.continuous)
    else:
        from dataflow_flex_templates_spark.streaming.job import ClipGraphJob

        job = ClipGraphJob(
            input_dir=args.input,
            output_dir=args.output,
            checkpoint_dir=args.checkpoint,
            watermark=args.watermark,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        q = job.start(spark, available_now=not args.continuous)

    q.awaitTermination(args.timeout_s)
    if q.isActive:
        q.stop()
    import json

    # Listener events are dispatched asynchronously; fold in each
    # query's recentProgress so a fast availableNow drain still reports.
    queries = getattr(q, "queries", [q])
    seen = {(p.get("runId"), p.get("batchId")) for p in rec.progress}
    for sq in queries:
        for p in sq.recentProgress:
            try:
                d = json.loads(getattr(p, "json", None) or p)
            except Exception:
                continue
            if (d.get("runId"), d.get("batchId")) not in seen:
                rec.progress.append(d)
    print(json.dumps(rec.summary()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
