"""Source → DataFrame readers.

Covers the reference's source operators (SURVEY.md §2.1):
  S1 SQL scan            providers/bigquery/BqQueryToRow.java:33-53
  S2 schema probe        providers/bigquery/BigQueryImpl.java:77-92
  S3 text/CSV scan       providers/text/TextSourceFileToRow.java:32-52
  S4 inline data scan    providers/text/ListOfStringToRowFn.java:26-35
  S5 metadata-only scan  providers/text/TextSourceFileMetadataToRow.java:27-31
  S6 CSV dialects        model/helpers/SourceMapper.java:28-52

All readers attach a hidden arrival-order ordinal column (ORDINAL_COL)
used for MERGE last-writer-wins tie-breaks; Spark's
monotonically_increasing_id is partition-monotonic, which matches the
reference's per-bundle arrival-order semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataflow_flex_templates_spark.plans.compiler import ORDINAL_COL
from dataflow_flex_templates_spark.spec.parser import CSV_DIALECTS
from dataflow_flex_templates_spark.spec.model import Source, SourceType


def all_string_schema(field_names: list[str]) -> T.StructType:
    """Text sources arrive all-string (utils/BeamUtils.java:125-135);
    typing happens per-target via the mapping casts."""
    return T.StructType([T.StructField(f, T.StringType(), True) for f in field_names])


def _with_ordinal(df: DataFrame) -> DataFrame:
    if ORDINAL_COL in df.columns:
        return df
    return df.withColumn(ORDINAL_COL, F.monotonically_increasing_id())


def read_source(spark: SparkSession, source: Source, ordinal: bool = True) -> DataFrame:
    """Materialize one spec source as a DataFrame (lazy scan)."""
    st = source.source_type
    if st == SourceType.text:
        dialect = CSV_DIALECTS.get(source.csv_format, CSV_DIALECTS["DEFAULT"])
        opts = dict(dialect)
        if source.delimiter:
            opts["sep"] = source.delimiter
        df = spark.read.options(**{k: v for k, v in opts.items() if v}).csv(
            source.uri, schema=all_string_schema(source.field_names)
        )
    elif st == SourceType.inline:
        rows = [[None if c is None else str(c) for c in r] for r in source.inline]
        df = spark.createDataFrame(rows, schema=all_string_schema(source.field_names))
    elif st == SourceType.bigquery:
        # SQL-text sources run as Spark SQL over the session catalog —
        # the pushdown-capable analogue of BqQueryToRow (S1).
        df = spark.sql(source.query)
    elif st in (SourceType.parquet, SourceType.iceberg):
        df = (spark.read.parquet(source.table or source.uri)
              if st == SourceType.parquet or (source.table or source.uri).endswith(".parquet")
              else spark.read.table(source.table))
        if source.query:
            df.createOrReplaceTempView(f"src_{abs(hash(source.name)) & 0xFFFF:x}")
            df = spark.sql(source.query)
    else:
        raise ValueError(f"unsupported source type: {st}")
    return _with_ordinal(df) if ordinal else df


def probe_schema(spark: SparkSession, source: Source) -> T.StructType:
    """Zero-cost schema probe (S2). The reference runs
    ``SELECT * FROM (q) LIMIT 0`` inside BigQuery
    (BigQueryImpl.java:84); in Spark, analysis alone yields the schema
    — no job runs."""
    return read_source(spark, source, ordinal=False).schema


def metadata_only(spark: SparkSession, source: Source) -> DataFrame:
    """Empty DataFrame carrying only the declared schema (S5)."""
    return spark.createDataFrame([], probe_schema(spark, source))
