"""Transcript-corpus ingestion: schema-validated readers for the
canonical input shape and a bucketed writer for staging.

BASELINE.json input_hint pins the corpus shape the engine indexes:

    (conv_id: string, turn_idx: int32, role: string,
     text: string, tool: string, ts: timestamp)

The reference consumes Lucene Documents; a Spark-first engine
consumes TABLES, and in practice transcript corpora arrive as
Parquet exports, JSONL event dumps, or CSV extracts. ``read_transcripts``
reads any of the three, validates/coerces to the canonical schema
(missing optional columns materialize as typed nulls; extra columns
are dropped or kept by flag; wrong types are CAST, not trusted), so
everything downstream — build_index, the curation passes, the
streaming sink — sees one shape.

``write_transcripts_bucketed`` stages a corpus partitioned by a
stable conv_id hash bucket: appends land in bounded directories, a
bucket is the natural unit for incremental (re)indexing, and the
bucket count is chosen once like n_shards. Plain columnar Parquet —
at 100 TB this is the lake-table layout an Iceberg/Delta catalog
would manage; the manifest-level seam is documented in README.

JSONL note: Spark's json reader infers ``turn_idx`` as long and
``ts`` as string — exactly the drift validate_transcripts exists to
normalize, so round-trips are schema-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

_REQUIRED = ("conv_id", "turn_idx")


def validate_transcripts(df: DataFrame, keep_extra: bool = False) -> DataFrame:
    """Coerce an arbitrary transcript-shaped frame to the canonical
    schema: required key columns must exist (raise otherwise), every
    canonical column is CAST to its pinned type (ints arriving as
    long/string, timestamps arriving as ISO strings), missing
    optional columns materialize as typed nulls, and extra columns
    drop unless keep_extra (they then trail the canonical six)."""
    missing = [c for c in _REQUIRED if c not in df.columns]
    if missing:
        raise ValueError(f"transcript corpus missing required columns {missing}")
    cols = []
    for f in TRANSCRIPT_SCHEMA.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    if keep_extra:
        canon = {f.name for f in TRANSCRIPT_SCHEMA.fields}
        cols += [F.col(c) for c in df.columns if c not in canon]
    return df.select(*cols)


def read_transcripts(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    keep_extra: bool = False,
    **options,
) -> DataFrame:
    """Read a transcript corpus from parquet / jsonl / csv and
    validate to the canonical schema. csv defaults to header=true;
    jsonl is standard line-delimited JSON (Spark's json source)."""
    fmt = fmt.lower()
    if fmt == "parquet":
        raw = spark.read.options(**options).parquet(path)
    elif fmt in ("jsonl", "json"):
        raw = spark.read.options(**options).json(path)
    elif fmt == "csv":
        opts = {"header": "true", **options}
        raw = spark.read.options(**opts).csv(path)
    else:
        raise ValueError(f"unknown transcript format {fmt!r} (parquet|jsonl|csv)")
    return validate_transcripts(raw, keep_extra=keep_extra)


def write_transcripts_bucketed(
    df: DataFrame, path: str, n_buckets: int = 64, mode: str = "append"
) -> None:
    """Stage a validated corpus partitioned by a STABLE conv_id hash
    bucket (first 8 md5 hex digits mod n_buckets — the module's
    deterministic hash, so the bucket of a conversation never changes
    across runs/engines): appends land in bounded directories and a
    bucket is the natural incremental-indexing unit. Partition
    pruning on `bucket` then serves per-bucket reindex jobs."""
    if int(n_buckets) < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    bucket = (
        F.conv(F.substring(F.md5(F.to_binary(F.col("conv_id"), F.lit("utf-8"))), 1, 8), 16, 10)
        .cast("long") % int(n_buckets)
    ).cast("int")
    (
        df.withColumn("bucket", bucket)
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )
