"""Transcript ingestion (sources/ingest.py).

Laws:
- parquet / jsonl / csv round-trip to ONE canonical schema (json's
  long/string drift and csv's all-string columns both coerce);
- required keys enforced; optional columns materialize as typed
  nulls; extra columns drop unless kept;
- the bucketed writer is stable (same conv -> same bucket across
  writes and engines — hashlib replica) and partition-prunes;
- an ingested corpus builds and searches (end-to-end splice).
"""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from fdblucene_spark.sources.ingest import (
    TRANSCRIPT_SCHEMA,
    read_transcripts,
    validate_transcripts,
    write_transcripts_bucketed,
)

ROWS = [
    ("c0", 0, "user", "alpha beta", None, "2026-01-01T00:00:01"),
    ("c0", 1, "assistant", "gamma delta", "search", "2026-01-01T00:00:02"),
    ("c1", 0, "user", "alpha gamma", None, "2026-01-01T00:01:00"),
]


def _canon_types(df):
    return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ingest"))
    pdf = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx long, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    pdf.write.parquet(os.path.join(base, "pq"))
    pdf.write.json(os.path.join(base, "jl"))
    pdf.selectExpr("conv_id", "turn_idx", "role", "text", "tool", "CAST(ts AS STRING) AS ts") \
        .write.option("header", "true").csv(os.path.join(base, "cs"))
    return base


def test_three_formats_one_schema(spark, staged):
    outs = {}
    for fmt, sub in (("parquet", "pq"), ("jsonl", "jl"), ("csv", "cs")):
        df = read_transcripts(spark, os.path.join(staged, sub), fmt=fmt)
        assert _canon_types(df) == [
            (f.name, f.dataType.simpleString()) for f in TRANSCRIPT_SCHEMA.fields
        ], fmt
        outs[fmt] = sorted(
            (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"])
            for r in df.collect()
        )
    assert outs["parquet"] == outs["jsonl"] == outs["csv"]
    assert len(outs["parquet"]) == 3


def test_validate_laws(spark):
    with pytest.raises(ValueError, match="required"):
        validate_transcripts(spark.createDataFrame([(1,)], "x int"))
    # missing optionals -> typed nulls; extras drop unless kept
    df = spark.createDataFrame([("c", "7", "extra")], "conv_id string, turn_idx string, junk string")
    out = validate_transcripts(df)
    r = out.collect()[0]
    assert r["turn_idx"] == 7 and r["text"] is None and "junk" not in out.columns
    kept = validate_transcripts(df, keep_extra=True)
    assert kept.columns[-1] == "junk"
    with pytest.raises(ValueError, match="unknown transcript format"):
        read_transcripts(spark, "/nope", fmt="xml")


def test_bucketed_writer_stable_and_pruned(spark, staged, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("buck") / "tx")
    df = read_transcripts(spark, os.path.join(staged, "pq"))
    write_transcripts_bucketed(df, out, n_buckets=16)
    write_transcripts_bucketed(df.filter("conv_id = 'c0'"), out, n_buckets=16)
    back = spark.read.parquet(out)
    got = {r["conv_id"]: r["bucket"] for r in back.select("conv_id", "bucket").distinct().collect()}
    for conv, b in got.items():
        exp = int(hashlib.md5(conv.encode()).hexdigest()[:8], 16) % 16
        assert b == exp, conv
    # appended c0 rows landed in the SAME bucket dir (stability)
    assert back.filter("conv_id = 'c0'").count() == 4
    plan = back.filter(F.col("bucket") == got["c0"])._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    with pytest.raises(ValueError, match="n_buckets"):
        write_transcripts_bucketed(df, out, n_buckets=0)


def test_ingested_corpus_builds_and_searches(spark, staged, tmp_path_factory):
    from fdblucene_spark.operators.build import build_index
    from fdblucene_spark.operators.query import Searcher

    df = read_transcripts(spark, os.path.join(staged, "jl"), fmt="jsonl")
    root = str(tmp_path_factory.mktemp("ing") / "idx")
    build_index(spark, df, root, key_cols=["conv_id", "turn_idx"], n_shards=2)
    hits = Searcher(spark, root).search(["alpha"], k=10).collect()
    assert len(hits) == 2
