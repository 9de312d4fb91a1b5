"""Streaming operators: watermarked dedup, windowed term counts, and
the applyInPandasWithState conversation tracker (cross-batch state)."""

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fdblucene_spark.functions.analysis import tokenize_text
from fdblucene_spark.streaming import ops

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

ROWS_A = [
    ("c0", 0, "alpha beta", "2026-01-01 00:00:01"),
    ("c0", 1, "alpha gamma", "2026-01-01 00:00:02"),
    ("c1", 0, "beta beta", "2026-01-01 00:00:03"),
    ("c1", 1, "ALPHA  beta", "2026-01-01 00:01:30"),  # dup of c0/0 after analysis
]
ROWS_B = [
    ("c0", 2, "delta", "2026-01-01 00:02:10"),
    ("c2", 0, "alpha beta", "2026-01-01 00:02:20"),  # dup fingerprint again
    ("c1", 2, "beta gamma delta", "2026-01-01 00:02:40"),
]


def _mk_stream_dir(spark, tmp, name):
    src = os.path.join(str(tmp), name)
    os.makedirs(src)
    for i, rows in enumerate([ROWS_A, ROWS_B]):
        pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text", "ts"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        df = spark.createDataFrame(pdf, schema=SCHEMA)
        df.coalesce(1).write.parquet(os.path.join(src, f"batch{i}"))
        time.sleep(1.1)  # distinct mtimes -> stable per-file batching
    return src


def _run(spark, stream_df, mode, name, timeout=120):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def _read_stream(spark, src):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )


def test_streaming_exact_dedup(spark, tmp_path_factory):
    src = _mk_stream_dir(spark, tmp_path_factory.mktemp("sdedup"), "in")
    out = _run(
        spark,
        ops.streaming_exact_dedup(_read_stream(spark, src), "text", "ts"),
        "append",
        "dedup_sink",
    )
    # 7 rows, but 'alpha beta' appears 3x (case/space variants) -> 5 distinct
    assert len(out) == 5
    fps = set()
    for t in out["text"]:
        fps.add(tuple(tokenize_text(t)))
    assert tuple(["alpha", "beta"]) in fps
    assert len(fps) == 5


def test_streaming_windowed_term_counts(spark, tmp_path_factory):
    src = _mk_stream_dir(spark, tmp_path_factory.mktemp("swin"), "in")
    out = _run(
        spark,
        ops.streaming_windowed_term_counts(_read_stream(spark, src), "text", "ts"),
        "complete",
        "win_sink",
    )
    # batch equivalence: same counts as a static windowed groupBy
    all_rows = pd.DataFrame(ROWS_A + ROWS_B, columns=["conv_id", "turn_idx", "text", "ts"])
    exp: dict = {}
    for _, r in all_rows.iterrows():
        minute = pd.to_datetime(r["ts"]).floor("min")
        for t in tokenize_text(r["text"]):
            exp[(minute, t)] = exp.get((minute, t), 0) + 1
    got = {
        (pd.to_datetime(r["window"]["start"]), r["term"]): int(r["n"])
        for _, r in out.iterrows()
    }
    assert got == exp


def test_conversation_tracker_state_across_batches(spark, tmp_path_factory):
    src = _mk_stream_dir(spark, tmp_path_factory.mktemp("sstate"), "in")
    stream = ops.with_token_counts(_read_stream(spark, src), "text").select(
        "conv_id", "turn_idx", "n_tokens"
    )
    out = _run(spark, ops.conversation_stats_tracker(stream), "update", "state_sink")
    # rows accumulate per micro-batch; the max turns_seen row per conv
    # is the final running total
    final = out.sort_values("turns_seen").groupby("conv_id").last()
    all_rows = pd.DataFrame(ROWS_A + ROWS_B, columns=["conv_id", "turn_idx", "text", "ts"])
    for conv, sub in all_rows.groupby("conv_id"):
        assert final.loc[conv, "turns_seen"] == len(sub)
        assert final.loc[conv, "tokens_seen"] == sum(len(tokenize_text(t)) for t in sub["text"])
        assert final.loc[conv, "last_turn_idx"] == sub["turn_idx"].max()
    # cross-batch accumulation actually happened: c0 spans both files,
    # so it must have emitted more than one running-total row
    assert (out["conv_id"] == "c0").sum() >= 2


def test_streaming_session_stats(spark, tmp_path_factory):
    """Session windows close after `gap` of silence per conversation;
    batch equivalence against a hand-segmented oracle."""
    src = _mk_stream_dir(spark, tmp_path_factory.mktemp("ssess"), "in")
    out = _run(
        spark,
        ops.streaming_session_stats(
            _read_stream(spark, src), "conv_id", "ts", "text", gap="30 seconds"
        ),
        "complete",
        "sess_sink",
    )
    # hand segmentation at a 30 s gap:
    # c0: 00:00:01, 00:00:02 | 00:02:10            -> 2 sessions (2 turns, 1 turn)
    # c1: 00:00:03 | 00:01:30 | 00:02:40           -> 3 sessions
    # c2: 00:02:20                                  -> 1 session
    all_rows = pd.DataFrame(ROWS_A + ROWS_B, columns=["conv_id", "turn_idx", "text", "ts"])
    all_rows["ts"] = pd.to_datetime(all_rows["ts"])
    exp = {}
    for conv, g in all_rows.sort_values("ts").groupby("conv_id"):
        start = None
        cur = []
        sessions = []
        for _, r in g.iterrows():
            if cur and (r["ts"] - cur[-1]["ts"]).total_seconds() >= 30:
                sessions.append(cur)
                cur = []
            cur.append(r)
        sessions.append(cur)
        for sess in sessions:
            n_toks = sum(len(tokenize_text(r["text"])) for r in sess)
            exp[(conv, sess[0]["ts"])] = (len(sess), n_toks)
    got = {
        (r["conv_id"], pd.to_datetime(r["session_start"])): (int(r["n_turns"]), int(r["n_tokens"]))
        for _, r in out.iterrows()
    }
    assert got == exp
    assert len(got) == 6


def test_streaming_denoise_transforms_batch_equivalence(spark, tmp_path_factory):
    """The denoising-objective transforms (FIM / span corruption /
    MLM / UL2 routing) are stateless map-only passes, so they apply
    unchanged to a stream: running them inside readStream ->
    writeStream yields BYTE-IDENTICAL rows to the batch path over the
    same input — the md5 draws are pure functions of (salt, id), so
    micro-batch boundaries cannot change any output."""
    from fdblucene_spark.operators import curation

    src = _mk_stream_dir(spark, tmp_path_factory.mktemp("sdenoise"), "in")
    static = spark.read.schema(SCHEMA).parquet(os.path.join(src, "*"))
    sid = F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string"))

    def apply(df):
        keyed = df.withColumn("uid", sid)
        return curation.mlm_mask(
            curation.fim_transform(keyed, "uid", "text", rate=0.8)
            .select("uid", F.col("rendered").alias("text")),
            "uid", "text", mask_rate=0.3,
        )

    stream_out = _run(
        spark, apply(_read_stream(spark, src)), "append", "denoise_sink"
    )
    batch_out = apply(static).toPandas()
    key = lambda pdf: sorted(
        (r["uid"], r["input_text"], tuple(r["label_positions"]))
        for _, r in pdf.iterrows()
    )
    assert key(stream_out) == key(batch_out)
    assert len(stream_out) == len(ROWS_A) + len(ROWS_B)
