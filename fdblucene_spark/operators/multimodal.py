"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training pipeline carries images/audio/video as `binary`
columns with a metadata struct alongside. The Spark-side plumbing —
schema, partition sizing, Arrow batch shape, UDF signatures — is real
and tested; the actual media decode is STUBBED (no image/audio libs
in this container): `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic md5-seeded fake decoder
stands in so the downstream feature pipeline is fully exercised.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),        # image|audio|video
        T.StructField("payload", T.BinaryType(), False),     # opaque bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), False),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table from a text corpus: payload =
    utf-8 bytes, kind cycles by id. Gives the pipeline real binary
    columns of realistic skewed sizes without external data."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    payload = F.to_binary(F.col(text_col), F.lit("utf-8"))
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            F.when(kind == "image", F.lit(64)).otherwise(F.lit(None).cast("int")).alias("width"),
            F.when(kind == "image", F.lit(64)).otherwise(F.lit(None).cast("int")).alias("height"),
            F.when(kind != "image", (F.length(payload) * 10).cast("int")).otherwise(F.lit(None).cast("int")).alias("duration_ms"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs an image lib not present here.

    fake=True returns a deterministic 8x8 grayscale 'image' seeded
    from md5(payload) — stable across runs and partitionings.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires an image/audio library not available in this environment; "
            "pass fake=True for the deterministic test decoder"
        )
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8), dtype=np.uint8)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extractor over binary payloads.

    Real plumbing: Arrow-batched binary columns in, fixed-dim float
    feature vectors out; per-batch numpy only. The 'model' is the fake
    decoder + an 8x8 -> FEATURE_DIM pooling, deterministic per payload.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for payload in pdf["payload"]:
                img = decode_image(bytes(payload), fake=fake).astype(np.float32)
                pooled = img.reshape(FEATURE_DIM, -1).mean(axis=1) / 255.0
                feats.append(pooled.astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": pdf["meta"].map(lambda m: int(m["n_bytes"])).astype("int64"),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame_sig", T.StringType(), False),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 100, fake: bool = True) -> DataFrame:
    """Frame sampling over video payloads (mapInPandas) — the
    plumbing a video-bearing pipeline needs: binary in, one row per
    sampled frame out, frame count driven by the duration metadata
    (n_frames = ceil(duration_ms / every_ms)). The DECODE is stubbed
    like decode_image: fake=True stands in a deterministic byte-slice
    "frame" (offset (i*len)//n, length max(1, len//n)) whose md5 is
    the frame signature — stable across runs/partitionings and
    reproducible by the SQL twin (the synthesized payloads are ASCII
    text bytes, so byte offsets == char offsets there); fake=False
    raises, as a real frame grab needs a video lib this container
    lacks. Non-video rows are skipped."""
    if not fake:
        raise NotImplementedError(
            "frame sampling requires a video decode library not available "
            "in this environment; pass fake=True for the deterministic "
            "byte-slice sampler"
        )
    step = int(every_ms)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            if pdf.empty:
                continue
            mids, idxs, tss, sigs = [], [], [], []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                dur = int(r["meta"]["duration_ms"])
                size = len(payload)
                n = max(1, -(-dur // step))
                chunk = max(1, size // n)
                for i in range(n):
                    o = (i * size) // n
                    mids.append(int(r["media_id"]))
                    idxs.append(i)
                    tss.append(i * step)
                    sigs.append(hashlib.md5(payload[o : o + chunk]).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int32"),
                    "frame_sig": sigs,
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def sample_frames_sql(table: str, id_col: str, text_col: str, every_ms: int = 100) -> str:
    """Twin of synthesize_media >> sample_frames(fake=True): payloads
    are the utf-8 text bytes (ASCII in the gate corpora, so substr
    char offsets equal byte offsets), kind 'video' iff id % 3 = 2,
    duration = 10 * n_bytes."""
    return f"""
WITH m AS (
  SELECT {id_col}::BIGINT AS media_id, {text_col} AS t,
         strlen({text_col})::BIGINT AS L,
         (strlen({text_col}) * 10)::BIGINT AS dur
  FROM {table} WHERE {id_col} % 3 = 2
), sized AS (
  SELECT *, greatest(1, (dur + {every_ms} - 1) // {every_ms}) AS n,
         greatest(1, L // greatest(1, (dur + {every_ms} - 1) // {every_ms})) AS chunk
  FROM m
), fr AS (
  SELECT media_id, t, L, n, chunk, unnest(range(0, n)) AS i FROM sized
)
SELECT media_id, i::INT AS frame_idx, (i * {every_ms})::INT AS ts_ms,
       md5(substr(t, ((i * L) // n)::INT + 1, chunk::INT)) AS frame_sig
FROM fr
"""


def resize_image(payload: bytes, width: int, height: int, fake: bool = False) -> np.ndarray:
    """STUB like decode_image: real resize needs an image lib.
    fake=True nearest-neighbor-resamples the deterministic 8x8 fake
    decode to (height, width) — exercises the full decode->transform
    array path with real shapes."""
    img = decode_image(payload, fake=fake)
    ys = (np.arange(height) * img.shape[0]) // height
    xs = (np.arange(width) * img.shape[1]) // width
    return img[np.ix_(ys, xs)]


def resize_images(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """mapInPandas resize pass over image payloads: binary in,
    (media_id, width, height, pixels bytes) out — the batch shape a
    real resize UDF would have; decode/resize stubbed via fake."""
    w, h = int(width), int(height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": np.int32(w),
                    "height": np.int32(h),
                    "pixels": [
                        resize_image(bytes(p), w, h, fake=fake).tobytes()
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(
        run, schema="media_id long, width int, height int, pixels binary"
    )


def byte_histogram_features(media: DataFrame, n_bins: int = FEATURE_DIM) -> DataFrame:
    """Deterministic, ORACLE-CHECKABLE feature extractor: the feature
    vector is the normalized histogram of payload byte values
    (bin = byte >> 4, 16 bins) — the same mapInPandas Arrow plumbing
    as extract_features (binary in, fixed-dim float32 out, per-batch
    numpy bincount) but SQL-expressible, so the gate can hash-match it
    against a DuckDB twin. The media DECODE stub boundary is
    unchanged: decode_image still raises without fake=True."""
    shift = 8 - int(n_bins).bit_length() + 1  # 16 bins -> >> 4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for payload in pdf["payload"]:
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b >> shift, minlength=n_bins).astype(np.float64)
                feats.append((hist / max(b.size, 1)).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": pdf["meta"].map(lambda m: int(m["n_bytes"])).astype("int64"),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def byte_histogram_sql(table: str, id_col: str, text_col: str, bins: tuple[int, ...]) -> str:
    """DuckDB twin of synthesize_media >> byte_histogram_features for
    the requested bins, reported as exact COUNTS (the gate multiplies
    the float32 ratio back by n_bytes and rounds — exact as long as
    float32 relative error < 0.5/count, which holds for any payload
    under ~10^6 bytes). ASCII-only corpus verified, so ascii(char) ==
    byte value."""
    bin_cols = ",\n       ".join(
        f"count(CASE WHEN bin = {b} THEN 1 END)::BIGINT AS c{b}" for b in bins
    )
    return f"""
WITH m AS (
  SELECT {id_col} AS media_id,
         ['image','audio','video'][({id_col} % 3 + 1)::INT] AS kind,
         {text_col} AS payload,
         strlen({text_col})::BIGINT AS n_bytes
  FROM {table}
), chars AS (
  SELECT media_id, kind, n_bytes,
         (ascii(substr(payload, unnest(range(1, strlen(payload)::INT + 1))::INT, 1)) // 16)::INT AS bin
  FROM m
)
SELECT media_id, kind, n_bytes,
       {bin_cols}
FROM chars GROUP BY media_id, kind, n_bytes
"""


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind payload accounting (pure Catalyst): rows, bytes, avg."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.col("meta.n_bytes")).cast("long").alias("total_bytes"),
        F.round(F.avg(F.col("meta.n_bytes")), 2).alias("avg_bytes"),
    )


def media_stats_sql(table: str, id_col: str, text_col: str) -> str:
    """Oracle twin of synthesize_media >> media_stats (payload = utf-8
    text bytes; kind cycles by id mod 3: 1->image? no — index is
    (id % 3)+1 into [image, audio, video])."""
    return f"""
WITH m AS (
  SELECT {id_col},
         ['image','audio','video'][({id_col} % 3 + 1)::INT] AS kind,
         strlen({text_col})::BIGINT AS n_bytes
  FROM {table}
)
SELECT kind, count(*)::BIGINT AS n_items, sum(n_bytes)::BIGINT AS total_bytes,
       round(avg(n_bytes), 2) AS avg_bytes
FROM m GROUP BY kind
"""
