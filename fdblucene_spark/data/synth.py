"""Deterministic synthetic transcripts corpus + reference query set.

Schema per BASELINE.json input_hint: (conv_id string, turn_idx int,
role string, text string, tool string, ts timestamp). Generation is
seeded per conversation, so the table is deterministic AND generated
distributed (spark.range over conv ids -> mapInPandas), which is the
only shape that scales to the bench sizes (FIXTURES.md section 5).

Zipfian(s=1.07) vocabulary of 5,000 terms ensures real hot-term skew
(top term lands in >20% of turns — exercises the salted build
shuffle), plus a seeded minority of punctuation / mixed-case /
Unicode tokens to exercise the analyzer, plus planted needle terms at
known (conv_id, turn_idx) for golden queries (FIXTURES.md section 1).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.07
ROLES = ["user", "assistant", "tool", "system"]
BASE_TS = dt.datetime(2026, 1, 1, 0, 0, 0)

# odd tokens: exercise lowercase/punct/Unicode paths of the analyzer
ODD_TOKENS = ["Café", "naïve-user!", "ÜBER,fast", "東京データ", "решение", "C3PO_unit", "O'Brien"]

# needles: (conv_id modulus, residue, turn_idx, term)
NEEDLES = [
    (97, 3, 1, "needlealpha"),
    (101, 7, 2, "needlebeta"),
    (211, 11, 0, "needlegamma"),
]

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

VOCAB = np.array([f"term{i:05d}" for i in range(VOCAB_SIZE)])
_P = (1.0 / np.arange(1, VOCAB_SIZE + 1) ** ZIPF_S)
_P /= _P.sum()


def _conv_frame(conv_ids: np.ndarray) -> pd.DataFrame:
    """Generate all turns for a batch of conversation indices."""
    frames = []
    for ci in conv_ids:
        rng = np.random.default_rng(SEED * 1_000_003 + int(ci))
        n_turns = int(rng.integers(3, 41))
        lens = rng.integers(5, 121, size=n_turns)
        total = int(lens.sum())
        toks = VOCAB[rng.choice(VOCAB_SIZE, size=total, p=_P)].astype(object)
        # seeded minority of odd tokens (~1.5%)
        odd_mask = rng.random(total) < 0.015
        if odd_mask.any():
            toks[odd_mask] = rng.choice(np.array(ODD_TOKENS, dtype=object), size=int(odd_mask.sum()))
        bounds = np.cumsum(lens)
        starts = bounds - lens
        texts = [" ".join(toks[s:e]) for s, e in zip(starts, bounds)]
        for mod, res, t_idx, term in NEEDLES:
            if int(ci) % mod == res and t_idx < n_turns:
                texts[t_idx] = texts[t_idx] + " " + term
        role_off = int(rng.integers(0, 4))
        roles = [ROLES[(role_off + t) % 4] for t in range(n_turns)]
        tools = [f"tool_{int(rng.integers(0, 8))}" if r == "tool" else None for r in roles]
        ts0 = BASE_TS + dt.timedelta(seconds=int(ci) * 3600)
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": f"conv_{int(ci):06d}",
                    "turn_idx": np.arange(n_turns, dtype=np.int32),
                    "role": roles,
                    "text": texts,
                    "tool": tools,
                    "ts": [ts0 + dt.timedelta(seconds=t) for t in range(n_turns)],
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def transcripts(spark: SparkSession, n_convs: int = 200, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic transcripts table (~21 turns/conv avg)."""
    if partitions is None:
        partitions = max(1, min(64, n_convs // 8 or 1))

    def gen(batches):
        for pdf in batches:
            yield _conv_frame(pdf["id"].to_numpy())

    return (
        spark.range(0, n_convs, numPartitions=partitions)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


def transcripts_pandas(n_convs: int = 200) -> pd.DataFrame:
    """Driver-side twin of transcripts() for the pure-Python oracle."""
    return _conv_frame(np.arange(n_convs))


def needle_locations(n_convs: int) -> list[tuple[str, int, str]]:
    """Known (conv_id, turn_idx, term) plants — golden-query ground truth.

    Note: a plant only exists if the conversation has enough turns; the
    oracle recomputes from the text, so this is for test convenience.
    """
    out = []
    for ci in range(n_convs):
        for mod, res, t_idx, term in NEEDLES:
            if ci % mod == res:
                out.append((f"conv_{ci:06d}", t_idx, term))
    return out


def reference_queries(n: int = 50) -> pd.DataFrame:
    """Fixed seeded query set (FIXTURES.md section 2): head/tail/needle
    terms, one absent term in a few queries, k in {1,5,10,100}."""
    rng = np.random.default_rng(SEED + 7)
    rows = []
    needles = [t for _, _, _, t in NEEDLES]
    for i in range(n):
        n_terms = int(rng.integers(1, 5))
        terms = []
        for _ in range(n_terms):
            kind = rng.random()
            if kind < 0.45:
                terms.append(str(VOCAB[int(rng.integers(0, 20))]))  # head
            elif kind < 0.85:
                terms.append(str(VOCAB[int(rng.integers(VOCAB_SIZE - 1500, VOCAB_SIZE))]))  # tail
            else:
                terms.append(str(rng.choice(needles)))
        if i % 11 == 5:
            terms.append("zzzzabsentterm")
        mode = "and" if i % 7 == 3 else ("phrase" if i % 13 == 8 else "or")
        rows.append(
            {
                "query_id": f"q{i:03d}",
                "terms": sorted(set(terms)),
                "k": int(rng.choice([1, 5, 10, 100])),
                "mode": mode,
            }
        )
    return pd.DataFrame(rows)
