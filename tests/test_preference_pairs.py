"""RLHF preference-pair assembly (curation.preference_pairs).

Laws:
- the whole construction (pair mining, md5-rank permutation, cyclic
  successor, same-conversation drop) has a pure-Python hand oracle;
- rejected always comes from a DIFFERENT conversation and is itself
  some mined pair's response;
- the cyclic wrap (max-rank pair -> rank 0) is exercised;
- partition/rerun invariance + salt re-draw;
- byte-identity vs the DuckDB twin.
"""

import hashlib

import duckdb
import pytest

from fdblucene_spark.operators.curation import preference_pairs, preference_pairs_sql

ROWS = []
for c in range(8):
    for t in range(6):
        role = "user" if t % 2 == 0 else ("assistant" if t % 4 == 1 else "tool")
        ROWS.append((f"c{c}", t, role, f"text {c} {t}"))
# c*: turns u a u t u a -> adjacent (user, assistant) pairs at (0,1) and (4,5)


def _mine():
    pairs = []
    by_conv = {}
    for conv, t, role, text in ROWS:
        by_conv.setdefault(conv, []).append((t, role, text))
    for conv, turns in by_conv.items():
        turns.sort()
        idx = 0
        for (t1, r1, x1), (t2, r2, x2) in zip(turns, turns[1:]):
            if r1 == "user" and r2 == "assistant":
                pairs.append((conv, idx, t1, x1, x2))
                idx += 1
    return pairs


def _expected(salt="pref-v1"):
    pairs = _mine()
    ranked = sorted(
        pairs,
        key=lambda p: (
            hashlib.md5(f"{salt}:{p[0]}:{p[1]}".encode()).hexdigest(),
            f"{p[0]}:{p[1]}",
        ),
    )
    n = len(ranked)
    out = []
    for i, p in enumerate(ranked):
        q = ranked[(i + 1) % n]
        if p[0] != q[0]:
            out.append((p[0], p[1], p[2], p[3], p[4], q[4]))
    return sorted(out)


@pytest.fixture()
def tx(spark):
    return spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string"
    )


def test_preference_pairs_hand_oracle(spark, tx):
    got = sorted(
        map(tuple, preference_pairs(tx, "conv_id", "turn_idx", "role", "text").collect())
    )
    exp = _expected()
    assert got == exp
    # every conversation mined two pairs; at most a handful self-drop
    assert len(got) >= 12
    convs = {r[0] for r in got}
    rejected_texts = {r[5] for r in got}
    chosen_texts = {p[4] for p in _mine()}
    assert rejected_texts <= chosen_texts  # negatives are real responses
    for r in got:
        assert r[5] != r[4]
        # rejected text belongs to a different conversation
        assert not r[5].startswith(f"text {r[0][1:]} ")


def test_preference_pairs_invariance_and_salt(spark, tx):
    a = sorted(map(tuple, preference_pairs(tx, "conv_id", "turn_idx", "role", "text").collect()))
    b = sorted(
        map(
            tuple,
            preference_pairs(
                tx.repartition(5), "conv_id", "turn_idx", "role", "text"
            ).collect(),
        )
    )
    assert a == b
    c = sorted(
        map(
            tuple,
            preference_pairs(
                tx, "conv_id", "turn_idx", "role", "text", salt="pref-v2"
            ).collect(),
        )
    )
    assert a != c
    assert _expected("pref-v2") == c  # the oracle covers any salt


def test_preference_pairs_duckdb_twin(spark, tx):
    got = sorted(
        map(tuple, preference_pairs(tx, "conv_id", "turn_idx", "role", "text").collect())
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(conv_id VARCHAR, turn_idx INT, role VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?, ?, ?)", ROWS)
    twin = sorted(
        map(
            tuple,
            con.execute(
                preference_pairs_sql("tt", "conv_id", "turn_idx", "role", "text")
            ).fetchall(),
        )
    )
    assert got == twin
