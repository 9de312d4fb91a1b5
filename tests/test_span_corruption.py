"""T5/UL2 span corruption (curation.span_corruption).

Laws:
- every draw (start flag, span length) is reproducible in pure
  Python via hashlib, so the whole (input, target) pair has a hand
  oracle, including island merging and sentinel numbering;
- reassembly: replacing each <extra_id_k> in the input with target
  span k reconstructs the original token stream (the paper's
  round-trip property);
- realized noise fraction tracks noise_density on a long corpus;
- partition/rerun invariance and salt re-draw;
- byte-identity vs the DuckDB twin;
- domain guards.
"""

import hashlib
import re

import duckdb
import pytest

from fdblucene_spark.operators.curation import span_corruption, span_corruption_sql

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog and runs far away into the deep dark forest tonight"),
    (1, ""),
    (2, None),
    (3, "single"),
    (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau"),
    (5, "Mixed CASE tokens, with punct!  and   spaces\tand_underscores kept123 intact"),
    (6, "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 4),
]


def _u(salt, tag, doc_id, i):
    h = hashlib.md5(f"{salt}:{tag}:{doc_id}:{i}".encode()).hexdigest()
    return int(h[:8], 16) / float(16**8)


def _tok(text):
    if text is None:
        return []
    return [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]


def _expected(doc_id, text, density, mean, salt="t5-v1"):
    ts = _tok(text)
    n = len(ts)
    p = density / mean
    max_len = max(1, int(2 * mean - 1))
    starts = [_u(salt, "s", doc_id, i) < p for i in range(n)]
    lens = [1 + int(_u(salt, "l", doc_id, i) * max_len) for i in range(n)]
    cov = [
        any(starts[i] and i + lens[i] > j for i in range(max(0, j - (max_len - 1)), j + 1))
        for j in range(n)
    ]
    isl = [cov[j] and (j == 0 or not cov[j - 1]) for j in range(n)]
    ipos = [j for j in range(n) if isl[j]]
    inp, tgt = [], []
    for j in range(n):
        if isl[j]:
            k = ipos.index(j)
            inp.append(f"<extra_id_{k}>")
            tgt.append(f"<extra_id_{k}> {ts[j]}")
        elif cov[j]:
            tgt.append(ts[j])
        else:
            inp.append(ts[j])
    tgt.append(f"<extra_id_{len(ipos)}>")
    return (n, sum(cov), len(ipos), " ".join(inp), " ".join(tgt))


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("density,mean", [(0.15, 3.0), (0.4, 2.0), (0.5, 1.0)])
def test_span_corruption_hand_oracle(spark, docs, density, mean):
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_noise"],
            r["n_spans"],
            r["input_text"],
            r["target_text"],
        )
        for r in span_corruption(
            docs, "doc_id", "text", noise_density=density, mean_span_len=mean
        ).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == _expected(doc_id, text, density, mean), doc_id


def test_span_corruption_round_trip(spark, docs):
    """Substituting target span k for <extra_id_k> in the input
    reconstructs the original token stream."""
    for r in span_corruption(docs, "doc_id", "text", noise_density=0.4).collect():
        spans = {}
        cur = None
        for tok in r["target_text"].split(" "):
            m = re.fullmatch(r"<extra_id_(\d+)>", tok)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            elif cur is not None:
                spans[cur].append(tok)
        rebuilt = []
        for tok in (r["input_text"].split(" ") if r["input_text"] else []):
            m = re.fullmatch(r"<extra_id_(\d+)>", tok)
            rebuilt.extend(spans[int(m.group(1))] if m else [tok])
        assert rebuilt == _tok(dict(DOCS)[r["doc_id"]]), r["doc_id"]


def test_span_corruption_density_tracks(spark):
    long_doc = " ".join(f"tok{i}" for i in range(4000))
    df = spark.createDataFrame([(1, long_doc)], "doc_id long, text string")
    r = span_corruption(df, "doc_id", "text", noise_density=0.15).collect()[0]
    frac = r["n_noise"] / r["n_tokens"]
    assert 0.10 < frac < 0.20, frac
    # mean realized span length ~ mean_span_len (merging inflates a bit)
    assert 2.0 < r["n_noise"] / r["n_spans"] < 4.5


def test_span_corruption_invariance(spark, docs):
    a = sorted(map(tuple, span_corruption(docs, "doc_id", "text").collect()))
    b = sorted(
        map(tuple, span_corruption(docs.repartition(5), "doc_id", "text").collect())
    )
    assert a == b
    c = sorted(
        map(tuple, span_corruption(docs, "doc_id", "text", salt="t5-v2").collect())
    )
    assert a != c


def test_span_corruption_duckdb_twin(spark, docs):
    got = sorted(
        map(
            tuple,
            span_corruption(
                docs, "doc_id", "text", noise_density=0.3, mean_span_len=2.5
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", DOCS)
    twin = sorted(
        map(
            tuple,
            con.execute(
                span_corruption_sql(
                    "tt", "doc_id", "text", noise_density=0.3, mean_span_len=2.5
                )
            ).fetchall(),
        )
    )
    assert got == twin


def test_span_corruption_guards(spark, docs):
    with pytest.raises(ValueError, match="noise_density"):
        span_corruption(docs, "doc_id", "text", noise_density=1.0)
    with pytest.raises(ValueError, match="mean_span_len"):
        span_corruption(docs, "doc_id", "text", mean_span_len=0.5)
    with pytest.raises(ValueError, match="noise_density"):
        span_corruption_sql("tt", "doc_id", "text", noise_density=0.0)
