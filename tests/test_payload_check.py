"""SpanPayloadCheckQuery + DelimitedPayloadTokenFilter.

The producer (build_index(payload_delim="_")) is Lucene's
analysis-common DelimitedPayloadTokenFilter with the IntegerEncoder —
'word_3' indexes as term 'word' carrying payload 3; a token without a
numeric suffix keeps its whole surface and the default length payload.
'_' is a \\w character, so the delimited token survives the standard
tokenizer intact (Lucene's default '|' would be split away).

Laws pinned here against a brute-force oracle:
- match = exists one occurrence per slot, payload-equal where checked,
  forming a span of width <= slop + (n-1) (ordered / unordered);
- all-None payloads == search_span_near, bit-identical scores;
- scoring = and-mode BM25 of the distinct clause terms (span-family
  convention) on matching docs;
- producer parse rules (suffix/no-suffix/empty-head/non-numeric);
- payload_delim is pinned in the manifest (append refusal), requires
  store_payloads, and refuses non-v1 chains.
"""

import numpy as np
import pytest

from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

RNG = np.random.default_rng(23)
WORDS = ["red", "blue", "fox", "owl", "dog"]


def _tok(text):
    """(term, payload) stream under the delimiter producer."""
    out = []
    for t in text.lower().split():
        head, sep, tail = t.rpartition("_")
        if sep and head and tail.isdigit():
            out.append((head, int(tail)))
        else:
            out.append((t, len(t)))
    return out


@pytest.fixture(scope="module")
def pc_rows():
    rows = []
    for i in range(200):
        n = int(RNG.integers(2, 12))
        toks = []
        for _ in range(n):
            w = str(RNG.choice(WORDS))
            if RNG.random() < 0.7:
                w = f"{w}_{int(RNG.integers(0, 4))}"
            toks.append(w)
        rows.append({"doc_id": i, "text": " ".join(toks)})
    return rows


@pytest.fixture(scope="module")
def pc_index(spark, pc_rows, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("paycheck") / "idx")
    build_index(spark, spark.createDataFrame(pc_rows), root, doc_col="doc_id",
                n_shards=4, store_payloads=True, payload_delim="_")
    return Searcher(spark, root)


def _brute(rows, terms, payloads, slop, in_order):
    """Reference matcher: try every slot assignment (tiny docs)."""
    import itertools
    n = len(terms)
    w = slop + n - 1
    hit = set()
    for r in rows:
        stream = _tok(r["text"])
        slot_positions = []
        for t, want in zip(terms, payloads):
            ps = [p for p, (tt, pay) in enumerate(stream)
                  if tt == t and (want is None or pay == want)]
            slot_positions.append(ps)
        for combo in itertools.product(*slot_positions):
            if len(set(combo)) != n:
                continue
            if in_order and any(b <= a for a, b in zip(combo, combo[1:])):
                continue
            if max(combo) - min(combo) <= w:
                hit.add(r["doc_id"])
                break
    return hit


CASES = [
    (["red", "fox"], [2, None], 0, True),
    (["red", "fox"], [None, 1], 2, True),
    (["red", "fox"], [3, 3], 3, False),
    (["blue", "owl", "dog"], [0, None, 2], 4, True),
    (["fox"], [2], 0, True),
    (["fox", "fox"], [1, 2], 5, False),  # same term, disjoint payloads
]


@pytest.mark.parametrize("terms,pays,slop,in_order", CASES)
def test_matches_brute_force(pc_rows, pc_index, terms, pays, slop, in_order):
    got = {int(r["doc"]) for r in
           pc_index.search_span_payload_check(terms, pays, k=500, slop=slop,
                                              in_order=in_order).collect()}
    assert got == _brute(pc_rows, terms, pays, slop, in_order)


def test_all_none_equals_span_near(pc_index):
    a = [(r["doc"], r["score"]) for r in pc_index.search_span_payload_check(
        ["red", "fox"], [None, None], k=100, slop=2, in_order=True).collect()]
    b = [(r["doc"], r["score"]) for r in pc_index.search_span_near(
        ["red", "fox"], k=100, slop=2, in_order=True).collect()]
    assert a == b and a


def test_scores_are_and_mode_bm25(pc_index):
    """Matching docs carry exactly their and-mode BM25 over the clause
    terms (the span-family scoring convention)."""
    hits = {r["doc"]: r["score"] for r in pc_index.search_span_payload_check(
        ["red", "fox"], [2, None], k=500).collect()}
    full = {r["doc"]: r["score"] for r in
            pc_index.search(["red", "fox"], k=10000, mode="and").collect()}
    assert hits and all(full[d] == s for d, s in hits.items())


def test_producer_parse_rules(spark, tmp_path_factory):
    rows = [
        # '_7' tail: numeric -> payload; 'x_y': non-numeric -> length;
        # '_3' alone: empty head -> whole-token length payload;
        # 'a_b_9': split at the LAST delimiter
        {"doc_id": 0, "text": "word_7 x_y _3 a_b_9 plain"},
    ]
    root = str(tmp_path_factory.mktemp("rules") / "idx")
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id",
                n_shards=1, store_payloads=True, payload_delim="_")
    s = Searcher(spark, root)
    got = {(r["term"], r["payload"])
           for r in s.payloads(["word", "x_y", "_3", "a_b", "plain"]).collect()}
    assert got == {("word", 7), ("x_y", 3), ("_3", 2), ("a_b", 9), ("plain", 5)}


def test_pin_and_guards(spark, pc_rows, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pins") / "idx")
    df = spark.createDataFrame(pc_rows[:10])
    with pytest.raises(ValueError, match="requires store_payloads"):
        build_index(spark, df, root, doc_col="doc_id", payload_delim="_")
    with pytest.raises(ValueError, match="standard_v1"):
        build_index(spark, df, root, doc_col="doc_id", store_payloads=True,
                    payload_delim="_", analyzer="standard_v2")
    build_index(spark, df, root, doc_col="doc_id", n_shards=2,
                store_payloads=True, payload_delim="_")
    with pytest.raises(ValueError, match="payload_delim pinned"):
        build_index(spark, df, root, doc_col="doc_id", n_shards=2,
                    store_payloads=True, append=True)


def test_query_guards(pc_index):
    with pytest.raises(ValueError, match="align"):
        pc_index.search_span_payload_check(["red", "fox"], [2], k=5)
    with pytest.raises(ValueError, match="non-negative"):
        pc_index.search_span_payload_check(["red"], [-1], k=5)
    with pytest.raises(ValueError, match="checked and unchecked"):
        pc_index.search_span_payload_check(
            ["red", "red"], [2, None], k=5, slop=3, in_order=False)
    # the same shape IS legal ordered
    pc_index.search_span_payload_check(
        ["red", "red"], [2, None], k=5, slop=3, in_order=True).collect()


def test_requires_payload_index(spark, pc_rows, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nopay") / "idx")
    build_index(spark, spark.createDataFrame(pc_rows[:10]), root,
                doc_col="doc_id", n_shards=2)
    with pytest.raises(ValueError, match="store_payloads"):
        Searcher(spark, root).search_span_payload_check(["red"], [2], k=5)
