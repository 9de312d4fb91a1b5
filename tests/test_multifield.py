"""Multi-field indexing: tokenized + keyword fields per document —
the reference's document shape (TextField("foo") + StringField("_id"),
SimpleFDBDirectoryTest.java:202-207), with per-field stats."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher
from fdblucene_spark.sources.manifest import IndexCatalog

DOCS = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3],
        "body": [
            "alpha beta gamma alpha",
            "beta delta",
            "Alpha ALPHA alpha epsilon",
            "zeta eta theta",
        ],
        "title": ["First Doc", "second doc", "third ALPHA", None],
        "uid": ["Doc-A", "Doc-B", "doc-a", None],
    }
)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx-mf"))
    df = spark.createDataFrame(DOCS)
    m = build_index(
        spark, df, root, doc_col="doc_id",
        text_fields={"body": "body", "title": "title"},
        keyword_fields={"uid": "uid"},
        n_shards=2,
    )
    return root, m


def test_per_field_stats(idx):
    _, m = idx
    assert sorted(m.fields()) == ["body", "title", "uid"]
    assert m.n_docs_for("body") == 4
    assert m.n_docs_for("title") == 3      # one null title
    assert m.n_docs_for("uid") == 3
    assert m.field_stat("uid", "sum_dl") == 3      # keyword dl = 1
    assert m.avgdl_for("body") == pytest.approx((4 + 2 + 4 + 3) / 4)
    # primary field fills the legacy top-level stats
    assert m.n_docs == m.n_docs_for("body")


def test_field_isolation(spark, idx):
    root, _ = idx
    s = Searcher(spark, root)
    body_hits = {r.doc for r in s.search(["alpha"], 10, field="body").collect()}
    title_hits = {r.doc for r in s.search(["alpha"], 10, field="title").collect()}
    assert body_hits == {0, 2}
    assert title_hits == {2}  # tokenized+lowercased title


def test_keyword_exact_semantics(spark, idx):
    root, _ = idx
    s = Searcher(spark, root)
    # no analysis: case preserved, punctuation kept, whole value one term
    assert {r.doc for r in s.search(["Doc-A"], 10, field="uid").collect()} == {0}
    assert {r.doc for r in s.search(["doc-a"], 10, field="uid").collect()} == {2}
    assert s.search(["doc"], 10, field="uid").count() == 0


def test_unknown_field_returns_empty(spark, idx):
    root, _ = idx
    s = Searcher(spark, root)
    assert s.search(["alpha"], 10, field="nope").count() == 0


def test_per_field_idf(spark, idx):
    # same term, different fields -> different df/N/avgdl -> different scores
    root, _ = idx
    s = Searcher(spark, root)
    b = s.search(["alpha"], 10, field="body").toPandas()
    t = s.search(["alpha"], 10, field="title").toPandas()
    sb = dict(zip(b["doc"], b["score"]))
    st = dict(zip(t["doc"], t["score"]))
    assert sb[2] != st[2]


def test_batch_mixed_fields(spark, idx):
    root, _ = idx
    s = Searcher(spark, root)
    out = s.search_batch(
        [
            {"query_id": "q1", "terms": ["alpha"], "k": 10, "field": "body"},
            {"query_id": "q2", "terms": ["Doc-B"], "k": 10, "field": "uid"},
            {"query_id": "q3", "terms": ["beta", "delta"], "k": 10, "mode": "and", "field": "body"},
        ]
    ).toPandas()
    by = {qid: set(g["doc"]) for qid, g in out.groupby("query_id")}
    assert by["q1"] == {0, 2} and by["q2"] == {1} and by["q3"] == {1}


def test_append_field_mismatch_rejected(spark, idx):
    root, _ = idx
    df = spark.createDataFrame(DOCS)
    with pytest.raises(ValueError, match="field set mismatch"):
        build_index(spark, df, root, doc_col="doc_id", n_shards=2, append=True)


def test_phrase_within_field(spark, idx):
    root, _ = idx
    s = Searcher(spark, root)
    assert {r.doc for r in s.search(["alpha", "beta"], 10, mode="phrase", field="body").collect()} == {0}


def test_transcripts_multifield_shape(spark, tmp_path_factory):
    # the BASELINE.json input_hint schema end-to-end: tokenized text +
    # keyword role/tool fields over (conv_id, turn_idx) dense ids
    from fdblucene_spark.data import synth

    root = str(tmp_path_factory.mktemp("idx-tx-mf"))
    df = synth.transcripts(spark, n_convs=30)
    m = build_index(
        spark, df, root, key_cols=["conv_id", "turn_idx"],
        text_fields={"text": "text"},
        keyword_fields={"role": "role", "tool": "tool"},
        n_shards=4,
    )
    assert sorted(m.fields()) == ["role", "text", "tool"]
    s = Searcher(spark, root)
    n_tool_turns = df.filter(df.role == "tool").count()
    assert s.count(["tool"], field="role") == n_tool_turns
    # every tool turn carries some tool_k keyword; the tool field only
    # exists on those turns
    assert m.n_docs_for("tool") == n_tool_turns
    # combined retrieval: text hits restricted to assistant turns via
    # keyword-field intersection driver-side (two searches, id join)
    text_hits = {r.doc for r in s.search(["term00000"], 10**6).collect()}
    asst = {r.doc for r in s.search(["assistant"], 10**6, field="role").collect()}
    both = text_hits & asst
    ids = df.sparkSession.createDataFrame([(int(d),) for d in both], "doc long")
    from fdblucene_spark.operators.build import assign_dense_doc_ids

    base = assign_dense_doc_ids(df, ["conv_id", "turn_idx"])
    joined = base.join(ids, "doc").select("role").distinct().collect()
    assert [r["role"] for r in joined] == ["assistant"]


def test_fetch_across_fields(spark, idx):
    root, _ = idx
    s = Searcher(spark, root)
    base = spark.createDataFrame(DOCS)
    hits = s.search(["Doc-B"], 5, field="uid")
    got = s.fetch(hits, base, "doc_id").select("body").collect()
    assert got[0]["body"] == "beta delta"
