"""Numeric doc-values updates (IndexWriter.updateNumericDocValue
analogue): sidecar overrides applied by every stored-table consumer,
latest-wins merging, fold-on-merge, and validation."""

import numpy as np
import pytest

from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.deletes import update_doc_values
from fdblucene_spark.operators.merge import merge_segments
from fdblucene_spark.operators.query import Searcher
from fdblucene_spark.sources.manifest import IndexCatalog

WORDS = ["alpha", "beta", "gamma", "delta"]


@pytest.fixture()
def dv_index(spark, tmp_path_factory):
    rng = np.random.default_rng(17)
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(WORDS, size=int(rng.integers(2, 12)))),
            "n_chars": 100 + i,
            "role": ["user", "assistant"][i % 2],
        }
        for i in range(100)
    ]
    root = str(tmp_path_factory.mktemp("dv") / "idx")
    build_index(
        spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=4,
        stored_fields={"n_chars": "n_chars", "role": "role"},
    )
    return rows, root


def _filtered(s, lo, hi):
    hits = s.search_boolean(
        [{"term": "alpha", "occur": "should"}, {"term": "beta", "occur": "should"},
         {"term": "gamma", "occur": "should"}, {"term": "delta", "occur": "should"}],
        k=1000, min_should_match=1,
        numeric=[{"field": "n_chars", "lo": lo, "hi": hi}],
    )
    return sorted(int(r["doc"]) for r in hits.collect())


def test_dv_update_applies_everywhere(spark, dv_index):
    rows, root = dv_index
    before = _filtered(Searcher(spark, root), 100, 150)
    assert before == list(range(51))  # n_chars = 100 + doc
    # push docs 0..9 out of range, pull 90..94 in
    up = spark.createDataFrame(
        [(d, 10_000) for d in range(10)] + [(d, 120) for d in range(90, 95)],
        "doc long, n_chars long",
    )
    update_doc_values(spark, root, up)
    s = Searcher(spark, root)
    want = [d for d in range(10, 51)] + list(range(90, 95))
    assert _filtered(s, 100, 150) == want
    # driver-local path sees the same overrides
    loc = s.search_boolean_local(
        [{"term": "alpha", "occur": "should"}, {"term": "beta", "occur": "should"},
         {"term": "gamma", "occur": "should"}, {"term": "delta", "occur": "should"}],
        k=1000, min_should_match=1,
        numeric=[{"field": "n_chars", "lo": 100, "hi": 150}],
    )
    assert sorted(int(d) for d in loc["doc"]) == want
    # sort surface: the overridden doc 0 now ranks first descending
    top = s.search_sorted(["alpha"], 5, "n_chars", ascending=False).toPandas()
    if 0 in set(int(d) for d in top["doc"]):
        assert int(top.iloc[0]["doc"]) == 0


def test_dv_update_latest_wins_and_merge_folds(spark, dv_index):
    rows, root = dv_index
    update_doc_values(spark, root, spark.createDataFrame([(5, 777)], "doc long, n_chars long"))
    update_doc_values(spark, root, spark.createDataFrame([(5, 888)], "doc long, n_chars long"))
    s = Searcher(spark, root)
    v = s._stored_df().filter("doc = 5").select("n_chars").first()[0]
    assert int(v) == 888
    # other column untouched
    assert s._stored_df().filter("doc = 5").select("role").first()[0] == "assistant"
    m = merge_segments(spark, root, mode="concat")
    assert "dv_path" not in m.properties
    s2 = Searcher(spark, root)
    assert int(s2._stored_df().filter("doc = 5").select("n_chars").first()[0]) == 888


def test_dv_update_validation(spark, dv_index):
    rows, root = dv_index
    with pytest.raises(ValueError):
        update_doc_values(
            spark, root, spark.createDataFrame([(1, 1)], "doc long, nope long")
        )
    with pytest.raises(ValueError):
        update_doc_values(spark, root, spark.createDataFrame([(1,)], "doc long"))
