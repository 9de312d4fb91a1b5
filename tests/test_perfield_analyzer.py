"""PerFieldAnalyzerWrapper: per-text-field analyzer chains in ONE
index (Lucene wraps a default analyzer + a field->analyzer map; here
build_index(analyzer={field: version}) pins the map in the manifest).

The same source column indexed under two fields with different chains
must diverge exactly where the chains do: stopwords searchable in the
v1 field, gone (df=0, shorter dl -> different norms) in the v2 field;
query-side analysis resolves per field (analyzer_for); the pin is the
canonical map, so appends must redeclare it exactly.
"""

import numpy as np
import pytest

from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

ROWS = [
    {"doc_id": 0, "text": "the quick fox and the lazy dog"},
    {"doc_id": 1, "text": "a fox is not a dog"},
    {"doc_id": 2, "text": "quick quick dog"},
    {"doc_id": 3, "text": "the the the"},          # all-stopword under v2
]
AMAP = {"body": "standard_v1", "body2": "standard_v2"}


@pytest.fixture(scope="module")
def pf_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("perfield") / "idx")
    build_index(
        spark, spark.createDataFrame(ROWS), root, doc_col="doc_id", n_shards=2,
        text_fields={"body": "text", "body2": "text"}, analyzer=AMAP,
    )
    return root


def test_perfield_chains_diverge(spark, pf_index):
    s = Searcher(spark, pf_index)
    # the pin is canonical and the per-field map round-trips
    assert s.manifest.analyzer == "perfield:body=standard_v1,body2=standard_v2"
    assert s.analyzer_for("body") == "standard_v1"
    assert s.analyzer_for("body2") == "standard_v2"
    assert s.analyzer == "standard_v1"  # primary field's version
    # stopword 'the': searchable in body, absent from body2
    assert s.count(["the"], field="body") == 2
    assert s.count(["the"], field="body2") == 0
    # doc lengths shrink under v2: doc 0 has 7 tokens in body, 4 in body2
    stats = s.term_stats_multi({"body": {"fox"}, "body2": {"fox"}})
    assert stats[("body", "fox")][0] == 2 and stats[("body2", "fox")][0] == 2
    assert s.manifest.avgdl_for("body") > s.manifest.avgdl_for("body2")
    # scores for the same term differ between the fields (norms moved)
    b1 = {r["doc"]: r["score"] for r in s.search(["fox"], 10, field="body").collect()}
    b2 = {r["doc"]: r["score"] for r in s.search(["fox"], 10, field="body2").collect()}
    assert set(b1) == set(b2) == {0, 1}
    assert b1 != b2


def test_perfield_matches_single_field_index(spark, pf_index, tmp_path_factory):
    """The v2 field inside the per-field index scores bit-identically
    to a dedicated standard_v2 single-field index over the same docs
    (per-field stats isolate the chains completely)."""
    root2 = str(tmp_path_factory.mktemp("v2only") / "idx")
    build_index(
        spark, spark.createDataFrame(ROWS), root2, doc_col="doc_id", n_shards=2,
        text_fields={"body2": "text"}, analyzer="standard_v2",
    )
    s_pf = Searcher(spark, pf_index)
    s_v2 = Searcher(spark, root2)
    got = [(r["doc"], r["score"]) for r in s_pf.search(["fox", "dog"], 10, field="body2").collect()]
    want = [(r["doc"], r["score"]) for r in s_v2.search(["fox", "dog"], 10, field="body2").collect()]
    assert got == want


def test_perfield_pin_enforced(spark, pf_index):
    df = spark.createDataFrame([{"doc_id": 10, "text": "more dogs here"}])
    # same map redeclared -> append commits
    build_index(spark, df, pf_index, doc_col="doc_id", n_shards=2,
                text_fields={"body": "text", "body2": "text"},
                analyzer=AMAP, append=True)
    s = Searcher(spark, pf_index)
    assert s.count(["more"], field="body") == 1
    # swapped map -> different pin -> refused
    with pytest.raises(ValueError, match="pinned"):
        build_index(spark, df, pf_index, doc_col="doc_id", n_shards=2,
                    text_fields={"body": "text", "body2": "text"},
                    analyzer={"body": "standard_v2", "body2": "standard_v1"},
                    append=True)
    # plain-string analyzer -> uniform pin -> refused too
    with pytest.raises(ValueError, match="pinned"):
        build_index(spark, df, pf_index, doc_col="doc_id", n_shards=2,
                    text_fields={"body": "text", "body2": "text"},
                    analyzer="standard_v1", append=True)


def test_uniform_map_pins_as_bare_version(spark, tmp_path_factory):
    """{f: v, g: v} pins as plain 'v' — interchangeable with the str
    form across appends (no gratuitous config mismatch)."""
    root = str(tmp_path_factory.mktemp("uni") / "idx")
    df = spark.createDataFrame(ROWS)
    build_index(spark, df, root, doc_col="doc_id", n_shards=2,
                text_fields={"body": "text", "body2": "text"},
                analyzer={"body": "standard_v2", "body2": "standard_v2"})
    m = Searcher(spark, root).manifest
    assert m.analyzer == "standard_v2"
    build_index(spark, spark.createDataFrame([{"doc_id": 10, "text": "ten"}]),
                root, doc_col="doc_id", n_shards=2,
                text_fields={"body": "text", "body2": "text"},
                analyzer="standard_v2", append=True)
    # map for an undeclared field is an error
    with pytest.raises(ValueError, match="undeclared"):
        build_index(spark, df, str(tmp_path_factory.mktemp("bad") / "i"),
                    doc_col="doc_id", n_shards=2,
                    text_fields={"body": "text"},
                    analyzer={"nosuch": "standard_v2"})


def test_add_indexes_carries_perfield_map(spark, pf_index, tmp_path_factory):
    """addIndexes of per-field sources must keep the analyzer map (and
    keyword_fields) in the destination manifest — losing it would make
    analyzer_for() fall back to the default chain on the merged index."""
    from fdblucene_spark.operators.merge import add_indexes

    root2 = str(tmp_path_factory.mktemp("pf2") / "idx")
    build_index(
        spark,
        spark.createDataFrame([{"doc_id": 50 + i, "text": t} for i, t in
                               enumerate(["the fox returns", "a dog again"])]),
        root2, doc_col="doc_id", n_shards=2,
        text_fields={"body": "text", "body2": "text"}, analyzer=AMAP,
    )
    dest = str(tmp_path_factory.mktemp("pfdst") / "idx")
    add_indexes(spark, dest, [pf_index, root2])
    s = Searcher(spark, dest)
    assert s.manifest.properties.get("field_analyzers") == AMAP
    assert s.analyzer_for("body2") == "standard_v2"
    # the v2 chain still drops stopwords on the merged index
    assert s.count(["the"], field="body2") == 0
    assert s.count(["the"], field="body") > 0
