"""DocValuesFieldExistsQuery / NormsFieldExistsQuery analogue.

Lucene 8 field-existence filters: DocValuesFieldExistsQuery iterates
docsWithField over a doc-values slot; NormsFieldExistsQuery matches
docs holding a norms entry for an indexed field. Here 'docvalues' is
a non-null slot in the index-owned stored table, 'norms' is a doclen
row for the field; both are constant-score, docID-ascending, and
respect tombstones. The reference delegates the originals to Lucene
(/root/reference/README.md:53).
"""

import pytest

from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.deletes import delete_docs
from fdblucene_spark.operators.query import Searcher

N_DOCS = 90
NULL_MOD = 3  # src is NULL for doc_id % 3 == 0
DEL_MOD = 10  # doc_id % 10 == 0 tombstoned


@pytest.fixture(scope="module")
def fe_index(spark, tmp_path_factory):
    rows = [
        {
            "doc_id": i,
            "text": "alpha beta" if i % 4 else "alpha",
            "src": None if i % NULL_MOD == 0 else f"s{i % 5}",
        }
        for i in range(N_DOCS)
    ]
    root = str(tmp_path_factory.mktemp("fe") / "idx")
    df = spark.createDataFrame(rows)
    build_index(
        spark, df, root, doc_col="doc_id", n_shards=4,
        text_fields={"text": "text"},
        keyword_fields={"src": "src"},
        stored_fields={"src": "src"},
    )
    delete_docs(
        spark, root,
        df.filter(df.doc_id % DEL_MOD == 0).selectExpr("doc_id AS doc"),
    )
    return Searcher(spark, root)


def _live(pred):
    return [i for i in range(N_DOCS) if i % DEL_MOD != 0 and pred(i)]


def test_docvalues_exists_skips_nulls_and_tombstones(spark, fe_index):
    got = fe_index.search_field_exists("src", k=N_DOCS, boost=2.5).collect()
    want = _live(lambda i: i % NULL_MOD != 0)
    assert [r["doc"] for r in got] == want
    assert all(abs(float(r["score"]) - 2.5) < 1e-9 for r in got)


def test_norms_exists_keyword_matches_indexed_docs(spark, fe_index):
    # the keyword field is inverted only where a value exists, so
    # norms-exists agrees with docvalues-exists on it
    got = fe_index.search_field_exists("src", k=N_DOCS, kind="norms").collect()
    assert [r["doc"] for r in got] == _live(lambda i: i % NULL_MOD != 0)
    assert all(float(r["score"]) == 1.0 for r in got)


def test_norms_exists_primary_field_is_live_roster(spark, fe_index):
    # text is never null here, so norms-exists(text) = every live doc
    got = fe_index.search_field_exists("text", k=N_DOCS, kind="norms").collect()
    assert [r["doc"] for r in got] == _live(lambda i: True)


def test_field_exists_k_cut_and_guards(spark, fe_index):
    got = fe_index.search_field_exists("src", k=5).collect()
    assert [r["doc"] for r in got] == _live(lambda i: i % NULL_MOD != 0)[:5]
    with pytest.raises(ValueError):
        fe_index.search_field_exists("src", k=5, kind="stored")
    with pytest.raises(ValueError):
        fe_index.search_field_exists("n_chars", k=5)  # not a stored slot
