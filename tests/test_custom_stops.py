"""Custom StopFilter analyzers (`stop:<words>` — the everyday Lucene
StandardAnalyzer(myStopWords) setup).

Laws:
- canonicalization: build_index accepts any case/order/spacing and
  pins the canonical lowercase-sorted form; the low-level registry
  (stop_set) accepts ONLY the canonical form (the pin is compared by
  string equality); invalid words raise;
- the pinned set is real: stopped terms vanish from the termdict,
  dl counts survivors only, all-stopword docs keep their dl=0
  roster row;
- query text analyzes with the INDEX's pinned set (a stopword query
  term matches nothing);
- the manifest pin behaves like every other creation config:
  same-set-different-spelling appends succeed, different sets raise;
- mixed per-field maps with custom stop chains are refused (pin
  ambiguity), uniform maps collapse to the bare name.
"""

import pytest

from fdblucene_spark.functions.analysis import (
    canonical_analyzer,
    stop_set,
    tokenize_text,
)
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

DOCS = [
    (0, "ion flux core node ion"),
    (1, "flux edge path core"),
    (2, "ion ion ion"),          # all-stopword under stop:flux? no — under stop:ion
    (3, ""),
    (4, "core path ion flux edge"),
]


def test_canonicalization_laws():
    assert canonical_analyzer("stop: The,and , AND") == "stop:and,the"
    assert canonical_analyzer("stop:b,a") == "stop:a,b"
    assert canonical_analyzer("standard_v2") == "standard_v2"
    assert stop_set("stop:a,b") == frozenset({"a", "b"})
    with pytest.raises(ValueError, match="canonical"):
        stop_set("stop:b,a,B")
    with pytest.raises(ValueError, match="token"):
        canonical_analyzer("stop:two words")
    with pytest.raises(ValueError, match="at least one"):
        canonical_analyzer("stop: ,")
    with pytest.raises(ValueError, match="unknown analyzer"):
        canonical_analyzer("standard_v99")
    assert tokenize_text("ion flux core", "stop:ion") == ["flux", "core"]


@pytest.fixture(scope="module")
def cs_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cstop") / "idx")
    m = build_index(
        spark,
        spark.createDataFrame(DOCS, "doc_id long, text string"),
        root, doc_col="doc_id", n_shards=2,
        analyzer="stop: Ion,  FLUX",  # messy input on purpose
    )
    return root, m


def test_custom_pin_canonical_and_applied(spark, cs_index):
    root, m = cs_index
    assert m.analyzer == "stop:flux,ion"
    s = Searcher(spark, root)
    td = spark.read.parquet(*s.manifest.segment_paths(root, "termdict"))
    terms = {r["term"] for r in td.collect()}
    assert "ion" not in terms and "flux" not in terms
    assert {"core", "node", "edge", "path"} <= terms
    dl = {
        (r["doc"]): r["dl"]
        for r in spark.read.parquet(*s.manifest.segment_paths(root, "doclen"))
        .filter("field = 'text'").collect()
    }
    # doc 0: 'ion flux core node ion' -> survivors core,node -> dl 2;
    # doc 2 all-stopword -> roster row dl=0; doc 3 empty -> dl=0
    assert dl[0] == 2 and dl[2] == 0 and dl[3] == 0 and dl[4] == 3
    # query-side: a stopped term analyzes away -> no hits
    assert s.search(["ion"], k=10).count() == 0
    assert s.search(["core"], k=10).count() == 3


def test_custom_pin_append_semantics(spark, cs_index):
    root, m = cs_index
    more = spark.createDataFrame([(10, "core ion extra")], "doc_id long, text string")
    # same set, different spelling: canonicalizes to the same pin
    build_index(spark, more, root, doc_col="doc_id", n_shards=2,
                append=True, analyzer="stop:FLUX , ion")
    s = Searcher(spark, root)
    assert s.search(["extra"], k=5).count() == 1
    with pytest.raises(ValueError, match="mismatch"):
        build_index(
            spark,
            spark.createDataFrame([(11, "x")], "doc_id long, text string"),
            root, doc_col="doc_id", n_shards=2, append=True,
            analyzer="stop:flux",
        )


def test_custom_mixed_perfield_refused(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cstopm") / "idx")
    df = spark.createDataFrame([(0, "a b", "c d")], "doc_id long, t1 string, t2 string")
    with pytest.raises(ValueError, match="mixed per-field"):
        build_index(
            spark, df, root, doc_col="doc_id", n_shards=2,
            text_fields={"t1": "t1", "t2": "t2"},
            analyzer={"t1": "stop:a", "t2": "standard_v1"},
        )
    # uniform custom map collapses to the bare pin and builds fine
    root2 = str(tmp_path_factory.mktemp("cstopm") / "idx2")
    m = build_index(
        spark, df, root2, doc_col="doc_id", n_shards=2,
        text_fields={"t1": "t1", "t2": "t2"},
        analyzer={"t1": "stop:a", "t2": "stop:a"},
    )
    assert m.analyzer == "stop:a"
