"""standard_v5 ASCIIFolding analyzer (Lucene analysis-common
ASCIIFoldingFilter): accented/decomposed Latin folds to its ASCII
skeleton straight after tokenization.

Laws pinned here: the fold rule table (NFKD + combining strip +
special cases, pass-through for out-of-table scripts, never-empty);
df folding (accented and plain surfaces share one term); bit-identical
BM25 vs a standard_v1 index over pre-folded text; the manifest pin
(cross-analyzer append refusal) and query-side analysis with v5.
"""

import pytest

from fdblucene_spark.functions.analysis import ascii_fold, tokenize_text
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

RULES = {
    "café": "cafe",
    "über": "uber",
    "señor": "senor",
    "çédille": "cedille",
    "naïve": "naive",
    "å": "a",
    "œuvre": "oeuvre",
    "straße": "strasse",
    "łódź": "lodz",
    "đạo": "dao",
    "þing": "thing",
    "ﬁne": "fine",        # NFKD ligature decomposition
    "東京": "東京",        # out-of-table script passes through
    "ascii": "ascii",
}


def test_fold_rule_table():
    for src, want in RULES.items():
        assert ascii_fold(src) == want, src


def test_fold_never_empties():
    # a pure combining-mark token keeps its surface
    t = "́̀"
    assert ascii_fold(t) == t


def test_tokenize_v5():
    assert tokenize_text("Café ÜBER the señor", "standard_v5") == [
        "cafe", "uber", "the", "senor"]


ROWS = [
    {"doc_id": 0, "text": "café über straße report"},
    {"doc_id": 1, "text": "cafe uber strasse report"},
    {"doc_id": 2, "text": "señor café plain"},
    {"doc_id": 3, "text": "nothing accented here"},
]
FOLDED = [dict(r, text=" ".join(ascii_fold(t) for t in r["text"].split()))
          for r in ROWS]


@pytest.fixture(scope="module")
def v5_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("v5") / "idx")
    build_index(spark, spark.createDataFrame(ROWS), root, doc_col="doc_id",
                n_shards=2, analyzer="standard_v5")
    return Searcher(spark, root)


def test_df_folds_surfaces_together(spark, v5_index):
    td = spark.read.parquet(*v5_index.manifest.segment_paths(v5_index.root, "termdict"))
    stats = {r["term"]: r["df"] for r in td.filter("field='text'").collect()}
    assert stats["cafe"] == 3 and "café" not in stats
    assert stats["strasse"] == 2 and stats["uber"] == 2 and stats["senor"] == 1


def test_bit_identity_vs_prefolded_v1(spark, v5_index, tmp_path_factory):
    root1 = str(tmp_path_factory.mktemp("v1") / "idx")
    build_index(spark, spark.createDataFrame(FOLDED), root1, doc_col="doc_id",
                n_shards=2, analyzer="standard_v1")
    s1 = Searcher(spark, root1)
    for terms in (["cafe"], ["cafe", "strasse"], ["senor", "report"]):
        a = [(r["doc"], r["score"]) for r in v5_index.search(terms, 10).collect()]
        b = [(r["doc"], r["score"]) for r in s1.search(terms, 10).collect()]
        assert a == b and a, terms


def test_query_side_analysis_folds(v5_index):
    got = [(r["doc"], r["score"]) for r in v5_index.search_parsed("café", 10).collect()]
    want = [(r["doc"], r["score"]) for r in v5_index.search(["cafe"], 10).collect()]
    assert got == want and {d for d, _ in got} == {0, 1, 2}


def test_pin_enforced(spark, v5_index):
    with pytest.raises(ValueError, match="analyzer"):
        build_index(spark, spark.createDataFrame(ROWS), v5_index.root,
                    doc_col="doc_id", n_shards=2, append=True)  # v1 default
