"""CJK bigram analyzer (standard_v7 — Lucene CJKAnalyzer:
StandardTokenizer + CJKBigramFilter).

Laws:
- tokenization: CJK runs -> overlapping character bigrams (length-1
  runs keep unigrams), non-CJK runs pass through, mixed tokens split
  at script boundaries; Han / Hiragana / Katakana / Hangul all pair;
- a v7 index is rank-identical to the pure-Python oracle on a
  multi-script corpus (bigram postings, dl over the bigram stream,
  norms, idf all exercised);
- the manifest pin enforces like every analyzer (v1 append refused);
- store_offsets refuses the chain (bigram spans are not \\w+ spans).
"""

import numpy as np
import pytest

from fdblucene_spark import oracle
from fdblucene_spark.functions.analysis import cjk_bigrams, tokenize_text
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

DOCS = [
    (0, "検索エンジン search engine 検索"),
    (1, "漢字検索システム test"),
    (2, "plain english only"),
    (3, "한국어 형태소 분석 엔진"),
    (4, "中文搜索引擎测试 mixed latin"),
    (5, "一"),
    (6, "a漢b カタカナ"),
]


def test_tokenize_laws():
    assert tokenize_text("検索エンジン", "standard_v7") == [
        "検索", "索エ", "エン", "ンジ", "ジン"
    ]
    assert tokenize_text("a漢b", "standard_v7") == ["a", "漢", "b"]
    assert tokenize_text("一", "standard_v7") == ["一"]
    assert tokenize_text("plain latin", "standard_v7") == ["plain", "latin"]
    assert tokenize_text("한국어", "standard_v7") == ["한국", "국어"]
    assert cjk_bigrams("abc") == ["abc"]
    # v1 keeps the whole run as one token — the chains really differ
    assert tokenize_text("検索エンジン", "standard_v1") == ["検索エンジン"]


@pytest.fixture(scope="module")
def cjk_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cjk") / "idx")
    build_index(
        spark,
        spark.createDataFrame(DOCS, "doc_id long, text string"),
        root, doc_col="doc_id", n_shards=2, analyzer="standard_v7",
    )
    return root


@pytest.mark.parametrize(
    "terms,mode",
    [(["検索"], "or"), (["検索", "search"], "or"), (["搜索"], "or"),
     (["한국", "국어"], "and"), (["漢"], "or")],
)
def test_rank_identity_vs_oracle(spark, cjk_index, terms, mode):
    s = Searcher(spark, cjk_index)
    oidx = oracle.build_oracle_index(
        [i for i, _ in DOCS], [t for _, t in DOCS], analyzer="standard_v7"
    )
    got = [(r["doc"], np.float32(r["score"])) for r in s.search(terms, 10, mode).collect()]
    exp = [(d, np.float32(x)) for d, x in oracle.search(oidx, terms, 10, mode)]
    assert got == exp, terms


def test_pin_and_guards(spark, cjk_index, tmp_path):
    more = spark.createDataFrame([(10, "延長テキスト")], "doc_id long, text string")
    with pytest.raises(ValueError, match="mismatch"):
        build_index(spark, more, cjk_index, doc_col="doc_id", n_shards=2,
                    append=True, analyzer="standard_v1")
    with pytest.raises(ValueError, match="CJK"):
        build_index(
            spark, more, str(tmp_path / "off"), doc_col="doc_id", n_shards=2,
            analyzer="standard_v7", store_offsets=True,
        )
