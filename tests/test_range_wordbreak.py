"""LongRange relation queries + WordBreakSpellChecker analogues.

Lucene 8 surfaces: document.LongRange/RangeFieldQuery (one-dim
INTERSECTS / WITHIN / CONTAINS / CROSSES relation queries over a
stored [lo, hi] endpoint pair) and the suggest module's
WordBreakSpellChecker (suggestWordBreaks: split a run-together word
into two dictionary words; suggestWordCombinations: combine adjacent
query terms into one dictionary word). The reference delegates both
originals to Lucene (/root/reference/README.md:53); here ranges are
pure Catalyst predicates over two stored slots and word-break
candidates are bounded In-pushdown termdict lookups.
"""

import pytest

from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.deletes import delete_docs
from fdblucene_spark.operators.query import Searcher

N_DOCS = 60
NULL_MOD = 11  # lo/hi endpoints NULL for doc_id % 11 == 0
DEL_MOD = 10  # doc_id % 10 == 0 tombstoned
Q_LO, Q_HI = 30, 60


def _range_of(i):
    lo = (i * 7) % 100
    return lo, lo + (i % 13) + 1


@pytest.fixture(scope="module")
def rf_index(spark, tmp_path_factory):
    rows = []
    for i in range(N_DOCS):
        lo, hi = _range_of(i)
        if i % NULL_MOD == 0:
            lo = hi = None
        rows.append((i, "alpha beta", lo, hi))
    root = str(tmp_path_factory.mktemp("rf") / "idx")
    df = spark.createDataFrame(
        rows, "doc_id long, text string, r_lo long, r_hi long"
    )
    build_index(
        spark, df, root, doc_col="doc_id", n_shards=4,
        text_fields={"text": "text"},
        stored_fields={"r_lo": "r_lo", "r_hi": "r_hi"},
    )
    delete_docs(
        spark, root,
        df.filter(df.doc_id % DEL_MOD == 0).selectExpr("doc_id AS doc"),
    )
    return Searcher(spark, root)


def _brute(relation):
    out = []
    for i in range(N_DOCS):
        if i % DEL_MOD == 0 or i % NULL_MOD == 0:
            continue
        lo, hi = _range_of(i)
        inter = lo <= Q_HI and hi >= Q_LO
        within = lo >= Q_LO and hi <= Q_HI
        contains = lo <= Q_LO and hi >= Q_HI
        ok = {
            "intersects": inter,
            "within": within,
            "contains": contains,
            "crosses": inter and not within and not contains,
        }[relation]
        if ok:
            out.append(i)
    return out


@pytest.mark.parametrize(
    "relation", ["intersects", "within", "contains", "crosses"]
)
def test_range_relations_match_brute_force(spark, rf_index, relation):
    got = rf_index.search_range_field(
        "r_lo", "r_hi", Q_LO, Q_HI, relation, k=N_DOCS, boost=1.5
    ).collect()
    assert [r["doc"] for r in got] == _brute(relation)
    assert all(abs(float(r["score"]) - 1.5) < 1e-9 for r in got)
    # partition sanity: crosses ⊂ intersects, disjoint from within/contains
    if relation == "crosses":
        inter = set(_brute("intersects"))
        assert set(r["doc"] for r in got) <= inter
        assert not set(r["doc"] for r in got) & set(_brute("within"))
        assert not set(r["doc"] for r in got) & set(_brute("contains"))


def test_range_topk_cut_is_lowest_docids(spark, rf_index):
    full = _brute("intersects")
    got = rf_index.search_range_field(
        "r_lo", "r_hi", Q_LO, Q_HI, "intersects", k=5
    ).collect()
    assert [r["doc"] for r in got] == full[:5]


def test_range_guards(spark, rf_index):
    with pytest.raises(ValueError, match="relation"):
        rf_index.search_range_field("r_lo", "r_hi", 1, 2, "overlaps", k=5)
    with pytest.raises(ValueError, match="q_lo"):
        rf_index.search_range_field("r_lo", "r_hi", 5, 1, "within", k=5)
    with pytest.raises(ValueError, match="not stored"):
        rf_index.search_range_field("r_lo", "nope", 1, 2, "within", k=5)


# ---- WordBreakSpellChecker ----

# dfs by construction: a=10, bcd=1, ab=6, cd=6, air=2, port=2,
# line=2, airport=1, airline=1
WB_N_DOCS = 12


@pytest.fixture(scope="module")
def wb_index(spark, tmp_path_factory):
    rows = []
    for i in range(WB_N_DOCS):
        toks = []
        if i < 10:
            toks.append("a")
        if i == 0:
            toks.append("bcd")
        if i < 6:
            toks.append("ab")
        if 2 <= i < 8:
            toks.append("cd")
        if i in (10, 11):
            toks += ["air", "port", "line"]
        if i == 10:
            toks.append("airport")
        if i == 11:
            toks.append("airline")
        rows.append((i, " ".join(toks)))
    root = str(tmp_path_factory.mktemp("wb") / "idx")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(
        spark, df, root, doc_col="doc_id", n_shards=2,
        text_fields={"text": "text"},
    )
    return Searcher(spark, root)


def test_word_breaks_max_freq_rank(spark, wb_index):
    got = wb_index.suggest_word_breaks("abcd", n=10).collect()
    # max-freq rank: (a, bcd) max=10 beats (ab, cd) max=6
    assert [(r["left_term"], r["right_term"]) for r in got] == [
        ("a", "bcd"), ("ab", "cd")
    ]
    assert (got[0]["freq_left"], got[0]["freq_right"]) == (10, 1)
    assert got[0]["score"] == 10 and got[1]["score"] == 6


def test_word_breaks_sum_freq_rank_flips(spark, wb_index):
    got = wb_index.suggest_word_breaks("abcd", n=10, sort="sum_freq").collect()
    # summed-freq rank: (ab, cd) 12 beats (a, bcd) 11
    assert [(r["left_term"], r["right_term"]) for r in got] == [
        ("ab", "cd"), ("a", "bcd")
    ]
    assert got[0]["score"] == 12 and got[1]["score"] == 11


def test_word_breaks_min_frequency_and_length(spark, wb_index):
    # bcd has df=1 -> dropped at min freq 2
    got = wb_index.suggest_word_breaks(
        "abcd", n=10, min_suggestion_frequency=2
    ).collect()
    assert [(r["left_term"], r["right_term"]) for r in got] == [("ab", "cd")]
    # min break length 2 drops the (a, bcd) split too
    got = wb_index.suggest_word_breaks(
        "abcd", n=10, min_break_word_length=2
    ).collect()
    assert [(r["left_term"], r["right_term"]) for r in got] == [("ab", "cd")]


def test_word_breaks_compound_and_misses(spark, wb_index):
    got = wb_index.suggest_word_breaks("airport", n=10).collect()
    assert [(r["left_term"], r["right_term"]) for r in got] == [("air", "port")]
    assert wb_index.suggest_word_breaks("zzzzz", n=10).count() == 0
    with pytest.raises(ValueError):
        wb_index.suggest_word_breaks("x", n=10)


def test_word_combinations(spark, wb_index):
    got = wb_index.suggest_word_combinations(
        ["air", "port", "line"], n=10
    ).collect()
    # airport (df=1) at start 0; portline is not in the dictionary
    assert [(r["start_idx"], r["combined"], r["freq"]) for r in got] == [
        (0, "airport", 1)
    ]
    got = wb_index.suggest_word_combinations(["air", "line"], n=10).collect()
    assert [(r["combined"], r["freq"]) for r in got] == [("airline", 1)]
    with pytest.raises(ValueError):
        wb_index.suggest_word_combinations(["one"], n=10)
