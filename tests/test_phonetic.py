"""Phonetic (Soundex) queries — Lucene's analysis-phonetic module
default encoder (PhoneticFilter + commons-codec Soundex), which the
reference inherits through Lucene's analyzer stack
(/root/reference/README.md:53).

Laws pinned here:
- soundex_py reproduces the commons-codec test vectors, including the
  two famous divergences from the naive algorithm: H/W transparency
  (ASHCRAFT -> A261, not A226) and vowel separation (TYMCZAK -> T522).
- the Catalyst chain (soundex_col) and the DuckDB ladder (soundex_sql)
  agree byte-for-byte with soundex_py on hand vectors AND under a
  property fuzz over h/w-heavy random strings.
- expand_terms(phonetic=...) enumerates exactly the equal-code
  vocabulary terms; search_phonetic == the OR search over that set
  (the SCORING_BOOLEAN rewrite law every MultiTermQuery surface obeys).
"""

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from fdblucene_spark.functions.phonetic import soundex_col, soundex_py, soundex_sql
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

# commons-codec SoundexTest vectors (public Apache test suite values)
VECTORS = {
    "ROBERT": "R163",
    "Rupert": "R163",
    "ASHCRAFT": "A261",   # H is code-transparent: C,R collapse across it
    "ASHCROFT": "A261",
    "Tymczak": "T522",    # vowel separates C,Z -> both coded
    "Pfister": "P236",    # F collapses into P's code run
    "testing": "T235",
    "The": "T000",
    "quick": "Q200",
    "brown": "B650",
    "fox": "F200",
    "jumped": "J513",
    "over": "O160",
    "lazy": "L200",
    "dogs": "D200",
    "merge": "M620",
    "mirj": "M620",
    "HOLMES": "H452",
    "ADOMOMI": "A355",
    "VONDERLEHR": "V536",
    "BALL": "B400",
    "SHAW": "S000",
    "JACKSON": "J250",
    "SCANLON": "S545",
    "SAINTJOHN": "S532",
    # non-letters stripped before encoding; all-non-letter -> ''
    "o'Brien": "O165",
    "term00001": "T650",
    "12345": "",
    "": "",
}


def test_soundex_py_vectors():
    for word, code in VECTORS.items():
        assert soundex_py(word) == code, word


def _fuzz_words(n=400, seed=7):
    """h/w/vowel-heavy random strings — the alphabet is biased toward
    the letters that distinguish commons-codec from naive Soundex."""
    rng = random.Random(seed)
    alpha = "hwaeiouyrcskbtdlmn" + string.ascii_lowercase + "0'-"
    out = []
    for _ in range(n):
        ln = rng.randint(0, 12)
        out.append("".join(rng.choice(alpha) for _ in range(ln)))
    return out


def test_soundex_col_parity(spark):
    words = list(VECTORS) + _fuzz_words()
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["c"] for r in df.select("w", soundex_col(F.col("w")).alias("c")).collect()}
    for w in words:
        assert got[w] == soundex_py(w), w


def test_soundex_sql_parity():
    words = list(VECTORS) + _fuzz_words(seed=11)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ", ".join(f"('{w}')" for w in words if "'" not in w)
                + ") v(w)")
    rows = con.execute(f"SELECT w, {soundex_sql('w')} FROM t").fetchall()
    assert rows  # the quote filter must not empty the corpus
    for w, c in rows:
        assert c == soundex_py(w), w


def test_soundex_sql_run_ladder_depth():
    """The replace ladder halves runs each pass: a 64-char same-code
    run (the documented bound) must still collapse to one digit."""
    con = duckdb.connect()
    word = "a" + "b" * 64  # 64 consecutive '1' codes after the head
    (code,) = con.execute(f"SELECT {soundex_sql(repr(word))}").fetchone()
    assert code == soundex_py(word) == "A100"


PH_DOCS = [
    (0, "robert files a merge report"),
    (1, "rupert reviews the merge queue"),
    (2, "roberta signs off"),           # R163 too (trailing A is a 0-code)
    (3, "plain row scan only"),
    (4, "robert and rupert disagree"),
    (5, "merge merge merge"),
]


@pytest.fixture(scope="module")
def ph_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("phonetic") / "idx")
    build_index(
        spark,
        spark.createDataFrame(PH_DOCS, "doc_id long, text string"),
        root, doc_col="doc_id", n_shards=2,
    )
    return Searcher(spark, root)


def test_expand_terms_phonetic(ph_index):
    # 'report' is R163 too (E,O are 0-codes, so the consonant skeleton
    # R-P-R-T matches R-B-R-T: B and P share code 1)
    assert set(ph_index.expand_terms(phonetic="robert")) == {
        "robert", "rupert", "roberta", "report"}
    assert set(ph_index.expand_terms(phonetic="mirj")) == {"merge"}
    assert ph_index.expand_terms(phonetic="12345") == []
    # cap law: top max_expansions by (df desc, term asc) — robert df=2
    # and rupert df=2 beat the df=1 terms
    assert set(ph_index.expand_terms(phonetic="robert", max_expansions=2)) == {
        "robert", "rupert"}


def test_search_phonetic_is_or_over_expansion(ph_index):
    got = [(r["doc"], r["score"]) for r in ph_index.search_phonetic("robert", k=10).collect()]
    want = [(r["doc"], r["score"])
            for r in ph_index.search(["robert", "rupert", "roberta", "report"],
                                     k=10, mode="or").collect()]
    assert got == want
    assert {d for d, _ in got} == {0, 1, 2, 4}


def test_search_phonetic_no_letters_empty(ph_index):
    assert ph_index.search_phonetic("0'-", k=10).count() == 0
