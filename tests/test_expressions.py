"""Lucene expressions-module analogue: parser, both walkers, and the
search_expression rescoring surface. The key invariant is that the
Catalyst walker and the SQL walker of the SAME AST agree numerically —
that equivalence is what makes the driver-gate twin trustworthy."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fdblucene_spark.functions import expressions as ex
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

WORDS = ["alpha", "beta", "gamma", "delta", "merge"]


def test_parse_precedence():
    # 1 + 2 * 3 == 7, not 9
    ast = ex.parse("1 + 2 * 3")
    assert ast == ("bin", "+", ("num", "1"), ("bin", "*", ("num", "2"), ("num", "3")))
    # ternary binds loosest and right-associates
    ast = ex.parse("a > 1 ? 2 : b ? 3 : 4")
    assert ast[0] == "ter" and ast[3][0] == "ter"


def test_parse_errors():
    for bad in ["1 +", "foo(", "nosuchfn(1)", "pow(1)", "1 2", "(1", "@"]:
        with pytest.raises(ex.ExpressionError):
            ex.parse(bad)


def test_variables_collected():
    ast = ex.parse("_score * ln(1 + n_chars) + (rank > 2 ? pop : 0)")
    assert ex.variables(ast) == ["_score", "n_chars", "pop", "rank"]


EXPRS = [
    "2 * x + y / 4 - 1",
    "x % 7",
    "-x + !y",
    "ln(1 + x) * sqrt(y + 0.5)",
    "pow(x, 2) + log10(y + 1) + log2(y + 1) + exp(0 - x / 50)",
    "min(x, y) + max(x, y) + abs(x - y) + ceil(x / 3) + floor(y / 3)",
    "x > 10 ? y : 0 - y",
    "(x >= 5 && y < 20) || x == 12 ? 1 : x != y ? 2 : 3",
    "x <= y ? ln(y + 1) : sqrt(x)",
]


def test_walkers_agree_on_duckdb(spark):
    """Evaluate every expression both ways over the same frame: the
    Catalyst Column on a Spark DF and the generated SQL via DuckDB."""
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "i": np.arange(200),
        "x": rng.integers(0, 40, 200).astype("float64"),
        "y": rng.integers(0, 40, 200).astype("float64"),
    })
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("t", pdf)
    for src in EXPRS:
        ast = ex.parse(src)
        col = ex.to_column(ast, {"x": F.col("x"), "y": F.col("y")})
        got = {
            int(r["i"]): float(r["v"])
            for r in sdf.select("i", col.alias("v")).collect()
        }
        sql = ex.to_sql(ast, {"x": "x", "y": "y"})
        want = dict(con.execute(f"SELECT i, {sql} FROM t").fetchall())
        assert got.keys() == want.keys()
        for i in got:
            assert got[i] == pytest.approx(want[i], rel=1e-12, abs=1e-12), (src, i)


def test_unbound_variable_raises():
    ast = ex.parse("x + z")
    with pytest.raises(ex.ExpressionError):
        ex.to_column(ast, {"x": F.lit(1.0)})
    with pytest.raises(ex.ExpressionError):
        ex.to_sql(ast, {"x": "x"})


@pytest.fixture(scope="module")
def expr_index(spark, tmp_path_factory):
    rng = np.random.default_rng(23)
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(WORDS, size=int(rng.integers(3, 14)))),
            "n_chars": int(rng.integers(40, 400)),
            "pop": int(rng.integers(0, 100)),
        }
        for i in range(300)
    ]
    root = str(tmp_path_factory.mktemp("exprs") / "idx")
    build_index(
        spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=4,
        stored_fields={"n_chars": "n_chars", "pop": "pop"},
    )
    return rows, root


def test_search_expression_matches_manual(spark, expr_index):
    rows, root = expr_index
    s = Searcher(spark, root)
    expr = "_score * ln(1 + n_chars) + (pop > 50 ? 10 : 0)"
    hits = s.search_expression(["alpha", "merge"], expr, k=15, mode="or")
    got = [(int(r["doc"]), float(r["score"]), float(r["raw_score"]))
           for r in hits.collect()]
    # recompute from the engine's own raw relevance + the source rows
    base = {
        int(r["doc"]): float(r["score"])
        for r in s.search(["alpha", "merge"], k=10_000, mode="or").collect()
    }
    byid = {r["doc_id"]: r for r in rows}
    want = sorted(
        (
            (d, sc * np.log1p(byid[d]["n_chars"])
             + (10.0 if byid[d]["pop"] > 50 else 0.0), sc)
            for d, sc in base.items()
        ),
        key=lambda t: (-t[1], t[0]),
    )[:15]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], rel=1e-9)
        assert g[2] == pytest.approx(w[2], rel=1e-6)


def test_search_expression_bindings_and_missing(spark, expr_index):
    rows, root = expr_index
    s = Searcher(spark, root)
    # bind variable `length` to the stored field n_chars
    hits = s.search_expression(
        ["beta"], "_score + length / 1000", k=5,
        bindings={"length": "n_chars"},
    )
    assert hits.count() == 5
    # unknown stored field -> clear error
    with pytest.raises(ValueError, match="not stored"):
        s.search_expression(["beta"], "_score + nope", k=5)


def test_search_expression_score_only_no_join(spark, expr_index):
    _, root = expr_index
    s = Searcher(spark, root)
    hits = s.search_expression(["gamma"], "sqrt(_score) * 2", k=8)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    # no stored-table join when the expression references only _score
    assert "stored" not in plan.lower()
    base = s.search(["gamma"], k=8, mode="or").collect()
    got = hits.collect()
    assert [r["doc"] for r in got] == [r["doc"] for r in base]
    for g, b in zip(got, base):
        assert float(g["score"]) == pytest.approx(
            2.0 * float(b["score"]) ** 0.5, rel=1e-9
        )
