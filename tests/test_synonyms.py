"""Synonym surface: the `synonym` kernel clause (Lucene SynonymQuery
nested inside BooleanQuery) and the query-time synonym graph
(SynonymGraphFilter rules -> QueryBuilder.analyzeGraphBoolean
compilation -> one composable boolean query).

Rank AND float32-score identity vs the pure-Python referee
(oracle.boolean_search), plus compiler unit laws (greedy maximal
match, equivalence vs explicit rules, clause shapes).
"""

import numpy as np
import pytest

from fdblucene_spark import oracle
from fdblucene_spark.functions.synonyms import (
    expand_graph,
    graph_clauses,
    parse_synonym_rules,
)
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi",
]


def _zipf(n):
    w = 1.0 / np.arange(1, n + 1)
    return w / w.sum()


def _mk_rows(n=220, seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        ln = int(rng.integers(3, 40))
        text = " ".join(rng.choice(WORDS, size=ln, p=_zipf(len(WORDS))))
        rows.append({
            "doc_id": i,
            "text": text,
            "role": ["user", "assistant", "tool"][i % 3],
            "n_chars": len(text),
        })
    return rows


@pytest.fixture(scope="module")
def syn_index(spark, tmp_path_factory):
    rows = _mk_rows()
    root = str(tmp_path_factory.mktemp("syn") / "idx")
    df = spark.createDataFrame(rows)
    build_index(
        spark, df, root, doc_col="doc_id", n_shards=4,
        text_fields={"text": "text"}, keyword_fields={"role": "role"},
        stored_fields={"n_chars": "n_chars"},
    )
    return rows, root


SYN_CASES = [
    # pure synonym disjunction: one blended clause
    ([{"synonym": ["beta", "kappa"], "occur": "should"}], None, None),
    # synonym must + term should
    ([{"synonym": ["alpha", "xi"], "occur": "must"},
      {"term": "gamma", "occur": "should"}], None, None),
    # synonym beside term shoulds with msm
    ([{"synonym": ["zeta", "pi"], "occur": "should"},
      {"term": "alpha", "occur": "should"},
      {"term": "beta", "occur": "should"}], 2, None),
    # synonym filter (matches gate membership, no score)
    ([{"term": "alpha", "occur": "should"},
      {"synonym": ["mu", "nu"], "occur": "filter"}], None, None),
    # synonym must_not excludes
    ([{"term": "alpha", "occur": "must"},
      {"synonym": ["omicron", "xi"], "occur": "must_not"}], None, None),
    # boosted synonym (BoostQuery folds into the blended weight)
    ([{"synonym": ["beta", "gamma"], "occur": "should", "boost": 2.5},
      {"term": "alpha", "occur": "should"}], None, None),
    # synonym with an absent member (df=0 member drops, clause lives)
    ([{"synonym": ["alpha", "notaword"], "occur": "must"}], None, None),
    # synonym with NO present member as should: clause drops
    ([{"synonym": ["nonesuch", "notaword"], "occur": "should"},
      {"term": "alpha", "occur": "should"}], None, None),
    # synonym nested inside a sub-query (graph mixed-group shape)
    ([{"term": "alpha", "occur": "must"},
      {"clauses": [{"synonym": ["beta", "kappa"], "occur": "should"},
                   {"phrase": ["gamma", "delta"], "occur": "should"}],
        "occur": "should", "min_should_match": 1}], None, None),
    # synonym + numeric doc-values range in one query
    ([{"synonym": ["alpha", "lam"], "occur": "should"}],
     None, [{"field": "n_chars", "lo": 40, "hi": 170}]),
]


def test_synonym_clause_rank_identity(spark, syn_index):
    rows, root = syn_index
    s = Searcher(spark, root)
    for i, (clauses, msm, numeric) in enumerate(SYN_CASES):
        exp = oracle.boolean_search(
            rows, "doc_id", clauses, k=30, min_should_match=msm,
            numeric=numeric, keyword_fields=("role",),
        )
        got = [
            (r["doc"], float(np.float32(r["score"])))
            for r in s.search_boolean(
                clauses, k=30, min_should_match=msm, numeric=numeric
            ).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in exp], f"case {i}: rank mismatch"
        np.testing.assert_array_equal(
            np.array([x for _, x in got], dtype=np.float32),
            np.array([x for _, x in exp], dtype=np.float32),
            err_msg=f"case {i}: score mismatch",
        )


def test_synonym_local_matches_distributed(spark, syn_index):
    rows, root = syn_index
    s = Searcher(spark, root)
    clauses = [{"synonym": ["beta", "kappa"], "occur": "should"},
               {"term": "alpha", "occur": "should"}]
    dist = [(r["doc"], float(np.float32(r["score"])))
            for r in s.search_boolean(clauses, k=25).collect()]
    loc = [(int(r.doc), float(np.float32(r.score)))
           for _, r in s.search_boolean_local(clauses, k=25).iterrows()]
    assert dist == loc


def test_synonym_blends_not_sums(spark, syn_index):
    """The defining SynonymQuery property: a doc holding BOTH members
    scores f32(idf(df_max) * tfnorm(tf_a + tf_b)) — strictly different
    from the two-term disjunction sum on that doc."""
    rows, root = syn_index
    s = Searcher(spark, root)
    syn = {r["doc"]: r["score"] for r in s.search_boolean(
        [{"synonym": ["beta", "gamma"], "occur": "should"}], k=220).collect()}
    dis = {r["doc"]: r["score"] for r in s.search_boolean(
        [{"term": "beta", "occur": "should"},
         {"term": "gamma", "occur": "should"}], k=220).collect()}
    both = [d for d in syn
            if d in dis and "beta" in rows[d]["text"].split()
            and "gamma" in rows[d]["text"].split()]
    assert both, "corpus should have docs with both members"
    assert all(abs(syn[d] - dis[d]) > 1e-6 for d in both)
    assert set(syn) == set(dis)  # same match set, different scores


# ---- compiler unit laws ----

def test_parse_rules_equivalence_and_explicit():
    smap = parse_synonym_rules(["usa, united states", "ny => new york"])
    # equivalence: every member maps to ALL members (expand=true)
    assert smap[("usa",)] == {("usa",), ("united", "states")}
    assert smap[("united", "states")] == {("usa",), ("united", "states")}
    # explicit: LHS is REPLACED (does not map to itself)
    assert smap[("ny",)] == {("new", "york")}


def test_parse_rules_merge_and_analyze():
    smap = parse_synonym_rules(["Dup => Duplicate", "dup => copy"])
    assert smap[("dup",)] == {("duplicate",), ("copy",)}
    with pytest.raises(ValueError):
        parse_synonym_rules(["!! => alpha"])


def test_expand_graph_greedy_longest_match():
    smap = parse_synonym_rules(["new york, ny", "york, yorkshire"])
    groups = expand_graph(["new", "york", "pizza"], smap)
    # longest match wins at position 0: 'new york' consumes 2 tokens,
    # so the 'york' rule never fires inside it
    assert groups == [sorted({("new", "york"), ("ny",)}), [("pizza",)]]


def test_graph_clauses_shapes():
    groups = [
        [("alpha",)],                              # plain term
        [("beta",), ("kappa",)],                   # all-single-token
        [("gamma", "delta")],                      # single multi-token path
        [("mu",), ("nu", "xi")],                   # mixed
    ]
    cl = graph_clauses(groups, "text", "must")
    assert cl[0] == {"term": "alpha", "occur": "must", "field": "text"}
    assert cl[1] == {"synonym": ["beta", "kappa"], "occur": "must", "field": "text"}
    assert cl[2] == {"phrase": ["gamma", "delta"], "occur": "must", "field": "text"}
    assert cl[3]["occur"] == "must" and cl[3]["min_should_match"] == 1
    assert {"term": "mu", "occur": "should", "field": "text"} in cl[3]["clauses"]
    assert {"phrase": ["nu", "xi"], "occur": "should", "field": "text"} in cl[3]["clauses"]


def test_search_graph_end_to_end(spark, syn_index):
    """search_graph == search_boolean over the compiled clauses ==
    the referee over the same clauses (rank + f32 score identity)."""
    rows, root = syn_index
    s = Searcher(spark, root)
    rules = ["beta, kappa", "gamma delta => epsilon"]
    smap = parse_synonym_rules(rules)
    for query, op in [("alpha beta", "or"), ("alpha beta", "and"),
                      ("gamma delta zeta", "or")]:
        toks = query.split()
        clauses = graph_clauses(
            expand_graph(toks, smap), "text",
            "must" if op == "and" else "should")
        exp = oracle.boolean_search(rows, "doc_id", clauses, k=20,
                                    keyword_fields=("role",))
        got = [(r["doc"], float(np.float32(r["score"])))
               for r in s.search_graph(query, rules, k=20, operator=op).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], (query, op)
        np.testing.assert_array_equal(
            np.array([x for _, x in got], dtype=np.float32),
            np.array([x for _, x in exp], dtype=np.float32))


def test_search_graph_multiword_rule_consumes_tokens(spark, syn_index):
    """A multi-token rule input consumes BOTH query tokens: the graph
    for 'gamma delta' under 'gamma delta => epsilon' is one group
    (term epsilon), not two groups."""
    rows, root = syn_index
    s = Searcher(spark, root)
    got = [(r["doc"], float(np.float32(r["score"])))
           for r in s.search_graph(
               "gamma delta", ["gamma delta => epsilon"], k=15).collect()]
    exp = oracle.boolean_search(
        rows, "doc_id", [{"term": "epsilon", "occur": "should", "field": "text"}],
        k=15, keyword_fields=("role",))
    assert got == [(d, float(np.float32(x))) for d, x in exp]
