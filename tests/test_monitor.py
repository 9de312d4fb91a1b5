"""Monitor / percolator (reverse search): register queries, stream
documents through them. Parity target: Lucene's lucene/monitor module
(Monitor.register + Monitor.match) which ships with the Lucene 8.1
distribution the reference depends on (reference: pom.xml:35-39).

Contracts under test: boolean match semantics (must/should+msm/
must_not), phrase verify (consecutive-run, not bag-of-words),
implicit msm=1 for pure-should queries, pure-negative rejection,
JVM-vs-Arrow tokenizer parity, plan shape (broadcast presearcher
join, no row-wise Python), and foreachBatch streaming use.
"""

import pytest
from pyspark.sql import functions as F

from fdblucene_spark.operators.monitor import (
    compile_queries,
    match_queries,
    match_queries_oracle,
)
from fdblucene_spark.plans.explain import assert_no_rowwise_python, physical_plan

DOCS = [
    (0, "alpha beta gamma delta"),
    (1, "alpha gamma beta"),          # phrase 'beta gamma' broken
    (2, "beta gamma epsilon"),
    (3, "alpha alpha zeta"),
    (4, "delta epsilon"),
    (5, "alpha beta gamma"),
    (6, ""),                          # empty doc matches nothing
    (7, "zeta eta theta alpha"),
]

QUERIES = [
    {"query_id": "q_and", "must": ["alpha", "beta"]},
    {"query_id": "q_or", "should": ["epsilon", "zeta"]},          # implicit msm=1
    {"query_id": "q_msm2", "should": ["alpha", "beta", "delta"], "msm": 2},
    {"query_id": "q_not", "must": ["gamma"], "must_not": ["delta"]},
    {"query_id": "q_phrase", "phrase": ["beta", "gamma"]},
    {"query_id": "q_mix", "must": ["alpha"], "should": ["eta", "epsilon"],
     "msm": 1, "must_not": ["beta"]},
]

# hand-derived truth (independent of compile_queries)
EXPECTED = {
    (0, "q_and"), (1, "q_and"), (5, "q_and"),
    (2, "q_or"), (3, "q_or"), (4, "q_or"), (7, "q_or"),
    (0, "q_msm2"), (1, "q_msm2"), (5, "q_msm2"),
    (1, "q_not"), (2, "q_not"), (5, "q_not"),
    (0, "q_phrase"), (2, "q_phrase"), (5, "q_phrase"),
    (7, "q_mix"),
}


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_match_queries_hand_oracle(spark):
    got = {
        (r["doc_id"], r["query_id"])
        for r in match_queries(_df(spark), QUERIES).collect()
    }
    assert got == EXPECTED
    # the pure-Python twin agrees (it is the pytest oracle elsewhere)
    assert match_queries_oracle(DOCS, QUERIES) == EXPECTED


def test_ascii_fast_parity(spark):
    a = match_queries(_df(spark), QUERIES, ascii_fast=True)
    got = {(r["doc_id"], r["query_id"]) for r in a.collect()}
    assert got == EXPECTED
    # ascii path is pure JVM: no python eval at all in the plan
    plan = physical_plan(a)
    assert "ArrowEval" not in plan and "BatchEvalPython" not in plan


def test_plan_shape(spark):
    df = match_queries(_df(spark), QUERIES)
    assert_no_rowwise_python(df)
    plan = physical_plan(df)
    # the presearcher must be a broadcast join (registry side), never
    # a shuffle of the corpus against the registry
    assert "BroadcastHashJoin" in plan


def test_validation():
    with pytest.raises(ValueError, match="pure-negative"):
        compile_queries([{"query_id": "bad", "must_not": ["x"]}])
    with pytest.raises(ValueError, match="duplicate"):
        compile_queries([{"query_id": "d", "must": ["a"]},
                         {"query_id": "d", "must": ["b"]}])
    with pytest.raises(ValueError, match="msm"):
        compile_queries([{"query_id": "m", "should": ["a"], "msm": 2}])
    with pytest.raises(ValueError, match="phrase"):
        compile_queries([{"query_id": "p", "phrase": ["solo"]}])


def test_phrase_needs_consecutive_run(spark):
    # all phrase terms present but never adjacent -> no match
    docs = [(0, "beta x gamma"), (1, "gamma beta"), (2, "x beta gamma y")]
    qs = [{"query_id": "p", "phrase": ["beta", "gamma"]}]
    got = {(r["doc_id"], r["query_id"])
           for r in match_queries(
               spark.createDataFrame(docs, "doc_id long, text string"), qs
           ).collect()}
    assert got == {(2, "p")}


def test_streaming_foreach_batch(spark, tmp_path):
    """The percolator is stateless + stream-static safe: tag each
    micro-batch inside foreachBatch, exactly the monitor's alerting
    loop."""
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    out: list[tuple] = []

    def tag(batch_df, batch_id):
        out.extend(
            (r["doc_id"], r["query_id"])
            for r in match_queries(batch_df, QUERIES).collect()
        )

    spark.createDataFrame(DOCS[:4], "doc_id long, text string") \
        .write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
        .writeStream.foreachBatch(tag)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    stream.awaitTermination(120)
    assert set(out) == {(d, q) for d, q in EXPECTED if d < 4}
