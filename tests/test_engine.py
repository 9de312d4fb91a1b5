"""End-to-end rank-identity suite (the golden search test).

Mirrors the reference's end-to-end shape — index, search, assert hits
and stored fields (SimpleFDBDirectoryTest.java:144-159) — scaled to
the full reference query set with a Lucene-8-faithful oracle referee
(SURVEY.md section 5.3)."""

import numpy as np
import pytest

from fdblucene_spark import oracle
from fdblucene_spark.data import synth
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher
from fdblucene_spark.plans.explain import assert_no_rowwise_python

N_CONVS = 150


@pytest.fixture(scope="module")
def corpus_pdf():
    return synth.transcripts_pandas(N_CONVS).sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )


@pytest.fixture(scope="module")
def oracle_index(corpus_pdf):
    return oracle.build_oracle_index(list(range(len(corpus_pdf))), corpus_pdf["text"].tolist())


@pytest.fixture(scope="module")
def built(spark, corpus_pdf, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx"))
    df = synth.transcripts(spark, n_convs=N_CONVS)
    manifest = build_index(
        spark, df, root, key_cols=["conv_id", "turn_idx"], n_shards=8, fingerprint="t-engine"
    )
    return root, manifest


def test_corpus_stats_match_oracle(built, oracle_index):
    _, m = built
    assert m.n_docs == oracle_index.n_docs
    assert m.sum_dl == oracle_index.sum_ttf
    assert abs(m.avgdl - oracle_index.avgdl) < 1e-12
    assert m.n_postings == oracle_index.sum_df


def test_docids_dense_and_deterministic(spark, built, corpus_pdf):
    # per-turn text equality under stable (conv_id, turn_idx) ordering —
    # the per-row invariant of BASELINE.json input_hint
    from fdblucene_spark.operators.build import assign_dense_doc_ids

    df = synth.transcripts(spark, n_convs=N_CONVS)
    ids = (
        assign_dense_doc_ids(df, ["conv_id", "turn_idx"])
        .select("doc", "conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values("doc", ignore_index=True)
    )
    assert np.array_equal(ids["doc"].to_numpy(), np.arange(len(corpus_pdf)))
    assert ids["conv_id"].tolist() == corpus_pdf["conv_id"].tolist()
    assert ids["turn_idx"].tolist() == corpus_pdf["turn_idx"].tolist()
    assert ids["text"].tolist() == corpus_pdf["text"].tolist()


def test_rank_identity_full_query_set(spark, built, oracle_index):
    root, _ = built
    s = Searcher(spark, root)
    qs = synth.reference_queries(50)
    batch = s.search_batch(qs.to_dict("records")).toPandas()
    for _, q in qs.iterrows():
        exp = oracle.search(oracle_index, q["terms"], q["k"], q["mode"])
        sub = batch[batch["query_id"] == q["query_id"]]
        got = list(zip(sub["doc"].tolist(), sub["score"].tolist()))
        assert [d for d, _ in exp] == [d for d, _ in got], (
            q["query_id"], q["mode"], exp[:3], got[:3],
        )
        assert all(abs(a - b) < 1e-6 for (_, a), (_, b) in zip(exp, got)), q["query_id"]


def test_single_search_matches_batch(spark, built, oracle_index):
    root, _ = built
    s = Searcher(spark, root)
    exp = oracle.search(oracle_index, ["term00010", "term00333"], 10)
    got = [(r["doc"], r["score"]) for r in s.search(["term00010", "term00333"], 10).collect()]
    assert [d for d, _ in exp] == [d for d, _ in got]


def test_needle_queries(spark, built, oracle_index, corpus_pdf):
    root, _ = built
    s = Searcher(spark, root)
    locs = [x for x in synth.needle_locations(N_CONVS)]
    assert locs, "fixture must plant needles"
    by_term: dict[str, list] = {}
    for conv, turn, term in locs:
        by_term.setdefault(term, []).append((conv, turn))
    key = list(zip(corpus_pdf["conv_id"], corpus_pdf["turn_idx"]))
    for term, places in by_term.items():
        hits = s.search([term], k=1000).toPandas()
        got_keys = {key[int(d)] for d in hits["doc"]}
        # a plant only exists if the conversation had enough turns
        want = {p for p in places if p in set(key)}
        assert got_keys == want, term


def test_and_is_intersection_of_or(spark, built, oracle_index):
    root, _ = built
    s = Searcher(spark, root)
    terms = ["term00004", "term00021"]
    n = oracle_index.n_docs
    and_docs = {r["doc"] for r in s.search(terms, n, "and").collect()}
    a = {r["doc"] for r in s.search([terms[0]], n).collect()}
    b = {r["doc"] for r in s.search([terms[1]], n).collect()}
    assert and_docs == (a & b)


def test_phrase_positive_case(spark, tmp_path_factory):
    # plant an exact phrase and a decoy with the words out of order
    import pandas as pd

    root = str(tmp_path_factory.mktemp("idx-phrase"))
    rows = pd.DataFrame(
        {
            "doc": [0, 1, 2],
            "text": [
                "alpha beta gamma needle phrase target end",
                "phrase target needle decoy",
                "needle gamma phrase",
            ],
        }
    )
    df = spark.createDataFrame(rows)
    build_index(spark, df, root, doc_col="doc", n_shards=2)
    s = Searcher(spark, root)
    hits = s.search(["needle", "phrase"], 10, mode="phrase").toPandas()
    assert hits["doc"].tolist() == [0]  # only doc0 has "needle phrase" adjacent


def test_search_local_matches_distributed(spark, built):
    root, _ = built
    s = Searcher(spark, root)
    for terms, mode in [
        (["term00000", "term00042"], "or"),
        (["term00003", "term00015"], "and"),
        (["needlealpha"], "or"),
    ]:
        dist = s.search(terms, 25, mode).toPandas()
        loc = s.search_local(terms, 25, mode)
        assert dist["doc"].tolist() == loc["doc"].tolist(), (terms, mode)
        assert (abs(dist["score"] - loc["score"]) < 1e-6).all()


def test_count_total_hits(spark, built, oracle_index):
    root, _ = built
    s = Searcher(spark, root)
    for terms, mode in [(["term00000"], "or"), (["term00008", "term00017"], "and")]:
        assert s.count(terms, mode) == oracle.count_matches(oracle_index, terms, mode)


def test_fetch_stored_fields(spark, built, corpus_pdf):
    root, _ = built
    s = Searcher(spark, root)
    from fdblucene_spark.operators.build import assign_dense_doc_ids

    base = assign_dense_doc_ids(
        synth.transcripts(spark, n_convs=N_CONVS), ["conv_id", "turn_idx"]
    )
    hits = s.search(["needlealpha"], 5)
    fetched = s.fetch(hits, base, "doc").select("conv_id", "turn_idx", "text", "score").toPandas()
    assert len(fetched) > 0
    for _, r in fetched.iterrows():
        src = corpus_pdf[
            (corpus_pdf["conv_id"] == r["conv_id"]) & (corpus_pdf["turn_idx"] == r["turn_idx"])
        ]["text"].iloc[0]
        assert src == r["text"]  # per-turn text equality invariant


def test_must_not_clause(spark, built, oracle_index):
    root, _ = built
    s = Searcher(spark, root)
    terms, nots = ["term00004", "term00021"], ["term00000"]
    exp = oracle.search(oracle_index, terms, 50, "or", not_terms=nots)
    got = [(r["doc"], r["score"]) for r in s.search(terms, 50, not_terms=nots).collect()]
    assert [d for d, _ in exp] == [d for d, _ in got]
    # local path agrees too
    loc = s.search_local(terms, 50, not_terms=nots)
    assert loc["doc"].tolist() == [d for d, _ in got]
    # excluded docs truly absent
    with_t0 = {r["doc"] for r in s.search(nots, 10**6).collect()}
    assert not with_t0 & {d for d, _ in got}


def test_hot_term_salted_across_shards(spark, built):
    # Zipf head term (>20% of turns) must be split across all shards —
    # the north-rule skew handling is structural, not incidental
    root, m = built
    postings = spark.read.parquet(*m.segments and [f"{root}/{m.segments[0].path}/postings"])
    from pyspark.sql import functions as F

    shards = (
        postings.filter(F.col("term") == "term00000")
        .select("shard").distinct().count()
    )
    assert shards == m.n_shards


def test_small_blocks_rank_identity(spark, oracle_index, tmp_path_factory):
    # block_size=8 forces dozens of blocks per posting list: exercises
    # block-max pruning, block boundaries, and multi-block decode hard
    root = str(tmp_path_factory.mktemp("idx-b8"))
    df = synth.transcripts(spark, n_convs=N_CONVS)
    build_index(
        spark, df, root, key_cols=["conv_id", "turn_idx"], n_shards=4, block_size=8
    )
    s = Searcher(spark, root)
    qs = synth.reference_queries(20)
    batch = s.search_batch(qs.to_dict("records")).toPandas()
    for _, q in qs.iterrows():
        exp = oracle.search(oracle_index, q["terms"], q["k"], q["mode"])
        sub = batch[batch["query_id"] == q["query_id"]]
        assert [d for d, _ in exp] == sub["doc"].tolist(), (q["query_id"], q["mode"])


def test_positions_off_phrase_errors(spark, tmp_path_factory):
    import pandas as pd

    root = str(tmp_path_factory.mktemp("idx-nopos"))
    df = spark.createDataFrame(pd.DataFrame({"doc": [0], "text": ["a b c"]}))
    build_index(spark, df, root, doc_col="doc", n_shards=1, store_positions=False)
    s = Searcher(spark, root)
    assert s.search(["a", "b"], 5, mode="and").count() == 1  # AND fine
    with pytest.raises(ValueError, match="positions"):
        s.search(["a", "b"], 5, mode="phrase")


def test_no_rowwise_python_anywhere(spark, built):
    root, _ = built
    s = Searcher(spark, root)
    assert_no_rowwise_python(s.search(["term00001"], 5))
    from fdblucene_spark.operators.build import build_postings

    df = synth.transcripts(spark, n_convs=5)
    from fdblucene_spark.operators.build import assign_dense_doc_ids

    docs = assign_dense_doc_ids(df, ["conv_id", "turn_idx"]).select("doc", "text")
    blocks, termdict, doclen, inverted = build_postings(docs, n_shards=2)
    for d in (blocks, termdict, doclen):
        assert_no_rowwise_python(d)


def test_pruning_rank_identity_selective_broad_small_k(spark, tmp_path_factory):
    """Rank identity UNDER HEAVY PRUNING: the selective+broad shape
    (rare needle beside two head terms) at small k is where the
    doc-level bound prunes ~95% of blocks — the result must still be
    identical to the exhaustive referee, and the profile counter must
    confirm pruning actually fired (safe-but-inert bounds are a known
    failure mode)."""
    rng = np.random.default_rng(41)
    n = 4000
    rows = []
    texts = []
    for i in range(n):
        toks = ["head1" if rng.random() < 0.6 else "h1x",
                "head2" if rng.random() < 0.5 else "h2x"]
        toks += [f"f{int(rng.integers(0, 50))}" for _ in range(int(rng.integers(5, 15)))]
        if rng.random() < 0.01:  # random spread: every SHARD gets needles
            toks.append("needle")
        rng.shuffle(toks)
        text = " ".join(toks)
        rows.append({"doc_id": i, "text": text})
        texts.append(text)
    root = str(tmp_path_factory.mktemp("prune") / "idx")
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=2,
                block_size=16)  # many small blocks so chunked theta pruning can fire
    s = Searcher(spark, root)
    oidx = oracle.build_oracle_index(list(range(n)), texts)
    for k in (3, 5, 10):
        exp = oracle.search(oidx, ["needle", "head1", "head2"], k, "or")
        got = [(r["doc"], r["score"])
               for r in s.search(["needle", "head1", "head2"], k, mode="or").collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], f"k={k} rank mismatch"
        np.testing.assert_array_equal(
            np.array([x for _, x in got], dtype=np.float32),
            np.array([x for _, x in exp], dtype=np.float32),
            err_msg=f"k={k} score mismatch",
        )
    prof = s.profile_local(["needle", "head1", "head2"], k=5, mode="or")
    frac = prof["blocks_pruned"] / max(prof["blocks_total"], 1)
    assert frac > 0.5, f"pruning inert: only {frac:.0%} pruned ({prof})"


def test_doclen_lead_flag_matches_groupby(spark):
    """The map-only doclen (lead-flag filter) must emit exactly the
    rows the old corpus-shuffle groupBy(field, doc).first() produced —
    one per (field, doc), including dl=0 roster rows."""
    from pyspark.sql import functions as F
    from fdblucene_spark.operators.build import assign_dense_doc_ids, build_postings

    df = synth.transcripts(spark, n_convs=8)
    # plant an empty-text doc to exercise the roster path
    df = df.withColumn(
        "text", F.when(F.col("turn_idx") == 0, F.lit("")).otherwise(F.col("text"))
    )
    docs = assign_dense_doc_ids(df, ["conv_id", "turn_idx"]).select("doc", "text")
    _, _, doclen, inverted = build_postings(docs, n_shards=2)
    got = doclen.toPandas().sort_values(["field", "doc"], ignore_index=True)
    exp = (
        inverted.groupBy("field", "doc")
        .agg(F.first("dl").alias("dl"), F.first("dlq").alias("dlq"))
        .toPandas()
        .sort_values(["field", "doc"], ignore_index=True)
    )
    assert got.equals(exp)
    assert (got.groupby(["field", "doc"]).size() == 1).all()
    assert (got["dl"] == 0).any()  # roster row present
