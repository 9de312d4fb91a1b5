"""Curation operators: decontamination, paragraph dedup, sampling.

Oracles are hand-computed / pure-Python replicas (md5 decisions are
recomputed with hashlib, so the determinism contract is pinned
outside Spark too).
"""

import hashlib
import math

import numpy as np

import pytest

from fdblucene_spark.operators import curation


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        # doc 0 is the "benchmark": its 8-grams are the contamination set
        (0, "one two three four five six seven eight nine ten"),
        # doc 1 copies an 8-gram window from doc 0 -> contaminated
        (1, "xx one two three four five six seven eight yy zz"),
        # doc 2 shares only a 7-gram -> clean at n=8
        (2, "one two three four five six seven XX eight nine"),
        (3, "totally unrelated words live here in this row padded long"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_any_overlap(spark, docs_df):
    bench = docs_df.filter("doc_id = 0")
    grams = curation.benchmark_ngrams(bench, "text", n=8)
    out = (
        curation.decontaminate(docs_df, grams, "doc_id", "text", n=8)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[0, "contaminated"])  # self-hit
    assert bool(out.loc[1, "contaminated"])
    assert not bool(out.loc[2, "contaminated"])
    assert not bool(out.loc[3, "contaminated"])
    # doc 1: tokens = 11 -> 4 distinct 8-grams, exactly 1 hit
    assert int(out.loc[1, "n_grams"]) == 4
    assert int(out.loc[1, "n_hits"]) == 1
    assert float(out.loc[1, "hit_frac"]) == 0.25


def test_decontaminate_shuffle_join_path(spark, docs_df):
    bench = docs_df.filter("doc_id = 0")
    grams = curation.benchmark_ngrams(bench, "text", n=8)
    a = (
        curation.decontaminate(docs_df, grams, "doc_id", "text", n=8, broadcast=False)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        curation.decontaminate(docs_df, grams, "doc_id", "text", n=8)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_paragraph_dedup_keeps_first_occurrence(spark):
    rows = [
        (0, "Unique opening line. All rights reserved. Body zero"),
        (1, "All rights reserved. Body one text"),
        (2, "Body two here. all RIGHTS  reserved"),  # normalization: NOT equal (double space)
        (3, "All rights reserved. All rights reserved"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        curation.paragraph_dedup(df, "doc_id", "text")
        .toPandas().set_index("doc_id").sort_index()
    )
    # 'all rights reserved' occurrences: docs 0(pos1), 1(pos0), 3(pos0), 3(pos1)
    # keeper = (0, 1); everything else drops
    assert out.loc[0, "text_clean"] == "Unique opening line. All rights reserved. Body zero"
    assert int(out.loc[0, "n_dropped"]) == 0
    assert out.loc[1, "text_clean"] == "Body one text"
    assert int(out.loc[1, "n_dropped"]) == 1
    # doc 2's variant normalizes differently (double space survives trim only at ends)
    assert int(out.loc[2, "n_dropped"]) == 0
    assert out.loc[3, "text_clean"] == ""
    assert int(out.loc[3, "n_dropped"]) == 2


def test_paragraph_dedup_min_count(spark):
    rows = [(0, "shared line. own zero"), (1, "shared line. own one")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        curation.paragraph_dedup(df, "doc_id", "text", min_count=3)
        .toPandas().set_index("doc_id")
    )
    assert int(out["n_dropped"].sum()) == 0  # below the floor, nothing drops


def test_curation_plans(spark, docs_df):
    """Plan contracts: all three operators are pure Catalyst (no
    row-wise Python anywhere), and decontaminate's benchmark side is a
    broadcast exchange (the corpus-side explode must never shuffle to
    meet the reference grams)."""
    from fdblucene_spark.plans.explain import assert_no_rowwise_python, physical_plan

    bench = docs_df.filter("doc_id = 0")
    grams = curation.benchmark_ngrams(bench, "text", n=8)
    dec = curation.decontaminate(docs_df, grams, "doc_id", "text", n=8)
    assert_no_rowwise_python(dec)
    assert "BroadcastHashJoin" in physical_plan(dec) or "BroadcastNestedLoop" in physical_plan(dec)
    pd_df = curation.paragraph_dedup(docs_df, "doc_id", "text")
    assert_no_rowwise_python(pd_df)
    samp = curation.stratified_sample(docs_df.withColumn("source", docs_df.doc_id % 2), "doc_id", "source", {"0": 0.5})
    assert_no_rowwise_python(samp)
    # sampling is a pure filter: no Exchange in its plan at all
    assert "Exchange" not in physical_plan(samp)


def _u(salt, doc_id):
    h = hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) / 16**8


def test_plan_mixture_rates(spark):
    rows = [(i, ["a", "b", "c"][i % 3], 100) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    # totals: a=1000, b=1000, c=1000; weights 3:1 at budget 2000 ->
    # target a=1500 (rate 1.0... no: 1500/1000 saturates), b=500 (0.5)
    rates = curation.plan_mixture(df, "source", "n", {"a": 3.0, "b": 1.0}, 2000.0)
    assert rates["a"] == 1.0  # saturates: can't upsample by dropping
    assert rates["b"] == ((2000.0 * 1.0) / 4.0) / 1000.0
    assert "c" not in rates  # unweighted stratum excluded
    # unknown stratum in weights: silently absent from rates
    rates2 = curation.plan_mixture(df, "source", "n", {"zz": 1.0}, 100.0)
    assert rates2 == {}
    with pytest.raises(ValueError):
        curation.plan_mixture(df, "source", "n", {"a": 0.0}, 100.0)


def test_stratified_sample_deterministic_and_exact(spark):
    rows = [(i, ["a", "b"][i % 2]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"a": 0.7, "b": 0.2}
    got = sorted(
        r["doc_id"]
        for r in curation.stratified_sample(df, "doc_id", "source", rates).collect()
    )
    want = sorted(
        i for i, s in rows if _u("v1", i) < rates[s]
    )
    assert got == want
    # rerun: bit-identical
    got2 = sorted(
        r["doc_id"]
        for r in curation.stratified_sample(df, "doc_id", "source", rates).collect()
    )
    assert got2 == got
    # default rate drops unknown strata entirely
    df2 = spark.createDataFrame([(1, "zz")], "doc_id long, source string")
    assert curation.stratified_sample(df2, "doc_id", "source", rates).count() == 0


def test_rrf_fuse_hand_oracle(spark):
    from fdblucene_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], "id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (4, 0.8), (1, 0.7)], "id long, cosine double"
    )
    got = rrf_fuse([(a, "id", "score"), (b, "id", "cosine")], k=4, k0=60).toPandas()
    want = {
        1: 1 / 61 + 1 / 63,
        2: 1 / 62,
        3: 1 / 63 + 1 / 61,
        4: 1 / 62,
    }
    rows = sorted(want.items(), key=lambda t: (-t[1], t[0]))
    assert [int(i) for i in got["id"]] == [i for i, _ in rows]
    for g, (_, w) in zip(got["rrf"], rows):
        assert abs(g - w) < 1e-15
    # ties (docs 1&3, and 2&4) broke by id asc
    assert [int(i) for i in got["id"]][:2] == [1, 3]


def test_duplicated_spans(spark):
    rows = [
        (0, "a0 b0 c d e f g0 h0"),          # shares c d e f (pos 2..5)
        (1, "x1 y1 c d e f z1 w1"),           # same window at pos 2..5
        (2, "p2 c d e f q2 r2 s2 t2"),        # at pos 1..4
        (3, "m n o p q r uniq3 uniq3b"),      # 6-token run shared with 4
        (4, "zz4 m n o p q r yy4"),           # -> two windows merge: span of 6
        (5, "short doc"),                      # < n tokens: no output
        (6, "all words unique here nothing duplicated at all6"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.duplicated_spans(df, "doc_id", "text", n=4)
    got = {
        (int(r["doc_id"]), int(r["span_start"]), int(r["span_end"]), int(r["span_tokens"]))
        for r in out.collect()
    }
    want = {
        (0, 2, 5, 4),
        (1, 2, 5, 4),
        (2, 1, 4, 4),
        (3, 0, 5, 6),   # windows at pos 0,1,2 merge -> tokens 0..5
        (4, 1, 6, 6),
    }
    assert got == want


def test_duplicated_spans_min_doc_freq(spark):
    # within-doc repetition alone does NOT count (distinct-doc df)
    rows = [(0, "r s t u r s t u"), (1, "all different words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert curation.duplicated_spans(df, "doc_id", "text", n=4).count() == 0
    # min_doc_freq=1 degenerates to every window (self-duplicates)
    assert curation.duplicated_spans(df, "doc_id", "text", n=4, min_doc_freq=1).count() == 2


def test_remove_spans_composes_with_duplicated_spans(spark):
    rows = [
        (0, "a0 b0 c d e f g0 h0"),
        (1, "x1 y1 c d e f z1 w1"),
        (2, "only unique tokens here today friends"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = curation.duplicated_spans(df, "doc_id", "text", n=4)
    out = (
        curation.remove_spans(df, spans, "doc_id", "text")
        .toPandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0, "text_clean"] == "a0 b0 g0 h0"
    assert int(out.loc[0, "n_tokens_removed"]) == 4
    assert out.loc[1, "text_clean"] == "x1 y1 z1 w1"
    assert out.loc[2, "text_clean"] == "only unique tokens here today friends"
    assert int(out.loc[2, "n_tokens_removed"]) == 0
    # keeper policy: exclude doc 0's span from the cut -> doc 0 keeps it
    keep_first = spans.filter("doc_id <> 0")
    out2 = (
        curation.remove_spans(df, keep_first, "doc_id", "text")
        .toPandas().set_index("doc_id")
    )
    assert out2.loc[0, "text_clean"] == "a0 b0 c d e f g0 h0"
    assert out2.loc[1, "text_clean"] == "x1 y1 z1 w1"


def test_pack_sequences_laws(spark, tmp_path_factory):
    """Concat-and-chunk packing: contiguity (next offset = previous
    offset + contribution), chunk spans match the hand formula,
    empty docs contribute only the separator, and the scan-based
    offsets are invariant to the partition count."""
    rows = [
        (0, "a b c d e"),            # 5 tokens
        (1, ""),                     # 0 tokens (separator only)
        (2, "x " * 300),             # 300 tokens -> spans chunks
        (3, "one two three"),
        (4, "z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    S = 64
    got = (
        curation.pack_sequences(
            df, "doc_id", "text", seq_len=S, sep_tokens=1, num_partitions=3,
            freeze_dir=str(tmp_path_factory.mktemp("pk") / "f"),
        )
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(got["n_tokens"]) == [5, 0, 300, 3, 1]
    # contiguity in id order
    off = 0
    for _, r in got.iterrows():
        assert r["tok_start"] == off
        assert r["chunk_first"] == off // S
        assert r["chunk_last"] == (off + r["n_tokens"] + 1 - 1) // S
        off += r["n_tokens"] + 1
    # doc 2 spans multiple chunks
    assert got.loc[2, "chunk_last"] > got.loc[2, "chunk_first"]
    # partition-count invariance
    got1 = (
        curation.pack_sequences(
            df, "doc_id", "text", seq_len=S, sep_tokens=1, num_partitions=1,
            freeze_dir=str(tmp_path_factory.mktemp("pk1") / "f"),
        )
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got1.equals(got)
    # sep_tokens=0: empty doc yields an empty span (last < first)
    got0 = (
        curation.pack_sequences(
            df, "doc_id", "text", seq_len=S, sep_tokens=0, num_partitions=2,
            freeze_dir=str(tmp_path_factory.mktemp("pk0") / "f"),
        )
        .toPandas().set_index("doc_id")
    )
    # zero contribution: next doc starts where the empty doc did
    assert got0.loc[1, "tok_start"] == got0.loc[2, "tok_start"]
    assert got0.loc[1, "chunk_last"] == (got0.loc[1, "tok_start"] - 1) // S
    with pytest.raises(ValueError):
        curation.pack_sequences(df, "doc_id", "text", seq_len=0)


def test_global_shuffle_permutation(spark):
    """Seeded shuffle: dense 0..n-1 permutation, hashlib-exact rank,
    partition-invariant, salt changes the order wholesale."""
    import pandas as pd

    n = 97
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(n)}))
    got = (
        curation.global_shuffle(df, "doc_id", salt="s1", num_partitions=4)
        .toPandas().sort_values("doc_id")
    )
    assert sorted(got["shuffle_rank"]) == list(range(n))
    # exact replica of the decision: rank by (md5('s1:'||id), id)
    exp_order = sorted(
        range(n), key=lambda i: (hashlib.md5(f"s1:{i}".encode()).hexdigest(), i)
    )
    exp_rank = {d: r for r, d in enumerate(exp_order)}
    assert {int(r.doc_id): int(r.shuffle_rank) for r in got.itertuples()} == exp_rank
    # partition invariance
    got1 = (
        curation.global_shuffle(df, "doc_id", salt="s1", num_partitions=1)
        .toPandas().sort_values("doc_id")
    )
    assert list(got1["shuffle_rank"]) == list(got["shuffle_rank"])
    # a different salt is a different permutation
    got2 = (
        curation.global_shuffle(df, "doc_id", salt="s2", num_partitions=4)
        .toPandas().sort_values("doc_id")
    )
    assert list(got2["shuffle_rank"]) != list(got["shuffle_rank"])


def _brute_chunks(rows, window, stride):
    import re
    out = []
    for doc_id, text in rows:
        ts = [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]
        n = len(ts)
        if n == 0:
            continue
        k = 1 if n <= window else -(-(n - window) // stride) + 1
        for i in range(k):
            s = i * stride
            sl = ts[s:s + window]
            out.append((doc_id, i, s, len(sl), " ".join(sl)))
    return sorted(out)


@pytest.mark.parametrize("window,stride", [(5, 3), (4, 4), (8, 1)])
def test_chunk_documents_matches_brute_force(spark, window, stride):
    rows = [
        (0, "a b c d e f g h i j k"),          # 11 tokens
        (1, "one two three"),                   # shorter than any window
        (2, ""),                                # zero tokens -> no chunks
        (3, "x " * 40),                         # 40 tokens, many windows
        (4, "exact five tokens right here"),    # n == window at 5
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in curation.chunk_documents(
            df, "doc_id", "text", window=window, stride=stride
        ).collect()
    )
    assert got == _brute_chunks(rows, window, stride)
    # coverage law: per doc, union of [tok_start, tok_start+n_tokens)
    # is exactly [0, n) and the last chunk reaches the doc end
    import collections
    per = collections.defaultdict(list)
    for d, i, s, n, _ in got:
        per[d].append((s, n))
    for d, spans in per.items():
        covered = set()
        for s, n in spans:
            covered |= set(range(s, s + n))
        assert covered == set(range(max(e for s, e in ((s, s + n) for s, n in spans))))


def test_chunk_documents_guards(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="window"):
        curation.chunk_documents(df, "doc_id", "text", window=0)
    with pytest.raises(ValueError, match="stride"):
        curation.chunk_documents(df, "doc_id", "text", window=4, stride=5)
    with pytest.raises(ValueError, match="stride"):
        curation.chunk_documents(df, "doc_id", "text", window=4, stride=0)
    # default stride = window (disjoint chunks)
    got = curation.chunk_documents(df.selectExpr("doc_id", "'a b c d e' AS text"),
                                   "doc_id", "text", window=2).collect()
    assert [(r["chunk_idx"], r["tok_start"], r["n_tokens"]) for r in sorted(
        got, key=lambda r: r["chunk_idx"])] == [(0, 0, 2), (1, 2, 2), (2, 4, 1)]


def test_plan_temperature_laws(spark):
    rows = [(i, "s%d" % (i % 3), 100 * (i % 3 + 1)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n long")
    # alpha=1 reduces to natural proportions: rate identical per
    # stratum when budget scales the whole corpus uniformly
    totals = {"s0": 1000.0, "s1": 2000.0, "s2": 3000.0}
    r1 = curation.plan_temperature(df, "src", "n", alpha=1.0, budget=3000.0)
    for d, t in totals.items():
        assert abs(r1[d] - min(1.0, 3000.0 * (t / 6000.0) / t)) < 1e-12
        assert abs(r1[d] - 0.5) < 1e-12  # alpha=1: uniform rate
    # alpha<1 upweights the small stratum: its rate strictly exceeds
    # the big stratum's
    r3 = curation.plan_temperature(df, "src", "n", alpha=0.3, budget=3000.0)
    assert r3["s0"] > r3["s1"] > r3["s2"]
    # saturation at 1.0 under a huge budget
    rbig = curation.plan_temperature(df, "src", "n", alpha=0.5, budget=1e12)
    assert all(v == 1.0 for v in rbig.values())
    for bad in (0.0, 1.5, -1.0):
        with pytest.raises(ValueError, match="alpha"):
            curation.plan_temperature(df, "src", "n", alpha=bad, budget=10)


def _brute_conv_windows(rows, n_turns, stride, sep="\n"):
    import collections
    by_conv = collections.defaultdict(list)
    for conv, turn, text in rows:
        by_conv[conv].append((turn, text))
    out = []
    for conv, turns in by_conv.items():
        turns.sort()
        n = len(turns)
        k = 1 if n <= n_turns else -(-(n - n_turns) // stride) + 1
        for i in range(k):
            s = i * stride
            win = turns[s:s + n_turns]
            out.append((conv, i, s, len(win), sep.join(t for _, t in win)))
    return sorted(out)


@pytest.mark.parametrize("n_turns,stride", [(4, 2), (3, 3), (6, 1)])
def test_conversation_windows_matches_brute_force(spark, n_turns, stride):
    rows = []
    for c, nt in [("c0", 9), ("c1", 2), ("c2", 4), ("c3", 13)]:
        # turn_idx gaps (x3) prove position-based ranking, not index math
        rows += [(c, i * 3, f"{c}t{i}") for i in range(nt)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx long, text string")
    got = sorted(
        tuple(r) for r in curation.conversation_windows(
            df, "conv_id", "turn_idx", "text", n_turns=n_turns, stride=stride
        ).select("conv_id", "window_idx", "first_pos", "n_window_turns", "text").collect()
    )
    assert got == _brute_conv_windows(rows, n_turns, stride)


def test_response_pairs_adjacency_and_numbering(spark):
    """SFT pair mining: only IMMEDIATELY-adjacent (user, assistant)
    turns pair (positional adjacency — index gaps fine, interleaved
    tool/system turns break the pair), pair_idx numbers per-conv
    pairs in turn order, and lead() never crosses a conversation."""
    rows = [
        ("a", 0, "user", "q0"), ("a", 1, "assistant", "r0"),
        ("a", 2, "assistant", "x"), ("a", 4, "user", "q1"),
        ("a", 6, "tool", "t"), ("a", 8, "assistant", "r1"),
        # turn-index gap, still positionally adjacent
        ("a", 10, "user", "q2"), ("a", 20, "assistant", "r2"),
        # conv b ends on a user turn; conv c starts with assistant —
        # neither may pair across the boundary
        ("b", 0, "user", "bq"),
        ("c", 0, "assistant", "cr"), ("c", 1, "user", "cq"),
        ("c", 2, "assistant", "cr2"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, role string, text string"
    )
    got = sorted(
        tuple(r)
        for r in curation.response_pairs(
            df, "conv_id", "turn_idx", "role", "text"
        ).collect()
    )
    assert got == [
        ("a", 0, 0, 1, "q0", "r0"),
        ("a", 1, 10, 20, "q2", "r2"),
        ("c", 0, 1, 2, "cq", "cr2"),
    ]
    # custom role pair: the tool turn right after a user turn
    got2 = sorted(
        tuple(r)
        for r in curation.response_pairs(
            df, "conv_id", "turn_idx", "role", "text",
            prompt_role="user", response_role="tool",
        ).collect()
    )
    assert got2 == [("a", 0, 4, 6, "q1", "t")]


def test_sft_examples_laws(spark):
    """SFT example assembly: one example per assistant turn, context =
    the preceding <= max_context_turns turns rendered 'role: text' in
    turn order (empty for a conversation opener), bounded frame cuts
    the OLDEST turns first, NULL-rendered turns contribute nothing,
    numbering per conversation in turn order; DuckDB twin identity."""
    rows = [
        ("a", 0, "user", "q0"), ("a", 1, "assistant", "r0"),
        ("a", 2, "tool", "t0"), ("a", 3, "user", "q1"),
        ("a", 4, "assistant", "r1"),
        # context bounding: 5 turns precede this response; frame=3
        ("a", 5, "assistant", "r2"),
        # opener response: empty context
        ("b", 0, "assistant", "opener"),
        # NULL text: contributes nothing to context, not counted
        ("c", 0, "user", None), ("c", 1, "user", "cq"),
        ("c", 2, "assistant", "cr"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, role string, text string"
    )
    got = sorted(
        tuple(r)
        for r in curation.sft_examples(
            df, "conv_id", "turn_idx", "role", "text", max_context_turns=3
        ).collect()
    )
    assert got == [
        ("a", 0, 1, 1, "user: q0", "r0"),
        ("a", 1, 4, 3, "assistant: r0\ntool: t0\nuser: q1", "r1"),
        # frame of 3 drops q0/r0, keeps (t0, q1, r1)
        ("a", 2, 5, 3, "tool: t0\nuser: q1\nassistant: r1", "r2"),
        ("b", 0, 0, 0, "", "opener"),
        ("c", 0, 2, 1, "user: cq", "cr"),
    ]
    # DuckDB twin identity on the same rows
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("t", pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text"]))
    exp = sorted(
        tuple(r) for r in con.sql(curation.sft_examples_sql(
            "t", "conv_id", "turn_idx", "role", "text", max_context_turns=3
        )).fetchall()
    )
    assert got == exp
    with pytest.raises(ValueError, match="max_context_turns"):
        curation.sft_examples(df, "conv_id", "turn_idx", "role", "text",
                              max_context_turns=0)


def test_conversation_windows_guards(spark):
    df = spark.createDataFrame([("c", 0, "x")], "conv_id string, turn_idx long, text string")
    with pytest.raises(ValueError, match="n_turns"):
        curation.conversation_windows(df, "conv_id", "turn_idx", "text", n_turns=0)
    with pytest.raises(ValueError, match="stride"):
        curation.conversation_windows(df, "conv_id", "turn_idx", "text", n_turns=2, stride=3)


def test_decontaminate_fuzzy_planted(spark):
    from fdblucene_spark.operators import dedup

    base = ("the quick brown fox jumps over the lazy dog while seven "
            "wizards brew strong potions under pale moonlight tonight")
    rows = [
        (0, base),                                    # benchmark doc
        (1, base.replace("strong", "weak")),          # near-copy -> dirty
        (2, base),                                    # exact copy -> dirty
        (3, "completely different text about spark partitions and "
            "shuffle services living in the cluster manager tonight"),
        (4, "another unrelated document mentioning quick tests and "
            "lazy evaluation but sharing no long shingle runs at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = df.filter("doc_id = 0")
    out = {r["doc_id"]: (r["contaminated"], r["max_jaccard"])
           for r in dedup.decontaminate_fuzzy(
               df, bench, "doc_id", "text", threshold=0.5).collect()}
    assert out[0][0] and out[0][1] == 1.0              # self-hit, exact
    assert out[2][0] and out[2][1] == 1.0
    assert out[1][0] and 0.5 <= out[1][1] < 1.0        # near-copy verified
    assert not out[3][0] and not out[4][0]
    assert len(out) == 5                                # one row per corpus doc
    # exact-jaccard law for the near-copy: recompute by hand
    import itertools

    def shingles(t):  # SHINGLE_N = 3
        ts = t.lower().split()
        return {" ".join(ts[i:i + 3]) for i in range(len(ts) - 2)} or {" ".join(ts)}

    a, b = shingles(rows[1][1]), shingles(rows[0][1])
    want = len(a & b) / len(a | b)
    assert abs(out[1][1] - want) < 1e-12
    with pytest.raises(ValueError, match="threshold"):
        dedup.decontaminate_fuzzy(df, bench, "doc_id", "text", threshold=0.0)


def test_dsir_weights_and_sample(spark):
    """DSIR laws: docs resembling the target corpus get HIGHER log
    importance weights than dissimilar docs; the per-doc value matches
    a hand replica (same hashing, same smoothing); Gumbel top-k is
    deterministic and w-monotone in expectation (the planted
    target-like docs dominate the sample)."""
    import hashlib
    import math

    target_like = "spark shuffle partition executor " * 4
    other = "violets bloom beside quiet rivers every spring morning "
    rows = [(i, target_like) for i in range(10)] + [
        (i, other + f"tail{i}") for i in range(10, 40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    target = df.filter("doc_id < 5")  # target corpus = target-like docs
    B, A = 512, 1.0
    tm = curation.dsir_bucket_counts(target, "text", n_buckets=B)
    rm = curation.dsir_bucket_counts(df, "text", n_buckets=B)
    w = curation.dsir_log_weights(df, tm, rm, "doc_id", "text", n_buckets=B,
                                  alpha=A).toPandas().set_index("doc_id")
    assert len(w) == 40
    assert w.loc[7, "log_w"] > w.loc[20, "log_w"]  # target-like wins
    # hand replica for one doc
    def feats(text):
        ts = [t for t in __import__("re").split(r"[^a-z0-9_]+", text.lower()) if t]
        grams = ts + ([" ".join(ts[i:i+2]) for i in range(len(ts)-1)] if len(ts) >= 2
                      else [" ".join(ts)])
        return [int(hashlib.md5(f"{curation.DSIR_SALT}:{g}".encode()).hexdigest()[:8], 16) % B
                for g in grams]
    tcnt, rcnt = {}, {}
    for i, t in rows:
        for bkt in feats(t):
            rcnt[bkt] = rcnt.get(bkt, 0) + 1
            if i < 5:
                tcnt[bkt] = tcnt.get(bkt, 0) + 1
    tt, rt = sum(tcnt.values()), sum(rcnt.values())
    doc = 20
    # per-bucket log-ratios quantize to float32 before the sum (the
    # engine's addition-order-determinism contract)
    want = sum(
        float(np.float32(
            math.log((tcnt.get(bkt, 0) + A) / (tt + A * B))
            - math.log((rcnt.get(bkt, 0) + A) / (rt + A * B))
        ))
        for bkt in feats(rows[doc][1])
    )
    assert abs(w.loc[doc, "log_w"] - want) < 1e-12
    # deterministic Gumbel top-k: target-like docs dominate; rerun identical
    s1 = curation.dsir_sample(
        curation.dsir_log_weights(df, tm, rm, "doc_id", "text", n_buckets=B),
        "doc_id", k=8).toPandas()
    s2 = curation.dsir_sample(
        curation.dsir_log_weights(df, tm, rm, "doc_id", "text", n_buckets=B),
        "doc_id", k=8).toPandas()
    assert s1["doc_id"].tolist() == s2["doc_id"].tolist()
    assert sum(1 for d in s1["doc_id"] if d < 10) >= 6
    with pytest.raises(ValueError, match="alpha"):
        curation.dsir_log_weights(df, tm, rm, "doc_id", "text", alpha=0.0)
    with pytest.raises(ValueError, match="k"):
        curation.dsir_sample(s1 := None or curation.dsir_log_weights(
            df, tm, rm, "doc_id", "text", n_buckets=B), "doc_id", k=0)


def test_upsample_stratified_exact_and_invariant(spark):
    rows = [(i, ["wiki", "web", "code"][i % 3], f"doc {i}") for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    rates = {"wiki": 2.5, "web": 0.4}
    got = sorted(
        (r["doc_id"], r["copy_idx"])
        for r in curation.upsample_stratified(df, "doc_id", "source", rates,
                                              default_rate=1.0, salt="s1").collect()
    )
    # hashlib replica of the copy-count rule
    want = []
    for i, src, _ in rows:
        rate = rates.get(src, 1.0)
        u = int(hashlib.md5(f"s1{i}".encode()).hexdigest()[:8], 16) / float(16 ** 8)
        n = int(rate) + (1 if u < rate - int(rate) else 0)
        want.extend((i, c) for c in range(n))
    assert got == sorted(want)
    # expectation sanity: wiki rows average ~2.5 copies, web ~0.4
    from collections import Counter
    per = Counter(d for d, _ in got)
    wiki_ids = [i for i, s, _ in rows if s == "wiki"]
    assert all(per[i] in (2, 3) for i in wiki_ids)
    # partition invariance
    got2 = sorted(
        (r["doc_id"], r["copy_idx"])
        for r in curation.upsample_stratified(df.repartition(17), "doc_id",
                                              "source", rates, default_rate=1.0,
                                              salt="s1").collect()
    )
    assert got2 == got
    with pytest.raises(ValueError):
        curation.upsample_stratified(df, "doc_id", "source", {"wiki": -1.0})


def test_conversation_dedup(spark):
    rows = [
        # conv a == conv c (same texts, same order); conv b differs in ORDER
        {"conv": "a", "turn": 0, "text": "hello world"},
        {"conv": "a", "turn": 1, "text": "how are you"},
        {"conv": "c", "turn": 0, "text": "hello world"},
        {"conv": "c", "turn": 1, "text": "how are you"},
        {"conv": "b", "turn": 0, "text": "how are you"},
        {"conv": "b", "turn": 1, "text": "hello world"},
        # concat-boundary trap: ["ab", "c"] vs ["a", "bc"]
        {"conv": "d", "turn": 0, "text": "ab"},
        {"conv": "d", "turn": 1, "text": "c"},
        {"conv": "e", "turn": 0, "text": "a"},
        {"conv": "e", "turn": 1, "text": "bc"},
    ]
    out = {
        r["conv"]: (r["fingerprint"], r["keeper"])
        for r in curation.conversation_dedup(
            spark.createDataFrame(rows), "conv", "turn", "text"
        ).collect()
    }
    assert out["a"][0] == out["c"][0]
    assert out["a"][1] is True and out["c"][1] is False  # min id keeps
    assert out["b"][0] != out["a"][0]  # turn ORDER matters
    assert out["d"][0] != out["e"][0]  # separator blocks boundary merges
    assert out["b"][1] and out["d"][1] and out["e"][1]


def test_conversation_dedup_sql_twin(spark):
    import duckdb
    import pandas as pd

    rows = [
        {"conv": f"c{i % 4}", "turn": i // 4, "text": f"t{i % 7} text body {i % 3}"}
        for i in range(40)
    ]
    got = (
        curation.conversation_dedup(spark.createDataFrame(rows), "conv", "turn", "text")
        .toPandas().sort_values("conv", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows))
    exp = con.sql(
        "WITH " + curation.conversation_dedup_sql("t", "conv", "turn", "text").lstrip()
        + " ORDER BY conv"
    ).df()
    assert list(got["conv"]) == list(exp["conv"])
    assert list(got["fingerprint"]) == list(exp["fingerprint"])
    assert [bool(x) for x in got["keeper"]] == [bool(x) for x in exp["keeper"]]


def test_cap_per_key(spark):
    import hashlib as _h

    rows = [{"doc_id": i, "source": f"s{i % 3}"} for i in range(60)]
    got = curation.cap_per_key(
        spark.createDataFrame(rows), "doc_id", "source", 5
    ).toPandas()
    # exact decision replica via hashlib (the determinism contract)
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["source"], []).append(r["doc_id"])
    want_keep = set()
    for k, ids in by_key.items():
        ranked = sorted(ids, key=lambda i: (_h.md5(f"v1:{i}".encode()).hexdigest(), i))
        want_keep |= set(ranked[:5])
    assert set(got[got["keep"]]["doc_id"]) == want_keep
    assert got.groupby("source")["keep"].sum().eq(5).all()
    # rerun + repartition invariance
    got2 = curation.cap_per_key(
        spark.createDataFrame(rows).repartition(7), "doc_id", "source", 5
    ).toPandas()
    assert set(got2[got2["keep"]]["doc_id"]) == want_keep
    import pytest as _pt

    with _pt.raises(ValueError):
        curation.cap_per_key(spark.createDataFrame(rows), "doc_id", "source", 0)


# ---- C4 line-level cleaning (Raffel et al. 2020 §2.2) ----

_C4_PAGES = [
    # survives: 5 punct-terminated >=3-word lines
    {"id": 0, "text": "the cat sat down.\nA dog ran fast!\nIs this a question?\n"
                      'He said "quoted line."\nFive lines are enough.'},
    # line filters: short line, no-punct line, javascript line all drop,
    # leaving 4 kept < 5 -> page dropped
    {"id": 1, "text": "one two.\nno terminal punct here\n"
                      "enable JavaScript to view this.\nkeep this line alive.\n"
                      "another keeper stays put.\nthird keeper is here.\n"
                      "fourth keeper is here."},
    # lorem ipsum page ban
    {"id": 2, "text": "Lorem Ipsum dolor sit amet.\n" * 6},
    # curly brace page ban (code heuristic)
    {"id": 3, "text": "function f() { return 1; }\n" + "a clean line stays here.\n" * 6},
    # survives with exactly min_lines after dropping one bad line
    {"id": 4, "text": "alpha beta gamma delta.\nshort.\n" + "good line number two.\n" * 4},
    # empty / whitespace-only lines never count
    {"id": 5, "text": "\n\n   \nonly one good line here.\n\n"},
]


def _c4_ref(pages, min_words=3, min_lines=5):
    out = {}
    for p in pages:
        low = p["text"].lower()
        if "lorem ipsum" in low or "{" in low:
            continue
        lines = [l.strip() for l in p["text"].split("\n")]
        kept = [
            l for l in lines
            if len(l.split()) >= min_words and l[-1:] in ('.', '!', '?', '"')
            and "javascript" not in l.lower()
        ]
        if len(kept) >= min_lines:
            out[p["id"]] = ("\n".join(kept), len(kept), len(lines))
    return out


def test_clean_c4_default_rules(spark):
    got = {
        r["id"]: (r["clean_text"], r["n_lines_kept"], r["n_lines_total"])
        for r in curation.clean_c4(
            spark.createDataFrame(_C4_PAGES), "id", "text"
        ).collect()
    }
    assert got == _c4_ref(_C4_PAGES)
    assert 0 in got and 4 in got and 1 not in got and 2 not in got and 3 not in got


def test_clean_c4_sql_twin_identity(spark):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("pages", pd.DataFrame(_C4_PAGES))
    exp = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(curation.clean_c4_sql("pages", "id", "text")).fetchall()
    }
    got = {
        r["id"]: (r["clean_text"], r["n_lines_kept"], r["n_lines_total"])
        for r in curation.clean_c4(
            spark.createDataFrame(_C4_PAGES), "id", "text"
        ).collect()
    }
    assert got == exp


def test_clean_c4_params_and_guards(spark):
    df = spark.createDataFrame(_C4_PAGES)
    # relaxing min_lines to 1 admits the single-good-line page
    got = {r["id"] for r in curation.clean_c4(df, "id", "text", min_lines=1).collect()}
    assert 5 in got
    # custom banned page substring knocks out page 0
    got2 = {r["id"] for r in curation.clean_c4(
        df, "id", "text", min_lines=1, banned_page_substrings=("cat sat",)
    ).collect()}
    assert 0 not in got2 and 5 in got2
    import pytest as _pt
    with _pt.raises(ValueError):
        curation.clean_c4(df, "id", "text", min_words=0)
    with _pt.raises(ValueError):
        curation.clean_c4(df, "id", "text", terminal_puncts=())
