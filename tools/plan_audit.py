"""Physical-plan audit of the round-4 query surfaces.

Builds a small index, then prints the load-bearing lines of each new
operator's physical plan (scans with PushedFilters/ReadSchema,
python-eval nodes, joins, aggregates) and asserts the invariants the
100-TB design depends on:

- no row-wise Python anywhere (ArrowEvalPython / MapInPandas only);
- the postings scan under every kernel carries the (field, term)
  predicate (pushed to Parquet);
- facet_counts' stored-table scan is pruned to (doc, facet_field);
- facet aggregation has a partial_count (map-side combine) before the
  exchange.

Usage: python tools/plan_audit.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from fdblucene_spark.operators.build import build_index  # noqa: E402
from fdblucene_spark.operators.query import Searcher  # noqa: E402
from fdblucene_spark.plans.explain import (  # noqa: E402
    assert_no_rowwise_python,
    physical_plan,
)
from fdblucene_spark.session import get_spark  # noqa: E402

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def main() -> int:
    spark = get_spark("plan-audit", cores=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    rng = np.random.default_rng(5)
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(WORDS, size=int(rng.integers(3, 30)))),
         "role": ["user", "assistant"][i % 2],
         "n_chars": int(rng.integers(20, 400))}
        for i in range(400)
    ]
    root = os.path.join(tempfile.mkdtemp(prefix="audit-"), "idx")
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id",
                n_shards=4, text_fields={"text": "text"},
                keyword_fields={"role": "role"},
                stored_fields={"role": "role", "n_chars": "n_chars"})
    s = Searcher(spark, root)
    sroot = os.path.join(tempfile.mkdtemp(prefix="audit-"), "idx_sorted")
    build_index(spark, spark.createDataFrame(rows), sroot, key_cols=["doc_id"],
                n_shards=4, text_fields={"text": "text"},
                stored_fields={"n_chars": "n_chars"},
                index_sort=("n_chars", True))
    ss = Searcher(spark, sroot)

    surfaces = {
        "search_parsed": s.search_parsed("alpha AND (beta gamma)^2 -delta", 10),
        "search_span_first": s.search_span_first("alpha", 10, end=3),
        "matching_docs": s.matching_docs([{"term": "alpha", "occur": "must"}]),
        "facet_counts": s.facet_counts(
            [{"term": "alpha", "occur": "should"},
             {"term": "beta", "occur": "should"}], "role"),
        "facet_ranges": s.facet_ranges(
            [{"term": "alpha", "occur": "must"}], "n_chars",
            [("lo", None, 100), ("hi", 100, None)]),
        "more_like_this": s.more_like_this("alpha alpha beta beta", 10,
                                           min_term_freq=2, min_doc_freq=1),
        # round-5 surfaces
        "term_vectors": s.term_vectors([3, 17], "text"),
        "search_synonym": s.search_synonym(["alpha", "beta"], 10),
        "search_blended": s.search_blended(
            [{"field": "text", "term": "alpha"},
             {"field": "role", "term": "user", "boost": 1.5}], 10, tie=0.3
        ),
        "search_classic": s.search_classic(["alpha", "beta"], 10),
        "search_block_join": s.search_block_join(["alpha"], "role", 5, "total"),
        "search_join": s.search_join(
            [{"term": "alpha", "occur": "must"}], "role", "role", 10
        ),
        # round-5 third-phase surfaces
        "search_multi_phrase": s.search_multi_phrase(
            ["alpha", ("beta", "gamma")], 10
        ),
        "search_phrase_wildcard": s.search_phrase_wildcard(
            ["alpha", {"prefix": "be"}], 10
        ),
        "field_exists": s.search_field_exists("role", 10, kind="norms"),
        "top_terms": s.top_terms("text", 5),
        "complete": s.complete("al", 5),
        "search_common_terms": s.search_common_terms(
            ["alpha", "delta", "theta"], 10, max_term_frequency=0.5
        ),
        "search_sorted_early": ss.search_sorted(
            ["alpha"], 5, sort_field="n_chars", ascending=True
        ),
    }
    # round-5 fourth-phase surfaces
    surfaces["drill_sideways"] = s.drill_sideways(
        [{"term": "alpha", "occur": "must"}], {"role": ["user"]}
    )
    surfaces["search_sorted_multi"] = s.search_sorted_multi(
        ["alpha"], 5, [("n_chars", False), ("role", True)]
    )
    surfaces["rescore"] = s.rescore(
        s.search(["alpha"], 20), [{"term": "beta", "occur": "should"}],
        k=10, weight=2.0, window=20,
    )
    from fdblucene_spark.operators import curation  # noqa: E402
    docs_df = spark.createDataFrame(rows).selectExpr("doc_id", "text")
    surfaces["pack_sequences"] = curation.pack_sequences(
        docs_df, "doc_id", "text", seq_len=64, num_partitions=4
    )
    surfaces["global_shuffle"] = curation.global_shuffle(
        docs_df, "doc_id", num_partitions=4
    )
    # round-5 fifth-phase surfaces
    surfaces["search_lm_dirichlet"] = s.search_lm_dirichlet(["alpha", "beta"], 10)
    surfaces["search_lm_jelinek_mercer"] = s.search_lm_jelinek_mercer(
        ["alpha", "beta"], 10
    )
    surfaces["search_dfi"] = s.search_dfi(["alpha", "beta"], 10)
    # round-5 sixth-phase surfaces
    surfaces["search_dfr"] = s.search_dfr(["alpha", "beta"], 10)
    surfaces["search_ib"] = s.search_ib(["alpha", "beta"], 10)
    surfaces["search_axiomatic"] = s.search_axiomatic(["alpha", "beta"], 10)
    surfaces["search_span_containing"] = s.search_span_containing(
        ("alpha", "beta"), "gamma", 10, slop=3
    )
    from fdblucene_spark.operators.multireader import MultiSearcher  # noqa: E402
    mdir = tempfile.mkdtemp(prefix="audit-")
    mra, mrb = os.path.join(mdir, "idx_a"), os.path.join(mdir, "idx_b")
    build_index(spark, spark.createDataFrame(rows[:200]), mra,
                doc_col="doc_id", n_shards=4, text_fields={"text": "text"})
    build_index(spark, spark.createDataFrame(rows[200:]), mrb,
                doc_col="doc_id", n_shards=4, text_fields={"text": "text"})
    surfaces["multi_reader"] = MultiSearcher(spark, [mra, mrb]).search(
        ["alpha", "beta"], 10
    )
    surfaces["multi_boolean"] = MultiSearcher(spark, [mra, mrb]).search_boolean(
        [{"term": "alpha", "occur": "must"},
         {"term": "beta", "occur": "should"},
         {"term": "gamma", "occur": "must_not"}], 10
    )
    from fdblucene_spark.operators.ngram_lm import (  # noqa: E402
        FreeTextSuggester, build_ngram_model,
    )
    lm_path = os.path.join(tempfile.mkdtemp(prefix="audit-"), "lm")
    build_ngram_model(spark, docs_df, "text", lm_path, order=3)
    surfaces["free_text_lookup"] = FreeTextSuggester(spark, lm_path).lookup(
        "alpha beta", 5
    )
    surfaces["chunk_documents"] = curation.chunk_documents(
        docs_df, "doc_id", "text", window=16, stride=8
    )
    conv_df = spark.createDataFrame(
        [{"conv_id": f"c{i % 20}", "turn_idx": i // 20, "text": f"turn {i}"}
         for i in range(400)]
    )
    surfaces["conversation_windows"] = curation.conversation_windows(
        conv_df, "conv_id", "turn_idx", "text", n_turns=6, stride=4
    )
    rp_df = spark.createDataFrame(
        [{"conv_id": f"c{i % 20}", "turn_idx": i // 20,
          "role": ["user", "assistant"][i % 2], "text": f"turn {i}"}
         for i in range(400)]
    )
    surfaces["response_pairs"] = curation.response_pairs(
        rp_df, "conv_id", "turn_idx", "role", "text"
    )
    surfaces["sft_examples"] = curation.sft_examples(
        rp_df, "conv_id", "turn_idx", "role", "text", max_context_turns=4
    )
    surfaces["facet_taxonomy"] = s.facet_taxonomy(
        [{"term": "alpha", "occur": "must"}], ["role"]
    )
    from fdblucene_spark.operators import dedup  # noqa: E402
    surfaces["decontaminate_fuzzy"] = dedup.decontaminate_fuzzy(
        docs_df, docs_df.filter("doc_id % 37 = 0"), "doc_id", "text"
    )
    # final-session surfaces
    surfaces["search_boosting"] = s.search_boosting(
        ["alpha", "beta"], [{"field": "role", "term": "tool", "occur": "must"}],
        k=10,
    )
    surfaces["search_join_scored"] = s.search_join_scored(
        ["alpha"], "role", "role", k=10, score_mode="total"
    )
    # round-5 sixth-phase surfaces
    surfaces["search_intervals"] = s.search_intervals(
        {"containing": [
            {"ordered": [{"term": "alpha"}, {"term": "beta"}], "max_gaps": 4},
            {"term": "gamma"}]}, 10,
    )
    surfaces["facet_stats"] = s.facet_stats(
        [{"term": "alpha", "occur": "must"}], "role", "n_chars"
    )
    from fdblucene_spark.operators.monitor import match_queries  # noqa: E402
    surfaces["match_queries"] = match_queries(
        docs_df, [
            {"query_id": "q1", "must": ["alpha", "beta"]},
            {"query_id": "q2", "phrase": ["gamma", "delta"]},
        ],
    )
    # round-5 seventh-phase surfaces
    surfaces["search_collapse"] = s.search_collapse(["alpha", "beta"], "role", 5)
    surfaces["search_to_child"] = s.search_to_child(["alpha"], "role", 10, "total")
    surfaces["complete_fuzzy"] = s.complete_fuzzy("alh", 5, max_edits=1)
    from fdblucene_spark.operators import geo, similarity  # noqa: E402
    emb_df = spark.createDataFrame(
        [{"vec_id": i, "embedding": [float((i * 7 + j) % 13) - 6.0 for j in range(8)]}
         for i in range(200)]
    )
    surfaces["sq_cosine_topk"] = similarity.sq_cosine_topk(
        emb_df, "vec_id", "embedding", [1.0] * 8, 5, rescore=20
    )
    geo_df = spark.createDataFrame(
        [{"pid": i, "lat": float(i % 180 - 90), "lon": float(i % 360 - 180)}
         for i in range(400)]
    )
    surfaces["geo_distance"] = geo.distance_query(
        geo_df, "lat", "lon", 10.0, 20.0, 500_000.0
    )
    surfaces["geo_nearest"] = geo.nearest_k(geo_df, "pid", "lat", "lon", 0.0, 0.0, 10)
    # round-5 eighth-phase surfaces
    surfaces["significant_terms"] = s.significant_terms(
        [{"term": "alpha", "occur": "must"}], k=5, min_doc_freq=2
    )
    surfaces["complete_infix"] = s.complete_infix("et", 5)
    surfaces["length_buckets"] = curation.length_buckets(
        docs_df, "doc_id", "text", batch_size=8, edges=(8, 16), num_partitions=4
    )
    # round-5 ninth-phase surfaces
    surfaces["search_boolean_sim"] = s.search_boolean_sim(
        ["alpha", "beta"], k=10, mode="or", boosts={"alpha": 2.0}
    )
    from fdblucene_spark.operators.classify import (  # noqa: E402
        naive_bayes_classify,
        perceptron_classify,
    )
    cls_df = spark.createDataFrame(
        [{"doc_id": r["doc_id"], "text": r["text"], "cls": r["role"]} for r in rows]
    )
    surfaces["naive_bayes_classify"] = naive_bayes_classify(
        cls_df, cls_df, "doc_id", "text", "cls"
    )
    pcls_df = cls_df.withColumn("bcls", F.col("cls") == "user")
    surfaces["perceptron_classify"] = perceptron_classify(
        pcls_df, pcls_df, "doc_id", "text", "bcls", epochs=2, train_id_col="doc_id"
    )
    surfaces["classify_knn"] = s.classify_knn(
        "alpha alpha beta beta", "role", k=10, min_term_freq=2, min_doc_freq=1
    )
    # round-5 tenth-phase surfaces
    surfaces["search_span_multi"] = s.search_span_multi(
        [{"prefix": "al"}, "beta"], 10, slop=2
    )
    surfaces["search_complex_phrase"] = s.search_complex_phrase('"al* beta"~2', 10)
    surfaces["facet_dynamic_ranges"] = s.facet_dynamic_ranges(
        [{"term": "alpha", "occur": "must"}], "n_chars", 4
    )
    surfaces["clean_c4"] = curation.clean_c4(
        docs_df.withColumn("text", F.concat_ws("\n", "text", "text")),
        "doc_id", "text", min_lines=1, min_words=1,
    )
    shp_df = spark.createDataFrame(
        [{"pid": i, "lats": [float(i % 10), float(i % 10 + 3), float(i % 10)],
          "lons": [0.0, 0.0, 3.0]} for i in range(100)]
    )
    surfaces["shape_box"] = geo.shape_box_query(
        shp_df, "lats", "lons", (0.0, 5.0, 0.0, 5.0)
    )
    # round-5 final-phase surfaces: the denoising-objective family is
    # map-only by design — audited like clean_c4/shape_box
    surfaces["fim_transform"] = curation.fim_transform(docs_df, "doc_id", "text")
    surfaces["span_corruption"] = curation.span_corruption(docs_df, "doc_id", "text")
    surfaces["mlm_mask"] = curation.mlm_mask(docs_df, "doc_id", "text")
    surfaces["ul2_mixture"] = curation.ul2_mixture(docs_df, "doc_id", "text")
    tx_df = spark.createDataFrame(
        [{"conv_id": f"c{i % 40}", "turn_idx": i // 40,
          "role": ["user", "assistant"][(i // 40) % 2], "text": f"turn {i}"}
         for i in range(400)]
    )
    surfaces["preference_pairs"] = curation.preference_pairs(
        tx_df, "conv_id", "turn_idx", "role", "text"
    )
    from fdblucene_spark.operators import textstats as _ts
    surfaces["lm_perplexity_backoff"] = _ts.lm_perplexity_backoff(
        docs_df, "doc_id", "text", train_df=docs_df.filter("doc_id % 3 = 0")
    )
    surfaces["winnow_fingerprints"] = _ts.winnow_fingerprints(docs_df, "doc_id", "text")
    from fdblucene_spark.operators.dedup import winnow_candidate_pairs as _wcp
    surfaces["winnow_candidate_pairs"] = _wcp(docs_df, "doc_id", "text", k=3, window=4)
    from fdblucene_spark.operators.similarity import bm25_hard_triples as _bht
    surfaces["bm25_hard_triples"] = _bht(
        s, [("a", ["alpha", "beta"]), ("b", ["gamma"])], neg_rank=5
    )
    # round-5 eleventh-phase surfaces
    url_df = spark.createDataFrame(
        [{"doc_id": i,
          "url": f"HTTPS://WWW.site{i % 7}.com:443/a/{i % 11}/?utm_source=x&b={i % 3}"}
         for i in range(300)]
    )
    surfaces["url_dedup"] = curation.url_dedup(url_df, "doc_id", "url")
    # plan shape is field-agnostic: same-field clauses exercise the
    # masked kernel's scan pushdown without a parallel-field build
    surfaces["search_span_masked"] = s.search_span_masked(
        [("text", "alpha"), ("text", "beta")], 10, slop=3
    )
    # round-5 twelfth-phase surfaces
    surfaces["search_phonetic"] = s.search_phonetic("alfa", 10)
    pay_rows = [{"doc_id": i, "text": f"alpha_{i % 3} beta_{(i + 1) % 3} gamma"}
                for i in range(120)]
    proot = os.path.join(tempfile.mkdtemp(prefix="audit-"), "payidx")
    build_index(spark, spark.createDataFrame(pay_rows), proot, doc_col="doc_id",
                n_shards=4, store_payloads=True, payload_delim="_")
    surfaces["search_span_payload_check"] = Searcher(spark, proot).search_span_payload_check(
        ["alpha", "beta"], [1, None], 10, slop=1
    )
    surfaces["search_surround"] = s.search_surround(
        "and(or(alpha, beta), w(gamma, delta), ep*)", 10
    )
    failures = 0
    for name, df in surfaces.items():
        plan = physical_plan(df)
        try:
            assert_no_rowwise_python(df)
        except AssertionError as e:
            failures += 1
            print(f"FAIL {name}: {e}")
            continue
        keep = [
            ln.strip() for ln in plan.splitlines()
            if any(m in ln for m in (
                "PushedFilters", "ReadSchema", "MapInPandas", "ArrowEval",
                "HashAggregate", "Exchange", "BroadcastHashJoin",
                "SortMergeJoin", "TakeOrdered"))
        ]
        print(f"== {name} ==")
        for ln in keep[:14]:
            print("  " + ln[:160])
        # postings scans must carry the field/term pushdown
        if name in ("search_parsed", "search_span_first", "matching_docs",
                    "search_synonym", "search_blended", "search_classic",
                    "search_multi_phrase",
                    "search_lm_dirichlet", "search_lm_jelinek_mercer",
                    "search_common_terms", "search_dfi",
                    "search_dfr", "search_ib", "search_axiomatic",
                    "search_span_containing",
                    "search_boolean_sim", "classify_knn",
                    "search_span_multi", "search_complex_phrase"):
            assert any("PushedFilters" in ln and "field" in ln for ln in keep), name
        if name == "top_terms":
            # termdict-only: the postings table must not be scanned
            assert not any("postings" in ln for ln in plan.splitlines()), \
                "top_terms must read only the termdict"
            assert any("HashAggregate" in ln for ln in keep), name
        if name == "complete":
            assert not any("postings" in ln for ln in plan.splitlines()), \
                "complete must read only the termdict"
            assert any("PushedFilters" in ln and "StartsWith" in ln
                       for ln in keep), "complete prefix not pushed to scan"
        if name == "term_vectors":
            # doc allow-set range pushed to the Parquet scan
            assert any("PushedFilters" in ln and "max_doc" in ln for ln in keep), name
        if name == "search_block_join":
            assert any("HashAggregate" in ln for ln in keep), \
                "block join missing partial+final parent agg"
        if name == "facet_counts":
            assert any("ReadSchema" in ln and "role" in ln and "n_chars" not in ln
                       for ln in keep), "facet stored scan not column-pruned"
            assert any("partial_count" in ln for ln in plan.splitlines()), \
                "facet agg missing map-side combine"
        if name == "drill_sideways":
            assert any("ReadSchema" in ln and "role" in ln and "n_chars" not in ln
                       for ln in keep), "sideways stored scan not column-pruned"
            assert any("partial_count" in ln for ln in plan.splitlines()), \
                "sideways agg missing map-side combine"
        if name in ("search_sorted_multi", "rescore"):
            assert any("TakeOrdered" in ln for ln in keep), \
                f"{name} missing TakeOrdered top-k cut"
        if name == "facet_taxonomy":
            assert any("partial_count" in ln for ln in plan.splitlines()), \
                "taxonomy rollup missing map-side combine"
        if name == "decontaminate_fuzzy":
            # the benchmark side must broadcast; the corpus must never
            # be exchanged before the candidate join
            assert any("BroadcastHashJoin" in ln for ln in keep), \
                "fuzzy decontam benchmark side not broadcast"
        if name == "chunk_documents":
            # chunking must stay shuffle-free (embarrassingly parallel)
            assert not any("Exchange" in ln for ln in plan.splitlines()), \
                "chunk_documents plan contains a shuffle"
        if name == "conversation_windows":
            # bounded-group shuffles only; never a single-partition sort
            assert "Exchange SinglePartition" not in plan, \
                "conversation_windows collapsed to a single partition"
        if name == "response_pairs":
            # conv-partitioned windows, never a global sort
            assert "Exchange SinglePartition" not in plan, \
                "response_pairs collapsed to a single partition"
        if name == "sft_examples":
            # conv-partitioned bounded-frame windows, never a global sort
            assert "Exchange SinglePartition" not in plan, \
                "sft_examples collapsed to a single partition"
        if name in ("search_boosting", "search_join_scored"):
            # post-demote / post-aggregate top-k stays a TakeOrdered
            # cut (never a global sort of the match set) and the
            # whole pipeline stays Python-free outside the kernel
            assert any("TakeOrdered" in ln for ln in plan.splitlines()), name
        if name == "search_intervals":
            # leaf-term pushdown reaches the postings Parquet scan
            assert any("PushedFilters" in ln and "field" in ln for ln in keep), name
            assert any("TakeOrdered" in ln for ln in keep), \
                "search_intervals missing TakeOrdered top-k cut"
        if name == "facet_stats":
            # one pass carries all five aggregates with map-side combine
            assert any("partial_sum" in ln for ln in plan.splitlines()), \
                "facet_stats agg missing map-side combine"
        if name == "search_collapse":
            # one partial+final max_by agg (SortAggregate — struct max
            # isn't hash-aggregable — but still with a map-side
            # partial_max), then a bounded top-k cut — never a window
            # over the match set
            assert any("partial_max" in ln for ln in plan.splitlines()), \
                "collapse missing map-side partial_max combine"
            assert any("TakeOrdered" in ln for ln in keep), \
                "collapse missing TakeOrdered top-k cut"
            assert "Window" not in plan, "collapse plan contains a window"
        if name == "search_to_child":
            assert any("HashAggregate" in ln for ln in keep), \
                "to_child missing parent fold agg"
            assert any("TakeOrdered" in ln for ln in keep), \
                "to_child missing TakeOrdered top-k cut"
        if name == "complete_fuzzy":
            assert not any("postings" in ln for ln in plan.splitlines()), \
                "complete_fuzzy must read only the termdict"
            assert any("PushedFilters" in ln and "StartsWith" in ln
                       for ln in keep), "complete_fuzzy first-char not pushed"
        if name == "sq_cosine_topk":
            # quantized candidate cut and exact re-rank are both
            # TakeOrdered (no global sort); all math is Catalyst
            # higher-order functions — no Python eval nodes at all
            assert any("TakeOrdered" in ln for ln in keep), \
                "sq topk missing TakeOrdered cut"
            assert "EvalPython" not in plan and "MapInPandas" not in plan, \
                "sq scoring left Catalyst"
        if name == "geo_distance":
            # the bounding box must reach the scan as data filters
            # (sargable comparisons -> row-group min/max skipping)
            assert any(("PushedFilters" in ln or "Filter" in ln) and "lat" in ln
                       for ln in plan.splitlines()), "geo box not a data filter"
            assert "EvalPython" not in plan and "MapInPandas" not in plan, \
                "geo math left Catalyst"
        if name == "geo_nearest":
            assert any("TakeOrdered" in ln for ln in keep), \
                "geo nearest missing TakeOrdered cut"
        if name in ("pack_sequences", "global_shuffle"):
            # the scan pattern's whole point: the prefix sum must never
            # collapse to one partition
            assert "Exchange SinglePartition" not in plan, \
                f"{name} plan collapsed to a single partition"
        if name in ("multi_reader", "multi_boolean"):
            # every sub-index scan carries the (field, term) pushdown;
            # one TakeOrdered merges the per-(src, shard) top-k
            assert sum(
                1 for ln in plan.splitlines()
                if "PushedFilters" in ln and "field" in ln
            ) >= 2, f"{name} missing per-leaf term pushdown"
            assert any("TakeOrdered" in ln for ln in keep), \
                f"{name} missing TakeOrdered top-k cut"
        if name == "free_text_lookup":
            # every gram probe pushes StringStartsWith/EqualTo into the
            # sorted gram tables; the corpus is never rescanned
            assert any("PushedFilters" in ln and "StartsWith" in ln
                       for ln in keep), "free_text gram prefix not pushed"
            assert any("TakeOrdered" in ln for ln in keep), \
                "free_text missing TakeOrdered top-k cut"
        if name == "significant_terms":
            # fg-count scan is column-pruned (docs blocks only — no
            # positions/payloads read) and the final cut is TakeOrdered
            assert any("ReadSchema" in ln and "docs" in ln
                       and "positions" not in ln for ln in keep), \
                "significant_terms postings scan not column-pruned"
            assert any("TakeOrdered" in ln for ln in keep), \
                "significant_terms missing TakeOrdered top-k cut"
        if name == "complete_infix":
            assert not any("postings" in ln for ln in plan.splitlines()), \
                "complete_infix must read only the termdict"
            assert any("PushedFilters" in ln and "Contains" in ln
                       for ln in keep), "complete_infix fragment not pushed"
        if name == "facet_dynamic_ranges":
            # windowless dense rank + 1-row count broadcast: never a
            # single-partition ROW_NUMBER over the match set
            assert "Window" not in plan, \
                "dynamic ranges plan contains a window"
            assert any("BroadcastHashJoin" in ln or "BroadcastNestedLoopJoin" in ln
                       for ln in keep), \
                "dynamic ranges count/offsets not broadcast"
        if name in ("clean_c4", "shape_box", "fim_transform",
                    "span_corruption", "mlm_mask", "ul2_mixture",
                    "winnow_fingerprints"):
            # pure higher-order column math: map-only, zero exchanges,
            # zero Python
            assert not any("Exchange" in ln for ln in plan.splitlines()), \
                f"{name} plan shuffles"
            assert "EvalPython" not in plan and "MapInPandas" not in plan, \
                f"{name} plan runs Python"
        if name == "length_buckets":
            # dense-rank scan pattern: no per-bucket window, no
            # single-partition collapse; bucket offsets broadcast back
            assert "Window" not in plan, \
                "length_buckets plan contains a window"
            assert "Exchange SinglePartition" not in plan or \
                any("BroadcastHashJoin" in ln for ln in keep), \
                "length_buckets collapsed to a single partition"
            assert any("BroadcastHashJoin" in ln for ln in keep), \
                "length_buckets bucket offsets not broadcast"
        if name == "preference_pairs":
            # windowless md5 dense rank + uniform rank+1 equi-join:
            # the only windows are conv-partitioned (pair mining);
            # nothing may collapse to a single partition
            assert "Exchange SinglePartition" not in plan, \
                "preference_pairs collapsed to a single partition"
        if name == "winnow_candidate_pairs":
            # fp-keyed self-join only; the hot-fp cap's window is
            # keyed by fp (bounded buckets), never a global window
            assert "Exchange SinglePartition" not in plan, \
                "winnow pairs collapsed to a single partition"
        if name == "bm25_hard_triples":
            # one batched kernel job; the rank window is bounded by
            # neg_rank rows per query
            assert any("PushedFilters" in ln and "field" in ln for ln in keep), \
                "triples postings scan lost the term pushdown"
        if name == "lm_perplexity_backoff":
            # dictionary-keyed joins + doc agg: no window, no Python
            assert "Window" not in plan, "ppl_backoff plan has a window"
            assert "EvalPython" not in plan and "MapInPandas" not in plan, \
                "ppl_backoff plan runs Python"
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
