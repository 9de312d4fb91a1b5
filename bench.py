"""Headline benchmark: one JSON line for the driver.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Reports per-stage seconds in "queries" and
derived throughputs in "extra". The north-star metric is indexing
throughput (turns/sec) over the synthetic transcripts corpus
(BASELINE.json) plus BM25 top-k latency on the reference query set;
tools/scaling_bench.py runs the same indexing job at two parallelism
levels for the scaling-efficiency evidence in BENCH/BASELINE.md.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
BENCH_TRANSCRIPT_CONVS (default 3000 ≈ 64k turns).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _cal_task(_):
    """One streaming-bandwidth unit: sort+hash over a 32 MB array.

    Mirrors tools/scaling_bench.py's calibration task so bench windows
    and scaling windows are comparable.
    """
    import hashlib

    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.integers(0, 1000, size=4_000_000)
    for _ in range(3):
        b = np.sort(a)
        hashlib.md5(b.tobytes()).digest()
        a = b + 1
    return 1


def _calibrate() -> dict:
    """Measure the host's deliverable streaming speedup at 4x procs.

    This VM's CPU/memory-bandwidth delivery drifts minute-to-minute
    (documented in BENCH/BASELINE.md); recording the same-window
    streaming ratio alongside every bench run lets a reader separate
    engine regressions from throttled windows. Ideal ratio is 4.0
    (8 procs / 2 procs on aggregate tasks/sec); quiet windows on this
    host deliver >= 2.0, throttled windows < 1.5.
    """
    import multiprocessing as mp

    out = {}
    for procs in (2, 8):
        with mp.get_context("spawn").Pool(procs) as pool:
            t0 = time.time()
            pool.map(_cal_task, range(procs * 3))
            out[f"cal_tps_{procs}"] = round(procs * 3 / (time.time() - t0), 3)
    out["cal_stream_ratio"] = round(out["cal_tps_8"] / max(out["cal_tps_2"], 1e-9), 2)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_convs = int(os.environ.get("BENCH_TRANSCRIPT_CONVS", "6000"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from pyspark.sql import functions as F

    from fdblucene_spark.data import synth
    from fdblucene_spark.operators import curation, dedup, similarity
    from fdblucene_spark.operators.build import build_index
    from fdblucene_spark.operators.merge import merge_segments
    from fdblucene_spark.operators.query import Searcher
    from fdblucene_spark.session import get_spark

    spark = get_spark(
        "sparklucene-bench",
        cores=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    queries: dict[str, float] = {}
    extra: dict[str, float] = {}
    probes: dict[str, float] = {}
    work = tempfile.mkdtemp(prefix="sparklucene-bench-")

    # Host-condition probe BEFORE the measured stages (and again after,
    # below): same-window streaming ratio, ideal 4.0 — see _calibrate.
    cal_pre = _calibrate()

    def _light_probe() -> float:
        """Seconds for one small (8 MB) sort+hash — a per-stage host
        speedometer. This VM throttles 5-30x minute-to-minute (two
        back-to-back r5 bench runs: dedup_minhash 2.4 s then 67.7 s,
        same code), so each stage timing records the host's local
        speed next to it; a reader normalizes stage/probe before
        calling anything a regression. Quiet-window value ~0.1 s."""
        import hashlib

        import numpy as np

        rng = np.random.default_rng(0)
        a = rng.integers(0, 1000, size=1_000_000)
        t0 = time.time()
        b = np.sort(a)
        hashlib.md5(b.tobytes()).digest()
        return round(time.time() - t0, 4)

    def timed(name: str):
        class _T:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *a):
                queries[name] = round(time.time() - self.t0, 3)
                probes[name] = _light_probe()

        return _T()

    # ---- corpus prep (generation measured separately, not in build) ----
    tx_path = os.path.join(work, "transcripts.parquet")
    with timed("gen_transcripts"):
        synth.transcripts(spark, n_convs=n_convs, partitions=cpus * 2).write.parquet(tx_path)
    transcripts = spark.read.parquet(tx_path)
    n_turns = transcripts.count()

    # ---- index build: transcripts (the north-star throughput) ----
    tx_root = os.path.join(work, "idx_tx")
    with timed("build_transcripts"):
        m = build_index(
            spark, transcripts, tx_root,
            key_cols=["conv_id", "turn_idx"], n_shards=max(16, cpus), store_positions=True,
        )
    extra["turns_per_sec"] = round(n_turns / queries["build_transcripts"], 1)
    extra["n_turns"] = n_turns
    extra["index_mb"] = round(sum(s.bytes for s in m.segments) / 1e6, 1)

    # ---- BM25 query latency: reference query set, batch + single ----
    s = Searcher(spark, tx_root)
    qset = synth.reference_queries(50).to_dict("records")
    with timed("bm25_batch50"):
        s.search_batch(qset).toPandas()
    extra["bm25_ms_per_query_batch"] = round(queries["bm25_batch50"] / 50 * 1000, 1)
    with timed("bm25_single"):
        s.search(["term00042", "term01500", "needlealpha"], k=10).collect()
    with timed("bm25_single_local"):
        # driver-local query path (the query-service shape): same
        # files, same kernel, no Spark job
        s.search_local(["term00042", "term01500", "needlealpha"], k=10)
    extra["bm25_local_ms"] = round(queries["bm25_single_local"] * 1000, 1)

    # ---- incremental append + compressed-domain merge ----
    extra_path = os.path.join(work, "extra.parquet")
    synth.transcripts(spark, n_convs=n_convs + max(200, n_convs // 10)).filter(
        F.col("conv_id") >= f"conv_{n_convs:06d}"
    ).write.parquet(extra_path)  # corpus gen not part of append timing
    extra_convs = spark.read.parquet(extra_path)
    with timed("append_segment"):
        build_index(
            spark, extra_convs, tx_root,
            key_cols=["conv_id", "turn_idx"], n_shards=max(16, cpus), append=True,
        )
    with timed("merge_concat"):
        merge_segments(spark, tx_root, mode="concat")

    # ---- tiered merge policy: 3 tiny appends, then ONE partial merge
    # of the small tier (the big consolidated segment is not rewritten;
    # contrast with merge_concat above, which rewrites everything) ----
    from fdblucene_spark.operators.merge import maybe_merge

    lo = n_convs
    for i in range(3):
        tiny = extra_convs.filter(
            (F.col("conv_id") >= f"conv_{lo + i * 50:06d}")
            & (F.col("conv_id") < f"conv_{lo + (i + 1) * 50:06d}")
        )
        build_index(spark, tiny, tx_root, key_cols=["conv_id", "turn_idx"],
                    n_shards=max(16, cpus), append=True)
    from fdblucene_spark.sources.manifest import IndexCatalog

    pre_ids = {s_.segment_id for s_ in IndexCatalog(tx_root).load().segments}
    with timed("merge_tiered"):
        m_t = maybe_merge(spark, tx_root, max_segments=2, tier_factor=3.0)
    new_segs = [s_ for s_ in m_t.segments if s_.segment_id not in pre_ids]
    extra["tiered_segments_after"] = len(m_t.segments)
    extra["tiered_rewrote_mb"] = round(sum(s_.bytes for s_ in new_segs) / 1e6, 2)
    extra["full_merge_rewrote_mb"] = extra["index_mb"]

    # ---- replication: cold sync of the full index, then no-op resync ----
    from fdblucene_spark.operators.replicate import sync_replica

    replica_root = os.path.join(work, "idx_tx_replica")
    with timed("replica_sync_cold"):
        _, rep = sync_replica(tx_root, replica_root, max_workers=cpus)
    extra["replica_mb"] = round(rep.bytes_copied / 1e6, 1)
    extra["replica_mb_per_sec"] = round(
        rep.bytes_copied / 1e6 / max(queries["replica_sync_cold"], 1e-9), 1
    )
    with timed("replica_resync_noop"):
        _, rep2 = sync_replica(tx_root, replica_root, max_workers=cpus)
    assert rep2.bytes_copied == 0 and not rep2.committed

    # ---- phrase query batch (vectorized position-adjacency kernel) ----
    vocab_head = [f"term{i:05d}" for i in range(20)]
    phrase_qset = [
        {"query_id": f"p{i:02d}", "terms": [vocab_head[i % 20], vocab_head[(i + 1) % 20]],
         "k": 10, "mode": "phrase"}
        for i in range(20)
    ]
    with timed("phrase_batch20"):
        s.search_batch(phrase_qset).toPandas()
    extra["phrase_ms_per_query_batch"] = round(queries["phrase_batch20"] / 20 * 1000, 1)
    # apples-to-apples OR baseline: the SAME head-term pairs without
    # the positional-adjacency verification
    or_qset = [dict(q, mode="or") for q in phrase_qset]
    with timed("or_head_batch20"):
        s.search_batch(or_qset).toPandas()
    extra["phrase_vs_or_ratio"] = round(
        queries["phrase_batch20"] / max(queries["or_head_batch20"], 1e-9), 2
    )

    # ---- documents corpus: build + search (driver tables) ----
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    doc_root = os.path.join(work, "idx_docs")
    with timed("build_documents"):
        # r5: lang keyword+stored added (mirrors the gate index's v6
        # shape for drill_sideways) — build_documents covers one more
        # keyword field than r4's recorded stage
        build_index(spark, docs, doc_root, doc_col="doc_id", n_shards=16,
                    keyword_fields={"source": "source", "lang": "lang"},
                    stored_fields={"n_chars": "n_chars", "source": "source",
                                   "lang": "lang"})
    sd = Searcher(spark, doc_root)
    with timed("bm25_documents"):
        sd.search(["dup", "hash", "vector"], k=100).collect()
    with timed("bm25_boolean_filtered"):
        # composable query: text SHOULD terms + keyword FILTER + numeric
        # doc-values range in one call
        sd.search_boolean(
            [{"term": "dup", "occur": "should"}, {"term": "hash", "occur": "should"},
             {"field": "source", "term": "src3", "occur": "filter"}],
            k=100, min_should_match=1,
            numeric=[{"field": "n_chars", "lo": 100, "hi": 500}],
        ).collect()

    with timed("bm25_boolean_msm2"):
        # head-term minimum_should_match=2 through the msm-aware
        # block-max pruning path (round-3 kernel)
        sd.search_boolean(
            [{"term": t, "occur": "should"} for t in ("dup", "hash", "vector")],
            k=100, min_should_match=2,
        ).collect()
    with timed("query_parser"):
        # classic QueryParser string -> ONE boolean job (round-4
        # surface): must + boosted group + must_not + numeric range
        sd.search_parsed(
            "dup AND (hash^2 vector) -slow +n_chars:[100 TO 500]",
            k=100, numeric_fields={"n_chars"},
        ).collect()
    with timed("facet_counts"):
        # term facets over the FULL match set (matched-doc kernel ->
        # stored join -> partial agg)
        sd.facet_counts(
            [{"term": "dup", "occur": "should"}, {"term": "hash", "occur": "should"}],
            "source", top_n=10,
        ).collect()
    mr_a, mr_b = os.path.join(work, "idx_mr_a"), os.path.join(work, "idx_mr_b")
    with timed("build_multireader_halves"):
        # two disjoint half-indexes (the per-partition sharding shape);
        # builds are independent — on a cluster they run concurrently
        build_index(spark, docs.filter(F.col("doc_id") % 2 == 0), mr_a,
                    doc_col="doc_id", n_shards=8)
        build_index(spark, docs.filter(F.col("doc_id") % 2 == 1), mr_b,
                    doc_col="doc_id", n_shards=8)
    with timed("bm25_multireader"):
        # federated MultiReader search with summed stats — compare
        # against bm25_documents (same query shape, single index)
        from fdblucene_spark.operators.multireader import MultiSearcher

        MultiSearcher(spark, [mr_a, mr_b]).search(
            ["dup", "hash", "vector"], k=100
        ).collect()
    with timed("significant_terms"):
        # ES significant_terms: matched-doc kernel + full-field
        # postings walk (fg counts via the shard cogroup) + termdict
        # bg join — the heaviest aggregate surface by design
        sd.significant_terms(
            [{"term": "dup", "occur": "must"}], k=10, min_doc_freq=3
        ).collect()
    with timed("complete_infix"):
        # dictionary-sized contains scan (AnalyzingInfixSuggester)
        sd.complete_infix("er", n=10).collect()
    with timed("length_buckets"):
        # padding-efficient batch assignment: one windowless dense
        # rank over (bucket, md5) + broadcast bucket offsets
        curation.length_buckets(
            docs, "doc_id", "text", batch_size=64,
            edges=(64, 128, 256, 512),
        ).count()
    with timed("facet_stats"):
        # association facets: five aggregates per bucket in the same
        # single pass the count facet makes
        sd.facet_stats(
            [{"term": "dup", "occur": "should"}, {"term": "hash", "occur": "should"}],
            "source", "n_chars", top_n=10,
        ).collect()
    with timed("percolate"):
        # reverse search (lucene/monitor): six registered queries vs
        # the whole corpus in ONE pass — broadcast presearcher join +
        # (doc,query) agg + phrase verify; corpus side never shuffles
        from fdblucene_spark.operators.monitor import match_queries

        match_queries(docs.select("doc_id", "text"), [
            {"query_id": "m_and", "must": ["key", "value"]},
            {"query_id": "m_or", "should": ["batch", "stream"]},
            {"query_id": "m_msm2", "should": ["dup", "hash", "vector"], "msm": 2},
            {"query_id": "m_not", "must": ["merge"], "must_not": ["dup"]},
            {"query_id": "m_phrase", "phrase": ["key", "value"]},
            {"query_id": "m_mix", "must": ["sort"], "should": ["scan", "stream"],
             "msm": 1, "must_not": ["slow"]},
        ]).count()
    with timed("intervals_query"):
        # IntervalQuery: minimal ordered(query, merge) <= 8 gaps
        # containing `key` — packed-key algebra on the same one-scan
        # kernel as the span family
        sd.search_intervals(
            {"containing": [
                {"ordered": [{"term": "query"}, {"term": "merge"}],
                 "max_gaps": 8},
                {"term": "key"}]}, k=100,
        ).collect()
    with timed("fuzzy_damerau"):
        # Damerau expansion: JVM prefilter + Arrow-batched exact DP,
        # then a WAND-pruned disjunction over the expansions
        s.search_fuzzy("term00042", k=100, max_edits=1, transpositions=True).collect()

    with timed("block_join"):
        # ToParentBlockJoin roll-up: full child match set -> one
        # partial+final agg keyed by the stored parent field
        sd.search_block_join(["dup", "hash"], "source", k=10, score_mode="total").collect()
    with timed("synonym_query"):
        # blended-stats pseudo-term (one decode pass, reduceat fold)
        sd.search_synonym(["merge", "hash"], k=100).collect()
    with timed("synonym_graph"):
        # multi-word synonym graph: SynonymQuery group + phrase-path
        # disjunction + pass-through term, compiled to ONE boolean job
        sd.search_graph(
            "dup sort merge stream", ["dup, batch", "sort merge, spark"], k=100
        ).collect()
    with timed("geo_polygon"):
        # even-odd ray cast unrolled to codegen column math (no UDF),
        # sargable bbox prefilter
        from fdblucene_spark.operators import geo as _geo

        _geo.polygon_query(
            docs.select(
                "doc_id",
                (((F.col("doc_id") * 7919) % 18000).cast("double") / 100.0 - 90.0).alias("lat"),
                (((F.col("doc_id") * 104729) % 36000).cast("double") / 100.0 - 180.0).alias("lon"),
            ),
            "lat", "lon",
            [(-30.0, -60.0), (45.0, -40.0), (10.0, 0.0), (45.0, 40.0), (-30.0, 60.0)],
        ).count()
    with timed("classic_tfidf"):
        # TF-IDF similarity swap (exhaustive scorer, no impact skip)
        sd.search_classic(["dup", "hash", "vector"], k=100).collect()

    with timed("rescore"):
        # QueryRescorer: window-100 first pass, phrase second pass
        # restricted to the window (candidate containment pushdown)
        first = sd.search(["dup", "hash", "vector"], 100)
        sd.rescore(first, [{"phrase": ["merge", "join"], "occur": "should"}],
                   k=20, weight=2.0, window=100).collect()
    with timed("drill_sideways"):
        # sibling facet counts: one matching kernel + pruned stored
        # join + partial agg per dimension
        sd.drill_sideways(
            [{"term": "dup", "occur": "should"}, {"term": "hash", "occur": "should"}],
            {"source": ["src3", "src5"], "lang": ["en"]}, top_n=10,
        ).collect()
    with timed("sort_multi"):
        # SortField chain over stored fields, TakeOrdered cut
        sd.search_sorted_multi(
            ["dup"], 10, [("n_chars", False), ("source", True)]
        ).collect()

    with timed("collapse"):
        # field collapsing: best doc per source, one partial+final
        # max_by agg (no match-set window)
        sd.search_collapse(["dup", "hash", "vector"], "source", k=10).collect()
    with timed("to_child_join"):
        # ToChildBlockJoin: parent fold + fan-down join
        sd.search_to_child(["dup", "hash"], "source", k=100, score_mode="total").collect()

    with timed("multi_phrase"):
        # Lucene phrase-frequency scoring (tf = phrase occurrence
        # count, MultiPhrase alternatives at slot 2)
        sd.search_multi_phrase(["sort", ("merge", "join")], k=100).collect()

    # ---- index-time sorting: early-terminated sorted top-k ----
    sort_root = os.path.join(work, "idx_docs_sorted")
    with timed("build_documents_sorted"):
        build_index(spark, docs, sort_root, key_cols=["doc_id"], n_shards=16,
                    stored_fields={"n_chars": "n_chars"},
                    index_sort=("n_chars", False))
    ss = Searcher(spark, sort_root)
    with timed("sorted_topk_early"):
        # docID order == sort order: block decode stops at k matches
        ss.search_sorted(["dup"], k=10, sort_field="n_chars", ascending=False).collect()
    with timed("sorted_topk_generic"):
        # same query on the UNSORTED twin: full match set -> TakeOrdered
        sd.search_sorted(["dup"], k=10, sort_field="n_chars", ascending=False).collect()
    extra["sorted_early_vs_generic"] = round(
        queries["sorted_topk_early"] / max(queries["sorted_topk_generic"], 1e-9), 2
    )

    # ---- pipeline ops at sf scale ----
    with timed("quality_classifier"):
        # hash-bucket linear classifier apply (map-side + per-doc agg)
        curation.classifier_scores(docs, "doc_id", "text", n_buckets=4096).count()
    with timed("nb_classify"):
        # naive-Bayes self-classification (train + classify, one pass)
        from fdblucene_spark.operators.classify import naive_bayes_classify
        naive_bayes_classify(docs, docs, "doc_id", "text", "source").count()
    with timed("perceptron_classify"):
        # batch boolean perceptron (2 epochs): all-BIGINT iterative
        # train + assign, the connected-components join shape
        from fdblucene_spark.operators.classify import perceptron_classify
        pdocs = docs.withColumn("cls", F.col("source") == "src1")
        perceptron_classify(pdocs, pdocs, "doc_id", "text", "cls",
                            epochs=2, train_id_col="doc_id").count()
    with timed("decontaminate"):
        bgrams = curation.benchmark_ngrams(docs.filter(F.col("doc_id") % 37 == 0), "text")
        curation.decontaminate(docs, bgrams, "doc_id", "text").count()
    with timed("paragraph_dedup"):
        curation.paragraph_dedup(docs, "doc_id", "text").count()
    with timed("dedup_minhash"):
        dedup.minhash_signatures(docs, "doc_id", "text").count()
    with timed("fuzzy_dedup_e2e"):
        # composed MinHash pipeline: LSH candidates -> exact-jaccard
        # verify -> connected components -> keeper flags
        dedup.fuzzy_dedup(docs, "doc_id", "text", threshold=0.4).count()
    with timed("pack_sequences"):
        # concat-and-chunk packing: scan-pattern global offsets
        curation.pack_sequences(docs, "doc_id", "text", seq_len=2048).count()
    with timed("global_shuffle"):
        # seeded dense permutation (dense-docID scan keyed on md5)
        curation.global_shuffle(docs, "doc_id").count()
    with timed("decontam_fuzzy"):
        # LSH corpus->benchmark candidates + exact-jaccard verify
        dedup.decontaminate_fuzzy(
            docs, docs.filter("doc_id % 37 = 0"), "doc_id", "text"
        ).count()
    with timed("chunk_documents"):
        # sliding 512/384 token windows, shuffle-free Catalyst
        curation.chunk_documents(docs, "doc_id", "text", 512, 384).count()
    with timed("conversation_windows"):
        # dialogue context assembly over the transcript corpus
        curation.conversation_windows(
            transcripts, "conv_id", "turn_idx", "text", n_turns=6, stride=4
        ).count()
    with timed("sft_examples"):
        # SFT example assembly: one example per assistant turn,
        # bounded 6-turn context collect per conversation partition
        curation.sft_examples(
            transcripts, "conv_id", "turn_idx", "role", "text",
            max_context_turns=6,
        ).count()
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    with timed("hard_negatives"):
        # DPR-style mining: every 199th vector is a query (its own
        # positive); broadcast batch x corpus codegen dot, per-query cut
        _hn_q = emb.filter(F.col("vec_id") % 199 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        _hn_pos = _hn_q.select("query_id", F.col("query_id").alias("vec_id"))
        similarity.hard_negatives(
            _hn_q, emb.select("vec_id", "embedding"), _hn_pos, k=5,
            id_col="vec_id", vec_col="embedding",
        ).count()
    with timed("semantic_dedup"):
        # SemDeDup: k-means assign + within-cluster near-dup drop
        similarity.semantic_dedup(emb, "vec_id", "embedding", n_centroids=16).count()
    with timed("ann_cosine_topk"):
        similarity.cosine_topk(emb, "vec_id", "embedding", list(qv), 25).collect()
    ann_root = os.path.join(work, "idx_ann")
    with timed("ann_build_ivf"):
        similarity.build_ann_index(spark, emb, "vec_id", "embedding", ann_root, kind="ivf")
    with timed("ann_ivf_probe"):
        similarity.AnnIndex(spark, ann_root).topk(list(qv), 25, nprobe=4).collect()

    with timed("ann_sq_rescored"):
        # int8 scalar-quantized scan (integer dot, no dequantize) +
        # exact-cosine re-rank of the top-50 candidates
        similarity.sq_cosine_topk(emb, "vec_id", "embedding", list(qv), 25, rescore=50).collect()
    with timed("geo_nearest"):
        # haversine nearest-k over doc-derived coords, TakeOrdered
        from fdblucene_spark.operators import geo as _geo

        gdf = docs.select(
            "doc_id",
            (((F.col("doc_id") * 7919) % 18000).cast("double") / 100.0 - 90.0).alias("lat"),
            (((F.col("doc_id") * 104729) % 36000).cast("double") / 100.0 - 180.0).alias("lon"),
        )
        _geo.nearest_k(gdf, "doc_id", "lat", "lon", -35.0, 150.0, 40).collect()

    with timed("filter_cache_cold"):
        # LRUQueryCache analogue: cold fill runs the constant-score
        # kernel and persists the doc-set sidecar
        from fdblucene_spark.operators.filtercache import FilterCache

        fc = FilterCache(sd)
        fc.clear()
        fcl = [{"field": "lang", "term": "fr", "occur": "filter"}]
        fnum = [{"field": "n_chars", "lo": 100, "hi": 900}]
        fc.docs(fcl, numeric=fnum).count()
    with timed("filter_cache_warm"):
        # warm read: column-pruned parquet scan of the cached set —
        # the per-query saving every composed filter gets thereafter
        fc.docs(fcl, numeric=fnum).count()
    extra["filter_cache_speedup"] = round(
        queries["filter_cache_cold"] / max(queries["filter_cache_warm"], 1e-9), 2
    )

    with timed("bloom_build"):
        # BloomFilteringPostingsFormat analogue over the TRANSCRIPTS
        # dictionary (the realistic vocabulary — the documents corpus
        # has ~31 terms, where a seek is trivially fast and the probe
        # comparison would be meaningless): one bit_or shuffle over k
        # hash positions per dictionary term -> parquet sidecar
        from fdblucene_spark.operators.bloom import TermBloom

        bloom = TermBloom.build(s)
    extra["bloom_n_terms"] = bloom.meta["n_terms"]
    oov100 = [f"zzqx{i}" for i in range(100)]
    with timed("bloom_oov100"):
        # 100 definite misses: pure bloom probe, the dictionary is
        # never touched (Lucene's short-circuit rule)
        assert not any(bloom.term_exists(oov100).values())
    with timed("seek_oov100"):
        # the same misses straight through the termdict seek — what
        # every OOV lookup costs without the bloom
        s.term_stats(oov100)
    extra["bloom_oov_speedup"] = round(
        queries["seek_oov100"] / max(queries["bloom_oov100"], 1e-9), 2
    )
    # structural evidence (scale-independent): bytes each miss path has
    # to consider. At sf0.1 both wall times sit at the pyarrow scan
    # floor (~3 ms/100 misses); what grows with the corpus is the term
    # dictionary, while the sidecar stays ~bits_per_term bits/term.
    extra["bloom_sidecar_kb"] = round(
        sum(os.path.getsize(f) for f in bloom._files) / 1024, 1
    )
    extra["termdict_kb"] = round(
        sum(os.path.getsize(f) for f in s._td_files) / 1024, 1
    )

    with timed("surround_query"):
        # surround-language parse + one composable boolean with a
        # truncation expansion (parser front-end cost rides the job)
        sd.search_surround("and(or(dup, hash), w(sort, merge), quer*)", k=100).collect()

    with timed("xml_query"):
        # XML CoreParser front-end over the same composable kernel:
        # boolean document with a nested dismax (parse cost is driver
        # microseconds; the job is the one boolean kernel pass)
        sd.search_xml(
            "<BooleanQuery>"
            '<Clause occurs="must"><TermQuery>key</TermQuery></Clause>'
            '<Clause occurs="should"><DisjunctionMaxQuery tieBreaker="0.3">'
            "<TermQuery>vector</TermQuery><TermQuery>hash</TermQuery>"
            "</DisjunctionMaxQuery></Clause>"
            '<Clause occurs="mustNot"><TermQuery>dup</TermQuery></Clause>'
            "</BooleanQuery>",
            k=100,
        ).collect()

    with timed("bpe_train16"):
        # distributed BPE tokenizer training: one corpus pass + 16
        # vocab-sized merge rounds (pair agg + argmax + codegen replace)
        from fdblucene_spark.operators.curation import train_bpe

        bpe_merges, _bpe_vocab = train_bpe(docs, "text", n_merges=16)
    extra["bpe_merges_learned"] = len(bpe_merges)

    with timed("denoise_transforms"):
        # the three denoising-objective passes back-to-back (all
        # map-only, zero shuffles): FIM PSM, T5 span corruption,
        # BERT MLM 80/10/10
        curation.fim_transform(docs, "doc_id", "text", rate=0.7).count()
        curation.span_corruption(docs, "doc_id", "text").count()
        curation.mlm_mask(docs, "doc_id", "text").count()
    with timed("preference_pairs"):
        # RLHF comparison-data assembly over the transcript corpus
        curation.preference_pairs(
            transcripts, "conv_id", "turn_idx", "role", "text"
        ).count()
    with timed("ppl_backoff"):
        # trained bigram stupid-backoff LM scores the whole corpus
        from fdblucene_spark.operators import textstats as _ts

        _ts.lm_perplexity_backoff(
            docs, "doc_id", "text", train_df=docs.filter("doc_id % 7 = 0")
        ).count()
    with timed("merge_sorted"):
        # SortingCodecReader path: base + append consolidated into ONE
        # segment whose docIDs follow the pinned chain (full rewrite —
        # the honest cost of a sorted merge)
        from fdblucene_spark.operators.merge import merge_sorted

        sm_root = os.path.join(work, "idx_sorted_merge")
        sm_kw = dict(key_cols=["doc_id"], n_shards=max(16, cpus),
                     stored_fields={"n_chars": "n_chars"},
                     index_sort=("n_chars", False))
        build_index(spark, docs.filter("doc_id % 2 = 0"), sm_root, **sm_kw)
        build_index(spark, docs.filter("doc_id % 2 = 1"), sm_root,
                    append=True, **sm_kw)
        m_s = merge_sorted(spark, sm_root)
    extra["sorted_merge_segments"] = len(m_s.segments)

    cal_post = _calibrate()
    extra["cal_pre"] = cal_pre
    extra["cal_post"] = cal_post
    extra["stage_probes_sec"] = probes
    extra["cal_stream_ratio_min"] = min(
        cal_pre["cal_stream_ratio"], cal_post["cal_stream_ratio"]
    )

    total = round(sum(v for k, v in queries.items() if k != "gen_transcripts"), 3)
    out = {
        "metric": "sparklucene_bench_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "extra": extra,
        "cpus": cpus,
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
