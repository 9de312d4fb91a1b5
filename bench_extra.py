"""Per-stage isolation bench (guide §1.4): times individual operators
against $SPARK_GRAFT_SF_DIR with a noop sink where applicable, so a
single stage can be measured without running the whole frozen bench.py.

Usage: python bench_extra.py [stage ...]        (default: all)
Prints one JSON line: {"stages": {name: sec}, "sf": ..., "cpus": N}.
bench.py itself is FROZEN for driver measurement; numbers from this
file are cited in OPTIMIZATION_r06.md only.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df):
    """Mirror bench.py's action (count) so numbers are comparable to
    the frozen driver methodology — bench.py times `.count()`, which
    lets Catalyst prune columns; a true noop sink would additionally
    materialize every projected column and measure a DIFFERENT
    (heavier) computation than the one the driver times."""
    df.count()


def main() -> None:
    # default: the sf1.0-scale mimic from tools/make_sf_mimic.py
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = set(sys.argv[1:])

    from pyspark.sql import functions as F

    from fdblucene_spark.operators import curation, dedup, similarity
    from fdblucene_spark.session import get_spark

    spark = get_spark("bench-extra", cores=cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    out: dict[str, float] = {}
    work = tempfile.mkdtemp(prefix="bench-extra-")

    def timed(name, fn):
        if only and name not in only:
            return
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        t0 = time.time()
        fn()
        out[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)

    timed("dedup_minhash", lambda: noop(dedup.minhash_signatures(docs, "doc_id", "text")))
    timed("fuzzy_dedup_e2e", lambda: noop(dedup.fuzzy_dedup(docs, "doc_id", "text", threshold=0.4)))
    timed("decontam_fuzzy", lambda: noop(dedup.decontaminate_fuzzy(
        docs, docs.filter("doc_id % 37 = 0"), "doc_id", "text")))

    def _hn():
        q = emb.filter(F.col("vec_id") % 199 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
        pos = q.select("query_id", F.col("query_id").alias("vec_id"))
        noop(similarity.hard_negatives(q, emb.select("vec_id", "embedding"), pos, k=5,
                                       id_col="vec_id", vec_col="embedding"))

    timed("hard_negatives", _hn)
    timed("ann_sq_rescored", lambda: similarity.sq_cosine_topk(
        emb, "vec_id", "embedding", list(qv), 25, rescore=50).collect())
    timed("ann_cosine_topk", lambda: similarity.cosine_topk(
        emb, "vec_id", "embedding", list(qv), 25).collect())
    timed("semantic_dedup", lambda: noop(similarity.semantic_dedup(
        emb, "vec_id", "embedding", n_centroids=16)))
    timed("bpe_train16", lambda: curation.train_bpe(docs, "text", n_merges=16))
    timed("pack_sequences", lambda: noop(curation.pack_sequences(docs, "doc_id", "text", seq_len=2048)))
    timed("length_buckets", lambda: noop(curation.length_buckets(
        docs, "doc_id", "text", batch_size=64, edges=(64, 128, 256, 512))))
    timed("chunk_documents", lambda: noop(curation.chunk_documents(docs, "doc_id", "text", 512, 384)))
    timed("paragraph_dedup", lambda: noop(curation.paragraph_dedup(docs, "doc_id", "text")))

    def _decon():
        bgrams = curation.benchmark_ngrams(docs.filter(F.col("doc_id") % 37 == 0), "text")
        noop(curation.decontaminate(docs, bgrams, "doc_id", "text"))

    timed("decontaminate", _decon)
    timed("quality_classifier", lambda: noop(curation.classifier_scores(
        docs, "doc_id", "text", n_buckets=4096)))

    def _nb():
        from fdblucene_spark.operators.classify import naive_bayes_classify
        noop(naive_bayes_classify(docs, docs, "doc_id", "text", "source"))

    timed("nb_classify", _nb)

    def _perc():
        from fdblucene_spark.operators.classify import perceptron_classify
        pdocs = docs.withColumn("cls", F.col("source") == "src1")
        noop(perceptron_classify(pdocs, pdocs, "doc_id", "text", "cls",
                                 epochs=2, train_id_col="doc_id"))

    timed("perceptron_classify", _perc)

    def _percolate():
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

    timed("percolate", _percolate)

    def _denoise():
        noop(curation.fim_transform(docs, "doc_id", "text", rate=0.7))
        noop(curation.span_corruption(docs, "doc_id", "text"))
        noop(curation.mlm_mask(docs, "doc_id", "text"))

    timed("denoise_transforms", _denoise)

    def _ppl():
        from fdblucene_spark.operators import textstats as _ts
        noop(_ts.lm_perplexity_backoff(
            docs, "doc_id", "text", train_df=docs.filter("doc_id % 7 = 0")))

    timed("ppl_backoff", _ppl)

    def _merge_sorted():
        from fdblucene_spark.operators.build import build_index
        from fdblucene_spark.operators.merge import merge_sorted
        sm_root = os.path.join(work, "idx_sorted_merge")
        sm_kw = dict(key_cols=["doc_id"], n_shards=max(16, cpus),
                     stored_fields={"n_chars": "n_chars"},
                     index_sort=("n_chars", False))
        build_index(spark, docs.filter("doc_id % 2 = 0"), sm_root, **sm_kw)
        build_index(spark, docs.filter("doc_id % 2 = 1"), sm_root, append=True, **sm_kw)
        t0 = time.time()
        merge_sorted(spark, sm_root)
        out["merge_sorted_only"] = round(time.time() - t0, 3)

    timed("merge_sorted", _merge_sorted)

    print(json.dumps({"stages": out, "sf": os.path.basename(sf_dir), "cpus": cpus}))


if __name__ == "__main__":
    main()
