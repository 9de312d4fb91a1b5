"""Capture .explain('formatted') for the round-6-touched operators.

Usage: python tools/capture_plans_r06.py <out_dir> <suffix>
  suffix = 'before' (run from the round-start tree) or 'after'.
Writes <out_dir>/<stage>_<suffix>.txt for each touched stage.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from fdblucene_spark.operators import curation, dedup, similarity, textstats
    from fdblucene_spark.operators.classify import (
        naive_bayes_classify, perceptron_classify,
    )
    from fdblucene_spark.operators.monitor import match_queries
    from fdblucene_spark.session import get_spark

    spark = get_spark("capture-plans", cores=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]

    hn_q = emb.filter(F.col("vec_id") % 199 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    hn_pos = hn_q.select("query_id", F.col("query_id").alias("vec_id"))
    pdocs = docs.withColumn("cls", F.col("source") == "src1")
    bgrams = curation.benchmark_ngrams(docs.filter(F.col("doc_id") % 37 == 0), "text")

    stages = {
        "hard_negatives": lambda: similarity.hard_negatives(
            hn_q, emb.select("vec_id", "embedding"), hn_pos, k=5,
            id_col="vec_id", vec_col="embedding"),
        "ann_sq_rescored": lambda: similarity.sq_cosine_topk(
            emb, "vec_id", "embedding", list(qv), 25, rescore=50),
        "dedup_minhash": lambda: dedup.minhash_signatures(docs, "doc_id", "text"),
        "fuzzy_dedup_e2e": lambda: dedup.fuzzy_dedup(docs, "doc_id", "text", threshold=0.4),
        "decontaminate": lambda: curation.decontaminate(docs, bgrams, "doc_id", "text"),
        "decontam_fuzzy": lambda: dedup.decontaminate_fuzzy(
            docs, docs.filter("doc_id % 37 = 0"), "doc_id", "text"),
        "paragraph_dedup": lambda: curation.paragraph_dedup(docs, "doc_id", "text"),
        "pack_sequences": lambda: curation.pack_sequences(docs, "doc_id", "text", seq_len=2048),
        "length_buckets": lambda: curation.length_buckets(
            docs, "doc_id", "text", batch_size=64, edges=(64, 128, 256, 512)),
        "chunk_documents": lambda: curation.chunk_documents(docs, "doc_id", "text", 512, 384),
        "nb_classify": lambda: naive_bayes_classify(docs, docs, "doc_id", "text", "source"),
        "perceptron_classify": lambda: perceptron_classify(
            pdocs, pdocs, "doc_id", "text", "cls", epochs=2, train_id_col="doc_id"),
        "percolate": lambda: match_queries(docs.select("doc_id", "text"), [
            {"query_id": "m_and", "must": ["key", "value"]},
            {"query_id": "m_phrase", "phrase": ["key", "value"]},
        ]),
        "ppl_backoff": lambda: textstats.lm_perplexity_backoff(
            docs, "doc_id", "text", train_df=docs.filter("doc_id % 7 = 0")),
        "denoise_fim": lambda: curation.fim_transform(docs, "doc_id", "text", rate=0.7),
        "quality_classifier": lambda: curation.classifier_scores(
            docs, "doc_id", "text", n_buckets=4096),
        "dedup_lsh_pairs": lambda: dedup.lsh_candidate_pairs(docs, "doc_id", "text"),
        "dedup_winnow_pairs": lambda: dedup.winnow_candidate_pairs(
            docs, "doc_id", "text"),
        "preference_pairs": lambda: curation.preference_pairs(
            _tx(), "conv_id", "turn_idx", "role", "text"),
        "build_doclen": lambda: _build_doclen(),
    }

    def _tx():
        from fdblucene_spark.data import synth
        return synth.transcripts(spark, n_convs=200)

    def _build_doclen():
        from fdblucene_spark.operators.build import build_postings
        docs_df = docs.select(F.col("doc_id").alias("doc"), "text")
        return build_postings(docs_df, n_shards=4)[2]
    for name, fn in stages.items():
        try:
            df = fn()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # plan capture only; record the failure
            plan = f"PLAN CAPTURE FAILED: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print("wrote", name)


if __name__ == "__main__":
    main()
