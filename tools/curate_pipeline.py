"""spark-submit entrypoint for an end-to-end training-data curation
pass — the pipeline-side sibling of submit_index_job.py:

    cd /root/repo && zip -qr /tmp/fdblucene_spark.zip fdblucene_spark
    spark-submit \
      --py-files /tmp/fdblucene_spark.zip \
      --num-executors 1000 --executor-cores 4 \
      --conf spark.sql.adaptive.enabled=true \
      tools/curate_pipeline.py \
      --input  s3://bucket/raw-docs/ \
      --output s3://bucket/curated-v1 \
      --quality-min 0.35 --fuzzy-threshold 0.8 \
      --bench-input s3://bucket/eval-benchmarks/ \
      --dsir-target s3://bucket/wiki-sample/ --dsir-k 100000000

Stages (each optional, each an already-gated operator; plan shapes
documented in README "Scale design"):
  1. quality floor          textstats.quality_scores >= --quality-min
  2. language allowlist     textstats.lang_id in --langs
  3. exact dedup            keep dup_rank == 1
  4. fuzzy dedup            MinHash/LSH fuzzy_dedup keepers (--fuzzy-threshold > 0)
  5. decontamination        exact 8-gram vs --bench-input, and fuzzy
                            (MinHash jaccard >= 0.8) when --bench-fuzzy
  6. DSIR selection         importance weights vs --dsir-target,
                            Gumbel top-k of --dsir-k docs
  7. write + report         curated parquet + one JSON line (per-stage
                            survivor counts — the curation lineage)

Deterministic end to end: md5-seeded sampling, fingerprinted inputs —
a re-submit reproduces byte-identical decisions.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--quality-min", type=float, default=0.0)
    ap.add_argument("--langs", default="", help="comma list; empty = no filter")
    ap.add_argument("--fuzzy-threshold", type=float, default=0.0,
                    help="> 0 enables MinHash fuzzy dedup at this jaccard")
    ap.add_argument("--bench-input", default="",
                    help="benchmark parquet for decontamination")
    ap.add_argument("--bench-fuzzy", action="store_true",
                    help="also run fuzzy (jaccard >= 0.8) decontamination")
    ap.add_argument("--dsir-target", default="",
                    help="target-distribution parquet for DSIR selection")
    ap.add_argument("--dsir-k", type=int, default=0,
                    help="docs to keep via Gumbel top-k (requires --dsir-target)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from fdblucene_spark.operators import curation, dedup, textstats

    spark = SparkSession.builder.appName("curate-pipeline").getOrCreate()
    t0 = time.time()
    idc, txc = args.id_col, args.text_col
    docs = spark.read.parquet(args.input)
    report: dict = {"input": args.input, "n_input": docs.count(), "stages": []}

    # Each stage persists its survivor frame before counting so the
    # count job's work is REUSED by the next stage instead of
    # replaying the whole upstream lineage per stage (O(stages^2)
    # recompute at corpus scale); the previous stage's cache is
    # released as soon as its successor materializes.
    pinned: list = []

    def stage(name: str, df):
        df = df.persist()
        n = df.count()
        while pinned:
            pinned.pop().unpersist()
        pinned.append(df)
        report["stages"].append({"stage": name, "survivors": n})
        return df

    if args.quality_min > 0:
        q = textstats.quality_scores(docs, idc, txc).filter(
            F.col("quality") >= args.quality_min).select(idc)
        docs = stage("quality", docs.join(q, idc))
    if args.langs:
        allowed = [s.strip() for s in args.langs.split(",") if s.strip()]
        lid = textstats.lang_id(docs, idc, txc).filter(
            F.col("lang").isin(allowed)).select(idc)
        docs = stage("lang_id", docs.join(lid, idc))
    keep = dedup.exact_duplicates(docs, idc, txc).filter(
        F.col("dup_rank") == 1).select(idc)
    docs = stage("exact_dedup", docs.join(keep, idc))
    if args.fuzzy_threshold > 0:
        fz = dedup.fuzzy_dedup(docs, idc, txc, threshold=args.fuzzy_threshold)
        docs = stage("fuzzy_dedup", docs.join(
            fz.filter(F.col("keep")).select(idc), idc))
    if args.bench_input:
        bench = spark.read.parquet(args.bench_input)
        grams = curation.benchmark_ngrams(bench, txc)
        clean = curation.decontaminate(docs, grams, idc, txc).filter(
            ~F.col("contaminated")).select(idc)
        docs = stage("decontam_exact", docs.join(clean, idc))
        if args.bench_fuzzy:
            fr = dedup.decontaminate_fuzzy(docs, bench, idc, txc, threshold=0.8)
            docs = stage("decontam_fuzzy", docs.join(
                fr.filter(~F.col("contaminated")).select(idc), idc))
    if args.dsir_target and args.dsir_k > 0:
        target = spark.read.parquet(args.dsir_target)
        tm = curation.dsir_bucket_counts(target, txc)
        rm = curation.dsir_bucket_counts(docs, txc)
        w = curation.dsir_log_weights(docs, tm, rm, idc, txc)
        picked = curation.dsir_sample(w, idc, k=args.dsir_k).select(idc)
        docs = stage("dsir_select", docs.join(picked, idc))

    docs.write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    report.update({
        "output": args.output,
        "n_output": out.count(),
        "seconds": round(time.time() - t0, 2),
    })
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
