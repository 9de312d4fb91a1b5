"""spark-submit entrypoint for cluster index builds (north rule:
"runs via spark-submit --py-files on multi-executor clusters").

Package the library and submit — no code changes between local[N]
and a 1000-executor cluster; get_spark() is bypassed here because
spark-submit owns master/deploy-mode/memory:

    cd /root/repo && zip -qr /tmp/fdblucene_spark.zip fdblucene_spark
    spark-submit \
      --py-files /tmp/fdblucene_spark.zip \
      --num-executors 1000 --executor-cores 4 --executor-memory 16g \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.shuffle.partitions=8000 \
      tools/submit_index_job.py \
      --input  s3://bucket/transcripts/   \
      --root   s3://bucket/indexes/tx-v1  \
      --key-cols conv_id,turn_idx --n-shards 4096

The job is idempotent and resumable: a re-submit after a partial
failure reuses the committed fingerprint (build_index fingerprint=
input path + options), and the emitted lineage JSON carries the
per-partition segment/doc/term/byte counts the north rule asks for.

Search smoke (--query) runs the reference-shaped BM25 top-k against
the fresh index so one submission proves build + search end-to-end.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="parquet path / table of transcript turns")
    ap.add_argument("--root", required=True, help="index root (any shared FS/object store)")
    ap.add_argument("--key-cols", default="conv_id,turn_idx",
                    help="comma-separated docID key columns (dense-rank ordering)")
    ap.add_argument("--doc-col", default=None,
                    help="pre-assigned integer docID column (overrides --key-cols)")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--n-shards", type=int, default=32)
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--query", default=None,
                    help="optional smoke query string (classic QueryParser syntax)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--stored-cols", default="",
                    help="comma-separated columns to store (doc values / fetch)")
    ap.add_argument("--index-sort", default=None, metavar="FIELD[:desc]",
                    help="index-time sort (setIndexSort): docIDs assigned in this "
                         "stored field's order per segment; sorted queries on it "
                         "early-terminate. Field must be in --stored-cols.")
    ap.add_argument("--user-data", default=None,
                    help="JSON str->str map published as commit user data "
                         "(checkpoint bookkeeping, setLiveCommitData)")
    args = ap.parse_args()
    index_sort = None
    if args.index_sort:
        fld, _, order = args.index_sort.partition(":")
        index_sort = (fld, order.lower() != "desc")

    from pyspark.sql import SparkSession

    # spark-submit provides master/deploy-mode/memory; only engine-
    # relevant SQL conf is set here (same values get_spark pins locally)
    spark = (
        SparkSession.builder.appName("fdblucene-spark-index-build")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .getOrCreate()
    )
    from fdblucene_spark.operators.build import build_index
    from fdblucene_spark.operators.query import Searcher

    df = spark.read.parquet(args.input)
    t0 = time.time()
    manifest = build_index(
        spark, df, args.root,
        doc_col=args.doc_col,
        key_cols=None if args.doc_col else [c for c in args.key_cols.split(",") if c],
        text_fields={"text": args.text_col},
        n_shards=args.n_shards,
        store_positions=not args.no_positions,
        fingerprint=args.input,
        stored_fields={c: c for c in args.stored_cols.split(",") if c},
        index_sort=index_sort,
        commit_user_data=json.loads(args.user_data) if args.user_data else None,
    )
    build_s = time.time() - t0
    seg = manifest.segments[-1]
    out = {
        "root": args.root,
        "version": manifest.version,
        "n_docs": manifest.n_docs,
        "build_s": round(build_s, 2),
        "turns_per_sec": round(manifest.n_docs / build_s, 1),
        "segment": seg.segment_id,
        "lineage": seg.lineage,
    }
    if args.query:
        s = Searcher(spark, args.root)
        t0 = time.time()
        hits = s.search_parsed(args.query, args.k).collect()
        out["query"] = args.query
        out["query_s"] = round(time.time() - t0, 3)
        out["hits"] = [{"doc": int(r["doc"]), "score": float(r["score"])} for r in hits]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
