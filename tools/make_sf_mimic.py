"""Generate a scaled mimic of the driver's documents/embeddings corpora
for PERFORMANCE measurement only (bench_extra.py / local bench runs at
driver scale).  The driver's own sf1.0 data is not available locally, so
this replicates /root/testdata/sf0.1 K-fold:

- documents: K copies with offset doc_ids; copies >= 1 get a per-(copy,
  doc) seeded word shuffle.  Vocabulary and per-doc token counts are
  preserved exactly (term/df stats scale K-fold, faithful for build and
  search stages); the shuffle destroys shingle overlap so copies do not
  form cross-copy duplicate clusters.  Caveat (documented in
  OPTIMIZATION_r06.md): planted near-dup clusters survive only in copy
  0, so dedup pair/CC volume is ~1/K of a faithfully generated corpus;
  shingle/minhash volume (the dominant dedup cost) is faithful.
- embeddings: K copies with offset vec_ids; copy c's vectors have their
  dimensions permuted by a per-copy fixed permutation (within-copy
  pairwise dots are exactly the originals').

Output is ONE parquet file with ONE row group per table, matching the
driver's layout (the unsplittable-input condition the spread() guard
exists for).  Never used by bench.py itself, tests, or any query path.

Usage: python tools/make_sf_mimic.py [out_dir] [K]   (default /root/sf1.0, 10)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1.0"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)

    docs = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
    n = len(docs)
    parts = []
    for c in range(k):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + c * n
        if c > 0:
            rng = np.random.default_rng(c)
            texts = []
            for t in docs["text"].tolist():
                w = t.split(" ")
                texts.append(" ".join([w[i] for i in rng.permutation(len(w))]))
            d["text"] = texts
            d["n_chars"] = d["text"].str.len()
        parts.append(d)
    import pandas as pd

    all_docs = pd.concat(parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(all_docs, preserve_index=False),
        os.path.join(out_dir, "documents.parquet"),
        row_group_size=len(all_docs),
    )

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet")).to_pandas()
    m = len(emb)
    vecs = np.array(emb["embedding"].tolist(), dtype=np.float32)
    eparts = []
    for c in range(k):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + c * m
        if c > 0:
            perm = np.random.default_rng(1000 + c).permutation(vecs.shape[1])
            e["embedding"] = list(vecs[:, perm])
        eparts.append(e)
    all_emb = pd.concat(eparts, ignore_index=True)
    all_emb["embedding"] = [np.asarray(v, dtype=np.float32) for v in all_emb["embedding"]]
    pq.write_table(
        pa.Table.from_pandas(all_emb, preserve_index=False),
        os.path.join(out_dir, "embeddings.parquet"),
        row_group_size=len(all_emb),
    )
    print(f"wrote {len(all_docs)} docs, {len(all_emb)} embeddings to {out_dir}")


if __name__ == "__main__":
    main()
