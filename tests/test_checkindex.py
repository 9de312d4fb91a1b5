"""CheckIndex analogue: healthy indexes verify clean; planted
corruption (block bytes, stats) is detected and named."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from fdblucene_spark.functions import codec
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.check import check_index

WORDS = ["alpha", "beta", "gamma", "delta"]


def _build(spark, tmp, seed=3):
    rng = np.random.default_rng(seed)
    rows = [
        {"doc_id": i, "text": " ".join(rng.choice(WORDS, size=int(rng.integers(2, 15))))}
        for i in range(200)
    ]
    root = str(tmp / "idx")
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=4)
    return root


def test_check_index_healthy(spark, tmp_path_factory):
    root = _build(spark, tmp_path_factory.mktemp("chk"))
    assert check_index(spark, root).count() == 0


def _postings_files(root):
    return sorted(
        glob.glob(os.path.join(root, "data", "segments", "*", "postings", "*.parquet"))
    )


def _rewrite(f, mutate):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f)
    pdf = t.to_pandas()
    mutate(pdf)
    pq.write_table(pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False), f)
    crc = os.path.join(os.path.dirname(f), "." + os.path.basename(f) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)  # hadoop sidecar would veto the planted corruption


def test_check_index_detects_block_corruption(spark, tmp_path_factory):
    root = _build(spark, tmp_path_factory.mktemp("chk2"))
    f = _postings_files(root)[0]

    def mutate(pdf):
        # claim wrong bounds/count for the first multi-posting block:
        # the decode kernel must trip the n / min_doc invariants
        i = next(idx for idx, r in pdf.iterrows() if r["n"] >= 2)
        d = codec.decode_doc_block(pdf.at[i, "docs"])
        pdf.at[i, "min_doc"] = int(d[-1])
        pdf.at[i, "n"] = int(pdf.at[i, "n"]) + 1

    _rewrite(f, mutate)
    probs = check_index(spark, root).toPandas()
    assert len(probs) >= 1
    text = " | ".join(probs["problem"])
    assert "docs decoded" in text or "min_doc" in text


def test_check_index_detects_termdict_mismatch(spark, tmp_path_factory):
    root = _build(spark, tmp_path_factory.mktemp("chk3"))
    f = sorted(
        glob.glob(os.path.join(root, "data", "segments", "*", "termdict", "*.parquet"))
    )[0]
    def mutate(pdf):
        pdf.at[0, "df"] = int(pdf.at[0, "df"]) + 7

    _rewrite(f, mutate)
    probs = check_index(spark, root).toPandas()
    assert any("termdict mismatch" in p for p in probs["problem"])


def test_check_index_verifies_index_sort_pin(spark, tmp_path_factory):
    """A sorted index verifies clean; a FORGED sort pin on an unsorted
    index (manifest edited behind the builder's back) is detected by
    the adjacent-pair pass."""
    import json

    rng = np.random.default_rng(11)
    rows = [
        {
            "k": i,
            "text": " ".join(rng.choice(WORDS, size=int(rng.integers(2, 15)))),
            "w": int(rng.integers(0, 1000)),
        }
        for i in range(300)
    ]
    base = tmp_path_factory.mktemp("chk4")
    good = str(base / "good")
    build_index(
        spark, spark.createDataFrame(rows), good, key_cols=["k"], n_shards=4,
        stored_fields={"w": "w"}, index_sort=[("w", True)],
    )
    assert check_index(spark, good).count() == 0

    forged = str(base / "forged")
    build_index(
        spark, spark.createDataFrame(rows), forged, key_cols=["k"], n_shards=4,
        stored_fields={"w": "w"},
    )
    cur = os.path.join(forged, "manifest", "CURRENT")
    with open(os.path.join(forged, "manifest", open(cur).read().strip())) as fh:
        man = json.load(fh)
    man["properties"]["index_sort"] = [["w", True]]
    forged_v = os.path.join(forged, "manifest", "manifest.v000999.json")
    with open(forged_v, "w") as fh:
        json.dump(man, fh)
    with open(cur, "w") as fh:
        fh.write("manifest.v000999.json")
    probs = check_index(spark, forged).toPandas()
    assert any("index_sort violation" in p for p in probs["problem"])


def test_exorcise_drops_corrupt_segment(spark, tmp_path_factory):
    from fdblucene_spark.operators.check import exorcise
    from fdblucene_spark.operators.query import Searcher
    from fdblucene_spark.sources.manifest import IndexCatalog

    tmp = tmp_path_factory.mktemp("exo")
    rows1 = [{"doc_id": i, "text": "alpha beta"} for i in range(30)]
    rows2 = [{"doc_id": 100 + i, "text": "alpha gamma"} for i in range(20)]
    root = str(tmp / "idx")
    build_index(spark, spark.createDataFrame(rows1), root, doc_col="doc_id",
                n_shards=2)
    build_index(spark, spark.createDataFrame(rows2), root, doc_col="doc_id",
                n_shards=2, append=True)
    cat = IndexCatalog(root)
    m0 = cat.load()
    assert len(m0.segments) == 2

    # healthy: no-op, same version
    m, dropped = exorcise(spark, root)
    assert dropped == [] and m.version == m0.version

    # truncate a file in the SECOND segment (rows2's docs)
    seg2 = next(s for s in m0.segments if s.doc_min >= 100)
    victim = sorted(
        glob.glob(os.path.join(root, seg2.path, "postings", "*.parquet"))
    )[0]
    with open(victim, "r+b") as fh:
        fh.truncate(10)

    m1, dropped = exorcise(spark, root)
    assert dropped == [seg2.segment_id]
    assert [s.segment_id for s in m1.segments] == [
        s.segment_id for s in m0.segments if s.segment_id != seg2.segment_id]
    assert m1.version == m0.version + 1 and m1.parent_version == m0.version

    # repaired snapshot: stats + search reflect only the healthy segment
    s = Searcher(spark, root)
    assert s.manifest.n_docs == 30
    docs = {r["doc"] for r in s.search(["alpha"], k=100, mode="or").collect()}
    assert docs == set(range(30))
    assert {r["doc"] for r in s.search(["gamma"], k=100, mode="or").collect()} == set()
    assert check_index(spark, root).count() == 0

    # idempotent: second run is a no-op on the repaired snapshot
    m2, dropped2 = exorcise(spark, root)
    assert dropped2 == [] and m2.version == m1.version


def test_exorcise_refuses_total_loss(spark, tmp_path_factory):
    from fdblucene_spark.operators.check import exorcise

    tmp = tmp_path_factory.mktemp("exo2")
    root = _build(spark, tmp)
    for f in _postings_files(root):
        with open(f, "r+b") as fh:
            fh.truncate(5)
    with pytest.raises(ValueError, match="every segment"):
        exorcise(spark, root)
