"""Lock-free multi-writer commit (reference: FDBIndexWriter's
lock-free claim, README.md:33-38) and segment integrity checks."""

import os

import pandas as pd
import pytest

import fdblucene_spark.sources.manifest as mf
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher
from fdblucene_spark.sources.manifest import CommitConflict, IndexCatalog


def _df(spark, ids, texts):
    return spark.createDataFrame(pd.DataFrame({"doc_id": ids, "text": texts}))


@pytest.fixture()
def raced_root(spark, tmp_index_root):
    build_index(
        spark, _df(spark, [0, 1], ["alpha beta", "beta gamma"]), tmp_index_root,
        doc_col="doc_id", n_shards=2,
    )
    return tmp_index_root


def _inject_racer(spark, root, racer_fn):
    """Monkeypatch commit so a racer lands between B's write and commit."""
    orig = mf.IndexCatalog.commit
    state = {"done": False}

    def racing(self, manifest):
        if not state["done"] and len(manifest.segments) >= 2:
            state["done"] = True
            racer_fn()
        return orig(self, manifest)

    mf.IndexCatalog.commit = racing
    return orig


def test_doc_col_append_retries_after_race(spark, raced_root):
    def racer():
        build_index(
            spark, _df(spark, [100, 101], ["delta epsilon", "zeta"]), raced_root,
            doc_col="doc_id", n_shards=2, append=True, fingerprint="racer-A",
        )

    orig = _inject_racer(spark, raced_root, racer)
    try:
        m = build_index(
            spark, _df(spark, [200], ["eta theta"]), raced_root,
            doc_col="doc_id", n_shards=2, append=True, fingerprint="writer-B",
        )
    finally:
        mf.IndexCatalog.commit = orig
    assert len(m.segments) == 3  # base + racer + B, nothing lost
    s = Searcher(spark, raced_root)
    assert s.search(["delta"], 5).count() == 1
    assert s.search(["eta"], 5).count() == 1


def test_key_cols_append_refuses_docid_race(spark, raced_root):
    # dense-ID mode: a racer claims the same id range -> the loser must
    # refuse to publish overlapping docIDs
    def racer():
        build_index(
            spark, _df(spark, [100], ["delta epsilon"]).withColumnRenamed("doc_id", "k"),
            raced_root, key_cols=["k"], n_shards=2, append=True, fingerprint="racer-A2",
        )

    orig = _inject_racer(spark, raced_root, racer)
    try:
        with pytest.raises(CommitConflict, match="dense docID range"):
            build_index(
                spark, _df(spark, [200], ["eta theta"]).withColumnRenamed("doc_id", "k"),
                raced_root, key_cols=["k"], n_shards=2, append=True, fingerprint="writer-B2",
            )
    finally:
        mf.IndexCatalog.commit = orig


def test_verify_segments_detects_truncation(spark, raced_root):
    cat = IndexCatalog(raced_root)
    assert cat.verify_segments() == []
    m = cat.load()
    seg_dir = os.path.join(raced_root, m.segments[0].path)
    victim = None
    for base, _, files in os.walk(seg_dir):
        for f in files:
            if f.endswith(".parquet"):
                victim = os.path.join(base, f)
                break
        if victim:
            break
    data = open(victim, "rb").read()
    try:
        open(victim, "wb").write(data[: len(data) // 2])
        assert any("content hash mismatch" in p for p in cat.verify_segments())
    finally:
        open(victim, "wb").write(data)
    assert cat.verify_segments() == []
