"""Commit user data (IndexWriter.setLiveCommitData) + HighFreqTerms.

The user-data map is the checkpoint-bookkeeping hook: an ingestion
pipeline records "consumed through sequence X" atomically with the
docs it indexed, and a resume reads it back from the snapshot it will
build on — the pattern the reference's Cloudant lineage uses Lucene
commit data for. Contracts: None inherits, a dict replaces wholesale,
the data-free commit bumps only the version, and snapshot pins see
their own map.
"""

import numpy as np
import pytest

from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher
from fdblucene_spark.sources.manifest import IndexCatalog

WORDS = ["ape", "bee", "cat", "doe", "elk", "fox"]


def _rows(n, seed, id0=0):
    rng = np.random.default_rng(seed)
    return [
        {"k": id0 + i, "text": " ".join(rng.choice(WORDS, size=int(rng.integers(2, 12))))}
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def ud_index(spark, tmp_path_factory):
    rows1 = _rows(120, 2)
    rows2 = _rows(60, 4, id0=1000)
    root = str(tmp_path_factory.mktemp("ud") / "idx")
    build_index(
        spark, spark.createDataFrame(rows1), root, key_cols=["k"], n_shards=4,
        commit_user_data={"last_seq": "120", "source": "batch-a"}, fingerprint="a",
    )
    return rows1, rows2, root


def test_user_data_roundtrip_inherit_replace(spark, ud_index):
    rows1, rows2, root = ud_index
    s = Searcher(spark, root)
    assert s.user_data == {"last_seq": "120", "source": "batch-a"}
    v1 = s.manifest.version
    # append with None INHERITS (live commit data persists)
    build_index(
        spark, spark.createDataFrame(rows2), root, key_cols=["k"], n_shards=4,
        append=True, fingerprint="b",
    )
    s2 = Searcher(spark, root)
    assert s2.user_data == {"last_seq": "120", "source": "batch-a"}
    # a dict REPLACES wholesale (Lucene setLiveCommitData semantics)
    build_index(
        spark, spark.createDataFrame(_rows(20, 9, id0=5000)), root,
        key_cols=["k"], n_shards=4, append=True, fingerprint="c",
        commit_user_data={"last_seq": "200"},
    )
    s3 = Searcher(spark, root)
    assert s3.user_data == {"last_seq": "200"}
    # snapshot pin: the old version still answers with ITS map
    assert Searcher(spark, root, version=v1).user_data["source"] == "batch-a"


def test_data_free_checkpoint_commit(spark, ud_index):
    _, _, root = ud_index
    cat = IndexCatalog(root)
    before = cat.load()
    m = cat.commit_user_data({"last_seq": "999", "note": "idle checkpoint"})
    assert m.version == before.version + 1
    assert [s.segment_id for s in m.segments] == [s.segment_id for s in before.segments]
    s = Searcher(spark, root)
    assert s.user_data == {"last_seq": "999", "note": "idle checkpoint"}
    # non-user-data properties carried through untouched
    assert m.properties["store_positions"] == before.properties["store_positions"]
    # values stringified like Lucene's Map<String,String>
    m2 = cat.commit_user_data({"n": 7})
    assert Searcher(spark, root).user_data == {"n": "7"}


def test_streaming_sink_records_progress(spark, tmp_path):
    """The indexing sink publishes {last_batch:<stream>} as commit
    user data with each append — the resumable-ingestion bookkeeping
    (Cloudant stores the consumed update_seq in Lucene commit data the
    same way). A replayed batch hits the idempotent-fingerprint no-op
    and must NOT regress the progress key."""
    from fdblucene_spark.streaming.incremental import indexing_sink

    root = str(tmp_path / "sidx")
    sink = indexing_sink(root, key_cols=["k"], n_shards=2)
    b0 = spark.createDataFrame(_rows(30, 21))
    sink(b0, 0)
    assert Searcher(spark, root).user_data["last_batch:stream"] == "0"
    sink(spark.createDataFrame(_rows(20, 22, id0=100)), 1)
    assert Searcher(spark, root).user_data["last_batch:stream"] == "1"
    sink(b0, 0)  # replay: no new segment, progress stays at 1
    s = Searcher(spark, root)
    assert s.user_data["last_batch:stream"] == "1"
    assert len(s.manifest.segments) == 2


def test_top_terms_matches_brute_force(spark, ud_index):
    rows1, rows2, root = ud_index
    s = Searcher(spark, root)
    # the fixture appended twice: per-segment termdict stats must SUM
    all_rows = rows1 + rows2 + _rows(20, 9, id0=5000)
    from collections import Counter

    df_c: Counter = Counter()
    ttf_c: Counter = Counter()
    for r in all_rows:
        ts = r["text"].split()
        ttf_c.update(ts)
        df_c.update(set(ts))
    want = sorted(df_c.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    got = s.top_terms("text", n=4).collect()
    assert [(r["term"], r["df"], r["ttf"]) for r in got] == [
        (t, c, ttf_c[t]) for t, c in want
    ]
    want_ttf = sorted(ttf_c.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    got_ttf = s.top_terms("text", n=4, by="ttf").collect()
    assert [(r["term"], r["ttf"]) for r in got_ttf] == want_ttf
    with pytest.raises(ValueError):
        s.top_terms("text", by="idf")


def test_complete_prefix_suggester(spark, tmp_path):
    """Autocomplete (AnalyzingSuggester half): dictionary terms extending
    a prefix ranked by summed-across-segments df, ties term asc. The
    fixture appends a second segment so per-segment stats must SUM."""
    words = ["cobalt", "cobra", "code", "coast", "cobalt", "cat", "dog"]
    rows1 = [{"k": i, "text": " ".join(["cobalt"] * 2 + [words[i % len(words)]])}
             for i in range(40)]
    rows2 = [{"k": 100 + i, "text": "cobra coast code"} for i in range(10)]
    root = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(rows1), root, key_cols=["k"],
                n_shards=2, fingerprint="a")
    build_index(spark, spark.createDataFrame(rows2), root, key_cols=["k"],
                n_shards=2, append=True, fingerprint="b")
    s = Searcher(spark, root)
    from collections import Counter

    df_c: Counter = Counter()
    ttf_c: Counter = Counter()
    for r in rows1 + rows2:
        ts = r["text"].split()
        ttf_c.update(t for t in ts if t.startswith("co"))
        df_c.update({t for t in ts if t.startswith("co")})
    want = sorted(df_c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = s.complete("co", n=3).collect()
    assert [(r["term"], r["df"], r["ttf"]) for r in got] == [
        (t, c, ttf_c[t]) for t, c in want
    ]
    # weight by ttf instead of df
    want_ttf = sorted(ttf_c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got_ttf = s.complete("co", n=3, by="ttf").collect()
    assert [(r["term"], r["ttf"]) for r in got_ttf] == want_ttf
    # non-matching prefix is empty, empty prefix and bad weight raise
    assert s.complete("zz").count() == 0
    with pytest.raises(ValueError):
        s.complete("")
    with pytest.raises(ValueError):
        s.complete("co", by="idf")
