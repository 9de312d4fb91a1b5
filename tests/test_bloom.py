"""Term Bloom sidecar (BloomFilteringPostingsFormat analogue).

Laws pinned here:
- no false negatives: every dictionary term probes True;
- measured false-positive rate stays near the design point (~1% at
  10 bits/term, k=7) — the hash chain is md5-based and deterministic,
  so this is a fixed number for a fixed corpus, not a flaky sample;
- term_exists (bloom prefilter + dictionary verify) is EXACT;
- the sidecar is pinned to a commit point: a new version refuses the
  old sidecar and builds its own; the old pinned Searcher keeps its
  entry (snapshot isolation, the FilterCache rule);
- two builds over the same snapshot produce identical word tables
  (the determinism contract every artifact here carries).
"""

import pytest

from fdblucene_spark.operators.bloom import TermBloom, _hash_positions_py
from fdblucene_spark.operators.build import build_index
from fdblucene_spark.operators.query import Searcher

VOCAB = [f"term{i:03d}" for i in range(120)] + ["alpha", "beta", "gamma"]


@pytest.fixture(scope="module")
def bl_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bloom") / "idx")
    rows = [{"doc_id": i, "text": f"alpha beta gamma term{i % 120:03d}"}
            for i in range(400)]
    build_index(spark, spark.createDataFrame(rows), root, doc_col="doc_id", n_shards=2)
    return Searcher(spark, root)


@pytest.fixture(scope="module")
def bl(bl_index):
    return TermBloom.build(bl_index)


def test_no_false_negatives(bl):
    assert all(bl.might_contain(VOCAB).values())


def test_fp_rate_at_design_point(bl):
    oov = [f"zz{i}" for i in range(4000)]
    fp = sum(bl.might_contain(oov).values())
    # design fp = (1 - e^{-kn/m})^k; m rounds n*10 UP to a power of
    # two, so the realized rate sits at or below ~1%
    assert fp / 4000 < 0.02


def test_term_exists_exact(bl):
    probes = VOCAB[:20] + ["zzznope", "qq9", "alph", "gamma"]
    got = bl.term_exists(probes)
    want = {t: (t in set(VOCAB)) for t in probes}
    assert got == want


def test_spark_hash_chain_matches_python(bl):
    """The build's Catalyst md5 chain and the driver-side probe chain
    must agree bit-for-bit, or no-false-negatives would be luck: every
    vocab term's k probe words must exist in the sidecar with its bit
    set — already covered — AND a probe must fail the moment any ONE
    position is perturbed (so agreement isn't via saturated words)."""
    import pyarrow.dataset as pads

    mask64 = (1 << 64) - 1
    tbl = pads.dataset(bl._files, format="parquet").to_table()
    have = dict(zip(tbl["word_idx"].to_numpy().tolist(), tbl["bits"].to_numpy().tolist()))
    set_bits = sum(bin(b & mask64).count("1") for b in have.values())
    # far from saturated: set bits well under half of m
    assert set_bits < bl.m // 2
    for t in VOCAB[:10]:
        for p in _hash_positions_py(t, bl.m, bl.k):
            assert ((have.get(p // 64, 0) & mask64) >> (p % 64)) & 1


def test_version_pin_and_rebuild(spark, bl_index, bl, tmp_path_factory):
    root = bl_index.root
    build_index(spark, spark.createDataFrame(
        [{"doc_id": 10_000, "text": "freshterm alpha"}]), root,
        doc_col="doc_id", n_shards=2, append=True)
    s2 = Searcher(spark, root)
    assert s2.manifest.version > bl_index.manifest.version
    with pytest.raises(FileNotFoundError):
        TermBloom(s2)
    b2 = TermBloom.build(s2)
    assert b2.term_exists(["freshterm"]) == {"freshterm": True}
    # the OLD pinned searcher still serves its own sidecar (snapshot
    # isolation), and it does NOT see the appended term
    assert TermBloom(bl_index).term_exists(["freshterm"]) == {"freshterm": False}


def test_deterministic_rebuild(spark, tmp_path_factory):
    rows = [{"doc_id": i, "text": f"alpha term{i % 40:03d}"} for i in range(100)]
    words = []
    for name in ("a", "b"):
        root = str(tmp_path_factory.mktemp(f"det{name}") / "idx")
        build_index(spark, spark.createDataFrame(rows), root,
                    doc_col="doc_id", n_shards=2)
        b = TermBloom.build(Searcher(spark, root))
        import pyarrow.dataset as pads
        tbl = pads.dataset(b._files, format="parquet").to_table()
        words.append(sorted(zip(tbl["word_idx"].to_numpy().tolist(),
                                tbl["bits"].to_numpy().tolist())))
    assert words[0] == words[1]


def test_guards(bl_index):
    with pytest.raises(ValueError, match="bits_per_term"):
        TermBloom.build(bl_index, bits_per_term=1)
    with pytest.raises(ValueError, match="no dictionary terms"):
        TermBloom.build(bl_index, field="nosuchfield")
    assert bl_index and TermBloom.build(bl_index).might_contain([]) == {}
