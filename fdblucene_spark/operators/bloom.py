"""Per-commit-point term Bloom filter — Lucene's
BloomFilteringPostingsFormat (codecs module), re-shaped for the
distributed engine.

Lucene wraps a postings format so each segment carries an in-RAM
bitset over its terms; `terms.iterator()` consults it before touching
the term dictionary, making "does this term exist at all?" nearly
free for the misses that dominate id-lookup and OOV-heavy workloads.
The reference inherits the stock codec stack (it stores codec bytes,
/root/reference/src/main/java/com/cloudant/fdblucene/FDBDirectory.java:52);
the filter would ride along unchanged.

Here the filter is a tiny parquet SIDECAR per (commit point, field)
under the index root — the FilterCache / AnnIndex pattern — because a
distributed engine's unit of reuse is the pinned snapshot, not the
open segment:

- bits live as int64 words, one row per NON-ZERO (word_idx, bits):
  build = one explode of k hash positions per dictionary term + ONE
  bit_or shuffle keyed by word_idx; written range-partitioned and
  sorted by word_idx so a probe's handful of words resolves by
  parquet row-group pruning.
- m is a power of two (n_terms * bits_per_term rounded up), so the
  60-bit md5-prefix hash is EXACTLY uniform mod m (no modulo bias)
  and the whole construction is deterministic — two builds of the
  same snapshot are bit-identical, like every other artifact here.
- probing is driver-side: k word lookups per term through ONE pyarrow
  scan with a word_idx pushdown filter — O(k x |terms|) row reads
  however large the dictionary. No false negatives by construction;
  false-positive rate is the standard (1 - e^{-kn/m})^k (~1% at 10
  bits/term, k=7).
- `term_exists` verifies bloom-positives against the term dictionary
  (one pyarrow seek, the L11 path), so the exported surface is EXACT;
  the bloom's value is the seeks it never issues. Lucene's
  BloomFilteringPostingsFormat does the same: the bitset only
  short-circuits misses, hits still walk the real dictionary.
- the sidecar records the manifest version it was built from and
  refuses to serve a Searcher pinned elsewhere (a new commit point
  changes the dictionary; same rule as the filter cache).

At 10^12 turns: a 10^8-term field at 10 bits/term is ~19 MB of
sidecar (1.5e6 words), built by one bounded shuffle over n_terms * k
rows; probes stay O(k) row reads. Nothing scales with the corpus.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import shutil
import uuid

import pyarrow.dataset as pads
from pyspark.sql import functions as F

_MASK60 = (1 << 60) - 1
_MASK64 = (1 << 64) - 1


def _n_hashes(bits_per_term: int) -> int:
    """Optimal k = ln2 * m/n, clamped to [1, 16]."""
    return max(1, min(16, round(math.log(2.0) * bits_per_term)))


def _hash_positions_py(term: str, m: int, k: int) -> list[int]:
    """Driver-side twin of the build's hash chain: position i is the
    top 60 bits of md5('<i>:<term>') mod m (m is a power of two, so
    the modulo is exactly uniform)."""
    return [
        (int(hashlib.md5(f"{i}:{term}".encode()).hexdigest()[:15], 16) & _MASK60) % m
        for i in range(k)
    ]


def _bloom_dir(root: str, version: int, field: str) -> str:
    return os.path.join(root, "data", "bloom", f"v{int(version):06d}", field)


class TermBloom:
    """Pinned-snapshot term-existence filter for one field."""

    def __init__(self, searcher, field: str = "text"):
        self.searcher = searcher
        self.field = field
        self.dir = _bloom_dir(searcher.root, searcher.manifest.version, field)
        meta_path = os.path.join(self.dir, "bloom.json")
        if not os.path.exists(meta_path):
            raise FileNotFoundError(
                f"no bloom sidecar for field {field!r} at manifest version "
                f"{searcher.manifest.version} — run TermBloom.build(searcher)"
            )
        with open(meta_path) as f:
            self.meta = json.load(f)
        if self.meta["version"] != searcher.manifest.version:
            raise ValueError("bloom sidecar pinned to a different commit point")
        self.m = int(self.meta["m"])
        self.k = int(self.meta["k"])
        self._files = [
            os.path.join(self.dir, f)
            for f in sorted(os.listdir(self.dir))
            if f.endswith(".parquet")
        ]

    # ------------------------------------------------------------- build
    @staticmethod
    def build(searcher, field: str = "text", bits_per_term: int = 10) -> "TermBloom":
        """Materialize the sidecar for the searcher's pinned snapshot.
        Idempotent: an existing sidecar for this (version, field) is
        reused; a concurrent builder losing the rename race discards
        its temp dir (the manifest-CAS pattern)."""
        if bits_per_term < 2:
            raise ValueError("bits_per_term must be >= 2")
        dest = _bloom_dir(searcher.root, searcher.manifest.version, field)
        if os.path.exists(os.path.join(dest, "bloom.json")):
            return TermBloom(searcher, field)
        spark = searcher.spark
        td = (
            spark.read.parquet(*searcher.manifest.segment_paths(searcher.root, "termdict"))
            .filter(F.col("field") == field)
            .select("term")
            .distinct()
        )
        n_terms = td.count()
        if n_terms == 0:
            raise ValueError(f"field {field!r} has no dictionary terms")
        m = 1 << max(6, int(n_terms * bits_per_term - 1).bit_length())
        k = _n_hashes(bits_per_term)
        # k hash positions per term: top 60 bits of md5('<i>:<term>'),
        # exactly uniform mod the power-of-two m; word/bit split and ONE
        # bit_or shuffle keyed by word_idx produce the packed bitset
        pos_cols = [
            (
                F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col("term"))), 1, 15), 16, 10)
                .cast("long") % F.lit(m)
            ).alias(f"p{i}")
            for i in range(k)
        ]
        positions = td.select(F.explode(F.array(*pos_cols)).alias("pos"))
        words = (
            positions
            .select(
                (F.col("pos") / 64).cast("long").alias("word_idx"),
                F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("mask"),
            )
            .groupBy("word_idx")
            .agg(F.bit_or("mask").alias("bits"))
            .repartitionByRange(max(1, m // (1 << 22)), "word_idx")
            .sortWithinPartitions("word_idx")
        )
        tmp = dest + f"._tmp-{uuid.uuid4().hex[:8]}"
        words.write.mode("errorifexists").parquet(tmp)
        with open(os.path.join(tmp, "bloom.json"), "w") as f:
            json.dump(
                {
                    "field": field,
                    "version": searcher.manifest.version,
                    "m": m,
                    "k": k,
                    "n_terms": n_terms,
                    "bits_per_term": bits_per_term,
                },
                f,
            )
        try:
            os.rename(tmp, dest)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the race: reuse winner
        return TermBloom(searcher, field)

    # ------------------------------------------------------------- probe
    def might_contain(self, terms: list[str]) -> dict[str, bool]:
        """Bloom membership for each term: False is DEFINITE (the term
        is not in the dictionary), True may be a false positive. ONE
        pyarrow scan fetches only the probed word indices (row-group
        pruning on the sorted word_idx column); the dictionary itself
        is never touched."""
        if not terms:
            return {}
        want: dict[str, list[int]] = {
            t: _hash_positions_py(t, self.m, self.k) for t in dict.fromkeys(terms)
        }
        idx = sorted({p // 64 for ps in want.values() for p in ps})
        dset = pads.dataset(self._files, format="parquet")
        tbl = dset.to_table(filter=pads.field("word_idx").isin(idx))
        have = dict(
            zip(tbl["word_idx"].to_numpy().tolist(), tbl["bits"].to_numpy().tolist())
        )
        out = {}
        for t, ps in want.items():
            # bits arrive as SIGNED int64 (bit 63 flips the sign); mask
            # into the unsigned domain before extracting
            out[t] = all(
                ((have.get(p // 64, 0) & _MASK64) >> (p % 64)) & 1 for p in ps
            )
        return out

    def term_exists(self, terms: list[str]) -> dict[str, bool]:
        """EXACT membership: bloom prefilter, then one term-dictionary
        seek for the bloom-positives only (Lucene's short-circuit rule
        — misses never reach the dictionary). The returned map carries
        no false positives."""
        maybe = self.might_contain(terms)
        positives = [t for t, v in maybe.items() if v]
        if not positives:
            return {t: False for t in maybe}
        stats = self.searcher.term_stats(positives, field=self.field)
        return {t: (t in stats) for t in maybe}
