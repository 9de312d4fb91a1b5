"""Persisted filter cache — Lucene's LRUQueryCache, re-shaped for a
distributed engine.

Lucene caches the DocIdSet of filter-like (non-scoring) queries per
segment in JVM heap, keyed by the Query and invalidated when the
segment goes away (LRUQueryCache; IndexSearcher.setQueryCache). The
reference inherits that cache through stock Lucene 8
(/root/reference/src/main/java/com/cloudant/fdblucene/
FDBDirectory.java:52 stores codec bytes; caching is
IndexSearcher-level). A Spark engine wants the same thing one level
up: a hot filter (lang = 'en' AND quality-range, a tenant predicate,
a time slice) is recomputed by EVERY query that composes with it, and
at 100 TB that recompute is a full constant-score kernel pass. Here
the matched doc set is materialized ONCE per (query, commit point)
as a tiny sorted parquet sidecar under the index root and every
subsequent query — from any executor, any session, any driver — reads
it back as a column-pruned scan and composes it through the existing
`allowed_docs` cogroup channel (never a driver array, never a
broadcast of corpus-sized state).

Correctness model:
- the cache key is sha256 over the CANONICAL clause spec (sorted-key
  JSON of clauses / min_should_match / numeric) + the pinned manifest
  version + the index fingerprint — a new commit point (append,
  delete, merge) changes the version, so entries can never serve
  stale doc sets; deletes are applied at fill time (matching_docs is
  tombstone-aware), matching Lucene's cache-per-reader rule.
- fills are atomic: write to a task-unique temp dir, os.rename into
  place. A concurrent filler losing the rename race discards its temp
  dir and reads the winner's entry (the manifest CAS pattern).
- eviction is LRU by entry mtime (reads touch their entry), bounded
  by max_entries; eviction only ever removes ENTRIES (doc-set
  sidecars), never index data, and a racing reader of an evicted
  entry just refills.

Scale: an entry is one `doc` column of the filter's matches — for
selective filters (the only ones worth caching, as with Lucene's
UsageTrackingQueryCachingPolicy) that is a sliver of the corpus, and
the composition join is shuffle-free on the cached side (the aux
channel repartitions by shard exactly as tombstones do).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame


class FilterCache:
    """Persisted doc-set cache for one Searcher's pinned snapshot."""

    def __init__(self, searcher, max_entries: int = 32):
        if max_entries < 1:
            raise ValueError("max_entries must be >= 1")
        self.searcher = searcher
        self.spark = searcher.spark
        self.max_entries = int(max_entries)
        self.dir = os.path.join(searcher.root, "cache", "filters")

    # -- keying ---------------------------------------------------------
    def key(
        self,
        clauses: list[dict],
        min_should_match: int | None = None,
        numeric: list[dict] | None = None,
    ) -> str:
        canon = json.dumps(
            {
                "clauses": clauses,
                "msm": min_should_match,
                "numeric": numeric,
                "manifest_version": self.searcher.manifest.version,
                "fingerprint": self.searcher.manifest.properties.get("fingerprint"),
            },
            sort_keys=True,
            separators=(",", ":"),
            default=str,
        )
        return hashlib.sha256(canon.encode("utf-8")).hexdigest()[:24]

    # -- the cache ------------------------------------------------------
    def docs(
        self,
        clauses: list[dict],
        min_should_match: int | None = None,
        numeric: list[dict] | None = None,
    ) -> DataFrame:
        """The filter's matched doc set (one `doc` column), from cache
        when present, computed-and-cached otherwise. Compose it into
        any query through `allowed_docs=`."""
        entry = os.path.join(self.dir, self.key(clauses, min_should_match, numeric))
        if not self._is_complete(entry):
            self._fill(entry, clauses, min_should_match, numeric)
        else:
            os.utime(entry)  # LRU touch
        return self.spark.read.parquet(entry).select("doc")

    def _is_complete(self, entry: str) -> bool:
        return os.path.exists(os.path.join(entry, "_SUCCESS"))

    def _fill(self, entry, clauses, min_should_match, numeric) -> None:
        ds = self.searcher.matching_docs(
            clauses, min_should_match=min_should_match, numeric=numeric
        )
        tmp = entry + ".tmp-" + uuid.uuid4().hex[:12]
        ds.select("doc").write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, entry)
        except OSError:
            # concurrent filler won the rename race: use its entry
            shutil.rmtree(tmp, ignore_errors=True)
            if not self._is_complete(entry):
                raise
        self._evict()

    def _evict(self) -> None:
        try:
            names = [n for n in os.listdir(self.dir) if ".tmp-" not in n]
        except FileNotFoundError:
            return
        if len(names) <= self.max_entries:
            return
        paths = [os.path.join(self.dir, n) for n in names]
        paths.sort(key=lambda p: os.path.getmtime(p))
        for p in paths[: len(paths) - self.max_entries]:
            shutil.rmtree(p, ignore_errors=True)

    def entries(self) -> list[str]:
        try:
            return sorted(
                n for n in os.listdir(self.dir)
                if ".tmp-" not in n
                and os.path.exists(os.path.join(self.dir, n, "_SUCCESS"))
            )
        except FileNotFoundError:
            return []

    def clear(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)
