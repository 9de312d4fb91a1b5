"""fdblucene_spark — a brand-new PySpark-native full-text engine.

Re-expresses the capabilities of cloudant-labs/fdblucene (Lucene 8.1.0
indexes stored in FoundationDB; see /root/reference) as an idiomatic
Spark engine:

- inverted-index build as DataFrame transforms + vectorized Arrow UDFs
  (reference: DATA.md:44-55 logical postings model),
- delta+varbyte block-compressed posting segments in Parquet
  (reference: Lucene codec delegated via pom.xml:31),
- snapshot-manifest commits with atomic swap
  (reference: FDBDirectory.java:350-365 atomic rename of segments_N),
- BM25 top-k with block-max WAND pruning, rank-identical to Lucene 8
  (reference: SimpleFDBDirectoryTest.java:144-159 search semantics).

Nothing is ported: the reference's byte-paging storage engine maps to
Parquet/manifest tables, and everything Lucene did in-process is built
from scratch on Spark primitives (SURVEY.md section 1.4).
"""

__version__ = "0.1.0"
