"""Input-parallelism guard for heavy per-row operators.

A corpus delivered as one (or few) single-row-group Parquet files
cannot be split by the scan planner — `spark.sql.files.maxPartitionBytes`
slices byte ranges, but a range that starts mid-row-group reads zero
rows, so a 1-row-group file always lands in ONE scan task. Every
tokenize/shingle/hash map stage over such an input then runs serially
on one core regardless of cluster size (the "one huge unsplittable
file" input-skew case of the optimization playbook: repartition
immediately after the read).

`spread()` round-robin repartitions the input to the session's
default parallelism before a heavy map stage. The shuffle moves only
the raw input rows once (column pruning pushes attribute selection
below the exchange while computed projections stay above it), and is
deterministic under task retry (Spark sorts before round-robin).
Purely a physical-plan change: results of every operator are
row-identical (all downstream aggregations/joins/windows key
explicitly, never on partitioning).

It repartitions UNCONDITIONALLY: a partition-count guard cannot work
here, because `spark.sql.files.minPartitionNum` makes a scan of one
single-row-group file report many byte-range partitions while every
row still lands in the one split containing the row-group start —
the RDD partition count says 32-way when the data is 1-way. The
call sites are all corpus-scan entries where one narrow shuffle of
the raw rows is orders of magnitude cheaper than the serialized
tokenize/score work it unlocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition `df` to defaultParallelism * factor."""
    sc = df.sparkSession.sparkContext
    target = max(1, sc.defaultParallelism * int(factor))
    return df.repartition(target)
