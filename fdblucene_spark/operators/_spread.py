"""Input-parallelism guard for heavy per-row operators.

A corpus delivered as one (or few) single-row-group Parquet files
cannot be split by the scan planner — `spark.sql.files.maxPartitionBytes`
slices byte ranges, but a range that starts mid-row-group reads zero
rows, so a 1-row-group file always lands in ONE scan task. Every
tokenize/shingle/hash map stage over such an input then runs serially
on one core regardless of cluster size (the "one huge unsplittable
file" input-skew case of the optimization playbook: repartition
immediately after the read).

`spread()` round-robin repartitions an under-partitioned input up to
the session's default parallelism before a heavy map stage. The
shuffle moves only the raw input rows once (projection pruning pushes
column selection below the exchange), is deterministic (Spark's
sort-before-repartition keeps row->partition assignment stable under
task retry), and is a no-op for inputs that already carry enough
partitions. Purely a physical-plan change: results of every operator
are row-identical (all downstream aggregations/joins are
partitioning-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition `df` to defaultParallelism * factor when it has
    fewer partitions than half that target; otherwise return as-is."""
    sc = df.sparkSession.sparkContext
    target = max(1, sc.defaultParallelism * int(factor))
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - planning edge (e.g. streaming)
        return df
    if n * 2 <= target:
        return df.repartition(target)
    return df
