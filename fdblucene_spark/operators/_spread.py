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
default parallelism before a heavy map stage — but ONLY when the
input actually needs it. A partition-count guard cannot work
(`spark.sql.files.minPartitionNum` makes a scan of one
single-row-group file report many byte-range partitions while every
row still lands in the one split containing the row-group start), so
the guard reads the REAL splittability signal: the number of Parquet
row groups across the frame's input files, from driver-side footer
metadata (O(files), KBs each, capped — a corpus with >= `_CAP` files
is splittable by counting alone). A well-laid-out corpus (many files
/ row groups, the 100 TB case) therefore skips the extra shuffle
entirely, while the pathological single-file delivery still gets
spread. Frames whose inputs cannot be enumerated (in-memory ranges,
unions of non-file sources) skip the guard conservatively by
spreading — matching the prior unconditional behavior.

The shuffle, when taken, moves only the raw input rows once (column
pruning pushes attribute selection below the exchange while computed
projections stay above it), and is deterministic under task retry
(Spark sorts before round-robin). Purely a physical-plan change:
results of every operator are row-identical (all downstream
aggregations/joins/windows key explicitly, never on partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CAP = 64  # >= this many input files: splittable by count alone


def _input_row_groups(df: DataFrame, need: int) -> int | None:
    """Total parquet row groups across df's input files, stopping
    early once `need` is reached; None = undeterminable (spread
    conservatively)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    if len(files) >= _CAP:
        return len(files)
    import pyarrow.parquet as pq

    total = 0
    for f in files:
        path = f[len("file:"):] if f.startswith("file:") else f
        if not path.endswith(".parquet"):
            return None
        try:
            total += pq.read_metadata(path).num_row_groups
        except Exception:
            return None
        if total >= need:
            return total
    return total


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition `df` to defaultParallelism * factor
    when (and only when) its file layout cannot deliver at least half
    that parallelism to the scan."""
    sc = df.sparkSession.sparkContext
    target = max(1, sc.defaultParallelism * int(factor))
    rgs = _input_row_groups(df, need=(target + 1) // 2)
    if rgs is not None and rgs >= (target + 1) // 2:
        return df
    return df.repartition(target)
