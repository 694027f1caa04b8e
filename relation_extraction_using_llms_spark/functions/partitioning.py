"""Scan-parallelism guard for per-row-expensive operators.

A small parquet file holds ONE row group, and row-group-grain splitting
means Spark scans it as ONE task no matter how many cores exist — so an
operator whose expensive work (shingle explodes, rolling windows,
hashing) happens in the scan stage runs single-threaded until its first
exchange (measured: the banded-MinHash map side on the single-file sf0.1
documents table ran 1.68 s on one core vs 1.24 s repartitioned across
32).  The optimization guide's rule for unsplittable inputs is
"repartition immediately after the read"; this helper applies it
adaptively so well-laid-out production tables are untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Only repartition when the total input is provably cheap to shuffle —
# a degenerate-looking scan of few HUGE files must not trigger a
# full-corpus shuffle (big files split at row-group grain anyway).
_MAX_WIDEN_BYTES = 1 << 30  # 1 GiB


def widen_degenerate_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` to the cluster's default
    parallelism when its scan would run on far fewer tasks than cores
    AND the plan's estimated bytes are small enough that the extra
    shuffle is trivially cheap.  Driver-side plan inspection only —
    never a job.  Row content is unchanged (callers are aggregations /
    joins, order-insensitive); the round-robin assignment is
    deterministic under retries (Spark sorts before round-robin
    repartition by default)."""
    try:
        spark = df.sparkSession
        target = spark.sparkContext.defaultParallelism
        n = df.rdd.getNumPartitions()
        if n * 4 > target:
            return df
        size = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
        if 0 < size <= _MAX_WIDEN_BYTES:
            return df.repartition(target)
        return df
    except Exception:
        return df
