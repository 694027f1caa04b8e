"""Per-partition checkpoint lineage + metrics ledger (north_rule).

Every stage that materializes a table also appends one ledger row per
partition key: (stage, partition_key, input_hash, row_count, status,
run_id).  Stage entry anti-joins its work set against completed ledger rows
— a killed run resumes exactly where it stopped, and re-running a completed
stage is a no-op.  Mirrors (as a table) what the reference's
content-addressed response cache does per file (llm_cache.py:79-141).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class StageLedger:
    def __init__(self, spark, ledger_path: str, run_id: str | None = None):
        self.spark = spark
        self.path = ledger_path
        self.run_id = run_id or uuid.uuid4().hex[:12]

    def read(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return None

    def completed(self, stage: str) -> DataFrame | None:
        df = self.read()
        if df is None:
            return None
        return (
            df.where((F.col("stage") == stage) & (F.col("status") == "done"))
            .select("partition_key")
            .distinct()
        )

    def pending(self, work_df: DataFrame, stage: str, key_col: str) -> DataFrame:
        """Rows of work_df whose partition key has not completed."""
        done = self.completed(stage)
        if done is None:
            return work_df
        return work_df.join(
            done.withColumnRenamed("partition_key", key_col), key_col, "left_anti"
        )

    def mark_done(self, stage: str, keyed_counts: DataFrame) -> None:
        """keyed_counts: (partition_key, row_count[, input_hash])."""
        cols = keyed_counts.columns
        out = keyed_counts.select(
            F.lit(stage).alias("stage"),
            F.col("partition_key").cast("string"),
            (
                F.col("input_hash") if "input_hash" in cols else F.lit(None)
            ).cast("string").alias("input_hash"),
            F.col("row_count").cast("long"),
            F.lit("done").alias("status"),
            F.lit(self.run_id).alias("run_id"),
        )
        out.write.mode("append").parquet(self.path)

    def stage_metrics(self) -> DataFrame | None:
        """The ledger doubles as the per-stage metrics table."""
        df = self.read()
        if df is None:
            return None
        return df.groupBy("stage", "status").agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum("row_count").alias("rows"),
            F.countDistinct("run_id").alias("n_runs"),
        )


def checkpointed_stage(
    ledger: StageLedger,
    stage: str,
    work_df: DataFrame,
    key_col: str,
    out_path: str,
    compute,
) -> DataFrame:
    """Run ``compute(pending_work) -> DataFrame`` for not-yet-done partition
    keys, append results to ``out_path``, mark keys done, and return the
    full materialized table.  Idempotent under kill/re-run."""
    pending = ledger.pending(work_df, stage, key_col)
    if pending.limit(1).count() > 0:
        result = compute(pending)
        result.write.mode("append").parquet(out_path)
        written = ledger.spark.read.parquet(out_path)
        counts = (
            pending.select(F.col(key_col).alias("partition_key"))
            .distinct()
            .join(
                written.groupBy(F.col(key_col).alias("partition_key")).agg(
                    F.count(F.lit(1)).alias("row_count")
                ),
                "partition_key",
                "left",
            )
            .select("partition_key", F.coalesce("row_count", F.lit(0)).alias("row_count"))
        )
        ledger.mark_done(stage, counts)
    return ledger.spark.read.parquet(out_path)
