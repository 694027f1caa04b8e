"""Per-partition checkpoint lineage + metrics ledger (north_rule).

Every checkpointed stage appends one ledger row per partition key:
(stage, partition_key, input_hash, row_count, status, run_id, ts).
``input_hash`` is a content fingerprint of the partition's INPUT rows, so
resume is correct under both failure modes:

  * killed run, fixed input  -> missing keys recompute, done keys skip
  * grown/changed input      -> keys whose input fingerprint changed are
                                stale: recomputed and their output
                                partition overwritten (dynamic partition
                                overwrite), never appended-to

The latest ledger row per (stage, key) wins.  Mirrors, as a table, what
the reference's content-addressed response cache does per file
(llm_cache.py:79-141).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, Window
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

    def latest(self, stage: str) -> DataFrame | None:
        """Latest ledger row per partition key for a stage."""
        df = self.read()
        if df is None:
            return None
        w = Window.partitionBy("partition_key").orderBy(F.col("ts").desc())
        return (
            df.where(F.col("stage") == stage)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def pending_keys(self, stage: str, key_fps: DataFrame) -> DataFrame:
        """key_fps: (partition_key, input_hash) of the CURRENT input.
        Returns the keys that are not done under the same fingerprint."""
        done = self.latest(stage)
        if done is None:
            return key_fps.select("partition_key")
        done_ok = done.where(F.col("status") == "done").select(
            "partition_key", F.col("input_hash").alias("done_hash")
        )
        return (
            key_fps.join(done_ok, "partition_key", "left")
            .where(
                F.col("done_hash").isNull()
                | (F.col("done_hash") != F.col("input_hash"))
            )
            .select("partition_key")
        )

    def mark_done(self, stage: str, keyed: DataFrame) -> None:
        """keyed: (partition_key, input_hash, row_count)."""
        out = keyed.select(
            F.lit(stage).alias("stage"),
            F.col("partition_key").cast("string"),
            F.col("input_hash").cast("string"),
            F.col("row_count").cast("long"),
            F.lit("done").alias("status"),
            F.lit(self.run_id).alias("run_id"),
            F.current_timestamp().alias("ts"),
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


def _key_fingerprints(work_df: DataFrame, key_col: str) -> DataFrame:
    """Order-insensitive content fingerprint per key: count + sum of a
    64-bit row hash (xxhash64 over all columns)."""
    # modular sum: plain sum of 64-bit hashes overflows under ANSI mode
    row_hash = F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in work_df.columns])),
        F.lit(1_000_000_007).cast("long"),
    )
    return work_df.groupBy(F.col(key_col).alias("partition_key")).agg(
        F.concat_ws(
            ":", F.count(F.lit(1)), F.sum(row_hash)
        ).alias("input_hash")
    )


def checkpointed_stage(
    ledger: StageLedger,
    stage: str,
    work_df: DataFrame,
    key_col: str,
    out_path: str,
    compute,
) -> DataFrame:
    """Run ``compute(pending_work) -> DataFrame`` for partition keys whose
    input fingerprint is new or changed; write results partitioned by
    ``key_col`` with dynamic partition overwrite (stale partitions are
    replaced, fresh ones added); mark keys done; return the full table.
    Idempotent under kill/re-run AND under input growth/change.

    ``compute``'s output must carry ``key_col`` with values matching the
    work rows' keys.
    """
    fps = _key_fingerprints(work_df, key_col).cache()
    todo = ledger.pending_keys(stage, fps).cache()
    if todo.limit(1).count() > 0:
        pending = work_df.join(
            todo.withColumnRenamed("partition_key", key_col), key_col, "left_semi"
        )
        result = compute(pending)
        (
            result.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(key_col)
            .parquet(out_path)
        )
        written = ledger.spark.read.parquet(out_path)
        counts = (
            todo.join(fps, "partition_key")
            .join(
                written.groupBy(F.col(key_col).alias("partition_key")).agg(
                    F.count(F.lit(1)).alias("row_count")
                ),
                "partition_key",
                "left",
            )
            .select(
                "partition_key",
                "input_hash",
                F.coalesce("row_count", F.lit(0)).alias("row_count"),
            )
        )
        ledger.mark_done(stage, counts)
    fps.unpersist()
    todo.unpersist()
    return ledger.spark.read.parquet(out_path)
