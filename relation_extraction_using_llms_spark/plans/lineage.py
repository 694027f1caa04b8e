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
import shutil
import uuid

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Hive/Spark partition-path escaping (escapePathName): these chars (and
# control chars 0x00-0x1F plus DEL 0x7F) appear %XX-encoded in
# "<col>=<value>" directory names.  This is Hive's exact charToEscape set —
# note '}' is NOT escaped by Hive/Spark; a mismatch here makes
# _drop_partitions derive a different directory name than Spark wrote, so
# stale files would survive a resume.
_ESCAPE_CHARS = set('"#%\'*/:=?\\{[]^') | {"\x7f"}


def _partition_dir(out_path: str, key_col: str, value) -> str:
    if value is None:
        return os.path.join(out_path, f"{key_col}=__HIVE_DEFAULT_PARTITION__")
    escaped = "".join(
        f"%{ord(ch):02X}" if (ch in _ESCAPE_CHARS or ord(ch) < 32) else ch
        for ch in str(value)
    )
    return os.path.join(out_path, f"{key_col}={escaped}")


def _drop_partitions(out_path: str, key_col: str, keys) -> None:
    """Physically remove the output partitions for ``keys`` (local/POSIX
    paths; an object-store deployment would swap in the Hadoop FileSystem
    API here).  Dynamic partition overwrite only replaces partitions that
    appear in the NEW result — a key whose recompute yields zero rows (or
    that vanished from the input) must have its stale files deleted
    explicitly, or the full-table read silently resurrects old rows."""
    for k in keys:
        d = _partition_dir(out_path, key_col, k)
        if os.path.exists(d):
            shutil.rmtree(d)


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

    def mark_removed(self, stage: str, keys: list) -> None:
        """Ledger keys whose input partitions vanished: their output was
        dropped; the latest-row-wins read treats them as not-done."""
        if not keys:
            return
        df = self.spark.createDataFrame(
            [(str(k),) for k in keys], "partition_key string"
        ).select(
            F.lit(stage).alias("stage"),
            "partition_key",
            F.lit("").alias("input_hash"),
            F.lit(0).cast("long").alias("row_count"),
            F.lit("removed").alias("status"),
            F.lit(self.run_id).alias("run_id"),
            F.current_timestamp().alias("ts"),
        )
        df.write.mode("append").parquet(self.path)

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
    # keys recorded done but absent from the CURRENT input: their output
    # partitions are stale — drop files and ledger them as removed
    done = ledger.latest(stage)
    if done is not None:
        vanished = (
            done.where(F.col("status") == "done")
            .select("partition_key")
            .join(fps.select("partition_key"), "partition_key", "left_anti")
        )
        vkeys = [r["partition_key"] for r in vanished.collect()]  # driver-metadata collect
        if vkeys:
            _drop_partitions(out_path, key_col, vkeys)
            ledger.mark_removed(stage, vkeys)
    if todo.limit(1).count() > 0:
        # pre-delete every pending partition: dynamic overwrite only
        # replaces partitions PRESENT in the new result, so a stale key
        # whose recompute yields zero rows would otherwise survive on disk
        # while being ledgered done with row_count=0.  Safe under crashes:
        # todo keys are by definition not done-under-current-hash, so a
        # kill between delete and write just recomputes them next run.
        todo_keys = [r["partition_key"] for r in todo.collect()]  # driver-metadata collect
        _drop_partitions(out_path, key_col, todo_keys)
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
