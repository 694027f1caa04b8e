"""SparkSession factory with scale-oriented defaults.

Local test runs use ``local[N]``; on a real cluster the same configs apply
(AQE, skew-join handling, Arrow batching).  Shuffle partitions default to the
core count locally — on a 1000-executor cluster you would size this to
2-3x total cores or let AQE coalesce from a high initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def tuned_conf(shuffle_partitions: int = 32) -> dict:
    """The engine's Spark conf, shared by ``get_spark`` (self-managed
    sessions) and the spark-submit entrypoint (scripts/run_pipeline.py,
    where master/deploy settings come from the submit command)."""
    return {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        # AQE coalescing is byte-based and blind to Python-CPU-heavy
        # applyInPandas stages: it collapsed the (small-bytes, big-CPU)
        # resolution shuffle to ~1 partition, serializing the cascade
        # (measured 23s -> 4s on sf0.1 by disabling).  We size
        # shuffle_partitions explicitly instead; skew-join stays on.
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # ObjectHashAggregate (every collect_list/collect_set packing stage:
        # eval input packing, resolve candidate packing, catalog partials)
        # falls back to SORT-based aggregation after only 128 distinct keys
        # per task by default — our packing aggregates routinely hold a few
        # thousand url-grain keys per task with small, bounded buffers, and
        # the sort fallback was measured ~15% slower on the eval/resolve
        # packing stages (guide §2.3: prefer hash aggregation while the
        # per-task state fits).  Buffer growth stays bounded: every
        # collect_* in this engine aggregates per-url or per-entity arrays
        # that are capped upstream (top-k slices, per-doc candidate sets).
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": "65536",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.ui.showConsoleProgress": "false",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    }


def get_spark(
    app_name: str = "kg-construct",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    AQE is on so runtime statistics re-plan shuffles (coalesce small
    partitions, split skewed ones); skew-join handling covers the
    head-entity hot keys called out in SURVEY.md §4 (salting is applied
    on top of this in the catalog/linking operators).
    """
    # Make this package importable by executor Python workers regardless of
    # the caller's cwd (the spark-submit equivalent of --py-files).  Must be
    # set before the JVM launches so spawned workers inherit it.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + existing if existing else "")
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in tuned_conf(shuffle_partitions).items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
