"""Table-format abstraction: parquet paths today, Iceberg tables on a
real warehouse (north_rule: "over Iceberg tables of Common-Crawl-style
web pages").

This container ships no Iceberg runtime jar, so the Iceberg branch is
import-gated exactly like the multimodal decode stub: the code path is
real and shaped for deployment (catalog-qualified identifiers,
snapshot-isolated reads, partitioned writes), and it raises a clear
error here rather than pretending.  Everything downstream consumes plain
DataFrames, so swapping the source format changes NO operator code —
the same property the embedder backends have.

Deployment wiring (cluster-side, public Iceberg docs):

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
        --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
        --conf spark.sql.catalog.lake.type=hive ...

then ``read_table(spark, "lake.web.pages", fmt="iceberg")``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_table(
    spark: SparkSession,
    location: str,
    fmt: str = "parquet",
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read a source table.

    ``fmt="parquet"``: ``location`` is a path (the shipped testdata /
    stage-table layout).  ``fmt="iceberg"``: ``location`` is a
    catalog-qualified table identifier; ``snapshot_id`` pins a
    snapshot-isolated read (time travel) so a resumed pipeline stage
    re-reads exactly the bytes its first attempt saw — the Iceberg
    analogue of the stage-ledger idempotency contract.
    """
    if fmt == "parquet":
        return spark.read.parquet(location)
    if fmt == "iceberg":
        if not _iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; submit with "
                "--packages org.apache.iceberg:iceberg-spark-runtime-"
                "4.0_2.13:<version> and a spark.sql.catalog.* conf "
                "(no Iceberg jar ships in this container)"
            )
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(location)
    raise ValueError(f"unknown table format: {fmt!r}")


def write_table(
    df: DataFrame,
    location: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write a result table.  Parquet writes to a path; Iceberg writes a
    catalog table via the v2 writer.

    Iceberg ``mode`` semantics (the idempotent-stage contract):
      ``overwrite``  on an EXISTING table -> ``overwritePartitions()`` —
                     dynamic partition overwrite, replacing only the
                     partitions present in ``df`` (a resumed stage
                     re-writing one partition leaves siblings intact);
                     on a missing table -> ``create()``.
      ``append``     -> ``append()``.

    ``partition_by`` defines the table's partition spec and therefore
    only applies when the table is CREATED (DataFrameWriterV2 ignores
    ``partitionedBy`` for append/overwrite of an existing table — the
    spec already lives in the table metadata); passing it on later
    writes is harmless but has no effect, so this function only wires it
    into the create path."""
    if fmt == "parquet":
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(location)
        return
    if fmt == "iceberg":
        spark = df.sparkSession
        if not _iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath (see read_table)"
            )
        w = df.writeTo(location)
        if mode == "overwrite":
            if spark.catalog.tableExists(location):
                w.overwritePartitions()
            else:
                if partition_by:
                    from pyspark.sql import functions as F

                    w = w.partitionedBy(*[F.col(c) for c in partition_by])
                w.create()
        elif mode == "append":
            w.append()
        else:
            raise ValueError(f"unsupported iceberg write mode: {mode!r}")
        return
    raise ValueError(f"unknown table format: {fmt!r}")
