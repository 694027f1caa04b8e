"""Retry policy (O4) and incremental embedding store (S7/R3)."""

from __future__ import annotations

import urllib.error

import pyspark.sql.functions as F
import pytest

from relation_extraction_using_llms_spark.sources.stub_model import call_with_retry


def _http_error(code, headers=None):
    hdrs = headers if headers is not None else {}
    return urllib.error.HTTPError("http://x", code, "err", hdrs, None)


def test_retry_5xx_then_success():
    calls = {"n": 0}
    sleeps = []

    def req():
        calls["n"] += 1
        if calls["n"] < 4:
            raise _http_error(503)
        return "ok"

    assert call_with_retry(req, sleep=sleeps.append) == "ok"
    assert calls["n"] == 4
    assert sleeps == [2.0, 4.0, 8.0]  # exponential base 2*2^k


def test_retry_4xx_fails_fast():
    calls = {"n": 0}

    def req():
        calls["n"] += 1
        raise _http_error(400)

    with pytest.raises(urllib.error.HTTPError):
        call_with_retry(req, sleep=lambda _: None)
    assert calls["n"] == 1


def test_retry_429_honors_retry_after_and_cap():
    calls = {"n": 0}
    sleeps = []

    class H(dict):
        def get(self, k, default=None):
            return {"Retry-After": "7"}.get(k, default)

    def req():
        calls["n"] += 1
        if calls["n"] <= 2:
            raise _http_error(429, H())
        return "ok"

    assert call_with_retry(req, sleep=sleeps.append) == "ok"
    assert sleeps == [7.0, 7.0]


def test_retry_gives_up_after_max():
    def req():
        raise _http_error(500)

    with pytest.raises(urllib.error.HTTPError):
        call_with_retry(req, max_retries=3, sleep=lambda _: None)


def test_embedding_store_incremental(spark, sf_dir, tmp_path):
    from relation_extraction_using_llms_spark.sources.embedding_store import (
        update_store,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_key"), "text"
    )
    path = str(tmp_path / "emb_store")

    first = update_store(docs.limit(50), path)
    n_first = first.count()
    assert n_first == 50

    # same input: nothing re-embedded — an append of re-embedded rows would
    # grow the store (the anti-join is the only guard)
    again = update_store(docs.limit(50), path)
    assert again.count() == n_first

    # superset: only the delta embeds; distinct hashes match exactly
    n_distinct_80 = docs.limit(80).select(F.sha2("text", 256)).distinct().count()
    wider = update_store(docs.limit(80), path)
    assert wider.count() == wider.select("text_hash").distinct().count() == n_distinct_80
    assert wider.count() > n_first


def test_table_format_abstraction(spark, tmp_path):
    """read_table/write_table: the parquet path round-trips (partitioned
    write included); the Iceberg branch is honestly gated — without the
    runtime jar it raises a clear deploy hint, never a cryptic py4j
    error."""
    import pytest

    from relation_extraction_using_llms_spark.sources.tables import (
        read_table,
        write_table,
    )

    df = spark.range(20).selectExpr("id", "id % 3 AS part")
    p = str(tmp_path / "t")
    write_table(df, p, partition_by=("part",))
    back = read_table(spark, p)
    assert back.count() == 20
    assert {r["part"] for r in back.select("part").distinct().collect()} == {0, 1, 2}
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        read_table(spark, "lake.web.pages", fmt="iceberg")
    with pytest.raises(RuntimeError, match="classpath"):
        write_table(df, "lake.web.out", fmt="iceberg")
    with pytest.raises(ValueError, match="unknown table format"):
        read_table(spark, p, fmt="delta")


def test_iceberg_write_call_chain(spark, monkeypatch):
    """Pin the jar-gated Iceberg branch with a stub writer so it cannot
    drift (the container has no Iceberg runtime, so this is the only way
    to test it): mode="overwrite" on an EXISTING table must be
    overwritePartitions() — dynamic partition overwrite, never a
    whole-table replace (createOrReplace would wipe sibling partitions on
    a resumed-stage re-run); a missing table is created WITH the
    partition spec; append never calls partitionedBy (the spec lives in
    the table metadata after creation)."""
    import pytest

    from relation_extraction_using_llms_spark.sources import tables

    calls: list[tuple] = []

    class FakeWriter:
        def partitionedBy(self, *cols):
            calls.append(("partitionedBy", len(cols)))
            return self

        def overwritePartitions(self):
            calls.append(("overwritePartitions",))

        def create(self):
            calls.append(("create",))

        def createOrReplace(self):
            calls.append(("createOrReplace",))

        def append(self):
            calls.append(("append",))

    class FakeCatalog:
        def __init__(self, exists):
            self._exists = exists

        def tableExists(self, name):
            calls.append(("tableExists", name))
            return self._exists

    class FakeSession:
        def __init__(self, exists):
            self.catalog = FakeCatalog(exists)

    class FakeDF:
        def __init__(self, exists):
            self.sparkSession = FakeSession(exists)

        def writeTo(self, loc):
            calls.append(("writeTo", loc))
            return FakeWriter()

    monkeypatch.setattr(tables, "_iceberg_available", lambda s: True)

    # overwrite + existing table -> dynamic partition overwrite ONLY
    calls.clear()
    tables.write_table(
        FakeDF(True), "lake.g.t", fmt="iceberg", mode="overwrite",
        partition_by=("day",),
    )
    assert ("overwritePartitions",) in calls
    assert not any(c[0] in ("createOrReplace", "create", "partitionedBy") for c in calls)

    # overwrite + missing table -> create WITH the partition spec
    calls.clear()
    tables.write_table(
        FakeDF(False), "lake.g.t", fmt="iceberg", mode="overwrite",
        partition_by=("day", "lang"),
    )
    assert ("partitionedBy", 2) in calls and ("create",) in calls
    assert not any(
        c[0] in ("createOrReplace", "overwritePartitions", "append") for c in calls
    )

    # append -> append, partition spec NOT re-declared
    calls.clear()
    tables.write_table(
        FakeDF(True), "lake.g.t", fmt="iceberg", mode="append",
        partition_by=("day",),
    )
    assert calls == [("writeTo", "lake.g.t"), ("append",)]

    with pytest.raises(ValueError, match="unsupported iceberg write mode"):
        tables.write_table(FakeDF(True), "lake.g.t", fmt="iceberg", mode="replace")
