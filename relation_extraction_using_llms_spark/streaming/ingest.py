"""Incremental ingest via Structured Streaming (SURVEY.md §2.13).

The reference is strictly batch; incremental arrival of new crawl pages is
the one streaming-shaped concern the web-scale graft adds.  Design:
``readStream`` over the pages table directory with
``Trigger.AvailableNow`` — each run drains whatever new files exist, writes
extraction output exactly-once via checkpointing, then stops.  The same
transformation (``clean_text_df``) serves batch and stream: extraction is a
stateless mapInPandas, so the streaming plan is identical.

``events_hourly_stream`` shows the stateful path: watermarked tumbling
window over the events stream (late data beyond the watermark dropped) —
the streaming twin of the batch ``events_hourly`` query in
__spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.extraction import extract_batches
from ..schemas import CLEAN_TEXT, PAGES


def stream_pages(
    spark, pages_path: str, max_files_per_trigger: int = 64
) -> DataFrame:
    """Page-file stream; ``max_files_per_trigger`` bounds micro-batch size
    (back-pressure knob — size so one batch's extraction fits executor
    memory at the deployment's file sizes)."""
    return (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_path)
    )


def stream_clean_text(pages_stream: DataFrame) -> DataFrame:
    """Same extraction stage, streaming plan (stateless mapInPandas)."""
    return pages_stream.select("url", "html").mapInPandas(
        extract_batches, schema=CLEAN_TEXT
    )


def run_available_now(
    spark, pages_path: str, out_path: str, checkpoint_path: str
):
    """Drain currently-available page files exactly once and stop.
    Re-running after new files arrive processes only the delta (the
    checkpoint tracks consumed files) — the streaming analogue of the
    batch ledger's anti-join resume."""
    q = (
        stream_clean_text(stream_pages(spark, pages_path))
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def events_hourly_stream(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregate over an events stream.
    ``window`` is the tumbling width and ``watermark`` the lateness
    tolerance (events older than max-seen-ts − watermark are dropped);
    any Spark interval string works (``"15 minutes"``, ``"1 day"``).
    Defaults match the batch ``events_hourly`` oracle twin."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n", "sum_value")
    )


def events_sessions_native(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Sessionization via Spark's native ``session_window`` (gap-merge
    sessions; works identically on a watermarked stream with
    ``applyInPandasWithState``-free built-in state).  Per-user session and
    event counts — the built-in twin of the window-function formulation in
    __spark_entry__.q_events_sessions.

    Boundary note: ``session_window`` merges an event landing EXACTLY at
    lastEvent + gap (closed interval — pinned by a crafted fixture in
    tests/test_streaming_and_resume.py), matching the lag formulation's
    strictly-greater split; the two agree at every gap, including the
    boundary, so they safely share one oracle.
    """
    sess = events.withColumn("ts", F.col("ts").cast("timestamp")).groupBy(
        F.session_window("ts", gap).alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return sess.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: incremental entity-catalog maintenance.
# ---------------------------------------------------------------------------

CATALOG_STATE_SCHEMA = (
    "mention_count long, forms array<string>, form_counts array<long>"
)
CATALOG_UPDATE_SCHEMA = (
    "entity_id string, mention_count long, n_forms_tracked int,"
    " canonical_guess string"
)


def incremental_catalog_updates(
    mention_stream: DataFrame, max_forms: int = 64
):
    """Streaming twin of the batch entity catalog: maintain per-entity
    cumulative mention counts and a BOUNDED top-form table across
    micro-batches via ``applyInPandasWithState`` (north_star: custom
    stateful operators for incremental arrival).

    Input: a stream of (entity_id, text) mention occurrences.  State per
    entity is capped at ``max_forms`` (count-ranked; ties by form string),
    so a Zipfian head entity holds O(max_forms) state no matter how many
    mentions arrive.  Emits one update row per entity per micro-batch:
    (entity_id, cumulative mention_count, n_forms_tracked,
    canonical_guess = current top form).
    """
    import pandas as pd

    def update_fn(key, pdfs, state):
        counts: dict[str, int] = {}
        total = 0
        if state.exists:
            total, forms, form_counts = state.get
            counts = dict(zip(list(forms), [int(c) for c in form_counts]))
        for pdf in pdfs:
            for t in pdf["text"]:
                if t is None:
                    continue
                total += 1
                counts[t] = counts.get(t, 0) + 1
        # bound the state: keep the max_forms highest-count forms
        kept = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:max_forms]
        state.update((total, [k for k, _ in kept], [v for _, v in kept]))
        canonical = kept[0][0] if kept else None
        yield pd.DataFrame(
            {
                "entity_id": [key[0]],
                "mention_count": [total],
                "n_forms_tracked": [len(kept)],
                "canonical_guess": [canonical],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return mention_stream.groupBy("entity_id").applyInPandasWithState(
        update_fn,
        outputStructType=CATALOG_UPDATE_SCHEMA,
        stateStructType=CATALOG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup_exact(
    doc_stream: DataFrame,
    ts_col: str = "warc_ts",
    watermark: str = "24 hours",
    text_col: str = "text",
) -> DataFrame:
    """Dedup-on-ingest: drop re-crawled byte-identical pages as they
    arrive — the streaming twin of ``operators.dedup.exact_duplicates``.

    ``dropDuplicatesWithinWatermark`` keys on md5(text), so the state
    store holds one 32-char fingerprint per distinct page seen within
    the watermark horizon and Spark EXPIRES keys older than the
    watermark — bounded state no matter how long the stream runs, which
    is the property a 10^12-page crawl needs (a plain ``dropDuplicates``
    on a stream keeps every key forever).  Pages whose identical text
    re-arrives later than the horizon are re-admitted: downstream batch
    dedup (this module's batch twins) catches those, so the horizon
    trades state size against how much the batch pass has left to do.

    Emits the surviving rows with their fingerprint (``text_hash``).
    """
    return (
        doc_stream.withColumn("text_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
