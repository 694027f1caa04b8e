"""Incremental embedding store (SURVEY.md §2.1 S7, §2.6 R1/R3).

The reference keeps ``embeddings.npy`` + hash indexes and re-embeds only
changed files (vector_store.py:69-146, embeddings.py:111-138).  Here the
store is a parquet table ``(text_hash, doc_key, embedding)``; the
change-data gate is a left-anti join on ``sha2(text)`` and embedding is an
Arrow-batched pandas UDF calling the embedder (deterministic hash embedder
by default; a served model in deployment — batch size = Arrow batch, the
analogue of the reference's batch-50 API calls).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def default_embedder(texts: list[str], dim: int = 64) -> list[list[float]]:
    """Deterministic stand-in for the served embedding model."""
    from ..operators.matching import _hash_embed

    return [_hash_embed(t or "", dim) for t in texts]


def embed_df(texts_df: DataFrame, embedder=None, dim: int = 64) -> DataFrame:
    """(doc_key, text) -> (doc_key, text_hash, embedding) via mapInPandas."""
    embedder = embedder or default_embedder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_key": pdf["doc_key"],
                    "text_hash": pdf["text_hash"],
                    "embedding": embedder(list(pdf["text"])),
                }
            )

    prepared = texts_df.select(
        "doc_key", "text", F.sha2(F.coalesce("text", F.lit("")), 256).alias("text_hash")
    )
    return prepared.mapInPandas(
        run, schema="doc_key string, text_hash string, embedding array<float>"
    )


def read_store(spark, store_path: str) -> DataFrame | None:
    if not os.path.exists(store_path):
        return None
    try:
        return spark.read.parquet(store_path)
    except Exception:
        return None


def update_store(
    texts_df: DataFrame, store_path: str, embedder=None
) -> DataFrame:
    """Embed only texts whose hash is absent from the store (R3), append,
    return the full store.  Idempotent: re-running with the same input
    embeds nothing."""
    spark = texts_df.sparkSession
    store = read_store(spark, store_path)
    hashed = texts_df.select(
        "doc_key", "text", F.sha2(F.coalesce("text", F.lit("")), 256).alias("text_hash")
    )
    if store is not None:
        todo = hashed.join(store.select("text_hash"), "text_hash", "left_anti")
    else:
        todo = hashed
    if todo.limit(1).count() > 0:
        embed_df(todo, embedder).write.mode("append").parquet(store_path)
    return spark.read.parquet(store_path)
