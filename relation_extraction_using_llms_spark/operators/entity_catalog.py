"""Global entity catalog (SURVEY.md §2.4, E1/E2).

Reference semantics (pipeline/data/entity_map.py:18-74): accumulate every
mention of each entity id across all documents; per entity, the top-10
surface forms by frequency (ties broken by first-seen order, matching
``Counter.most_common`` under sorted-document processing), canonical name =
the mode, ``document_count = max(1, n_unique_forms // 2)``.

Scale design (north_rule skew clause): entity ids are Zipfian — a head
entity can have billions of mentions at 10^12 docs.  We therefore never
``collect_list`` raw mentions per entity.  Stage 1 aggregates at
``(entity_id, surface form)`` grain — the surface form in the key spreads a
hot entity across partitions (a natural salt).  Stage 2 aggregates the
per-form counts (thousands of rows per entity at most) into the catalog
row.  Both stages are map-side-combinable built-in aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mention_counts(gold_entities_df: DataFrame) -> DataFrame:
    """(entity_id, text) -> count + first-seen order key + first type.

    First-seen = lexicographically smallest (url, mention position), the
    deterministic stand-in for the reference's insertion order under
    sorted-file processing (loader.py:44 sorts the glob).
    """
    occ = gold_entities_df.select(
        "url",
        "entity_id",
        "entity_type",
        F.posexplode("mentions").alias("pos", "mention"),
    ).select(
        "url",
        "entity_id",
        "entity_type",
        "pos",
        F.col("mention.text").alias("text"),
    )
    order_key = F.struct(F.col("url"), F.col("pos"))
    return occ.groupBy("entity_id", "text").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(order_key).alias("first_seen"),
        F.min_by("entity_type", order_key).alias("entity_type"),
    )


def entity_catalog(gold_entities_df: DataFrame, top_k: int = 10) -> DataFrame:
    """ENTITY_CATALOG rows from gold entities (E1+E2)."""
    counts = mention_counts(gold_entities_df)
    w = Window.partitionBy("entity_id").orderBy(
        F.col("n").desc(), F.col("first_seen").asc()
    )
    ranked = counts.withColumn("rank", F.row_number().over(w))
    return (
        ranked.groupBy("entity_id")
        .agg(
            # type at entity creation = first occurrence overall (entity_map.py:31-40)
            F.min_by("entity_type", F.col("first_seen")).alias("entity_type"),
            F.max(F.when(F.col("rank") == 1, F.col("text"))).alias("canonical_name"),
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rank") <= top_k,
                            F.struct(F.col("rank"), F.col("text")),
                        )
                    )
                ),
                lambda s: s["text"],
            ).alias("common_mentions"),
            F.sum("n").alias("mention_count"),
            F.greatest(
                F.lit(1), (F.count(F.lit(1)) / 2).cast("long")
            ).alias("document_count"),
        )
    )
