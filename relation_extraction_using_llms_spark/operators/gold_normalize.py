"""Gold annotation normalization (SURVEY.md §2.3, G1-G3).

Reference semantics (setup_scripts/generate_gold_relations.py:47-134),
re-expressed as declarative DataFrame transforms:

  G1 collect_entities : explode passages x annotations x locations ->
     groupBy (url, identifier) with first-seen type and ordered mentions
  G2 collect_relations: project relation infons, drop incomplete rows
  G3 integrity filter : keep relations whose head AND tail exist in the
     document's entity set (two left-semi joins)

All JVM-side: from_json + explodes + aggregates; zero Python UDFs.
At 10^12-doc scale each groupBy keys on (url, entity_id) — per-document,
so no global hot keys; the cross-document catalog (entity_catalog.py) is
where skew handling lives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.bioc import bioc_docs, passages_df


def gold_entities(pages_df: DataFrame) -> DataFrame:
    """G1: per-document entities with mention spans.

    Output: (url, entity_id, entity_type, mentions array<struct>) where
    mentions are ordered by (passage_index, annotation position, location
    position) — the reference's accumulation order — and entity_type is the
    first type seen in that order.
    """
    ann = (
        passages_df(pages_df)
        .select(
            "url",
            "passage_index",
            F.col("passage.offset").alias("passage_offset"),
            F.posexplode_outer("passage.annotations").alias("ann_index", "ann"),
        )
        .select(
            "url",
            "passage_index",
            "passage_offset",
            "ann_index",
            F.trim(F.coalesce(F.col("ann.infons.identifier"), F.lit(""))).alias("entity_id"),
            F.trim(F.coalesce(F.col("ann.infons.type"), F.lit(""))).alias("entity_type"),
            F.trim(F.coalesce(F.col("ann.text"), F.lit(""))).alias("mention_text"),
            F.posexplode_outer(F.col("ann.locations")).alias("loc_index", "loc"),
        )
        .where(F.col("entity_id") != "")
    )
    mention = F.struct(
        F.col("mention_text").alias("text"),
        F.col("passage_index").cast("int").alias("passage_index"),
        F.col("passage_offset").cast("int").alias("passage_offset"),
        F.coalesce(F.col("loc.offset"), F.lit(0)).cast("int").alias("char_offset"),
        F.coalesce(F.col("loc.length"), F.length("mention_text")).cast("int").alias("length"),
    )
    ordered = F.struct("passage_index", "ann_index", "loc_index").alias("ord")
    return (
        ann.select("url", "entity_id", "entity_type", ordered, mention.alias("m"))
        .groupBy("url", "entity_id")
        .agg(
            F.min_by("entity_type", F.col("ord")).alias("entity_type"),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("ord"), F.col("m")))
                ),
                lambda s: s["m"],
            ).alias("mentions"),
        )
    )


def gold_relations_raw(pages_df: DataFrame) -> DataFrame:
    """G2: project relation infons; drop rows missing entity1/entity2/type."""
    rel = bioc_docs(pages_df).select(
        "url", F.explode_outer("relations").alias("rel")
    )
    out = rel.select(
        "url",
        F.trim(F.coalesce(F.col("rel.id"), F.lit(""))).alias("rel_id"),
        F.trim(F.coalesce(F.col("rel.infons.entity1"), F.lit(""))).alias("head_id"),
        F.trim(F.coalesce(F.col("rel.infons.entity2"), F.lit(""))).alias("tail_id"),
        F.trim(F.coalesce(F.col("rel.infons.type"), F.lit(""))).alias("rel_type"),
        F.trim(F.coalesce(F.col("rel.infons.novel"), F.lit(""))).alias("novel"),
    )
    return out.where(
        (F.col("head_id") != "") & (F.col("tail_id") != "") & (F.col("rel_type") != "")
    )


def gold_relations(pages_df: DataFrame, entities_df: DataFrame | None = None) -> DataFrame:
    """G2 + G3: relations whose head and tail both exist in the document's
    entity set (generate_gold_relations.py:130-134), as two left-semi joins."""
    ents = (entities_df if entities_df is not None else gold_entities(pages_df)).select(
        "url", "entity_id"
    )
    rels = gold_relations_raw(pages_df)
    return rels.join(
        ents.withColumnRenamed("entity_id", "head_id"), ["url", "head_id"], "left_semi"
    ).join(
        ents.withColumnRenamed("entity_id", "tail_id"), ["url", "tail_id"], "left_semi"
    )
