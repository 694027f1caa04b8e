"""Both resolution layouts (packed / bucketed) produce identical ids —
they differ only in shuffle topology."""

from __future__ import annotations


def test_modes_agree(spark, sf_dir):
    from relation_extraction_using_llms_spark.functions.extraction import clean_text_df
    from relation_extraction_using_llms_spark.functions.parsing import parsed_triples_df
    from relation_extraction_using_llms_spark.operators.entity_catalog import (
        entity_catalog,
    )
    from relation_extraction_using_llms_spark.operators.gold_normalize import (
        gold_entities,
    )
    from relation_extraction_using_llms_spark.operators.linking import (
        doc_candidates,
        linking_catalog,
        resolve_in_document,
    )
    from relation_extraction_using_llms_spark.sources.synthetic import (
        pages_df,
        stub_responses_df,
    )

    pages = pages_df(spark, sf_dir).limit(120).cache()
    clean = clean_text_df(pages).select("url", "text")
    responses = stub_responses_df(spark, sf_dir, ["IO"], ["stub-large"]).join(
        clean.select("url"), "url", "left_semi"
    )
    triples = parsed_triples_df(responses.join(clean, "url"))
    ents = gold_entities(pages)
    cands = doc_candidates(ents, linking_catalog(ents, entity_catalog(ents)))

    def key(rows):
        return sorted(
            (r["url"], r["technique"], r["model"], r["pred_index"], r["head_id"], r["tail_id"])
            for r in rows
        )

    packed = key(resolve_in_document(triples, cands, mode="packed").collect())
    bucketed = key(resolve_in_document(triples, cands, mode="bucketed").collect())
    assert packed == bucketed
    assert len(packed) > 100
    assert any(h is not None for (_, _, _, _, h, _) in packed)


def test_pairs_mode_agrees(spark, sf_dir):
    """The distinct-pair layout resolves identically to packed/bucketed."""
    from relation_extraction_using_llms_spark.functions.extraction import clean_text_df
    from relation_extraction_using_llms_spark.functions.parsing import parsed_triples_df
    from relation_extraction_using_llms_spark.operators.entity_catalog import (
        full_catalog,
    )
    from relation_extraction_using_llms_spark.operators.gold_normalize import (
        gold_entities,
    )
    from relation_extraction_using_llms_spark.operators.linking import (
        doc_candidates,
        resolve_in_document,
    )
    from relation_extraction_using_llms_spark.sources.synthetic import (
        pages_df,
        stub_responses_df,
    )

    pages = pages_df(spark, sf_dir).limit(120).cache()
    clean = clean_text_df(pages).select("url", "text")
    responses = stub_responses_df(spark, sf_dir, ["IO"], ["stub-large"]).join(
        clean.select("url"), "url", "left_semi"
    )
    triples = parsed_triples_df(responses.join(clean, "url"))
    ents = gold_entities(pages)
    cat = full_catalog(ents)
    cands = doc_candidates(ents, cat)

    def key(rows):
        return sorted(
            (r["url"], r["pred_index"], r["head_id"], r["tail_id"]) for r in rows
        )

    packed = key(resolve_in_document(triples, cands, mode="packed").collect())
    pairs = key(
        resolve_in_document(
            triples,
            membership_df=ents.select("url", "entity_id"),
            catalog_df=cat,
        ).collect()
    )
    assert pairs == packed
    assert len(pairs) > 100


def test_full_catalog_equals_chain(spark, sf_dir):
    """full_catalog (one salted two-phase pass) row-for-row equals the
    linking_catalog(entity_catalog(...)) chain it replaces."""
    import pyspark.sql.functions as F

    from relation_extraction_using_llms_spark.operators.entity_catalog import (
        entity_catalog,
        full_catalog,
    )
    from relation_extraction_using_llms_spark.operators.linking import (
        linking_catalog,
    )
    from relation_extraction_using_llms_spark.sources.synthetic import gold_entities_df

    ents = gold_entities_df(spark, sf_dir).cache()
    chain = linking_catalog(ents, entity_catalog(ents))
    fused = full_catalog(ents)
    cols = [
        "entity_id", "entity_type", "canonical_name", "common_mentions",
        "mention_count", "document_count",
        F.array_sort("exact_forms").alias("exact_forms"),  # set: order-free
        "first20", "created_ord",
    ]

    def key(df):
        return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())

    a, b = key(chain), key(fused)
    assert len(a) == len(b) > 0
    assert a == b
