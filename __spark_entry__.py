"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end KG-construction pipeline on
sf0.001.  ``queries()`` exposes one entry per implemented operator from
SURVEY.md §2 (+ the training-data ops); ``oracle_sql()`` provides DuckDB
twins for every SQL-expressible one.  Non-SQL-expressible pipeline stages
(html parsing, greedy matching, LSH) get rows-only checks by design.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_ROOT)
# Executor Python workers resolve our UDF modules by name; make the package
# importable for them even when the caller built the SparkSession itself
# (only effective if this module is imported before the JVM launches —
# session.get_spark does the same for sessions we create).
_existing = os.environ.get("PYTHONPATH", "")
if _REPO_ROOT not in _existing.split(os.pathsep):
    os.environ["PYTHONPATH"] = _REPO_ROOT + (
        os.pathsep + _existing if _existing else ""
    )

from pyspark.sql import functions as F  # noqa: E402

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _pipeline(spark, sf_dir, **overrides):
    from relation_extraction_using_llms_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from relation_extraction_using_llms_spark.sources.stub_model import make_stub_model
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    cfg = PipelineConfig(
        techniques=overrides.get("techniques", ["IO", "ReAct"]),
        modes=["improved"],
        models=overrides.get("models", ["stub-large"]),
        strategies=overrides.get("strategies", ["exact", "text", "jaccard"]),
        with_types_variants=overrides.get("with_types_variants", (True,)),
    )
    pages = pages_df(spark, sf_dir)
    return run_pipeline(spark, pages, cfg, model_fn=make_stub_model(sf_dir))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pipeline on sf0.001 -> eval_aggregate table."""
    stages = _pipeline(spark, "/root/testdata/sf0.001")
    return stages["eval_aggregate"].orderBy(
        "strategy", "with_types", "technique", "model"
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def q_clean_extract(spark, sf_dir):
    from relation_extraction_using_llms_spark.functions.extraction import clean_text_df
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    return clean_text_df(pages_df(spark, sf_dir)).select(
        "url", "title", F.length("file_text").alias("n_bytes"), "text"
    )


def q_gold_entities(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.gold_normalize import (
        gold_entities,
    )
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    return gold_entities(pages_df(spark, sf_dir)).select(
        "url", "entity_id", "entity_type", F.size("mentions").alias("n_mentions")
    )


def q_gold_relations(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.gold_normalize import (
        gold_relations,
    )
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    return gold_relations(pages_df(spark, sf_dir))


def q_entity_catalog(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.entity_catalog import (
        entity_catalog,
    )
    from relation_extraction_using_llms_spark.sources.synthetic import (
        gold_entities_df,
        pages_df,
    )

    return entity_catalog(gold_entities_df(spark, sf_dir)).select(
        "entity_id",
        "entity_type",
        "canonical_name",
        F.size("common_mentions").alias("n_common"),
        "mention_count",
        "document_count",
    )


def q_parse_triples(spark, sf_dir):
    from relation_extraction_using_llms_spark.functions.extraction import clean_text_df
    from relation_extraction_using_llms_spark.functions.parsing import parsed_triples_df
    from relation_extraction_using_llms_spark.sources.synthetic import (
        pages_df,
        stub_responses_df,
    )

    clean = clean_text_df(pages_df(spark, sf_dir)).select("url", "text")
    resp = stub_responses_df(spark, sf_dir, ["IO", "ReAct"], ["stub-large"])
    return parsed_triples_df(resp.join(clean, "url")).select(
        "url",
        "technique",
        "model",
        "pred_index",
        "head_mention",
        "tail_mention",
        "relation_type",
        F.round("confidence", 6).alias("confidence"),
    )


def q_resolved_triples(spark, sf_dir):
    return _pipeline(spark, sf_dir)["resolved"].select(
        "url",
        "technique",
        "model",
        "pred_index",
        "head_mention",
        "tail_mention",
        "relation_type",
        "head_id",
        "tail_id",
    )


def q_eval_per_doc(spark, sf_dir):
    df = _pipeline(spark, sf_dir)["eval_per_doc"]
    return df.select(
        "url",
        "technique",
        "model",
        "strategy",
        "with_types",
        "tp",
        "fp",
        "fn",
        "n_semantic",
        F.round("precision", 9).alias("precision"),
        F.round("recall", 9).alias("recall"),
        F.round("f1_score", 9).alias("f1_score"),
        F.round("graph_edit_distance", 9).alias("graph_edit_distance"),
    )


def q_eval_aggregate(spark, sf_dir):
    df = _pipeline(spark, sf_dir)["eval_aggregate"]
    return df.select(
        "technique",
        "model",
        "strategy",
        "with_types",
        "n_docs",
        "total_tp",
        "total_fp",
        "total_fn",
        F.round("macro_f1", 9).alias("macro_f1"),
        F.round("micro_f1", 9).alias("micro_f1"),
    )


def q_model_ranking(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.aggregate import model_ranking

    stages = _pipeline(spark, sf_dir, models=["stub-small", "stub-large"])
    return model_ranking(stages["eval_aggregate"]).select(
        "strategy",
        "with_types",
        "model",
        F.round("composite_score", 9).alias("composite_score"),
        "rank",
    )


def q_canonical_triples(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.canonicalize import (
        canonical_mapping,
        materialize_triples,
    )
    from relation_extraction_using_llms_spark.operators.entity_catalog import (
        entity_catalog,
    )
    from relation_extraction_using_llms_spark.operators.linking import linking_catalog
    from relation_extraction_using_llms_spark.sources.synthetic import gold_entities_df

    stages = _pipeline(spark, sf_dir)
    ents = gold_entities_df(spark, sf_dir)
    link_cat = linking_catalog(ents, entity_catalog(ents))
    cmap = canonical_mapping(link_cat)
    return materialize_triples(stages["resolved"], cmap).select(
        "subj", "pred", "obj", "url", "technique", "model", "subj_bucket"
    )


# ---- SQL-checkable operators over the shipped tables ----------------------


def q_dedup_exact(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_docs(spark, sf_dir))


def q_dedup_prefix(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.dedup import prefix_duplicates

    return prefix_duplicates(_docs(spark, sf_dir))


def q_dedup_ngram_jaccard(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), n=3, threshold=0.5
    ).select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_minhash_lsh(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir), jaccard_threshold=0.5).select(
        "doc_a", "doc_b"
    )


def q_dedup_simhash(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.dedup import simhash_pairs

    return simhash_pairs(_docs(spark, sf_dir), hamming_threshold=3)


def q_dedup_embedding(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    return embedding_near_dup_pairs(_emb(spark, sf_dir), threshold=0.95).select(
        "vec_a", "vec_b"
    )


def q_ann_topk(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, queries, k=10).select("query_id", "vec_id", "rank")


def q_ann_lsh_topk(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.similarity import lsh_topk

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(emb, queries, k=10).select("query_id", "vec_id", "rank")


def q_token_count(spark, sf_dir):
    from relation_extraction_using_llms_spark.functions.textstats import token_count

    return token_count(_docs(spark, sf_dir))


def q_language_id(spark, sf_dir):
    from relation_extraction_using_llms_spark.functions.textstats import language_id

    return language_id(_docs(spark, sf_dir))


def q_quality_score(spark, sf_dir):
    from relation_extraction_using_llms_spark.functions.textstats import quality_score

    return quality_score(_docs(spark, sf_dir)).select(
        "doc_id",
        "n_tokens",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("unique_ratio", 6).alias("unique_ratio"),
        F.round("quality_score", 6).alias("quality_score"),
    )


def q_fingerprint(spark, sf_dir):
    from relation_extraction_using_llms_spark.functions.textstats import fingerprint

    return fingerprint(_docs(spark, sf_dir))


def q_top_tokens_per_source(spark, sf_dir):
    """E2-shaped top-k window: top-10 tokens by frequency per source."""
    from pyspark.sql import Window

    tok = _docs(spark, sf_dir).select(
        "source", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token")
    )
    counts = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("source", "token", "n", "rank")
    )


def q_dataset_align(spark, sf_dir):
    """S4 left-outer alignment with empty-default (loader.py:186-223)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "left").select(
        "o_orderkey",
        F.coalesce("c_name", F.lit("__missing__")).alias("cust_name"),
        F.coalesce("c_mktsegment", F.lit("__none__")).alias("segment"),
    )


def _pred_gold_lineitem(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    gold = li.where(F.col("l_discount") > 0.05).select(
        "l_orderkey", "l_partkey"
    ).distinct()
    pred = li.where(F.col("l_tax") > 0.04).select("l_orderkey", "l_partkey").distinct()
    return pred, gold


def q_match_metrics_sql(spark, sf_dir):
    """Q1-Q4 formula parity on a deterministic pred/gold derivation."""
    pred, gold = _pred_gold_lineitem(spark, sf_dir)
    tp = pred.join(gold, ["l_orderkey", "l_partkey"]).groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("tp")
    )
    np_ = pred.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_pred"))
    ng = gold.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_gold"))
    m = (
        ng.join(np_, "l_orderkey", "full_outer")
        .join(tp, "l_orderkey", "left")
        .select(
            "l_orderkey",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("n_gold", F.lit(0)).alias("n_gold"),
        )
    )
    tp_, npred, ngold = F.col("tp"), F.col("n_pred"), F.col("n_gold")
    fp, fn = npred - tp_, ngold - tp_
    prec = F.when(npred > 0, tp_ / npred).otherwise(F.lit(0.0))
    rec = F.when(ngold > 0, tp_ / ngold).otherwise(F.lit(0.0))
    return m.select(
        "l_orderkey",
        "tp",
        fp.alias("fp"),
        fn.alias("fn"),
        F.round(prec, 9).alias("precision"),
        F.round(rec, 9).alias("recall"),
        F.round(
            F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0)),
            9,
        ).alias("f1_score"),
        F.round(F.when(ngold > 0, fn / ngold).otherwise(F.lit(0.0)), 9).alias(
            "omission_rate"
        ),
        F.round(F.when(npred > 0, fp / npred).otherwise(F.lit(0.0)), 9).alias(
            "hallucination_rate"
        ),
    )


def q_macro_micro_sql(spark, sf_dir):
    """A2/A3 formula parity: macro/micro over the per-doc metric rows,
    grouped by order priority."""
    per_doc = q_match_metrics_sql(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    j = per_doc.join(orders, "l_orderkey")
    tp, fp, fn = F.sum("tp"), F.sum("fp"), F.sum("fn")
    micro_p = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    micro_r = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    # macro averages sum thousands of doubles whose order differs between
    # engines; 6 decimals absorbs the ulp drift (9 was too tight — r1 hash FAIL)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("precision"), 6).alias("macro_precision"),
        F.round(F.avg("recall"), 6).alias("macro_recall"),
        F.round(F.avg("f1_score"), 6).alias("macro_f1"),
        tp.alias("total_tp"),
        fp.alias("total_fp"),
        fn.alias("total_fn"),
        F.round(micro_p, 9).alias("micro_precision"),
        F.round(micro_r, 9).alias("micro_recall"),
    )


def q_ged_sql(spark, sf_dir):
    """Q6 set-algebra parity: symmetric-difference edit counts between two
    deterministic edge sets derived from orders."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    gold = orders.where(F.col("o_orderstatus") == "F").select(
        (F.col("o_custkey") % 100).alias("src"), (F.col("o_orderkey") % 97).alias("dst")
    ).distinct()
    pred = orders.where(F.col("o_orderstatus") == "O").select(
        (F.col("o_custkey") % 100).alias("src"), (F.col("o_orderkey") % 97).alias("dst")
    ).distinct()
    edge_edits = (
        pred.withColumn("p", F.lit(1))
        .join(gold.withColumn("g", F.lit(1)), ["src", "dst"], "full_outer")
        .agg(
            F.sum(
                F.when(F.col("p").isNull() | F.col("g").isNull(), 1).otherwise(0)
            ).alias("edge_edits")
        )
    )
    def nodes(df):
        return df.select(F.col("src").alias("n")).union(
            df.select(F.col("dst").alias("n"))
        ).distinct()

    node_edits = (
        nodes(pred)
        .withColumn("p", F.lit(1))
        .join(nodes(gold).withColumn("g", F.lit(1)), ["n"], "full_outer")
        .agg(
            F.sum(
                F.when(F.col("p").isNull() | F.col("g").isNull(), 1).otherwise(0)
            ).alias("node_edits")
        )
    )
    return edge_edits.crossJoin(node_edits).select(
        "edge_edits",
        "node_edits",
        (F.col("edge_edits") + F.col("node_edits")).alias("graph_edit_distance"),
    )


def q_redundancy_sql(spark, sf_dir):
    """Q5 parity: duplicate rate over (least,greatest,flag) triples per
    order."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keyed = li.select(
        "l_orderkey",
        F.concat_ws(
            "|",
            F.least("l_partkey", "l_suppkey"),
            F.greatest("l_partkey", "l_suppkey"),
            "l_returnflag",
        ).alias("k"),
    )
    per_key = keyed.groupBy("l_orderkey", "k").agg(F.count(F.lit(1)).alias("c"))
    return per_key.groupBy("l_orderkey").agg(
        F.round(
            F.sum(F.col("c") - 1) / F.sum("c"), 9
        ).alias("redundancy_rate")
    )


def q_cache_antijoin(spark, sf_dir):
    """S5 resume semantics: work set anti-joined against 'cached' keys."""
    docs = _docs(spark, sf_dir).select("doc_id")
    cached = docs.where(F.col("doc_id") % 3 == 0)
    return docs.join(cached, "doc_id", "left_anti")


def q_events_hourly(spark, sf_dir):
    """Streaming-shaped tumbling-window aggregate, batch form (the
    Structured Streaming job in streaming/ingest.py runs this same plan)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_eval_all_strategies(spark, sf_dir):
    """All 10 matching strategies (M1-M10) end-to-end on a 150-doc slice —
    rows-only by design (greedy order-dependent matching is not
    SQL-expressible)."""
    from relation_extraction_using_llms_spark.operators.matching import ALL_STRATEGIES
    from relation_extraction_using_llms_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from relation_extraction_using_llms_spark.sources.stub_model import make_stub_model
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    cfg = PipelineConfig(
        techniques=["ReAct"],
        models=["stub-large"],
        strategies=ALL_STRATEGIES,
        with_types_variants=(True,),
    )
    pages = pages_df(spark, sf_dir).limit(150)
    stages = run_pipeline(spark, pages, cfg, model_fn=make_stub_model(sf_dir))
    return stages["counts"].select(
        "url", "strategy", "tp", "fp", "fn", "n_semantic",
        F.round("semantic_sum", 6).alias("semantic_sum"),
    )


def q_events_sessions(spark, sf_dir):
    """Sessionization via window functions: a new session starts after a
    >30 min gap; per user count sessions and events."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cast timestamp -> double keeps sub-second precision (events.ts carries
    # microseconds; unix_timestamp truncates and diverges from epoch())
    epoch = F.col("ts").cast("timestamp").cast("double")
    gapped = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when((epoch - F.lag(epoch).over(w)) > 1800, 1)
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = gapped.withColumn("session_id", F.sum("new_session").over(w2))
    return sess.groupBy("user_id").agg(
        (F.max("session_id") + 1).cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_technique_rankings(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.aggregate import (
        technique_rankings,
    )

    stages = _pipeline(spark, sf_dir)
    return technique_rankings(stages["eval_aggregate"]).select(
        "strategy", "with_types", "technique", "model", "metric",
        F.round("value", 9).alias("value"), "rank",
    )


def q_strategy_summary(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.aggregate import (
        strategy_summary,
    )

    stages = _pipeline(spark, sf_dir)
    return strategy_summary(stages["eval_aggregate"]).select(
        "strategy", "with_types",
        F.round("avg_f1", 9).alias("avg_f1"),
        F.round("best_f1", 9).alias("best_f1"),
        F.round("worst_f1", 9).alias("worst_f1"),
        "best_combo", "n_combos",
    )


def q_multimodal_features(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.multimodal import (
        attach_fake_media,
        extract_features,
    )

    media = attach_fake_media(_docs(spark, sf_dir))
    return extract_features(media).select(
        "doc_id", "media_type", F.round(F.element_at("feature", 1), 6).alias("f0")
    )


def q_multimodal_frames(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.multimodal import (
        attach_fake_media,
        sample_frames,
    )

    media = attach_fake_media(_docs(spark, sf_dir))
    return sample_frames(media).select("doc_id", "frame_index")


def q_multimodal_resize(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.multimodal import (
        attach_fake_media,
        resize_metadata,
    )

    return resize_metadata(attach_fake_media(_docs(spark, sf_dir)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # pipeline operators (synthetic corpus; rows-only checks)
        "clean_extract": q_clean_extract,
        "gold_entities": q_gold_entities,
        "gold_relations": q_gold_relations,
        "entity_catalog": q_entity_catalog,
        "parse_triples": q_parse_triples,
        "resolved_triples": q_resolved_triples,
        "eval_per_doc": q_eval_per_doc,
        "eval_aggregate": q_eval_aggregate,
        "model_ranking": q_model_ranking,
        "canonical_triples": q_canonical_triples,
        "eval_all_strategies": q_eval_all_strategies,
        # dedup / similarity / text / multimodal (SQL twins where exact)
        "dedup_exact": q_dedup_exact,
        "dedup_prefix": q_dedup_prefix,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding": q_dedup_embedding,
        "ann_topk": q_ann_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "text_token_count": q_token_count,
        "text_language_id": q_language_id,
        "text_quality": q_quality_score,
        "text_fingerprint": q_fingerprint,
        "top_tokens_per_source": q_top_tokens_per_source,
        "dataset_align": q_dataset_align,
        "match_metrics_sql": q_match_metrics_sql,
        "macro_micro_sql": q_macro_micro_sql,
        "ged_sql": q_ged_sql,
        "redundancy_sql": q_redundancy_sql,
        "cache_antijoin": q_cache_antijoin,
        "events_hourly": q_events_hourly,
        "events_sessions": q_events_sessions,
        "technique_rankings": q_technique_rankings,
        "strategy_summary": q_strategy_summary,
        "multimodal_features": q_multimodal_features,
        "multimodal_frames": q_multimodal_frames,
        "multimodal_resize": q_multimodal_resize,
    }


def oracle_sql() -> dict[str, str]:
    en = ", ".join(f"'{w}'" for w in ["the", "and", "of", "to", "is", "in", "that", "with"])
    de = ", ".join(f"'{w}'" for w in ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"])
    es = ", ".join(f"'{w}'" for w in ["el", "la", "los", "las", "es", "que", "con", "una"])
    return {
        "dedup_exact": """
            SELECT md5(text) AS text_hash, count(*) AS n_docs,
                   min(doc_id) AS canonical_doc_id
            FROM documents GROUP BY 1 HAVING count(*) > 1
        """,
        "dedup_prefix": """
            SELECT md5(array_to_string(
                       string_split_regex(trim(text), '\\s+')[1:8], ' ')) AS prefix_hash,
                   count(*) AS n_docs, min(doc_id) AS canonical_doc_id
            FROM documents GROUP BY 1 HAVING count(*) > 1
        """,
        "dedup_ngram_jaccard": """
            WITH toks AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
              FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id,
                     array_to_string(t[i:i+2], ' ') AS shingle
              FROM toks, UNNEST(generate_series(1, greatest(len(t)-2, 1))) AS u(i)
            ), kept AS (
              SELECT * FROM sh WHERE shingle NOT IN (
                SELECT shingle FROM sh GROUP BY 1 HAVING count(*) > 200)
            ), sizes AS (
              SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY 1
            ), pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
              FROM kept a JOIN kept b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 6) AS jaccard
            FROM pairs
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE shared * 1.0 / (sa.n_sh + sb.n_sh - shared) >= 0.5
        """,
        "dedup_embedding": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding, b.embedding) >= 0.95
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
                       WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(q.embedding, e.embedding) AS cosine
              FROM q, embeddings e
            ), ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, vec_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 10
        """,
        "text_token_count": """
            SELECT doc_id,
                   len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
                   CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subwords_est,
                   len(list_distinct(string_split_regex(lower(trim(text)), '\\s+')))
                       AS n_unique_tokens
            FROM documents
        """,
        "text_language_id": f"""
            WITH t AS (
              SELECT doc_id, lang AS lang_actual,
                     list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS toks
              FROM documents
            ), s AS (
              SELECT doc_id, lang_actual,
                     len(list_intersect(toks, [{en}])) AS score_en,
                     len(list_intersect(toks, [{de}])) AS score_de,
                     len(list_intersect(toks, [{es}])) AS score_es
              FROM t
            )
            SELECT doc_id, lang_actual,
                   CASE
                     WHEN greatest(score_en, score_de, score_es) = 0 THEN 'und'
                     WHEN score_en = greatest(score_en, score_de, score_es) THEN 'en'
                     WHEN score_de = greatest(score_en, score_de, score_es) THEN 'de'
                     ELSE 'es'
                   END AS lang_pred,
                   score_en, score_de, score_es
            FROM s
        """,
        "text_quality": """
            WITH f AS (
              SELECT doc_id,
                     len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
                     length(text) AS n_chars,
                     length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                         AS punct,
                     len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x IN ('the','and','of','to','is','in','that','with')))
                         AS stop_hits,
                     len(list_distinct(string_split_regex(lower(trim(text)), '\\s+')))
                         AS uniq
              FROM documents
            ), feats AS (
              SELECT doc_id, n_tokens,
                     n_chars * 1.0 / greatest(n_tokens, 1) AS mean_word_len,
                     punct * 1.0 / greatest(n_chars, 1) AS punct_ratio,
                     stop_hits * 1.0 / greatest(n_tokens, 1) AS stopword_ratio,
                     uniq * 1.0 / greatest(n_tokens, 1) AS unique_ratio
              FROM f
            )
            SELECT doc_id, n_tokens,
                   round(mean_word_len, 6) AS mean_word_len,
                   round(punct_ratio, 6) AS punct_ratio,
                   round(stopword_ratio, 6) AS stopword_ratio,
                   round(unique_ratio, 6) AS unique_ratio,
                   round(CAST(
                         0.3 * (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
                       + 0.25 * (CASE WHEN mean_word_len BETWEEN 3 AND 12 THEN 1.0 ELSE 0.0 END)
                       + 0.2 * (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END)
                       + 0.25 * (CASE WHEN unique_ratio >= 0.1 THEN 1.0 ELSE 0.0 END)
                       AS DOUBLE), 6) AS quality_score
            FROM feats
        """,
        "text_fingerprint": """
            WITH toks AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     [array_to_string(t[i:i+4], ' ')
                      FOR i IN generate_series(1, greatest(len(t)-4, 1))] AS shingles
              FROM toks
            )
            SELECT doc_id,
                   list_min(list_transform(shingles, s -> md5(s))) AS fingerprint,
                   len(shingles) AS n_shingles
            FROM sh
        """,
        "top_tokens_per_source": """
            WITH tok AS (
              SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
              FROM documents
            ), c AS (
              SELECT source, token, count(*) AS n FROM tok GROUP BY 1, 2
            ), r AS (
              SELECT source, token, n,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY n DESC, token ASC) AS rank
              FROM c
            )
            SELECT source, token, n, rank FROM r WHERE rank <= 10
        """,
        "dataset_align": """
            SELECT o_orderkey,
                   coalesce(c_name, '__missing__') AS cust_name,
                   coalesce(c_mktsegment, '__none__') AS segment
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        """,
        "match_metrics_sql": """
            WITH gold AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_discount > 0.05
            ), pred AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_tax > 0.04
            ), tp AS (
              SELECT l_orderkey, count(*) AS tp FROM pred JOIN gold
              USING (l_orderkey, l_partkey) GROUP BY 1
            ), np AS (
              SELECT l_orderkey, count(*) AS n_pred FROM pred GROUP BY 1
            ), ng AS (
              SELECT l_orderkey, count(*) AS n_gold FROM gold GROUP BY 1
            ), m AS (
              SELECT coalesce(ng.l_orderkey, np.l_orderkey) AS l_orderkey,
                     coalesce(tp.tp, 0) AS tp,
                     coalesce(np.n_pred, 0) AS n_pred,
                     coalesce(ng.n_gold, 0) AS n_gold
              FROM ng FULL OUTER JOIN np ON ng.l_orderkey = np.l_orderkey
              LEFT JOIN tp ON tp.l_orderkey = coalesce(ng.l_orderkey, np.l_orderkey)
            )
            SELECT l_orderkey, tp,
                   n_pred - tp AS fp, n_gold - tp AS fn,
                   round(CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred ELSE 0.0 END, 9) AS precision,
                   round(CASE WHEN n_gold > 0 THEN tp * 1.0 / n_gold ELSE 0.0 END, 9) AS recall,
                   round(CASE WHEN (CASE WHEN n_pred > 0 THEN tp*1.0/n_pred ELSE 0.0 END)
                            + (CASE WHEN n_gold > 0 THEN tp*1.0/n_gold ELSE 0.0 END) > 0
                       THEN 2 * (CASE WHEN n_pred > 0 THEN tp*1.0/n_pred ELSE 0.0 END)
                              * (CASE WHEN n_gold > 0 THEN tp*1.0/n_gold ELSE 0.0 END)
                            / ((CASE WHEN n_pred > 0 THEN tp*1.0/n_pred ELSE 0.0 END)
                             + (CASE WHEN n_gold > 0 THEN tp*1.0/n_gold ELSE 0.0 END))
                       ELSE 0.0 END, 9) AS f1_score,
                   round(CASE WHEN n_gold > 0 THEN (n_gold - tp) * 1.0 / n_gold ELSE 0.0 END, 9)
                       AS omission_rate,
                   round(CASE WHEN n_pred > 0 THEN (n_pred - tp) * 1.0 / n_pred ELSE 0.0 END, 9)
                       AS hallucination_rate
            FROM m
        """,
        "macro_micro_sql": """
            WITH gold AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_discount > 0.05
            ), pred AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_tax > 0.04
            ), tp AS (
              SELECT l_orderkey, count(*) AS tp FROM pred JOIN gold
              USING (l_orderkey, l_partkey) GROUP BY 1
            ), np AS (SELECT l_orderkey, count(*) AS n_pred FROM pred GROUP BY 1),
            ng AS (SELECT l_orderkey, count(*) AS n_gold FROM gold GROUP BY 1),
            m AS (
              SELECT coalesce(ng.l_orderkey, np.l_orderkey) AS l_orderkey,
                     coalesce(tp.tp, 0) AS tp,
                     coalesce(np.n_pred, 0) AS n_pred,
                     coalesce(ng.n_gold, 0) AS n_gold
              FROM ng FULL OUTER JOIN np ON ng.l_orderkey = np.l_orderkey
              LEFT JOIN tp ON tp.l_orderkey = coalesce(ng.l_orderkey, np.l_orderkey)
            ), per_doc AS (
              SELECT l_orderkey, tp, n_pred - tp AS fp, n_gold - tp AS fn,
                     CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred ELSE 0.0 END AS precision,
                     CASE WHEN n_gold > 0 THEN tp * 1.0 / n_gold ELSE 0.0 END AS recall
              FROM m
            ), pd2 AS (
              SELECT *, CASE WHEN precision + recall > 0
                   THEN 2 * precision * recall / (precision + recall) ELSE 0.0 END AS f1
              FROM per_doc
            )
            SELECT o_orderpriority, count(*) AS n_docs,
                   round(avg(precision), 6) AS macro_precision,
                   round(avg(recall), 6) AS macro_recall,
                   round(avg(f1), 6) AS macro_f1,
                   sum(tp) AS total_tp, sum(fp) AS total_fp, sum(fn) AS total_fn,
                   round(CASE WHEN sum(tp) + sum(fp) > 0
                       THEN sum(tp) * 1.0 / (sum(tp) + sum(fp)) ELSE 0.0 END, 9)
                       AS micro_precision,
                   round(CASE WHEN sum(tp) + sum(fn) > 0
                       THEN sum(tp) * 1.0 / (sum(tp) + sum(fn)) ELSE 0.0 END, 9)
                       AS micro_recall
            FROM pd2 JOIN orders ON o_orderkey = l_orderkey
            GROUP BY o_orderpriority
        """,
        "ged_sql": """
            WITH gold AS (
              SELECT DISTINCT o_custkey % 100 AS src, o_orderkey % 97 AS dst
              FROM orders WHERE o_orderstatus = 'F'
            ), pred AS (
              SELECT DISTINCT o_custkey % 100 AS src, o_orderkey % 97 AS dst
              FROM orders WHERE o_orderstatus = 'O'
            ), ee AS (
              SELECT count(*) FILTER (WHERE p.src IS NULL OR g.src IS NULL) AS edge_edits
              FROM (SELECT src, dst, 1 AS x FROM pred) p
              FULL OUTER JOIN (SELECT src, dst, 1 AS y FROM gold) g
              USING (src, dst)
            ), pn AS (
              SELECT DISTINCT n FROM (SELECT src AS n FROM pred UNION SELECT dst FROM pred)
            ), gn AS (
              SELECT DISTINCT n FROM (SELECT src AS n FROM gold UNION SELECT dst FROM gold)
            ), ne AS (
              SELECT count(*) FILTER (WHERE pn.n IS NULL OR gn.n IS NULL) AS node_edits
              FROM pn FULL OUTER JOIN gn USING (n)
            )
            SELECT edge_edits, node_edits, edge_edits + node_edits AS graph_edit_distance
            FROM ee, ne
        """,
        "redundancy_sql": """
            WITH keyed AS (
              SELECT l_orderkey,
                     concat_ws('|', least(l_partkey, l_suppkey),
                               greatest(l_partkey, l_suppkey), l_returnflag) AS k
              FROM lineitem
            ), per_key AS (
              SELECT l_orderkey, k, count(*) AS c FROM keyed GROUP BY 1, 2
            )
            SELECT l_orderkey, round(sum(c - 1) * 1.0 / sum(c), 9) AS redundancy_rate
            FROM per_key GROUP BY 1
        """,
        "cache_antijoin": """
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 3 = 0)
        """,
        "events_sessions": """
            WITH gapped AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                          THEN 1 ELSE 0 END AS new_session
              FROM events
            ), sess AS (
              SELECT user_id,
                     sum(new_session) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS session_id
              FROM gapped
            )
            SELECT user_id, CAST(max(session_id) + 1 AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM sess GROUP BY 1
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n, round(sum(value), 6) AS sum_value,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        """,
    }


if __name__ == "__main__":
    from relation_extraction_using_llms_spark.session import get_spark

    s = get_spark("entry-smoke", master="local[8]")
    df = entry(s)
    df.show(10, truncate=False)
    print("rows:", df.count())
