"""Physical-plan assertions: the optimizations we rely on at 100 TB must
actually appear in the executed plans — column pruning reaching the
parquet scan, predicate pushdown, broadcast joins for small dimensions,
and zero row-at-a-time Python in any hot path."""

from __future__ import annotations

import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_scan_prunes_columns_for_token_count(spark, sf_dir):
    """token_count projects 4 derived columns from text; the parquet scan
    must read ONLY (doc_id, text) — not source/lang/ts."""
    from relation_extraction_using_llms_spark.functions.textstats import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(token_count(docs))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    schema_str = scan[0]
    assert "doc_id" in schema_str and "text" in schema_str
    for absent in ("source", "lang"):
        assert absent not in schema_str, schema_str


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    """A selective filter lands in PushedFilters on the scan node."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    q = ev.where(F.col("event_type") == "click").groupBy("user_id").count()
    plan = _plan(q)
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "event_type" in pushed, pushed


def test_extraction_ships_only_url_and_html(spark, sf_dir):
    """clean_text_df column-prunes before the Python stage: Arrow ships
    (url, html), never the full pages row."""
    from relation_extraction_using_llms_spark.functions.extraction import clean_text_df
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    plan = _plan(clean_text_df(pages_df(spark, sf_dir)))
    # the MapInPandas input projection carries exactly url + html
    map_lines = [ln for ln in plan.splitlines() if "MapInPandas" in ln]
    assert map_lines, plan
    assert "url" in map_lines[0] and "html" in map_lines[0]
    assert "warc_ts" not in map_lines[0] and "lang" not in map_lines[0]


def test_prompt_configs_join_is_broadcast(spark, sf_dir):
    """The tiny (technique, mode, model) config table fans out via a
    broadcast nested loop / broadcast join — never a shuffle."""
    from relation_extraction_using_llms_spark.functions.prompts import (
        build_prompts,
        configs_df,
    )
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df
    from relation_extraction_using_llms_spark.functions.extraction import clean_text_df

    clean = clean_text_df(pages_df(spark, sf_dir)).select("url", "text")
    prompts = build_prompts(clean, configs_df(spark, ["IO"], ["improved"], ["m"]))
    plan = _plan(prompts)
    assert "Broadcast" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_no_row_python_udfs_in_headline_plans(spark, sf_dir):
    """BatchEvalPython (row-at-a-time Python UDF) must not appear in any
    headline stage plan; Python rides Arrow (MapInPandas / ArrowEvalPython
    pandas UDFs) only."""
    import __spark_entry__ as entry_mod

    for name in ["text_stats", "dedup_jaccard_clusters", "events_sessions",
                 "match_metrics_sql", "top_tokens_per_source"]:
        plan = _plan(entry_mod.queries()[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan, (name, plan)


def test_whole_stage_codegen_covers_metric_math(spark, sf_dir):
    """Metric arithmetic (P/R/F1 formulas) stays inside whole-stage
    codegen spans."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["match_metrics_sql"](spark, sf_dir)
    df.collect()  # finalize the adaptive plan
    plan = _plan(df)
    assert "isFinalPlan=true" in plan, plan
    # codegen stages render as "*(n)" prefixes in the executed-plan string
    assert "*(" in plan, plan


def test_graph_table_subject_reads_prune_partitions(spark, sf_dir, tmp_path):
    """Edges written partitionBy(subj_bucket): a subject-keyed read scans
    exactly one partition (PartitionFilters on the scan)."""
    from relation_extraction_using_llms_spark.operators.canonicalize import (
        materialize_triples,
    )
    from relation_extraction_using_llms_spark.plans.reports import (
        write_graph_tables,
    )

    preds = spark.createDataFrame(
        [(f"https://u/{i}", "IO", "m", 0, "a", "b", "Association", 0.9,
          f"E{i % 7}", f"E{(i + 1) % 7}") for i in range(100)],
        "url string, technique string, model string, pred_index int,"
        " head_mention string, tail_mention string, relation_type string,"
        " confidence double, head_id string, tail_id string",
    )
    paths = write_graph_tables(materialize_triples(preds), str(tmp_path / "g"))
    edges = spark.read.parquet(paths["edges"])
    one_subj = edges.where(F.col("subj") == "E3")
    bucket = one_subj.select("subj_bucket").distinct().collect()
    assert len(bucket) == 1
    pruned = edges.where(F.col("subj_bucket") == bucket[0]["subj_bucket"])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "subj_bucket" in plan
    summary = {r["pred"]: r for r in spark.read.parquet(paths["predicate_summary"]).collect()}
    assert summary["Association"]["n_edges"] == 100


def test_native_lsh_plan_is_pure_jvm(spark, sf_dir):
    """The native random-projection LSH must plan with zero Python (no
    BatchEvalPython, no MapInPandas, no MLlib vector UDF) and block
    candidates through a real equi-join on (table, bucket)."""
    from relation_extraction_using_llms_spark.operators.similarity import (
        lsh_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    df = lsh_topk(emb, q, k=5)
    plan = _plan(df)
    for absent in ("BatchEvalPython", "MapInPandas", "PythonUDF"):
        assert absent not in plan, (absent, plan)
    # the bucket join is an equi-join (hash or sort-merge), not a
    # cartesian/nested-loop product
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan
    assert any(j in plan for j in ("HashJoin", "SortMergeJoin")), plan


def test_native_embedding_dedup_plan_is_pure_jvm(spark, sf_dir):
    from relation_extraction_using_llms_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(embedding_near_dup_pairs(emb, threshold=0.95, method="lsh"))
    for absent in ("BatchEvalPython", "MapInPandas", "PythonUDF",
                   "CartesianProduct", "NestedLoop"):
        assert absent not in plan, (absent, plan)
