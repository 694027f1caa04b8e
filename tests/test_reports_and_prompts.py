"""Report sinks (S8) and prompt construction (P1-P8)."""

from __future__ import annotations

import pyspark.sql.functions as F

from relation_extraction_using_llms_spark.functions.prompts import (
    MODES,
    TECHNIQUES,
    build_prompts,
    configs_df,
    template_hash,
    template_parts,
)


def test_template_variants_distinct():
    seen = set()
    for t in TECHNIQUES:
        for m in MODES:
            pre, suf = template_parts(t, m)
            assert "{doc_id}" in pre
            seen.add((pre, suf))
            assert template_hash(t, m) not in (None, "")
    assert len(seen) == 12  # 4 techniques x 3 modes all distinct


def test_build_prompts_fanout_and_content(spark, sf_dir):
    from relation_extraction_using_llms_spark.functions.extraction import clean_text_df
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    clean = clean_text_df(pages_df(spark, sf_dir).limit(10)).select("url", "text")
    cfgs = configs_df(spark, ["IO", "CoT"], ["baseline", "full"], ["m1"])
    prompts = build_prompts(clean, cfgs)
    rows = prompts.collect()
    assert len(rows) == 10 * 2 * 2
    for r in rows:
        assert r["url"] in r["prompt"]  # doc_id interpolation
        assert r["prompt"].endswith("JSON output:")
        assert len(r["doc_hash"]) == 12
        if r["mode"] == "full":
            assert "Example document" in r["prompt"]
        if r["technique"] == "CoT":
            assert "step" in r["prompt"].lower()


def test_rag_context_join(spark, sf_dir):
    from relation_extraction_using_llms_spark.functions.extraction import clean_text_df
    from relation_extraction_using_llms_spark.operators.similarity import rag_context
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    clean = clean_text_df(pages_df(spark, sf_dir).limit(8)).select("url", "text")
    snippets = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20).select("doc_id", "text")
    )
    ctx = rag_context(clean, snippets, k=2)
    rows = ctx.collect()
    assert len(rows) == 8
    assert all("---" in r["context"] or r["context"] for r in rows)

    cfgs = configs_df(spark, ["RAG", "IO"], ["improved"], ["m1"])
    prompts = build_prompts(clean, cfgs, context_df=ctx).collect()
    rag = [r for r in prompts if r["technique"] == "RAG"]
    io = [r for r in prompts if r["technique"] == "IO"]
    assert all(p["prompt"].startswith("Retrieved context:") for p in rag)
    assert not any(p["prompt"].startswith("Retrieved context:") for p in io)


def test_write_run_artifacts(spark, sf_dir, tmp_path):
    from relation_extraction_using_llms_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from relation_extraction_using_llms_spark.plans.reports import write_run_artifacts
    from relation_extraction_using_llms_spark.sources.stub_model import make_stub_model
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    cfg = PipelineConfig(
        techniques=["IO"], models=["stub-large"], strategies=["exact"],
        with_types_variants=(True,),
    )
    pages = pages_df(spark, sf_dir).limit(40)
    stages = run_pipeline(spark, pages, cfg, model_fn=make_stub_model(sf_dir))
    paths = write_run_artifacts(
        str(tmp_path / "run"), stages["eval_per_doc"], stages["eval_aggregate"]
    )
    assert set(paths) >= {
        "eval_per_doc",
        "eval_aggregate",
        "technique_rankings",
        "model_ranking",
        "strategy_summary",
        "best_configuration",
    }
    agg = spark.read.parquet(paths["eval_aggregate"])
    assert agg.count() == 1
    per_doc = spark.read.parquet(paths["eval_per_doc"])
    # partition pruning works on the report tree
    assert per_doc.where(F.col("strategy") == "exact").count() == per_doc.count()


def test_rag_pipeline_retrieves_context(spark, sf_dir):
    """RAG-technique prompts carry retrieved snippets (rag_prompter.py:77-129
    always retrieves); non-RAG prompts are unchanged; eval still runs."""
    from relation_extraction_using_llms_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from relation_extraction_using_llms_spark.sources.stub_model import make_stub_model
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    cfg = PipelineConfig(
        techniques=["RAG", "IO"], models=["stub-large"], strategies=["exact"],
        with_types_variants=(True,), rag_k=2, rag_index_size=16,
    )
    pages = pages_df(spark, sf_dir).limit(40)
    stages = run_pipeline(spark, pages, cfg, model_fn=make_stub_model(sf_dir))
    rag = stages["prompts"].where(F.col("technique") == "RAG").limit(5).collect()
    assert rag and all(p["prompt"].startswith("Retrieved context:\n") for p in rag)
    io = stages["prompts"].where(F.col("technique") == "IO").limit(5).collect()
    assert io and all(not p["prompt"].startswith("Retrieved context:") for p in io)
    assert stages["eval_aggregate"].count() == 2  # one row per technique


def test_rag_context_ann_retrieves_via_lsh(spark, sf_dir):
    """The ANN RAG path (embed -> lsh_topk -> assemble) returns one ordered
    context per url; a document whose text IS a snippet must retrieve that
    snippet first (self-similarity = 1 through the hashed embedder)."""
    from relation_extraction_using_llms_spark.functions.extraction import (
        clean_text_df,
    )
    from relation_extraction_using_llms_spark.operators.similarity import (
        rag_context_ann,
    )
    from relation_extraction_using_llms_spark.plans.pipeline import (
        rag_snippet_index,
    )
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    clean = clean_text_df(pages_df(spark, sf_dir)).select("url", "text").limit(40)
    snippets = rag_snippet_index(clean, 16)
    ctx = rag_context_ann(clean, snippets, k=3)
    rows = ctx.collect()
    # EVERY query url yields a row — a url with zero LSH candidates
    # carries a null context instead of silently dropping (parity with
    # rag_context's one-row-per-url contract)
    assert len(rows) == clean.select("url").distinct().count()
    assert any(r["context"] for r in rows)
    # a query identical to an indexed snippet retrieves it at rank 1
    snip = snippets.collect()[0]
    probe = spark.createDataFrame(
        [(str(snip["doc_id"]), snip["text"])], "url string, text string"
    )
    got = rag_context_ann(probe, snippets, k=1).collect()
    assert len(got) == 1
    assert got[0]["context"] == snip["text"]


def test_rag_pipeline_ann_retrieval_mode(spark, sf_dir):
    """rag_retrieval='ann' swaps the retriever inside the pipeline and RAG
    prompts still carry retrieved context."""
    import pyspark.sql.functions as F

    from relation_extraction_using_llms_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from relation_extraction_using_llms_spark.sources.stub_model import (
        make_stub_model,
    )
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    cfg = PipelineConfig(
        techniques=["RAG"], models=["stub-large"], strategies=["exact"],
        with_types_variants=(True,), rag_retrieval="ann", rag_index_size=16,
    )
    pages = pages_df(spark, sf_dir).limit(30)
    stages = run_pipeline(spark, pages, cfg, model_fn=make_stub_model(sf_dir))
    prompts = stages["prompts"].where(F.col("technique") == "RAG")
    n_with_ctx = prompts.where(
        F.col("prompt").contains("Retrieved context")
    ).count()
    assert n_with_ctx > 0


def test_rag_context_ann_plan_is_lazy(spark):
    """With the default embedder, rag_context_ann must not run any job at
    plan-construction time (the dim-discovery head() is skipped): building
    the context DataFrame over a poisoned upstream DAG must not raise."""
    import pytest

    from relation_extraction_using_llms_spark.operators.similarity import (
        rag_context_ann,
    )

    def boom(batches):
        raise RuntimeError("upstream DAG executed during planning")
        yield  # pragma: no cover

    poisoned = spark.range(4).mapInPandas(boom, schema="url string, text string")
    snippets = spark.createDataFrame(
        [("s1", "alpha beta")], "doc_id string, text string"
    )
    ctx = rag_context_ann(poisoned, snippets, k=1)  # must not raise
    with pytest.raises(Exception, match="upstream DAG executed"):
        ctx.count()
